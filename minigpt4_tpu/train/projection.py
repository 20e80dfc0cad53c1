"""Stage-1 projection training: fit ``llama_proj`` on image-caption pairs.

MiniGPT-4's first training stage freezes the ViT, Q-Former and LLM and trains
only the linear projection (the reference ships the *result* of that training
— the .pth the converter reads — but no trainer).  This module provides the
TPU-native trainer the reference lacks, and doubles as the framework's full
forward+backward path: vision encode -> soft-prompt injection -> decoder
cross-entropy -> grads -> optax update, jittable over a (dp, tp) mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models import llama as llama_mod
from ..models import minigpt4 as vision_mod


def caption_loss(
    proj_params: dict,
    frozen: dict,
    pixels: jnp.ndarray,
    caption_tokens: jnp.ndarray,
    caption_mask: jnp.ndarray,
    vision_cfg,
    llm_cfg,
) -> jnp.ndarray:
    """Cross-entropy of caption tokens given the image soft prompt.

    frozen: {'vision': vision params without llama_proj, 'llm': decoder params}
    pixels [B, 3, H, W]; caption_tokens [B, T] (BOS first); caption_mask [B, T].
    """
    vision_params = dict(frozen["vision"])
    vision_params["llama_proj"] = proj_params
    img_embeds = vision_mod.encode_image(vision_params, pixels, vision_cfg)  # [B, Q, D]

    tok_embeds = llama_mod.embed_tokens(frozen["llm"], caption_tokens)  # [B, T, D]
    seq = jnp.concatenate([img_embeds.astype(tok_embeds.dtype), tok_embeds], axis=1)

    import dataclasses

    b = pixels.shape[0]
    n_q = img_embeds.shape[1]
    t = caption_tokens.shape[1]
    cfg_t = dataclasses.replace(llm_cfg, n_ctx=n_q + t)
    cache = llama_mod.init_cache(cfg_t, batch=b, dtype=tok_embeds.dtype)
    # use_flash=False: the flash-decode kernel has no VJP and training runs
    # sharded (the einsum path differentiates and partitions cleanly)
    logits, _ = llama_mod.forward(
        frozen["llm"], cache, seq, jnp.int32(0), cfg_t, all_logits=True,
        use_flash=False,
    )  # [B, n_q+T, V]

    # predict caption token t+1 from position (n_q + t)
    pred = logits[:, n_q - 1 : n_q + t - 1]  # [B, T, V]
    logp = jax.nn.log_softmax(pred, axis=-1)
    nll = -jnp.take_along_axis(logp, caption_tokens[..., None], axis=-1)[..., 0]
    mask = caption_mask.astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_train_step(vision_cfg, llm_cfg, optimizer: optax.GradientTransformation):
    """Returns jitted step(proj_params, opt_state, frozen, batch) ->
    (proj_params, opt_state, loss)."""

    def step(proj_params, opt_state, frozen, pixels, tokens, mask):
        loss, grads = jax.value_and_grad(caption_loss)(
            proj_params, frozen, pixels, tokens, mask, vision_cfg, llm_cfg
        )
        updates, opt_state = optimizer.update(grads, opt_state, proj_params)
        proj_params = optax.apply_updates(proj_params, updates)
        return proj_params, opt_state, loss

    return jax.jit(step)

"""MiniGPT-4 vision pipeline: ViT-G -> ln_vision -> Q-Former -> llama_proj.

One jitted function equals the reference's entire ``encode_image`` graph
(/root/reference/minigpt4.cpp:2094-2363): the ggml graph rebuilt per call
becomes a single XLA computation compiled once, with pixels as the only
host->device transfer and the [32, n_embd] projection as the only download
(or zero downloads when chaining straight into the decoder on-device).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from . import eva_vit, qformer
from .layers import layer_norm, linear

LN_VISION_EPS = 1e-5  # LAVIS Blip2Base.LayerNorm default (torch nn.LayerNorm)


@dataclass(frozen=True)
class VisionConfig:
    vit: eva_vit.ViTConfig
    qformer: qformer.QFormerConfig
    llama_embed_dim: int  # 4096 (7B) or 5120 (13B)


def encode_image(params: dict, pixels: jnp.ndarray, cfg: VisionConfig) -> jnp.ndarray:
    """pixels [B, 3, 224, 224] (preprocessed f32 CHW) -> [B, 32, n_embd]."""
    x = eva_vit.forward(params["visual_encoder"], pixels, cfg.vit)
    x = layer_norm(x, params["ln_vision"], LN_VISION_EPS)
    x = qformer.forward(params["qformer"], x, cfg.qformer)
    return linear(x, params["llama_proj"])


def jit_encode_image(cfg: VisionConfig):
    return jax.jit(partial(encode_image, cfg=cfg))


def load_params(reader, dtype=jnp.float32, quant_mode: str = "auto") -> tuple[dict, VisionConfig]:
    """Assemble the full vision pipeline from a ContainerReader
    (load_minigpt4_model, minigpt4.cpp:2085-2092)."""
    from .eva_vit import _load_linear

    vit_params, vit_cfg = eva_vit.load_params(reader, dtype, quant_mode)
    qf_params, qf_cfg = qformer.load_params(reader, dtype, quant_mode)
    proj = _load_linear(
        reader, "llama_proj", "weight", reader.tensor_f32("llama_proj", "bias"), dtype, quant_mode
    )
    ln = {
        "g": jnp.asarray(reader.tensor_f32("ln_vision", "weight"), dtype),
        "b": jnp.asarray(reader.tensor_f32("ln_vision", "bias"), dtype),
    }
    n_embd = reader.models["llama_proj"].tensors["weight"].shape[0]
    params = {
        "visual_encoder": vit_params,
        "ln_vision": ln,
        "qformer": qf_params,
        "llama_proj": proj,
    }
    return params, VisionConfig(vit=vit_cfg, qformer=qf_cfg, llama_embed_dim=n_embd)

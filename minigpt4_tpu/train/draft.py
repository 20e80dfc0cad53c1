"""Draft-head distillation: a tiny decoder over the FROZEN shared embedding.

Round-2's draft-model speculation (llama.draft_speculative_decode_loop) had
no drafter to run — no small checkpoint can enter this environment, and
n-gram prompt-lookup drafts ~nothing on novel text (the measured 1.04
tokens/pass realistic floor).  This module trains one IN-REPO:

  * the draft is a 1-2 layer llama whose token embedding is the MAIN
    model's embedding matrix projected through a learned ``p_in``
    [d_main, d_draft], and whose output head is ``p_out`` [d_draft,
    d_main] composed with the SAME main embedding — so the committed
    artifact holds only the projections + tiny layers (~10-25 MB), never a
    32000-row table, and the vocabulary is tied to the teacher by
    construction;
  * training is teacher distillation: cross-entropy of the draft's
    next-token prediction against the teacher's GREEDY choice (exactly the
    speculative-verify acceptance event), teacher-forced over mixed
    context streams;
  * at load, :func:`assemble_draft` materializes a STANDARD llama param
    tree (embeddings computed once on device), so the engine's existing
    draft machinery (DraftFns / draft_speculative_decode_loop) runs it
    unchanged.

The same trainer distills against real checkpoints (pass the real params)
— run it on deployment hardware with real chat text for a production
drafter; tools/train_bench_draft.py is the in-repo instance against the
benchmark's synthetic 13B.

Reference tie-in: llama.cpp's "speculative" example expects users to BRING
a small model; the reference repo itself ships none.  This subsystem makes
the capability self-contained.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod


@dataclass(frozen=True)
class DraftHeadConfig:
    d_draft: int = 512
    n_layer: int = 2
    n_head: int = 8
    n_ff: int = 1408

    def llama_cfg(self, n_vocab: int, n_ctx: int) -> llama_mod.LlamaConfig:
        return llama_mod.LlamaConfig(
            n_vocab=n_vocab, n_embd=self.d_draft, n_head=self.n_head,
            n_layer=self.n_layer, n_rot=self.d_draft // self.n_head,
            n_ff=self.n_ff, n_ctx=n_ctx,
        )


def init_draft_head(key, d_main: int, cfg: DraftHeadConfig) -> dict:
    """Artifact pytree: projections + stacked tiny layers (f32 master)."""
    ks = jax.random.split(key, 8)
    d, ff, L = cfg.d_draft, cfg.n_ff, cfg.n_layer

    def nrm(k, *shape, s):
        return jax.random.normal(k, shape, jnp.float32) * s

    return {
        "p_in": nrm(ks[0], d_main, d, s=d_main ** -0.5),
        "p_out": nrm(ks[1], d, d_main, s=d ** -0.5),
        "layers": {
            "attention_norm": jnp.ones((L, d), jnp.float32),
            "wqkv": {"w": nrm(ks[2], L, d, 3 * d, s=0.02)},
            "wo": {"w": nrm(ks[3], L, d, d, s=0.02 / (2 * L) ** 0.5)},
            "ffn_norm": jnp.ones((L, d), jnp.float32),
            "w13": {"w": nrm(ks[4], L, d, 2 * ff, s=0.02)},
            "w2": {"w": nrm(ks[5], L, ff, d, s=0.02 / (2 * L) ** 0.5)},
        },
        "norm": jnp.ones((d,), jnp.float32),
    }


def assemble_draft(main_emb: jnp.ndarray, art: dict, dtype=jnp.bfloat16) -> dict:
    """Artifact + the main model's [V, d_main] embedding -> a standard
    llama param tree the draft loops consume unchanged.  Differentiable in
    the artifact (the trainer calls it inside the loss)."""
    emb = main_emb.astype(jnp.float32)
    tok = emb @ art["p_in"]                      # [V, d_draft]
    head = art["p_out"] @ emb.T                  # [d_draft, V]
    return {
        "tok_embeddings": tok.astype(dtype),
        "norm": art["norm"].astype(dtype),
        "output": {"w": head.astype(dtype)},
        "layers": jax.tree_util.tree_map(lambda p: p.astype(dtype), art["layers"]),
    }


def save_artifact(path: str | Path, art: dict, cfg: DraftHeadConfig,
                  teacher_mode: str = "") -> None:
    """``teacher_mode`` records which teacher numerics ("gq"/"w8a8"/...) the
    head was distilled against; the benchmark only scores the artifact
    inside the matching arm (argmax agreement is numerics-sensitive)."""
    flat = {
        "p_in": np.asarray(art["p_in"], np.float16),
        "p_out": np.asarray(art["p_out"], np.float16),
        "norm": np.asarray(art["norm"], np.float16),
        "attention_norm": np.asarray(art["layers"]["attention_norm"], np.float16),
        "wqkv": np.asarray(art["layers"]["wqkv"]["w"], np.float16),
        "wo": np.asarray(art["layers"]["wo"]["w"], np.float16),
        "ffn_norm": np.asarray(art["layers"]["ffn_norm"], np.float16),
        "w13": np.asarray(art["layers"]["w13"]["w"], np.float16),
        "w2": np.asarray(art["layers"]["w2"]["w"], np.float16),
        "cfg": np.asarray([cfg.d_draft, cfg.n_layer, cfg.n_head, cfg.n_ff],
                          np.int32),
    }
    if teacher_mode:
        flat["teacher_mode"] = np.asarray(teacher_mode)
    np.savez_compressed(str(path), **flat)


def artifact_teacher_mode(path: str | Path, default: str = "w8a8") -> str:
    """The quant-mode tag recorded at save time (pre-tag artifacts were
    always distilled against the w8a8 teacher)."""
    with np.load(str(path)) as z:
        return str(z["teacher_mode"]) if "teacher_mode" in z else default


def load_artifact(path: str | Path) -> tuple[dict, DraftHeadConfig]:
    z = np.load(str(path))
    cfg = DraftHeadConfig(*[int(v) for v in z["cfg"]])
    art = {
        "p_in": jnp.asarray(z["p_in"], jnp.float32),
        "p_out": jnp.asarray(z["p_out"], jnp.float32),
        "norm": jnp.asarray(z["norm"], jnp.float32),
        "layers": {
            "attention_norm": jnp.asarray(z["attention_norm"], jnp.float32),
            "wqkv": {"w": jnp.asarray(z["wqkv"], jnp.float32)},
            "wo": {"w": jnp.asarray(z["wo"], jnp.float32)},
            "ffn_norm": jnp.asarray(z["ffn_norm"], jnp.float32),
            "w13": {"w": jnp.asarray(z["w13"], jnp.float32)},
            "w2": {"w": jnp.asarray(z["w2"], jnp.float32)},
        },
    }
    return art, cfg


def make_distill_step(dcfg: llama_mod.LlamaConfig, opt):
    """One jitted distillation step.

    Loss: mean CE of draft logits (teacher-forced, all positions past
    ``warm``) against the teacher's greedy token — the exact event the
    speculative verify pass accepts on.  f32 end-to-end inside the draft
    (bf16 drafting is what serving runs; training in f32 keeps Adam sane).

    ``main_emb`` is a step ARGUMENT, not a closure: a captured [V, d_main]
    f32 table becomes an embedded HLO constant, and remote-compile relays
    reject the resulting ~0.7 GB payload (HTTP 413 — the round-3 trainer
    failure mode)."""

    def loss_fn(art, main_emb, tokens, targets, warm):
        dparams = assemble_draft(main_emb, art, dtype=jnp.float32)
        b, t = tokens.shape
        cache = llama_mod.init_cache(dcfg, batch=b, dtype=jnp.float32)
        emb = llama_mod.embed_tokens(dparams, tokens)
        logits, _ = llama_mod.forward(
            dparams, cache, emb, jnp.int32(0), dcfg, all_logits=True,
            use_flash=False,
        )  # [B, T, V]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        mask = jnp.broadcast_to(
            (jnp.arange(t)[None, :] >= warm).astype(jnp.float32), ce.shape)
        acc = (jnp.argmax(logits, -1) == targets).astype(jnp.float32)
        return (ce * mask).sum() / mask.sum(), (acc * mask).sum() / mask.sum()

    @jax.jit
    def step(art, opt_state, main_emb, tokens, targets, warm):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            art, main_emb, tokens, targets, warm)
        updates, opt_state = opt.update(grads, opt_state, art)
        import optax

        art = optax.apply_updates(art, updates)
        return art, opt_state, loss, acc

    return step


def teacher_targets(params, cfg, tokens: jnp.ndarray, cache_dtype=jnp.bfloat16):
    """Teacher-forced greedy targets [B, T] for a token batch (the teacher's
    argmax at every position — what verify compares drafts against).

    The scratch KV cache is sized to the batch's sequence length, not
    ``cfg.n_ctx``: a full-context cache at batch 8 x 13B geometry is ~6.7 GB
    (f8) beside the ~13-14 GB teacher weights — an instant OOM for state the
    forward never reads past ``T``."""
    import dataclasses

    b, t = tokens.shape
    cfg = dataclasses.replace(cfg, n_ctx=min(cfg.n_ctx, t))
    cache = llama_mod.init_cache(cfg, batch=b, dtype=cache_dtype)
    emb = llama_mod.embed_tokens(params, tokens)
    logits, _ = llama_mod.forward(params, cache, emb, jnp.int32(0), cfg,
                                  all_logits=True)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)

"""On-device sampling: the llama.cpp chain as jittable logits -> token.

Used inside the fused multi-token decode loop (one TPU dispatch generates a
chunk of tokens), where per-token host round-trips would dominate latency on
tunneled/remote backends.  Implements greedy and the
top-k -> tail-free -> typical -> top-p -> temperature chain with the same
truncation semantics as the host sampler (engine/sampling.py); mirostat
stays host-side (it carries float state across calls and is rarely used).

All steps operate on a descending sort of the logits once per token —
jnp.sort over a 32k vocab is microseconds on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DeviceSamplingConfig:
    """Static (compile-time) sampling configuration."""

    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.9
    tfs_z: float = 1.0
    typical_p: float = 1.0

    @property
    def greedy(self) -> bool:
        return self.temp <= 0


def sample_token(logits: jnp.ndarray, key: jnp.ndarray, cfg: DeviceSamplingConfig) -> jnp.ndarray:
    """logits [V] f32 -> token id (int32 scalar)."""
    if cfg.greedy:
        return jnp.argmax(logits).astype(jnp.int32)

    v = logits.shape[-1]
    order = jnp.argsort(-logits)  # descending
    sl = logits[order]
    probs = jax.nn.softmax(sl)

    keep = jnp.arange(v) < (cfg.top_k if cfg.top_k > 0 else v)

    # tail-free over the currently-kept prefix
    if cfg.tfs_z < 1.0:
        fd = jnp.abs(jnp.diff(probs, n=2))
        s = fd.sum()
        fd = jnp.where(s > 0, fd / s, 1.0 / (v - 2))
        cum = jnp.cumsum(fd)
        n_keep = jnp.searchsorted(cum, cfg.tfs_z) + 1
        keep = keep & (jnp.arange(v) < jnp.maximum(n_keep, 1))

    # locally-typical: mask by |surprise - entropy| rank
    if cfg.typical_p < 1.0:
        eps = 1e-12
        surprise = -jnp.log(probs + eps)
        entropy = jnp.sum(probs * surprise)
        shifted = jnp.abs(surprise - entropy)
        t_order = jnp.argsort(shifted)
        t_cum = jnp.cumsum(probs[t_order])
        t_keep_n = jnp.maximum(jnp.searchsorted(t_cum, cfg.typical_p) + 1, 1)
        t_rank = jnp.argsort(t_order)  # rank of each sorted-position in typicality order
        keep = keep & (t_rank < t_keep_n)

    if cfg.top_p < 1.0:
        kp = jnp.where(keep, probs, 0.0)
        kp = kp / jnp.maximum(kp.sum(), 1e-12)
        cum = jnp.cumsum(kp)
        n_keep = jnp.searchsorted(cum, cfg.top_p) + 1
        keep = keep & (jnp.arange(v) < jnp.maximum(n_keep, 1))

    keep = keep.at[0].set(True)  # min_keep = 1
    scaled = jnp.where(keep, sl / cfg.temp, -jnp.inf)
    idx = jax.random.categorical(key, scaled)
    return order[idx].astype(jnp.int32)

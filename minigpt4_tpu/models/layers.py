"""Shared NN primitives (functional, jit-friendly).

TPU-native equivalents of the reference's CRTP layer library
(/root/reference/minigpt4.cpp:983-1093): pure functions over parameter
pytrees instead of graph-building structs.  Numerics follow the *PyTorch*
ground truth the reference mirrors (its inline torch comments), not ggml's
approximations: exact erf GELU (ggml uses a tanh approximation) and per-layer
LayerNorm epsilons (ggml hardcodes 1e-5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .params import linear


def layer_norm(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    """Non-RMS LayerNorm with learned scale/shift (NNLayerNorm,
    minigpt4.cpp:1073-1093).  Statistics in f32 regardless of input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jnp.ndarray, g: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LLaMA RMSNorm (llama.cpp ggml_rms_norm semantics)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(ms + eps)
    return (y * g.astype(jnp.float32)).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default used by EVA/Q-Former."""
    return jax.nn.gelu(x, approximate=False)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-head attention core: q [B,H,Sq,D], k/v [B,H,Sk,D] -> [B,H,Sq,D].

    Softmax in f32 (matches torch; ggml_soft_max is also f32)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """[B, S, H*D] -> [B, H, S, D]."""
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, -1).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, D] -> [B, S, H*D]."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


__all__ = ["layer_norm", "rms_norm", "gelu", "mha", "split_heads", "merge_heads", "linear"]

"""Quantized matmul: x [..., K] × packed W [N, K] -> [..., N].

Two interchangeable implementations under one signature:

  * **XLA fallback** — dequantize the whole weight in-graph, then one MXU
    matmul.  Correct everywhere (CPU tests included), but materializes the
    dense weight in HBM each call.
  * **Pallas kernel** — tiles of the packed weight are DMA'd to VMEM,
    dequantized on the VPU and fed to the MXU without ever materializing the
    dense matrix in HBM.  This is the decode-path speed-of-light kernel: at
    batch 1 decode is HBM-bandwidth-bound, so reading 4.5-5.5 bits/weight
    instead of 16 is the difference between ~10 and ~40 tok/s on 13B
    (reference's analogous trick: ggml quantized ``mul_mat``).

The Pallas kernel consumes the repacked representation
(:mod:`minigpt4_tpu.ops.repack` / :mod:`.pallas_quant_matmul`) — weights are
repacked once at load time on the TPU path (models/params.load_quant_weight),
so raw ggml-byte QTensors always take the XLA fallback here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qmatmul_xla(x: jnp.ndarray, qt, out_dtype=None) -> jnp.ndarray:
    """Fallback: dense dequant + matmul (contract over K of both operands)."""
    w = qt.dequantize(x.dtype)  # [N, K]
    y = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype or x.dtype)


def qmatmul(x: jnp.ndarray, qt, prefer_pallas: bool = True, out_dtype=None) -> jnp.ndarray:
    del prefer_pallas  # kept for API stability; QTensors always dequant in XLA
    return qmatmul_xla(x, qt, out_dtype=out_dtype)

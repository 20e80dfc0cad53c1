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

The Pallas path is selected automatically on TPU for shapes it supports;
set ``MINIGPT4_TPU_NO_PALLAS=1`` to force the fallback.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..formats.dtypes import DataType, traits
from . import dequant as jdequant


def _use_pallas() -> bool:
    if os.environ.get("MINIGPT4_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


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
    if prefer_pallas and _use_pallas():
        from . import pallas_quant_matmul as pqm

        y = pqm.qmatmul_pallas(x, qt, out_dtype=out_dtype)
        if y is not None:
            return y
    return qmatmul_xla(x, qt, out_dtype=out_dtype)

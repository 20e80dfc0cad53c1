"""Pallas fused dequantize-matmul kernels (TPU hot path).

``qmatmul_pallas`` returns ``None`` for unsupported shapes/formats, in which
case the caller falls back to the XLA dequant path.  Implemented formats are
registered in ``_KERNELS``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KERNELS: dict = {}


def qmatmul_pallas(x: jnp.ndarray, qt, out_dtype=None):
    fn = _KERNELS.get(qt.dtype)
    if fn is None:
        return None
    return fn(x, qt, out_dtype=out_dtype)

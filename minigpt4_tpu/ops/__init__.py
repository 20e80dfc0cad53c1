"""Compute ops: jittable dequantization, quantized matmul (XLA + Pallas),
and attention kernels."""

from . import dequant, quant_matmul

__all__ = ["dequant", "quant_matmul"]

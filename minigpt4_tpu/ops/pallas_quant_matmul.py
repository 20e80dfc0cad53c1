"""Pallas fused dequantize-matmul: the decode-path speed-of-light kernel.

Computes ``y[m, n] = sum_k x[m, k] * w[n, k]`` where ``w`` is a
:class:`~minigpt4_tpu.ops.repack.RepackedQuant`: packed codes are DMA'd to
VMEM per N-tile, expanded to bf16 on the VPU (nibble/bit-plane unpack +
per-group scale multiply), and contracted on the MXU — the dense weight
matrix never exists in HBM.  At batch-1 decode this is HBM-bandwidth-bound:
the kernel reads ~0.6-1.0 B/weight instead of the fallback's ~12 B/weight
(dense f32 dequant write + read + source), the difference between ~4 and
~40+ tok/s on 13B (see BASELINE.md).

The affine/offset term is algebraically hoisted out of the kernel:

    y = (scale*q - min) @ x  =  [kernel: (scale*q) @ x]  -  groupsum(x) @ min

so the wrapper subtracts a tiny [M, K/gs] x [K/gs, N] XLA matmul.

Layout invariants (from repack.py): nibble planes pair elem i with elem
i + K/2 in one byte; hi-bit planes are packed along logical k.  The kernel
therefore splits x into its two K/2 halves and issues two MXU contractions
per tile.  Grid is (m_tiles, n_tiles); K is processed whole per tile (VMEM
footprint at TN=128, K=13824 is ~5 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .repack import RepackedQuant

import os

TN = int(os.environ.get("MINIGPT4_TPU_QMM_TN", "256"))  # N tile
TM_DECODE = 8  # M tile for small batch


def _kernel(x_ref, codes_ref, scales_ref, hi_ref, out_ref, *, k, gs, code_bits, hi_bits):
    """Tile-interleaved layout (ops.repack): every expansion is a 2D
    ``pltpu.repeat`` (tile semantics) — Mosaic cannot lower the 3D reshapes
    an element-repeat would need.  Storage lane j's scale is scales[j % G]
    and its hi-bit field index is j // (bytes_per_row), both of which
    tile-repeat + iota arithmetic produce directly."""
    xf = x_ref[:]  # [TM, K] bf16, already tile-permuted by the wrapper
    # scales: one bf16 convert on the SMALL [TN, G] plane, then tile-repeat —
    # keeps the big per-element multiply at bf16 width (2x VPU throughput)
    sc16 = scales_ref[:].astype(jnp.bfloat16)  # [TN, G]
    if code_bits == 4:
        half = k // 2
        # widen to i32 before bit ops: Mosaic cannot legalize shifts on i8
        codes = codes_ref[:].astype(jnp.int32)  # [TN, K/2]
        lo = codes & 0x0F
        hi4 = codes >> 4
        if hi_bits:
            # tile-major bit plane: byte i, field p <-> storage lane p*nb + i,
            # so extraction is per_byte CONSTANT-shift slices concatenated on
            # lanes — no per-lane variable shifts (3 VPU ops/elem vs ~7)
            per_byte = 8 // hi_bits
            mask = (1 << hi_bits) - 1
            hb = hi_ref[:].astype(jnp.int32)  # [TN, K/per_byte]
            bits = jnp.concatenate(
                [(hb >> (p * hi_bits)) & mask for p in range(per_byte)], axis=1
            )  # [TN, K] in storage-lane order
            lo = lo | (bits[:, :half] << 4)
            hi4 = hi4 | (bits[:, half:] << 4)
        # storage lane j -> scale group j % G; K/2 = G*(gs/2) so one repeat
        # serves both nibble planes ((j + K/2) % G == j % G)
        sc_half = pltpu.repeat(sc16, gs // 2, 1)  # [TN, K/2] bf16
        wa = lo.astype(jnp.bfloat16) * sc_half
        wb = hi4.astype(jnp.bfloat16) * sc_half
        acc = jax.lax.dot_general(
            xf[:, :half], wa.astype(xf.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot_general(
            xf[:, half:], wb.astype(xf.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        codes = codes_ref[:].astype(jnp.int32)  # [TN, K]
        w = codes.astype(jnp.bfloat16) * pltpu.repeat(sc16, gs, 1)
        acc = jax.lax.dot_general(
            xf, w.astype(xf.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc  # [TM, TN] f32


def _supported(rq: RepackedQuant) -> bool:
    if rq.codes.ndim != 2:
        return False
    k, gs = rq.n_in, rq.group_size
    if rq.code_bits == 4 and (k % 2 or (k // 2) % gs):
        return False
    if k % gs:
        return False
    return True


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _run(x, codes, scales, hi, *, meta, interpret=False):
    # packed into a tuple for static hashing
    k, gs, code_bits, hi_bits, n_out = meta
    m = x.shape[0]
    tm = TM_DECODE if m <= TM_DECODE else min(128, m)
    m_pad = -(-m // tm) * tm
    n_pad = -(-n_out // TN) * TN
    xp = jnp.zeros((m_pad, k), jnp.bfloat16).at[:m].set(x.astype(jnp.bfloat16))

    kernel = functools.partial(_kernel, k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits)
    in_specs = [
        pl.BlockSpec((tm, k), lambda mi, ni: (mi, 0)),
        pl.BlockSpec((TN, codes.shape[1]), lambda mi, ni: (ni, 0)),
        pl.BlockSpec((TN, scales.shape[1]), lambda mi, ni: (ni, 0)),
    ]
    args = [xp, codes, scales]
    if hi is not None:
        in_specs.append(pl.BlockSpec((TN, hi.shape[1]), lambda mi, ni: (ni, 0)))
        args.append(hi)
    else:
        # dummy ref (kernel ignores it when hi_bits == 0)
        in_specs.append(pl.BlockSpec((1, 1), lambda mi, ni: (0, 0)))
        args.append(jnp.zeros((1, 1), jnp.uint8))

    flops = 2 * m_pad * k * n_pad
    bytes_accessed = (
        codes.size + scales.size * 4 + (hi.size if hi is not None else 0) + m_pad * k * 2
    )
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // tm, n_pad // TN),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, TN), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n_out]


def qmatmul_repacked(x: jnp.ndarray, rq: RepackedQuant, out_dtype=None) -> jnp.ndarray:
    """x [..., K] @ rq.T -> [..., N] via the fused kernel (+ XLA min term)."""
    if not _supported(rq):
        from .repack import dequantize_repacked

        w = dequantize_repacked(rq, jnp.float32)
        y = jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return y.astype(out_dtype or x.dtype)

    from .repack import tile_permute_x

    lead = x.shape[:-1]
    k = rq.n_in
    x2 = x.reshape(-1, k)
    xp = tile_permute_x(x2, rq.group_size)  # match the storage K order
    interpret = jax.default_backend() != "tpu"
    meta = (k, rq.group_size, rq.code_bits, rq.hi_bits, rq.n_out)
    y = _run(xp, rq.codes, rq.scales, rq.hi, meta=meta, interpret=interpret)
    # affine term: groupsum(x) @ mins.T
    gs = rq.group_size
    xg = x2.astype(jnp.float32).reshape(-1, k // gs, gs).sum(axis=2)  # [M, K/gs]
    y = y - jax.lax.dot_general(
        xg, rq.mins, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return y.reshape(*lead, rq.n_out).astype(out_dtype or x.dtype)


# legacy registry used by quant_matmul.qmatmul (QTensor path): no kernels are
# registered for raw ggml-byte QTensors — the repacked representation is the
# TPU path.
_KERNELS: dict = {}


def qmatmul_pallas(x: jnp.ndarray, qt, out_dtype=None):
    fn = _KERNELS.get(qt.dtype)
    if fn is None:
        return None
    return fn(x, qt, out_dtype=out_dtype)

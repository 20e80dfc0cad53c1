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


def _rd(ref):
    """Read a block, dropping the leading singleton layer axis the stacked
    path's [1, TN, C] BlockSpecs introduce."""
    v = ref[...]
    return v[0] if v.ndim == 3 else v


def _kernel(x_ref, xg_ref, codes_ref, scales_ref, mins_ref, hi_ref, out_ref, *, k, gs,
            code_bits, hi_bits):
    """Tile-interleaved layout (ops.repack): every expansion is a 2D
    ``pltpu.repeat`` (tile semantics) — Mosaic cannot lower the 3D reshapes
    an element-repeat would need.  Storage lane j's scale is scales[j % G]
    and its hi-bit field index is j // (bytes_per_row), both of which
    tile-repeat + iota arithmetic produce directly."""
    xf = _rd(x_ref)  # [TM, K] bf16, already tile-permuted by the wrapper
    # scales: one bf16 convert on the SMALL [TN, G] plane, then tile-repeat —
    # keeps the big per-element multiply at bf16 width (2x VPU throughput)
    sc16 = _rd(scales_ref).astype(jnp.bfloat16)  # [TN, G]
    if code_bits == 4:
        half = k // 2
        # widen to i32 before bit ops: Mosaic cannot legalize shifts on i8
        codes = _rd(codes_ref).astype(jnp.int32)  # [TN, K/2]
        lo = codes & 0x0F
        hi4 = codes >> 4
        if hi_bits:
            # tile-major bit plane: byte i, field p <-> storage lane p*nb + i,
            # so extraction is per_byte CONSTANT-shift slices concatenated on
            # lanes — no per-lane variable shifts (3 VPU ops/elem vs ~7)
            per_byte = 8 // hi_bits
            mask = (1 << hi_bits) - 1
            hb = _rd(hi_ref).astype(jnp.int32)  # [TN, K/per_byte]
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
        codes = _rd(codes_ref).astype(jnp.int32)  # [TN, K]
        w = codes.astype(jnp.bfloat16) * pltpu.repeat(sc16, gs, 1)
        acc = jax.lax.dot_general(
            xf, w.astype(xf.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # affine term folded in: y -= groupsum(x) @ mins.T  (tiny MXU dot)
    xg = _rd(xg_ref)  # [TM, G] f32
    mins = _rd(mins_ref)  # [TN, G] f32
    acc -= jax.lax.dot_general(
        xg, mins, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
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


def _kernel_stacked(idx_ref, x_ref, xg_ref, codes_ref, scales_ref, mins_ref, hi_ref,
                    out_ref, *, k, gs, code_bits, hi_bits):
    """Stacked-weight kernel: blocks are selected from [L, N, *] arrays by the
    prefetched layer index (index maps in _run) — weights stream straight
    from the stacked HBM array with no per-layer slice copy (the XLA
    alternative materializes every layer's weights before the kernel can
    read them, tripling decode traffic).  ``idx_ref`` is consumed by the
    index maps; the body just squeezes the [1, ...] blocks via _rd."""
    del idx_ref
    _kernel(x_ref, xg_ref, codes_ref, scales_ref, mins_ref, hi_ref, out_ref,
            k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits)


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "static_layer"))
def _run(x, xg, codes, scales, mins, hi, layer=None, *, meta, interpret=False,
         static_layer=None):
    if static_layer is not None:
        layer = static_layer
    """x [M, K] (tile-permuted), xg [M, G] group-sums -> [M, N] f32.

    When ``layer`` is given, codes/scales/mins/hi carry a leading [L] axis
    and the kernel's index maps select the layer block via the prefetched
    scalar — the stacked weights are never sliced/copied in HBM (an XLA-side
    slice would materialize every layer's weights before the opaque
    pallas_call could read them, tripling decode traffic).
    """
    k, gs, code_bits, hi_bits, n_out = meta
    m = x.shape[0]
    tm = TM_DECODE if m <= TM_DECODE else min(128, m)
    m_pad = -(-m // tm) * tm
    n_pad = -(-n_out // TN) * TN
    g = k // gs
    xp = jnp.zeros((m_pad, k), jnp.bfloat16).at[:m].set(x.astype(jnp.bfloat16))
    xgp = jnp.zeros((m_pad, g), jnp.float32).at[:m].set(xg)

    stacked = layer is not None
    static_layer = stacked and isinstance(layer, int)
    if hi is None:
        hi_arr = jnp.zeros((1, 1, 1) if stacked else (1, 1), jnp.uint8)
        hi_shape = None
    else:
        hi_arr = hi
        hi_shape = hi.shape[-1]

    if static_layer:
        # unrolled-layer path: the index maps close over the constant layer,
        # so these are plain custom calls (the scalar-prefetch variant hangs
        # the remote compile pipeline when nested in lax.scan; static maps
        # need no prefetch at all)
        li = layer
        in_specs = [
            pl.BlockSpec((tm, k), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((tm, g), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((1, TN, codes.shape[-1]), lambda mi, ni: (li, ni, 0)),
            pl.BlockSpec((1, TN, g), lambda mi, ni: (li, ni, 0)),
            pl.BlockSpec((1, TN, g), lambda mi, ni: (li, ni, 0)),
            pl.BlockSpec(
                (1, TN, hi_shape) if hi_shape else (1, 1, 1),
                (lambda mi, ni: (li, ni, 0)) if hi_shape else (lambda mi, ni: (0, 0, 0)),
            ),
        ]
        grid_spec = pl.GridSpec(
            grid=(m_pad // tm, n_pad // TN),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, TN), lambda mi, ni: (mi, ni)),
        )
        args = (xp, xgp, codes, scales, mins, hi_arr)
        call_kernel = functools.partial(
            _kernel, k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits
        )
    elif not stacked:
        in_specs = [
            pl.BlockSpec((tm, k), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((tm, g), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((TN, codes.shape[-1]), lambda mi, ni: (ni, 0)),
            pl.BlockSpec((TN, g), lambda mi, ni: (ni, 0)),
            pl.BlockSpec((TN, g), lambda mi, ni: (ni, 0)),
            pl.BlockSpec(
                (TN, hi_shape) if hi_shape else (1, 1),
                (lambda mi, ni: (ni, 0)) if hi_shape else (lambda mi, ni: (0, 0)),
            ),
        ]
        grid_spec = pl.GridSpec(
            grid=(m_pad // tm, n_pad // TN),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, TN), lambda mi, ni: (mi, ni)),
        )
        args = (xp, xgp, codes, scales, mins, hi_arr)
        call_kernel = functools.partial(
            _kernel, k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits
        )
    else:
        in_specs = [
            pl.BlockSpec((tm, k), lambda mi, ni, l_ref: (mi, 0)),
            pl.BlockSpec((tm, g), lambda mi, ni, l_ref: (mi, 0)),
            pl.BlockSpec((1, TN, codes.shape[-1]), lambda mi, ni, l_ref: (l_ref[0], ni, 0)),
            pl.BlockSpec((1, TN, g), lambda mi, ni, l_ref: (l_ref[0], ni, 0)),
            pl.BlockSpec((1, TN, g), lambda mi, ni, l_ref: (l_ref[0], ni, 0)),
            pl.BlockSpec(
                (1, TN, hi_shape) if hi_shape else (1, 1, 1),
                (lambda mi, ni, l_ref: (l_ref[0], ni, 0))
                if hi_shape
                else (lambda mi, ni, l_ref: (0, 0, 0)),
            ),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // tm, n_pad // TN),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, TN), lambda mi, ni, l_ref: (mi, ni)),
        )
        args = (jnp.asarray(layer, jnp.int32).reshape(1), xp, xgp, codes, scales, mins, hi_arr)
        call_kernel = functools.partial(
            _kernel_stacked, k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits
        )

    per_layer_codes = codes.shape[-2] * codes.shape[-1]
    bytes_accessed = per_layer_codes + m_pad * k * 2 + n_pad * g * 8
    out = pl.pallas_call(
        call_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n_out]


def qmatmul_repacked(
    x: jnp.ndarray, rq: RepackedQuant, out_dtype=None, layer=None
) -> jnp.ndarray:
    """x [..., K] @ rq.T -> [..., N] via the fused kernel.

    ``layer``: layer index when ``rq`` holds stacked [L, ...] planes
    (zero-copy weight streaming from the stacked array — see _run).  Pass a
    *python int* (unrolled layer loops) for the static fast path; traced
    indices use scalar prefetch, which must NOT be nested inside lax.scan
    (the combination wedges the compile pipeline).
    """
    stacked = rq.codes.ndim == 3
    if stacked and layer is None:
        raise ValueError("stacked RepackedQuant requires a layer index")
    if not stacked and not _supported(rq):
        from .repack import dequantize_repacked

        w = dequantize_repacked(rq, jnp.float32)
        y = jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return y.astype(out_dtype or x.dtype)

    from .repack import tile_permute_x

    lead = x.shape[:-1]
    k = rq.n_in
    gs = rq.group_size
    x2 = x.reshape(-1, k)
    xp = tile_permute_x(x2, gs)  # match the storage K order
    xg = x2.astype(jnp.float32).reshape(-1, k // gs, gs).sum(axis=2)  # [M, G]
    interpret = jax.default_backend() != "tpu"
    meta = (k, gs, rq.code_bits, rq.hi_bits, rq.n_out)
    if stacked and isinstance(layer, int):
        y = _run(
            xp, xg, rq.codes, rq.scales, rq.mins, rq.hi, None,
            meta=meta, interpret=interpret, static_layer=layer,
        )
    else:
        y = _run(
            xp, xg, rq.codes, rq.scales, rq.mins, rq.hi,
            layer if stacked else None, meta=meta, interpret=interpret,
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

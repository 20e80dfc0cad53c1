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

Layout invariants (from repack.py): nibble codes are row-pair packed
([N/2, K] u8, unpacked by one ``pltpu.bitcast`` to uint4 — the sublane dim
doubles with lo/hi interleaved, zero bit ops); hi-bit planes are packed
tile-major (lane j -> byte j % nb, field j // nb, nb = K*hi_bits/8).  Grid
is (n_tiles, m_tiles) — M innermost, so packed planes DMA once per N tile
while only the small x blocks re-fetch.  The packed planes for the whole K
are DMA'd per tile (codes are <= 0.5 B/weight: ~1.8 MB at TN=256, K=13824),
but the *unpack* runs in static chunks of c*G storage lanes so bf16/i32
temporaries stay bounded regardless of K — the round-1 kernel expanded the
full [TN, K] row to i32 in one shot, which at K=13824 is 14 MB and blew the
16 MB scoped-VMEM limit.  Chunk boundaries are multiples of G (so lane j's
scale is a plain tile-repeat of scales[:G]) and never cross a hi-bit field,
so every chunk reads one static slice of each plane.  _tile_policy shrinks
(chunk, TM, TN) until a conservative VMEM estimate fits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .repack import RepackedQuant

import os

TN = int(os.environ.get("MINIGPT4_TPU_QMM_TN", "256"))  # N tile
TM_DECODE = 8  # M tile for small batch
# per-chunk i32 temporary budget (bytes): bounds unpack temporaries at any K
CHUNK_BYTES = int(os.environ.get("MINIGPT4_TPU_QMM_CHUNK_BYTES", str(2 << 20)))
_tile_policy_override = None  # dev hook for tools/sweep_qmm.py


def _rd(ref):
    """Read a block, dropping the leading singleton layer axis the stacked
    path's [1, TN, C] BlockSpecs introduce."""
    v = ref[...]
    return v[0] if v.ndim == 3 else v


def _sl(ref, i0, i1):
    """Static column slice of a block ref, dropping the stacked path's
    leading singleton layer axis."""
    if len(ref.shape) == 3:
        return ref[0, :, i0:i1]
    return ref[:, i0:i1]


def _seg_lanes(k: int, code_bits: int, hi_bits: int) -> int:
    """Lanes per unpack segment: chunks must not cross a hi-bit field
    boundary (the constant shift amount flips there).  Row-pair nibble
    packing has no half boundary — both nibbles of a byte are in the same
    column — so hi-less formats chunk freely across the whole row."""
    return (k * hi_bits // 8) if hi_bits else k


def _chunk_plan(k: int, code_bits: int, hi_bits: int, cl: int):
    """Static (lane0, n_lanes) chunks of length ``cl`` covering storage lanes
    [0, K).  ``cl`` is a multiple of G = K/gs (so the per-lane scale is a
    tile-repeat of scales[:, :G]) dividing the segment length — guaranteed by
    _tile_policy."""
    seg = _seg_lanes(k, code_bits, hi_bits)
    return [(s + o, cl) for s in range(0, k, seg) for o in range(0, seg, cl)]


def _tile_policy(m: int, k: int, gs: int, code_bits: int, hi_bits: int):
    """Choose (tm, tn, cl) so the kernel's conservative VMEM estimate fits the
    16 MB scoped limit: shrink the unpack chunk first (cheapest — a few more
    VPU slices), then the M tile (prefill re-reads x per N tile, which is
    cheap since x << codes with the N-outer grid), then the N tile.

    The estimate double-counts lifetimes on purpose (double-buffered input
    blocks + peak unpack temporaries); it over- rather than under-shoots what
    Mosaic's scoped allocator reports.
    """
    g = k // gs
    code_cols = k  # v2 layout: row-pair packing keeps all K columns
    hi_cols = (k * hi_bits // 8) if hi_bits else 0
    per_seg = _seg_lanes(k, code_bits, hi_bits) // g

    def est(tm, tn, cl):
        tm_eff = max(tm, 16)  # bf16 sublane padding
        inputs = 2 * (
            (tn // 2 if code_bits == 4 else tn) * code_cols  # codes u8/i8
            + tn * hi_cols  # hi u8
            + 2 * tn * g * 4  # scales + mins planes (f32 worst case)
            + tm_eff * k * 2  # x bf16
            + tm_eff * g * 4  # xg f32
        )
        out = 2 * tm_eff * tn * 4
        # hoisted i32 widen of the whole hi plane (shared across chunks)
        hoist = tn * hi_cols * 4
        # unpack temporaries per chunk: q bf16 + w bf16 + sc_c bf16
        # (+ masked bf16 when hi), + the sliced x copy
        temps = hoist + tn * cl * (2 + 2 + 2 + (2 if hi_bits else 0)) + tm_eff * cl * 2
        # plus ~tn*800 B of scoped stack PER CHUNK that Mosaic does not reuse
        # across the unrolled loop (calibrated: 32-chunk q8_0 M=512 overshot
        # a 14.2 MB estimate to an actual 20.85 MB — ~0.2 MB/chunk at tn=256)
        per_chunk = (k // cl) * tn * 800
        return inputs + out + temps + per_chunk

    budget = 14_500_000  # headroom under the 16 MB scoped-VMEM limit
    tms = [t for t in (128, 64, 32, 16, 8) if t <= max(m, 8)] or [8]
    divisors = [d for d in range(per_seg, 0, -1) if per_seg % d == 0]
    for tn in (TN, 128):
        for tm in tms:
            for d in divisors:
                if d * g * 4 > CHUNK_BYTES // max(tn, 1):
                    continue
                if est(tm, tn, d * g) <= budget:
                    return tm, tn, d * g
    # last resort: smallest everything (tiny geometries always fit)
    return tms[-1], 128, g


def _kernel(x_ref, xg_ref, codes_ref, scales_ref, mins_ref, hi_ref, out_ref, *, k, gs,
            code_bits, hi_bits, cl):
    """Tile-interleaved storage lanes (ops.repack): storage lane j's scale is
    scales[j % G] (a plain tile-repeat — Mosaic cannot lower the 3D reshapes
    an element-repeat would need) and its hi-bit field index is j // nb —
    constant within a chunk from _chunk_plan, so each chunk is one static
    slice + constant shift.  Nibble unpack is ``pltpu.bitcast(u8, uint4)``:
    the row-pair packed [TN/2, CL] byte tile doubles into the [TN, CL] code
    tile with lo/hi sublane-interleaved — zero bit ops on the VPU (the
    round-1 layout's i32 widen+mask+shift per element made the kernel
    VPU-bound at ~200 GB/s effective; this path is DMA-bound)."""
    xf = _rd(x_ref)  # [TM, K] bf16, already tile-permuted by the wrapper
    sc = _rd(scales_ref).astype(jnp.bfloat16)  # [TN, G]
    g = k // gs
    nb = k * hi_bits // 8 if hi_bits else 0
    mask = (1 << hi_bits) - 1 if hi_bits else 0

    # affine term first: acc = -groupsum(x) @ mins.T  (tiny MXU dot)
    xg = _rd(xg_ref)  # [TM, G] f32
    mins = _rd(mins_ref).astype(jnp.float32)  # [TN, G]
    acc = -jax.lax.dot_general(
        xg, mins, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # ONE i32 widen of the whole hi-bit plane, shared by all 8/hi_bits field
    # chunks (the per-chunk widen + shift + and + cast chain made q5_k ~2.4x
    # slower per element than q4_k; hoisting the widen and replacing the
    # shift with and + constant-multiply measures +20% on the 13B w2 shape —
    # the kernel is VPU-unpack-bound at decode, not DMA-bound)
    hbw = _rd(hi_ref).astype(jnp.int32) if hi_bits else None  # [TN, nb]
    for l0, cle in _chunk_plan(k, code_bits, hi_bits, cl):
        if code_bits == 4:
            c8 = _sl(codes_ref, l0, l0 + cle)  # [TN/2, CL] u8
            q = pltpu.bitcast(c8, jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
        else:
            q = _sl(codes_ref, l0, l0 + cle).astype(jnp.bfloat16)  # i8 codes
        if hi_bits:
            # field bits without a shift: (hbw & (mask << s)) is bits << s
            # (<= 3 << 6 = 192, exact in bf16) and the power-of-two multiply
            # rescales to bits * 16 exactly
            p = l0 // nb
            i0 = l0 - p * nb
            s_amt = p * hi_bits
            masked = (hbw[:, i0 : i0 + cle] & (mask << s_amt)).astype(jnp.bfloat16)
            q = q + masked * jnp.bfloat16(2.0 ** (4 - s_amt))
        reps = cle // g
        sc_c = pltpu.repeat(sc, reps, 1) if reps > 1 else sc  # [TN, CL]
        acc += jax.lax.dot_general(
            xf[:, l0 : l0 + cle], (q * sc_c).astype(xf.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc  # [TM, TN] f32


def _supported(rq: RepackedQuant) -> bool:
    if rq.codes.ndim != 2:
        return False
    return rq.codes.shape[-1] % rq.group_size == 0


def _kernel_stacked(idx_ref, x_ref, xg_ref, codes_ref, scales_ref, mins_ref, hi_ref,
                    out_ref, *, k, gs, code_bits, hi_bits, cl):
    """Stacked-weight kernel: blocks are selected from [L, N, *] arrays by the
    prefetched layer index (index maps in _run) — weights stream straight
    from the stacked HBM array with no per-layer slice copy (the XLA
    alternative materializes every layer's weights before the kernel can
    read them, tripling decode traffic).  ``idx_ref`` is consumed by the
    index maps; the body just squeezes the [1, ...] blocks via _rd."""
    del idx_ref
    _kernel(x_ref, xg_ref, codes_ref, scales_ref, mins_ref, hi_ref, out_ref,
            k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits, cl=cl)


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
    # dev hook (tools/sweep_qmm.py): force a tile policy; requires cache clear
    tm, tn, cl = _tile_policy_override or _tile_policy(m, k, gs, code_bits, hi_bits)
    m_pad = -(-m // tm) * tm
    n_pad = -(-n_out // tn) * tn
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

    # Grid is (n_tiles, m_tiles) — M innermost — so the big packed planes are
    # DMA'd once per N tile while only the small x/xg blocks re-fetch per M
    # tile (at prefill x is ~25x smaller than the codes it would otherwise
    # re-stream per M tile).
    grid = (n_pad // tn, m_pad // tm)
    tn_c = tn // 2 if code_bits == 4 else tn  # codes block rows (row-pair packing)
    if static_layer:
        # unrolled-layer path: the index maps close over the constant layer,
        # so these are plain custom calls (the scalar-prefetch variant hangs
        # the remote compile pipeline when nested in lax.scan; static maps
        # need no prefetch at all)
        li = layer
        in_specs = [
            pl.BlockSpec((tm, k), lambda ni, mi: (mi, 0)),
            pl.BlockSpec((tm, g), lambda ni, mi: (mi, 0)),
            pl.BlockSpec((1, tn_c, codes.shape[-1]), lambda ni, mi: (li, ni, 0)),
            pl.BlockSpec((1, tn, g), lambda ni, mi: (li, ni, 0)),
            pl.BlockSpec((1, tn, g), lambda ni, mi: (li, ni, 0)),
            pl.BlockSpec(
                (1, tn, hi_shape) if hi_shape else (1, 1, 1),
                (lambda ni, mi: (li, ni, 0)) if hi_shape else (lambda ni, mi: (0, 0, 0)),
            ),
        ]
        grid_spec = pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda ni, mi: (mi, ni)),
        )
        args = (xp, xgp, codes, scales, mins, hi_arr)
        call_kernel = functools.partial(
            _kernel, k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits, cl=cl
        )
    elif not stacked:
        in_specs = [
            pl.BlockSpec((tm, k), lambda ni, mi: (mi, 0)),
            pl.BlockSpec((tm, g), lambda ni, mi: (mi, 0)),
            pl.BlockSpec((tn_c, codes.shape[-1]), lambda ni, mi: (ni, 0)),
            pl.BlockSpec((tn, g), lambda ni, mi: (ni, 0)),
            pl.BlockSpec((tn, g), lambda ni, mi: (ni, 0)),
            pl.BlockSpec(
                (tn, hi_shape) if hi_shape else (1, 1),
                (lambda ni, mi: (ni, 0)) if hi_shape else (lambda ni, mi: (0, 0)),
            ),
        ]
        grid_spec = pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda ni, mi: (mi, ni)),
        )
        args = (xp, xgp, codes, scales, mins, hi_arr)
        call_kernel = functools.partial(
            _kernel, k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits, cl=cl
        )
    else:
        in_specs = [
            pl.BlockSpec((tm, k), lambda ni, mi, l_ref: (mi, 0)),
            pl.BlockSpec((tm, g), lambda ni, mi, l_ref: (mi, 0)),
            pl.BlockSpec((1, tn_c, codes.shape[-1]), lambda ni, mi, l_ref: (l_ref[0], ni, 0)),
            pl.BlockSpec((1, tn, g), lambda ni, mi, l_ref: (l_ref[0], ni, 0)),
            pl.BlockSpec((1, tn, g), lambda ni, mi, l_ref: (l_ref[0], ni, 0)),
            pl.BlockSpec(
                (1, tn, hi_shape) if hi_shape else (1, 1, 1),
                (lambda ni, mi, l_ref: (l_ref[0], ni, 0))
                if hi_shape
                else (lambda ni, mi, l_ref: (0, 0, 0)),
            ),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda ni, mi, l_ref: (mi, ni)),
        )
        args = (jnp.asarray(layer, jnp.int32).reshape(1), xp, xgp, codes, scales, mins, hi_arr)
        call_kernel = functools.partial(
            _kernel_stacked, k=k, gs=gs, code_bits=code_bits, hi_bits=hi_bits, cl=cl
        )

    per_layer_codes = codes.shape[-2] * codes.shape[-1]
    hi_bytes = n_pad * hi_shape if hi_shape else 0
    plane_bytes = 2 * n_pad * g * jnp.dtype(scales.dtype).itemsize
    bytes_accessed = per_layer_codes + hi_bytes + plane_bytes + m_pad * k * 2
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
    # K from the array shape, NOT the static n_in: inside shard_map the
    # leaves are the per-device K/S slices (each a self-consistent repack —
    # see repack.with_k_shards) while the static aux still says global K
    k = rq.codes.shape[-1]
    gs = rq.group_size
    if rq.k_shards != 1 and k == rq.n_in:
        raise ValueError(
            "k-sharded RepackedQuant must be consumed shard-locally "
            "(row-parallel shard_map path); global use would mis-map scales"
        )
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


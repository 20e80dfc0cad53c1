"""Blockwise flash-decode attention over the HBM-resident KV cache.

Replaces the decode-path attention einsum (models/llama.py) which reads the
whole ``attn_len`` bucket of cache every step.  This kernel keeps the K/V
cache in HBM (``memory_space=ANY``, no XLA slice — a slice of the stacked
[L, B, H, C, Dh] cache would materialize a per-layer copy every call) and
DMAs only the **live** blocks (``ceil((pos0+S)/BLK)``), with an online
softmax so the schedule is blockwise — the ring-attention / sequence-parallel
seam SURVEY.md §5 calls for: extending to multi-chip SP is a change of who
owns which C-blocks, not of the kernel's math.

One compilation serves every decode position: the block loop bound is a
traced scalar (SMEM input), not a static ``attn_len`` bucket — unlike the
einsum path, no per-bucket recompiles and no dead-key traffic.

Reference behavior replaced: llama.cpp decode attention inside llama_eval
(vendored at reference CMakeLists.txt:318; driven via
/root/reference/minigpt4.cpp:2365-2382).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

BLK = int(os.environ.get("MINIGPT4_TPU_FLASH_BLK", "0"))  # 0 = auto per window
# Auto policy (pick_blk): the block size scales with the attention window —
# small blocks keep block-granularity waste low at small decode positions
# (reading a 512-block for pos<128 wastes 4x the DMA), large blocks lift
# the DMA's effective bandwidth at long positions (128-row blocks are 32 KB
# contiguous transfers and measured ~310 GB/s vs ~550 on the weight
# stream).  Set MINIGPT4_TPU_FLASH_BLK to force one size for all windows.


def pick_blk(attn_window: int, c: int) -> int:
    """KV block size for a decode whose visible window is ``attn_window``
    positions (the engine's power-of-two attn bucket; static per compiled
    specialization).  Must divide the cache length ``c``."""
    if BLK:
        return min(BLK, c)
    b = 128
    # final b <= window/4 bounds worst-case over-read at ~25% while
    # quadrupling the per-DMA transfer at long positions
    while b * 8 <= min(attn_window, c) and b < 512 and c % (b * 2) == 0:
        b *= 2
    return min(b, c)
NEG_INF = float(np.finfo(np.float32).min)
# fp8 (e4m3) cache blocks: the native f8->f32 convert measured ~2x the
# bf16-cache block cost; the integer exponent-rebias unpack (bitcast u8,
# widen, shift/or, +bias, bitcast bf16) is the cheaper path.  Subnormals
# (exp==0, |v| < 2^-6) flush to zero — below e4m3 KV noise.
_F8_BITCAST = os.environ.get("MINIGPT4_TPU_F8_BITCAST", "1") != "0"


def _block_f32(v):
    """VMEM block -> f32, with the integer e4m3 unpack when applicable.

    All bit ops run in i32 with constant MULTIPLIES standing in for shifts —
    Mosaic cannot legalize sub-i32 vector shifts (arith.shli on i16)."""
    if _F8_BITCAST and v.dtype == jnp.float8_e4m3fn:
        b = pltpu.bitcast(v, jnp.uint8).astype(jnp.int32)
        em = b & 0x7F  # exponent+mantissa field
        sign = (b & 0x80) * 256  # sign bit -> bf16 bit 15
        bits = sign | (em * 16 + (120 << 7))  # rebias 7 -> 127
        bits = jnp.where(em < 8, sign, bits)  # subnormals -> +-0
        # e4m3fn NaN (em==0x7F) must stay NaN, matching the native cast
        # path — flushing it to 480 would mask upstream cache corruption
        bits = jnp.where(em == 0x7F, sign | 0x7FC0, bits)
        return pltpu.bitcast(bits.astype(jnp.uint16), jnp.bfloat16).astype(
            jnp.float32
        )
    return v.astype(jnp.float32)


def _kernel(*refs, li, s, blk, c, dh, scale, stats, paged):
    """One (b, h) pair per program.  k_ref/v_ref are the FULL stacked caches
    ([L, B, H, C, Dh], HBM); q_ref/o_ref are [1, 1, S, Dh] VMEM blocks.

    ``paged=True`` (serving page pool): k_ref/v_ref are the page POOLS
    [L, NP, H, PAGE, Dh] with blk == PAGE, and an extra SMEM ref ``pt_ref``
    [B, MAXP] maps lane b's logical KV block i to its pool page — the DMA
    source index goes through the table, nothing else changes (the blockwise
    schedule is exactly what makes paging a lookup, not a new kernel).

    ``stats=True`` (sequence-parallel partials): o_ref gets the UNNORMALIZED
    accumulator and stats_ref[0] gets [m | l] lane-broadcast side by side —
    the SP merge rescales and reduces across chips (sp_flash_decode_attention).
    ``pos0`` may be negative in that mode (this chip's cache slice starts
    after the last visible position): zero blocks are read and (m=-inf, l=0,
    acc=0) partials come back."""
    if paged:
        pos_ref, pt_ref, q_ref, k_ref, v_ref, o_ref, *stats_ref = refs
    else:
        pos_ref, q_ref, k_ref, v_ref, o_ref, *stats_ref = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    pos0 = pos_ref[b, 0]  # per-batch decode cursor (full [B, 1] SMEM block)
    live = pos0 + s  # number of visible keys for the last query row
    nblk = jax.lax.max(
        jnp.int32(0), jax.lax.min((live + blk - 1) // blk, jnp.int32(c // blk))
    )

    def _srcs(i):
        if paged:
            pg = pt_ref[b, i]
            return k_ref.at[li, pg, h], v_ref.at[li, pg, h]
        c0 = pl.multiple_of(i * blk, blk)
        return (
            k_ref.at[li, b, h, pl.ds(c0, blk)],
            v_ref.at[li, b, h, pl.ds(c0, blk)],
        )

    def scoped(kb, vb, ksem, vsem):
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [S, Dh]
        q_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (s, blk), 0)

        def start_block(i, slot):
            ks, vs = _srcs(i)
            pltpu.make_async_copy(ks, kb.at[slot], ksem.at[slot]).start()
            pltpu.make_async_copy(vs, vb.at[slot], vsem.at[slot]).start()

        # double-buffered KV stream: block i+1's DMA flies while block i
        # computes — without it every block pays full DMA latency serially,
        # which dominates decode at long positions (13B @ pos 2000: the
        # attention share measured ~2.9x the drained-bandwidth cost)
        @pl.when(nblk > 0)
        def _prologue():
            start_block(jnp.int32(0), jnp.int32(0))

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < nblk)
            def _prefetch():
                start_block(i + 1, jax.lax.rem(i + 1, 2))

            ks, vs = _srcs(i)
            key_pos = i * blk + jax.lax.broadcasted_iota(jnp.int32, (s, blk), 1)
            mask = jnp.where(key_pos <= q_pos, 0.0, NEG_INF)  # [S, BLK]
            pltpu.make_async_copy(ks, kb.at[slot], ksem.at[slot]).wait()
            sc = (
                jax.lax.dot_general(
                    q, _block_f32(kb[slot]), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + mask
            )  # [S, BLK]
            m_new = jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True))  # [S, 1]
            p = jnp.exp(sc - m_new)  # [S, BLK]
            alpha = jnp.exp(m - m_new)  # [S, 1]
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            pltpu.make_async_copy(vs, vb.at[slot], vsem.at[slot]).wait()
            pv = jax.lax.dot_general(
                p, _block_f32(vb[slot]), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, Dh]
            return m_new, l_new, acc * alpha + pv

        m0 = jnp.full((s, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((s, 1), jnp.float32)
        a0 = jnp.zeros((s, dh), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, a0))
        if stats:
            o_ref[0, 0] = acc
            ml = jnp.concatenate(
                [jnp.broadcast_to(m, (s, 128)), jnp.broadcast_to(l, (s, 128))],
                axis=1,
            )
            stats_ref[0][0, 0] = ml
        else:
            o_ref[0, 0] = acc / l

    pl.run_scoped(
        scoped,
        kb=pltpu.VMEM((2, blk, dh), k_ref.dtype),
        vb=pltpu.VMEM((2, blk, dh), v_ref.dtype),
        ksem=pltpu.SemaphoreType.DMA((2,)),
        vsem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit, static_argnames=("li", "scale", "interpret", "stats", "blk")
)
def _run(q, ck, cv, pos0, *, li, scale, interpret, stats=False, blk=None):
    b, h, s, dh = q.shape
    c = ck.shape[-2]
    blk = blk if blk else pick_blk(c, c)
    if c % blk:
        raise ValueError(
            f"cache length {c} must be a multiple of the KV block {blk} — "
            "callers fall back to the einsum path otherwise (models/llama.py)"
        )
    grid = (b, h)
    block = pl.BlockSpec((1, 1, s, dh), lambda bi, hi: (bi, hi, 0, 0))
    pos_arr = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (b,))
    out_specs = (block, pl.BlockSpec((1, 1, s, 256), lambda bi, hi: (bi, hi, 0, 0))) if stats else block
    out_shape = (
        (jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32),
         jax.ShapeDtypeStruct((b, h, s, 256), jnp.float32))
        if stats
        else jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32)
    )
    out = pl.pallas_call(
        functools.partial(_kernel, li=li, s=s, blk=blk, c=c, dh=dh, scale=scale,
                          stats=stats, paged=False),
        grid=grid,
        in_specs=[
            # per-batch decode cursors (scalar pos broadcasts to [B, 1]);
            # whole-array SMEM block: sub-blocks fail the (8, 128) lowering
            # divisibility check once B > 1
            pl.BlockSpec((b, 1), lambda bi, hi: (0, 0), memory_space=pltpu.SMEM),
            block,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(pos_arr.reshape(b, 1), q, ck, cv)
    return out


@functools.partial(jax.jit, static_argnames=("li", "scale", "interpret"))
def _run_paged(q, pk, pv, pos0, pt, *, li, scale, interpret):
    b, h, s, dh = q.shape
    _, np_, hp, page, _ = pk.shape
    maxp = pt.shape[1]
    c = maxp * page  # logical per-lane capacity
    grid = (b, h)
    block = pl.BlockSpec((1, 1, s, dh), lambda bi, hi: (bi, hi, 0, 0))
    pos_arr = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (b,))
    return pl.pallas_call(
        functools.partial(_kernel, li=li, s=s, blk=page, c=c, dh=dh,
                          scale=scale, stats=False, paged=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda bi, hi: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b, maxp), lambda bi, hi: (0, 0),
                         memory_space=pltpu.SMEM),
            block,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32),
        interpret=interpret,
    )(pos_arr.reshape(b, 1), jnp.asarray(pt, jnp.int32), q, pk, pv)


def flash_decode_attention(
    q: jnp.ndarray,
    ck: jnp.ndarray,
    cv: jnp.ndarray,
    li: int,
    pos0: jnp.ndarray,
    scale: float,
    return_stats: bool = False,
    blk: int | None = None,
):
    """q [B, H, S, Dh] x stacked cache [L, B, H, C, Dh] -> ctx [B, H, S, Dh]
    (f32), causal from absolute position ``pos0`` — a scalar, or a [B]
    vector of per-batch cursors (batched serving decode).  ``li`` must be a
    static layer index (the layer loop is unrolled; see models/llama.py).

    ``return_stats``: return (acc, m, l) online-softmax PARTIALS instead of
    the normalized context — acc [B,H,S,Dh] unnormalized, m/l [B,H,S] — for
    the sequence-parallel merge."""
    if ck.ndim == 4:  # un-stacked [B, H, C, Dh]: add the L axis
        ck, cv = ck[None], cv[None]
        li = 0
    interpret = jax.default_backend() != "tpu"
    if not return_stats:
        return _run(q, ck, cv, pos0, li=li, scale=scale, interpret=interpret,
                    blk=blk)
    acc, ml = _run(q, ck, cv, pos0, li=li, scale=scale, interpret=interpret,
                   stats=True, blk=blk)
    return acc, ml[..., 0], ml[..., 128]


def paged_flash_decode_attention(
    q: jnp.ndarray,
    pool_k: jnp.ndarray,
    pool_v: jnp.ndarray,
    li: int,
    pos0: jnp.ndarray,
    page_table: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """Decode attention over a shared KV **page pool** (vLLM-style paging,
    TPU-native): q [B, H, S, Dh] x pools [L, NP, H, PAGE, Dh] -> ctx
    [B, H, S, Dh] (f32).

    ``page_table`` [B, MAXP] i32 maps lane b's logical KV block i (positions
    [i*PAGE, (i+1)*PAGE)) to a pool page id; entries past the live length
    are never read (the block loop stops at ceil((pos0+S)/PAGE)).  Serving
    lanes thus cost HBM proportional to their *used* positions, not a
    uniformly reserved session_ctx — the capacity lever behind the batched
    serving paths (engine/paged.py).  The reference has no serving layer at
    all (single cursor, minigpt4.cpp:2521); this is TPU-native new capability.
    """
    interpret = jax.default_backend() != "tpu"
    return _run_paged(q, pool_k, pool_v, pos0, page_table, li=li, scale=scale,
                      interpret=interpret)


def sp_flash_decode_attention(
    q: jnp.ndarray,
    ck_local: jnp.ndarray,
    cv_local: jnp.ndarray,
    li: int,
    pos0: jnp.ndarray,
    scale: float,
    sp_axis: str,
    c_offset: jnp.ndarray,
) -> jnp.ndarray:
    """Sequence-parallel decode attention under ``shard_map``: the KV cache's
    C axis is sharded over ``sp_axis`` and this device holds positions
    [c_offset, c_offset + C_local).  Each device runs the SAME blockwise
    kernel on its local slice (this is why the schedule is blockwise — the
    SP extension is a partial-merge, not a new kernel: SURVEY.md §5) and the
    online-softmax partials merge with one pmax + two psums:

        ctx = sum_d exp(m_d - m*) acc_d / sum_d exp(m_d - m*) l_d
    """
    acc, m, l = flash_decode_attention(
        q, ck_local, cv_local, li, pos0 - c_offset, scale, return_stats=True
    )
    m_star = jax.lax.pmax(m, sp_axis)  # [B, H, S]
    w = jnp.exp(m - m_star)
    l_star = jax.lax.psum(l * w, sp_axis)
    acc_star = jax.lax.psum(acc * w[..., None], sp_axis)
    return acc_star / l_star[..., None]

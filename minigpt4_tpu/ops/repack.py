"""Repack ggml quant blocks into TPU-friendly planes.

ggml's interleaved per-block byte layouts (18-24 byte blocks, nibbles paired
j/j+16, 6-bit packed scales...) are hostile to TPU vector loads.  At weight-
load time we repack every format once on the host into a unified
structure-of-arrays the Pallas kernel consumes with plain strided loads:

    codes   uint8 [N/2, K]  row-pair nibble packing: byte (r, j) = code of
            output row 2r (lo nibble) | row 2r+1 (hi nibble) at storage lane
            j.  This matches ``pltpu.bitcast(u8, uint4)`` semantics exactly —
            the bitcast doubles the sublane dim with lo/hi interleaved — so
            the kernel unpacks a nibble tile with ZERO bit ops (bitcast +
            int8 + bf16 casts), where the round-1 K-paired layout needed an
            i32 widen + mask + shift per element (VPU-bound at 13B).
            (byte formats q8_0 use int8 [N, K]: direct i8->bf16 cast.)
    hi      uint8 [N, K/8]  optional 5th-bit plane (q5_*), packed tile-major:
            the bit for storage lane j is byte j % nb, field j // nb
            (nb = K*hi_bits/8; q6_k uses a 2-bit plane [N, K/4])
    scales  bf16 [N, K/gs]  per-group multiplier (f32 via plane_dtype for
            bit-exact decode; bf16 halves scale-plane HBM traffic and adds
            <=2^-9 relative scale error, far under 4/5-bit quant noise)
    mins    bf16 [N, K/gs]  per-group subtrahend, in the unified form

        w[n, k] = scales[n, k/gs] * q[n, k] - mins[n, k/gs]

    (asymmetric formats fold their zero offset into mins: q4_0 -> 8*d, etc.;
    q8_0 keeps signed codes and mins = 0)

The min term never enters the kernel's inner loop: since
``sum_k w x = sum_k scale*q*x - sum_g min_g * groupsum_g(x)``, the kernel
computes the q-matmul and subtracts a tiny [M, K/gs] x [K/gs, N] matmul.

Memory cost vs ggml packing: +0.125 B/weight for the bf16 scale planes
(13B q5_k: 9.0 -> 9.7 GB) — bought back many times over by the kernel
reading 4-8x fewer bytes than the dense-dequant fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.dtypes import DataType
from ..formats import quants as nq


@jax.tree_util.register_pytree_node_class
@dataclass
class RepackedQuant:
    """TPU-layout quantized 2-D weight, logically [n_out, n_in]."""

    codes: jnp.ndarray  # uint8 [..., N/2, K] (4-bit, row-pair) or int8 [..., N, K]
    scales: jnp.ndarray  # bf16/f32 [..., N, K/gs]
    mins: jnp.ndarray  # bf16/f32 [..., N, K/gs]
    hi: jnp.ndarray | None  # uint8 [..., N, K/8] (1-bit) or [..., N, K/4] (2-bit)
    dtype: DataType  # static: source format
    n_in: int  # static
    group_size: int  # static
    code_bits: int  # static: 4 (row-pair nibble planes) or 8 (byte codes)
    hi_bits: int  # static: 0, 1, or 2
    k_shards: int = 1  # static: tensor-parallel K shards (see with_k_shards)

    def tree_flatten(self):
        children = (self.codes, self.scales, self.mins, self.hi)
        aux = (self.dtype, self.n_in, self.group_size, self.code_bits, self.hi_bits,
               self.k_shards)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def n_out(self) -> int:
        # scales always carry one row per logical output row; codes may hold
        # one zero-padded row when n_out is odd (row-pair packing)
        return self.scales.shape[-2]


def _f16(b: np.ndarray) -> np.ndarray:
    return b.copy().view(np.dtype("<f2")).astype(np.float32)


def _tile_permute(q: np.ndarray, gs: int) -> np.ndarray:
    """Reorder K to *tile-interleaved* storage: original k = g*gs + b maps to
    storage j = b*G + g (G = K/gs groups).

    Why: Mosaic cannot lower the 3D reshapes an element-repeat needs, but
    ``pltpu.repeat`` (tile semantics) is a pure 2D op.  In this order the
    scale of storage lane j is ``scales[j % G]`` — exactly what a tile-repeat
    produces — and bit planes packed tile-major expand the same way.  The
    activation vector gets the matching permutation once per matmul (a tiny
    XLA transpose outside the kernel); the contraction is order-invariant.
    """
    n, k = q.shape
    g = k // gs
    return np.ascontiguousarray(q.reshape(n, g, gs).swapaxes(1, 2).reshape(n, k))


def _pack_nibbles_rowpair(q: np.ndarray) -> np.ndarray:
    """int [N, K] (0..15) -> uint8 [N/2, K]: byte (r, j) = q[2r, j] |
    q[2r+1, j] << 4, matching ``pltpu.bitcast(., uint4)``'s sublane-interleave
    (u4 row 2r = lo nibble, row 2r+1 = hi nibble of byte row r)."""
    return (q[0::2] | (q[1::2] << 4)).astype(np.uint8)


def _pack_bits_tilemajor(b: np.ndarray, bits: int) -> np.ndarray:
    """int [N, K] -> uint8 [N, K*bits/8], packed tile-major: the value for
    storage lane j lives in byte ``j % B`` at field ``j // B`` (B = out
    bytes per row), so a ``pltpu.repeat`` + shift-by-(lane // B) recovers it
    without any reshape."""
    n, k = b.shape
    per_byte = 8 // bits
    nb = k // per_byte
    out = np.zeros((n, nb), np.uint8)
    for p in range(per_byte):
        out |= (b[:, p * nb : (p + 1) * nb].astype(np.uint8) & ((1 << bits) - 1)) << (p * bits)
    return out


def _decode_codes_scales(raw: np.ndarray, shape: tuple[int, int], dtype: DataType):
    """Extract (q int array [N, K], scales [N, K/gs], mins [N, K/gs], gs).

    q holds the *raw code* (unsigned); mins absorb zero offsets so that
    w = scales*q - mins exactly reproduces the ggml decode.
    """
    n, k = shape
    b = raw.reshape(n, -1)

    if dtype == DataType.Q4_0:
        blk = b.reshape(n, -1, 18)
        d = _f16(blk[:, :, 0:2]).reshape(n, -1)
        qs = blk[:, :, 2:18]
        lo = (qs & 0x0F).astype(np.uint8)
        hi = (qs >> 4).astype(np.uint8)
        q = np.concatenate([lo, hi], axis=2).reshape(n, k)
        return q, d, 8.0 * d, 32
    if dtype == DataType.Q4_1:
        blk = b.reshape(n, -1, 20)
        d = _f16(blk[:, :, 0:2]).reshape(n, -1)
        m = _f16(blk[:, :, 2:4]).reshape(n, -1)
        qs = blk[:, :, 4:20]
        q = np.concatenate([(qs & 0x0F), (qs >> 4)], axis=2).reshape(n, k)
        return q, d, -m, 32
    if dtype == DataType.Q5_0:
        blk = b.reshape(n, -1, 22)
        d = _f16(blk[:, :, 0:2]).reshape(n, -1)
        qh = blk[:, :, 2:6].copy().view("<u4").reshape(n, -1, 1)
        bits = ((qh >> np.arange(32, dtype=np.uint32)) & 1).astype(np.uint8)
        qs = blk[:, :, 6:22]
        lo = (qs & 0x0F) | (bits[:, :, :16] << 4)
        hi = (qs >> 4) | (bits[:, :, 16:] << 4)
        q = np.concatenate([lo, hi], axis=2).reshape(n, k)
        return q, d, 16.0 * d, 32
    if dtype == DataType.Q5_1:
        blk = b.reshape(n, -1, 24)
        d = _f16(blk[:, :, 0:2]).reshape(n, -1)
        m = _f16(blk[:, :, 2:4]).reshape(n, -1)
        qh = blk[:, :, 4:8].copy().view("<u4").reshape(n, -1, 1)
        bits = ((qh >> np.arange(32, dtype=np.uint32)) & 1).astype(np.uint8)
        qs = blk[:, :, 8:24]
        lo = (qs & 0x0F) | (bits[:, :, :16] << 4)
        hi = (qs >> 4) | (bits[:, :, 16:] << 4)
        q = np.concatenate([lo, hi], axis=2).reshape(n, k)
        return q, d, -m, 32
    if dtype == DataType.Q8_0:
        blk = b.reshape(n, -1, 34)
        d = _f16(blk[:, :, 0:2]).reshape(n, -1)
        qs = blk[:, :, 2:34].view(np.int8)
        # signed codes, zero mins: the kernel casts i8 -> bf16 directly
        return qs.reshape(n, k).copy(), d, np.zeros_like(d), 32

    # k-quants: decode via the exact codec scale logic, vectorized over all
    # blocks of the whole tensor at once (13B-scale tensors repack in seconds)
    if dtype == DataType.Q2_K:
        blk = b.reshape(n, -1, 84)
        scales = blk[:, :, :16]
        d = _f16(blk[:, :, 80:82]).reshape(n, -1, 1)
        dmin = _f16(blk[:, :, 82:84]).reshape(n, -1, 1)
        flat = np.ascontiguousarray(blk[:, :, 16:80]).reshape(-1, 64)
        q = nq._q2k_expand_qs(flat).reshape(n, -1, 256)
        sc = d * (scales & 0x0F)  # [n, nb, 16]
        mn = dmin * (scales >> 4)
        return (
            q.reshape(n, k).astype(np.uint8),
            sc.reshape(n, -1),
            mn.reshape(n, -1),
            16,
        )
    if dtype == DataType.Q3_K:
        blk = b.reshape(n, -1, 110)
        d = _f16(blk[:, :, 108:110]).reshape(n, -1, 1)
        nb = blk.shape[1]
        sc6 = nq._q3k_unpack_scales(
            np.ascontiguousarray(blk[:, :, 96:108]).reshape(-1, 12)
        ).reshape(n, nb, 16)
        q2 = nq._q3k_expand_qs(np.ascontiguousarray(blk[:, :, 32:96]).reshape(-1, 64))
        hb = nq._q3k_expand_hmask(np.ascontiguousarray(blk[:, :, :32]).reshape(-1, 32))
        q3 = (q2 | (hb << 2)).astype(np.uint8)  # 0..7; decode = q3 - 4
        sc = d * (sc6 - 32)
        return q3.reshape(n, k), sc.reshape(n, -1), (4.0 * sc).reshape(n, -1), 16
    if dtype in (DataType.Q4_K, DataType.Q5_K):
        bbytes = 144 if dtype == DataType.Q4_K else 176
        blk = b.reshape(n, -1, bbytes)
        d = _f16(blk[:, :, 0:2]).reshape(n, -1, 1)
        dmin = _f16(blk[:, :, 2:4]).reshape(n, -1, 1)
        nb = blk.shape[1]
        sc8, mn8 = nq._k4_unpack_scales(
            np.ascontiguousarray(blk[:, :, 4:16]).reshape(-1, 12)
        )
        sc8 = sc8.reshape(n, nb, 8)
        mn8 = mn8.reshape(n, nb, 8)
        sc = d * sc8
        mn = dmin * mn8
        if dtype == DataType.Q4_K:
            qs = blk[:, :, 16:144].reshape(n, nb, 4, 32)
            q = np.stack([(qs & 0x0F), (qs >> 4)], axis=3).reshape(n, k)
        else:
            qh = blk[:, :, 16:48]
            qs = blk[:, :, 48:176].reshape(n, nb, 4, 32)
            j = np.arange(4).reshape(1, 1, 4, 1)
            hb1 = (qh[:, :, None, :] >> (2 * j)) & 1
            hb2 = (qh[:, :, None, :] >> (2 * j + 1)) & 1
            q1 = (qs & 0x0F) + (hb1 << 4)
            q2 = (qs >> 4) + (hb2 << 4)
            q = np.stack([q1, q2], axis=3).reshape(n, k)
        return q.astype(np.uint8), sc.reshape(n, -1), mn.reshape(n, -1), 32
    if dtype == DataType.Q6_K:
        blk = b.reshape(n, -1, 210)
        nb = blk.shape[1]
        ql = blk[:, :, :128].reshape(n, nb, 2, 64)
        qh = blk[:, :, 128:192].reshape(n, nb, 2, 32)
        sc16 = blk[:, :, 192:208].view(np.int8).astype(np.float32)
        d = _f16(blk[:, :, 208:210]).reshape(n, -1, 1)
        l0, l1 = ql[..., :32], ql[..., 32:]
        q0 = (l0 & 0x0F) | ((qh >> 0 & 3) << 4)
        q1 = (l1 & 0x0F) | ((qh >> 2 & 3) << 4)
        q2 = (l0 >> 4) | ((qh >> 4 & 3) << 4)
        q3 = (l1 >> 4) | ((qh >> 6 & 3) << 4)
        q = np.concatenate([q0, q1, q2, q3], axis=-1).reshape(n, k).astype(np.uint8)
        sc = d * sc16  # [n, nb, 16]
        return q, sc.reshape(n, -1), (32.0 * sc).reshape(n, -1), 16
    raise ValueError(f"unsupported repack format {dtype}")


# static per-format plane layout (must not depend on data: layers stack)
_LAYOUT = {
    DataType.Q4_0: (4, 0),
    DataType.Q4_1: (4, 0),
    DataType.Q2_K: (4, 0),
    DataType.Q3_K: (4, 0),
    DataType.Q4_K: (4, 0),
    DataType.Q5_0: (4, 1),
    DataType.Q5_1: (4, 1),
    DataType.Q5_K: (4, 1),
    DataType.Q6_K: (4, 2),
    DataType.Q8_0: (8, 0),
}

REPACKABLE = frozenset(_LAYOUT)


def repack(
    raw: np.ndarray, shape: tuple[int, int], dtype: DataType, plane_dtype=jnp.bfloat16
) -> RepackedQuant:
    """ggml packed bytes -> TPU-plane representation (host-side, one-time).

    K is stored tile-interleaved (see _tile_permute); the kernel permutes the
    activation vector to match.  ``plane_dtype`` sets the scale/min plane
    precision: bf16 (default, -0.125 B/weight HBM traffic, <=2^-9 relative
    scale error) or f32 (bit-exact decode vs the ggml codecs)."""
    dtype = DataType(dtype)
    n, k = shape
    q, scales, mins, gs = _decode_codes_scales(np.ascontiguousarray(raw, np.uint8), shape, dtype)
    code_bits, hi_bits = _LAYOUT[dtype]
    if code_bits == 4:
        q = _tile_permute(q.astype(np.uint8), gs)
        if n % 2:  # odd n_out (e.g. vicuna-v0's 32001 vocab): zero-pad a row
            q = np.concatenate([q, np.zeros((1, k), q.dtype)], axis=0)
        codes = _pack_nibbles_rowpair(q & 0x0F)
        if hi_bits:
            hi = _pack_bits_tilemajor((q[:n] >> 4).astype(np.uint8), hi_bits)
        else:
            hi = None
    else:
        codes = _tile_permute(q.astype(np.int8), gs)
        hi = None
    return RepackedQuant(
        codes=jnp.asarray(codes),
        scales=jnp.asarray(scales.astype(np.float32), plane_dtype),
        mins=jnp.asarray(mins.astype(np.float32), plane_dtype),
        hi=jnp.asarray(hi) if hi is not None else None,
        dtype=dtype,
        n_in=k,
        group_size=gs,
        code_bits=code_bits,
        hi_bits=hi_bits,
    )


def tile_permute_x(x: jnp.ndarray, gs: int) -> jnp.ndarray:
    """Apply the storage permutation to activations: x [..., K] -> [..., K]
    with x_perm[..., b*G + g] = x[..., g*gs + b] (jit-safe, runs in XLA).
    K-sharded weights are consumed shard-locally (see with_k_shards), where
    each local slice is a plain k_shards=1 layout — so no shard variant."""
    k = x.shape[-1]
    g = k // gs
    lead = x.shape[:-1]
    return x.reshape(*lead, g, gs).swapaxes(-1, -2).reshape(*lead, k)


def with_k_shards(rq: RepackedQuant, k_shards: int) -> RepackedQuant:
    """Re-layout a repacked weight so every plane is CONTIGUOUSLY shardable
    along its last axis into ``k_shards`` tensor-parallel K slices.

    The base layout's tile-interleave (lane j <-> element (j%G)*gs + j//G)
    scatters any contiguous K range across all lanes, which is why round 1
    could not row-shard quantized weights (VERDICT.md weak #6).  Here each
    K/S slice is tile-interleaved INDEPENDENTLY, so chip s's column slice is
    a self-consistent k_shards=1 repack of its logical K/S range: inside
    shard_map the local planes feed the unmodified kernel, with scales/mins
    (original group order, contiguous per shard) sharded the same way.

    Host-side, one-time (device arrays are pulled back; called at load)."""
    if k_shards == rq.k_shards:
        return rq
    if rq.k_shards != 1:
        raise ValueError("re-sharding an already k-sharded weight is unsupported")
    k, gs, s = rq.n_in, rq.group_size, k_shards
    if (k // s) % gs or k % s:
        raise ValueError(f"K={k} not shardable into {s} group-aligned slices")
    g = k // gs
    g_s = g // s
    ks = k // s

    # target storage lane t = s_idx*ks + j' holds original element
    # e = s_idx*ks + (j' % G_s)*gs + j' // G_s; base lane of e is b*G + g_e
    t = np.arange(k)
    s_idx, jp = t // ks, t % ks
    e = s_idx * ks + (jp % g_s) * gs + jp // g_s
    src = (e % gs) * g + e // gs  # base-layout lane holding element e

    codes = np.asarray(rq.codes)[..., src]  # column permute (both nibbles ride along)
    hi = None
    if rq.hi_bits:
        # unpack base bit-plane to per-lane values, permute, repack per shard
        per_byte = 8 // rq.hi_bits
        mask = (1 << rq.hi_bits) - 1
        nb = k // per_byte
        hb = np.asarray(rq.hi)
        lanes = np.arange(k)
        vals = (hb[..., lanes % nb] >> ((lanes // nb) * rq.hi_bits)) & mask  # [.., N, K]
        vals = vals[..., src]  # target lane t's value comes from base lane src[t]
        nb_s = ks // per_byte
        # per-shard tile-major pack: shard-local lane j' -> byte j' % nb_s,
        # field j' // nb_s
        v4 = vals.reshape(*vals.shape[:-1], s, per_byte, nb_s).astype(np.uint8)
        out = np.zeros((*vals.shape[:-1], s, nb_s), np.uint8)
        for p in range(per_byte):
            out |= v4[..., p, :] << (p * rq.hi_bits)
        hi = jnp.asarray(out.reshape(*vals.shape[:-1], s * nb_s))
    return RepackedQuant(
        jnp.asarray(codes), rq.scales, rq.mins, hi,
        rq.dtype, rq.n_in, rq.group_size, rq.code_bits, rq.hi_bits, k_shards,
    )


def dequantize_repacked(rq: RepackedQuant, out_dtype=jnp.float32) -> jnp.ndarray:
    """Reference (XLA) decode of the repacked planes -> [N, K] in the
    *original* (ggml) K order; used for testing and as a fallback."""
    k = rq.n_in
    if rq.code_bits == 4:
        lo = (rq.codes & 0x0F).astype(jnp.int32)  # [..., ceil(N/2), K] rows 2r
        hi4 = (rq.codes >> 4).astype(jnp.int32)  # -> rows 2r+1
        rows = 2 * rq.codes.shape[-2]
        q = jnp.stack([lo, hi4], axis=-2).reshape(*rq.codes.shape[:-2], rows, k)
        q = q[..., : rq.n_out, :]  # drop the odd-N zero-pad row
    else:
        q = rq.codes.astype(jnp.int32)
    s = rq.k_shards
    ks = k // s
    if rq.hi_bits:
        # per-shard tile-major fields (shard-local lane j' -> byte j' % nb_s,
        # field j' // nb_s)
        per_byte = 8 // rq.hi_bits
        nb_s = ks // per_byte
        hb = rq.hi.astype(jnp.int32).reshape(*rq.hi.shape[:-1], s, nb_s)
        fields = [
            (hb >> (p * rq.hi_bits)) & ((1 << rq.hi_bits) - 1)
            for p in range(per_byte)
        ]
        bits = jnp.concatenate(fields, axis=-1).reshape(*rq.hi.shape[:-1], k)
        q = q + (bits << 4)
    gs = rq.group_size
    g_s = ks // gs
    lead = q.shape[:-1]
    # shard-local storage lane j' -> scale group j' % G_s
    sc = jnp.tile(
        rq.scales.astype(jnp.float32).reshape(*lead, s, g_s),
        (1,) * len(lead) + (1, gs),
    )  # [..., S, ks]
    w_st = sc.reshape(*lead, k) * q.astype(jnp.float32)
    # un-permute per-shard storage -> original order, then per-group mins
    w = (
        w_st.reshape(*lead, s, gs, g_s)
        .swapaxes(-1, -2)
        .reshape(*lead, k)
    )
    mn = jnp.repeat(rq.mins.astype(jnp.float32), gs, axis=-1)
    return (w - mn).astype(out_dtype)

"""Jittable (XLA) dequantization of ggml packed blocks.

jnp mirrors of :mod:`minigpt4_tpu.formats.quants` decoders so quantized
weights can live in HBM as packed ``uint8`` and be expanded inside a jitted
computation (the XLA fallback path for quantized matmul; the Pallas kernels
in :mod:`minigpt4_tpu.ops.quant_matmul` fuse the same math into tiles).

All functions take ``packed`` of shape ``[..., row_packed_bytes]`` and return
``[..., n]`` floats, where ``n`` is the logical element count per row.
Bit layouts are identical to the NumPy codecs (tested for equality).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.dtypes import QK, QK_K, DataType, traits


def _bitcast_f16(u8_pairs: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 2] -> float32[...]."""
    return jax.lax.bitcast_convert_type(u8_pairs, jnp.float16).astype(jnp.float32)


def _bitcast_u32(u8_quads: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 4] -> uint32[...]."""
    return jax.lax.bitcast_convert_type(u8_quads, jnp.uint32)


def _blocks(packed: jnp.ndarray, block_bytes: int) -> jnp.ndarray:
    return packed.reshape(*packed.shape[:-1], -1, block_bytes)


def dequant_q4_0(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 18)
    d = _bitcast_f16(b[..., 0:2])[..., None]
    qs = b[..., 2:18]
    lo = (qs & 0x0F).astype(jnp.int8) - 8
    hi = (qs >> 4).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    out = q * d
    return out.reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_q4_1(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 20)
    d = _bitcast_f16(b[..., 0:2])[..., None]
    m = _bitcast_f16(b[..., 2:4])[..., None]
    qs = b[..., 4:20]
    lo = (qs & 0x0F).astype(jnp.float32)
    hi = (qs >> 4).astype(jnp.float32)
    out = jnp.concatenate([lo, hi], axis=-1) * d + m
    return out.reshape(*packed.shape[:-1], -1).astype(out_dtype)


def _expand_qh(b: jnp.ndarray, off: int) -> jnp.ndarray:
    qh = _bitcast_u32(b[..., off : off + 4])[..., None]  # [..., nb, 1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return ((qh >> shifts) & 1).astype(jnp.uint8)


def dequant_q5_0(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 22)
    d = _bitcast_f16(b[..., 0:2])[..., None]
    bits = _expand_qh(b, 2)
    qs = b[..., 6:22]
    lo = (qs & 0x0F) | (bits[..., :16] << 4)
    hi = (qs >> 4) | (bits[..., 16:] << 4)
    q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32) - 16.0
    return (q * d).reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_q5_1(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 24)
    d = _bitcast_f16(b[..., 0:2])[..., None]
    m = _bitcast_f16(b[..., 2:4])[..., None]
    bits = _expand_qh(b, 4)
    qs = b[..., 8:24]
    lo = (qs & 0x0F) | (bits[..., :16] << 4)
    hi = (qs >> 4) | (bits[..., 16:] << 4)
    q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    return (q * d + m).reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_q8_0(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 34)
    d = _bitcast_f16(b[..., 0:2])[..., None]
    qs = jax.lax.bitcast_convert_type(b[..., 2:34], jnp.int8).astype(jnp.float32)
    return (qs * d).reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_q2_k(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 84)
    scales = b[..., :16]
    qs = b[..., 16:80]
    d = _bitcast_f16(b[..., 80:82])[..., None]
    dmin = _bitcast_f16(b[..., 82:84])[..., None]
    # expand 2-bit quants in decode order: element (half, j, l) with
    # q = (qs[32*half + l] >> 2j) & 3
    halves = qs.reshape(*qs.shape[:-1], 2, 32)  # [..., nb, 2, 32]
    shifted = jnp.stack([(halves >> (2 * j)) & 3 for j in range(4)], axis=-2)
    q = shifted.reshape(*qs.shape[:-1], 256).astype(jnp.float32)  # [..., nb, 256]
    sc = jnp.repeat((scales & 0x0F).astype(jnp.float32), 16, axis=-1)
    mn = jnp.repeat((scales >> 4).astype(jnp.float32), 16, axis=-1)
    out = d * sc * q - dmin * mn
    return out.reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_q3_k(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 110)
    hmask = b[..., :32]
    qs = b[..., 32:96]
    sb = b[..., 96:108]
    d = _bitcast_f16(b[..., 108:110])[..., None]
    # unpack 16 6-bit scales (kmask shuffle, see formats.quants)
    lo4 = sb[..., 0:8] & 0x0F
    hi4 = sb[..., 0:8] >> 4
    top = sb[..., 8:12]
    n0 = lo4[..., 0:4] | ((top >> 0 & 3) << 4)
    n1 = lo4[..., 4:8] | ((top >> 2 & 3) << 4)
    n2 = hi4[..., 0:4] | ((top >> 4 & 3) << 4)
    n3 = hi4[..., 4:8] | ((top >> 6 & 3) << 4)
    sc = jnp.concatenate([n0, n1, n2, n3], axis=-1).astype(jnp.int32) - 32  # [..., nb, 16]
    halves = qs.reshape(*qs.shape[:-1], 2, 32)
    q2 = jnp.stack([(halves >> (2 * j)) & 3 for j in range(4)], axis=-2).reshape(
        *qs.shape[:-1], 256
    )
    hbits = jnp.stack(
        [(hmask >> (4 * half + j)) & 1 for half in range(2) for j in range(4)], axis=-2
    ).reshape(*qs.shape[:-1], 256)
    q = q2.astype(jnp.int32) - jnp.where(hbits > 0, 0, 4)
    sc_full = jnp.repeat(sc, 16, axis=-1).astype(jnp.float32)
    out = d * sc_full * q.astype(jnp.float32)
    return out.reshape(*packed.shape[:-1], -1).astype(out_dtype)


def _k4_scales(sb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 12] packed 6-bit pairs -> (sc [..., 8], mn [..., 8]) float32."""
    sbi = sb.astype(jnp.int32)
    sc_lo = sbi[..., 0:4] & 63
    mn_lo = sbi[..., 4:8] & 63
    sc_hi = (sbi[..., 8:12] & 0x0F) | ((sbi[..., 0:4] >> 6) << 4)
    mn_hi = (sbi[..., 8:12] >> 4) | ((sbi[..., 4:8] >> 6) << 4)
    sc = jnp.concatenate([sc_lo, sc_hi], axis=-1).astype(jnp.float32)
    mn = jnp.concatenate([mn_lo, mn_hi], axis=-1).astype(jnp.float32)
    return sc, mn


def dequant_q4_k(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 144)
    d = _bitcast_f16(b[..., 0:2])[..., None]
    dmin = _bitcast_f16(b[..., 2:4])[..., None]
    sc, mn = _k4_scales(b[..., 4:16])
    qs = b[..., 16:144].reshape(*b.shape[:-1], 4, 32)  # [..., nb, 4, 32]
    lo = (qs & 0x0F).astype(jnp.float32)
    hi = (qs >> 4).astype(jnp.float32)
    q = jnp.stack([lo, hi], axis=-2).reshape(*b.shape[:-1], 256)  # groups 2j, 2j+1
    dsc = (d * sc)[..., :, None]  # [..., nb, 8, 1]
    dmn = (dmin * mn)[..., :, None]
    qg = q.reshape(*b.shape[:-1], 8, 32)
    out = qg * dsc - dmn
    return out.reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_q5_k(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 176)
    d = _bitcast_f16(b[..., 0:2])[..., None]
    dmin = _bitcast_f16(b[..., 2:4])[..., None]
    sc, mn = _k4_scales(b[..., 4:16])
    qh = b[..., 16:48]  # [..., nb, 32]
    qs = b[..., 48:176].reshape(*b.shape[:-1], 4, 32)
    lo = (qs & 0x0F).astype(jnp.int32)
    hi = (qs >> 4).astype(jnp.int32)
    j = jnp.arange(4)[:, None]
    hb1 = ((qh[..., None, :] >> (2 * j)) & 1).astype(jnp.int32)  # [..., nb, 4, 32]
    hb2 = ((qh[..., None, :] >> (2 * j + 1)) & 1).astype(jnp.int32)
    q1 = lo + (hb1 << 4)
    q2 = hi + (hb2 << 4)
    q = jnp.stack([q1, q2], axis=-2).reshape(*b.shape[:-1], 8, 32).astype(jnp.float32)
    dsc = (d * sc)[..., :, None]
    dmn = (dmin * mn)[..., :, None]
    out = q * dsc - dmn
    return out.reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_q6_k(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 210)
    ql = b[..., :128].reshape(*b.shape[:-1], 2, 64)
    qh = b[..., 128:192].reshape(*b.shape[:-1], 2, 32)
    sc = jax.lax.bitcast_convert_type(b[..., 192:208], jnp.int8).astype(jnp.float32)
    d = _bitcast_f16(b[..., 208:210])[..., None]
    l0 = ql[..., :32]
    l1 = ql[..., 32:]
    q0 = ((l0 & 0x0F) | ((qh >> 0 & 3) << 4)).astype(jnp.int32) - 32
    q1 = ((l1 & 0x0F) | ((qh >> 2 & 3) << 4)).astype(jnp.int32) - 32
    q2 = ((l0 >> 4) | ((qh >> 4 & 3) << 4)).astype(jnp.int32) - 32
    q3 = ((l1 >> 4) | ((qh >> 6 & 3) << 4)).astype(jnp.int32) - 32
    q = jnp.concatenate([q0, q1, q2, q3], axis=-1)  # [..., nb, 2, 128]
    q = q.reshape(*b.shape[:-1], 256).astype(jnp.float32)
    sc_full = jnp.repeat(sc, 16, axis=-1)
    out = d * sc_full * q
    return out.reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_q8_k(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    b = _blocks(packed, 292)
    d = jax.lax.bitcast_convert_type(b[..., 0:4], jnp.float32)[..., None]
    qs = jax.lax.bitcast_convert_type(b[..., 4:260], jnp.int8).astype(jnp.float32)
    return (qs * d).reshape(*packed.shape[:-1], -1).astype(out_dtype)


def dequant_f16(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    pairs = packed.reshape(*packed.shape[:-1], -1, 2)
    return jax.lax.bitcast_convert_type(pairs, jnp.float16).astype(out_dtype)


def dequant_f32(packed: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    quads = packed.reshape(*packed.shape[:-1], -1, 4)
    return jax.lax.bitcast_convert_type(quads, jnp.float32).astype(out_dtype)


DEQUANT_FNS = {
    DataType.F16: dequant_f16,
    DataType.F32: dequant_f32,
    DataType.Q4_0: dequant_q4_0,
    DataType.Q4_1: dequant_q4_1,
    DataType.Q5_0: dequant_q5_0,
    DataType.Q5_1: dequant_q5_1,
    DataType.Q8_0: dequant_q8_0,
    DataType.Q2_K: dequant_q2_k,
    DataType.Q3_K: dequant_q3_k,
    DataType.Q4_K: dequant_q4_k,
    DataType.Q5_K: dequant_q5_k,
    DataType.Q6_K: dequant_q6_k,
    DataType.Q8_K: dequant_q8_k,
}


def dequantize(packed: jnp.ndarray, dtype: DataType, out_dtype=jnp.float32) -> jnp.ndarray:
    """[..., packed_bytes] uint8 -> [..., n] floats (jit-safe)."""
    return DEQUANT_FNS[DataType(dtype)](packed, out_dtype)

"""Quant codec tests: exact decode layouts + encode/decode round-trips.

Decode exactness is checked against hand-constructed blocks whose expected
values are computed independently from the ggml layout documentation
(scalar reference decoders below, written element-by-element from the
per-format bit layout).  Round-trips check encoders emit decodable blocks
with bounded quantization error.
"""

import numpy as np
import pytest

from minigpt4_tpu.formats import DataType, quants, row_bytes, traits

RNG = np.random.default_rng(1337)

ALL_QUANTS = [
    DataType.Q4_0,
    DataType.Q4_1,
    DataType.Q5_0,
    DataType.Q5_1,
    DataType.Q8_0,
    DataType.Q8_1,
    DataType.Q2_K,
    DataType.Q3_K,
    DataType.Q4_K,
    DataType.Q5_K,
    DataType.Q6_K,
    DataType.Q8_K,
]

# max relative RMS error tolerated for a round-trip (quantization noise)
# For N(0,1) data: 4-bit block quantization lands around 0.08 relative RMS
# (step = blockmax/8 ~ 0.28 sigma), 5-bit halves that, 2-bit ~0.35.
RTOL = {
    DataType.Q4_0: 0.11,
    DataType.Q4_1: 0.11,
    DataType.Q5_0: 0.06,
    DataType.Q5_1: 0.06,
    DataType.Q8_0: 0.006,
    DataType.Q8_1: 0.006,
    DataType.Q2_K: 0.45,
    DataType.Q3_K: 0.20,
    DataType.Q4_K: 0.12,
    DataType.Q5_K: 0.07,
    DataType.Q6_K: 0.035,
    DataType.Q8_K: 0.008,
}


# ---------------------------------------------------------------------------
# scalar reference decoders (independent implementations of the layouts)
# ---------------------------------------------------------------------------


def ref_dequant_q4_0(raw):
    out = []
    for blk in raw.reshape(-1, 18):
        d = np.frombuffer(blk[:2].tobytes(), "<f2")[0].astype(np.float32)
        qs = blk[2:]
        vals = [0.0] * 32
        for j in range(16):
            vals[j] = (int(qs[j] & 0x0F) - 8) * d
            vals[j + 16] = (int(qs[j] >> 4) - 8) * d
        out.extend(vals)
    return np.array(out, np.float32)


def ref_dequant_q5_1(raw):
    out = []
    for blk in raw.reshape(-1, 24):
        d = np.frombuffer(blk[:2].tobytes(), "<f2")[0].astype(np.float32)
        m = np.frombuffer(blk[2:4].tobytes(), "<f2")[0].astype(np.float32)
        qh = int(np.frombuffer(blk[4:8].tobytes(), "<u4")[0])
        qs = blk[8:]
        vals = [0.0] * 32
        for j in range(16):
            b_lo = (qh >> j) & 1
            b_hi = (qh >> (j + 16)) & 1
            vals[j] = ((int(qs[j] & 0x0F) | (b_lo << 4))) * d + m
            vals[j + 16] = ((int(qs[j] >> 4) | (b_hi << 4))) * d + m
        out.extend(vals)
    return np.array(out, np.float32)


def ref_dequant_q6_k(raw):
    out = []
    for blk in raw.reshape(-1, 210):
        ql = blk[:128]
        qh = blk[128:192]
        sc = blk[192:208].view(np.int8)
        d = np.frombuffer(blk[208:210].tobytes(), "<f2")[0].astype(np.float32)
        y = np.zeros(256, np.float32)
        for half in range(2):
            for l in range(32):
                is_ = l // 16
                base = 128 * half
                lq = ql[64 * half : 64 * half + 64]
                hq = qh[32 * half : 32 * half + 32]
                q1 = (int(lq[l] & 0xF) | ((int(hq[l]) >> 0 & 3) << 4)) - 32
                q2 = (int(lq[l + 32] & 0xF) | ((int(hq[l]) >> 2 & 3) << 4)) - 32
                q3 = (int(lq[l] >> 4) | ((int(hq[l]) >> 4 & 3) << 4)) - 32
                q4 = (int(lq[l + 32] >> 4) | ((int(hq[l]) >> 6 & 3) << 4)) - 32
                y[base + l] = d * sc[8 * half + is_ + 0] * q1
                y[base + l + 32] = d * sc[8 * half + is_ + 2] * q2
                y[base + l + 64] = d * sc[8 * half + is_ + 4] * q3
                y[base + l + 96] = d * sc[8 * half + is_ + 6] * q4
        out.extend(y.tolist())
    return np.array(out, np.float32)


def ref_dequant_q4_k(raw):
    out = []
    for blk in raw.reshape(-1, 144):
        d = np.frombuffer(blk[0:2].tobytes(), "<f2")[0].astype(np.float32)
        dmin = np.frombuffer(blk[2:4].tobytes(), "<f2")[0].astype(np.float32)
        scales = blk[4:16]
        qs = blk[16:]
        y = np.zeros(256, np.float32)

        def get_scale_min(j):
            if j < 4:
                return scales[j] & 63, scales[j + 4] & 63
            sc = (scales[j + 4] & 0x0F) | ((scales[j - 4] >> 6) << 4)
            mn = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
            return sc, mn

        for j in range(4):
            sc1, m1 = get_scale_min(2 * j)
            sc2, m2 = get_scale_min(2 * j + 1)
            for l in range(32):
                q = qs[32 * j + l]
                y[64 * j + l] = d * sc1 * (q & 0x0F) - dmin * m1
                y[64 * j + 32 + l] = d * sc2 * (q >> 4) - dmin * m2
        out.extend(y.tolist())
    return np.array(out, np.float32)


def ref_dequant_q5_k(raw):
    out = []
    for blk in raw.reshape(-1, 176):
        d = np.frombuffer(blk[0:2].tobytes(), "<f2")[0].astype(np.float32)
        dmin = np.frombuffer(blk[2:4].tobytes(), "<f2")[0].astype(np.float32)
        scales = blk[4:16]
        qh = blk[16:48]
        qs = blk[48:]
        y = np.zeros(256, np.float32)

        def get_scale_min(j):
            if j < 4:
                return scales[j] & 63, scales[j + 4] & 63
            sc = (scales[j + 4] & 0x0F) | ((scales[j - 4] >> 6) << 4)
            mn = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
            return sc, mn

        for j in range(4):
            sc1, m1 = get_scale_min(2 * j)
            sc2, m2 = get_scale_min(2 * j + 1)
            u1, u2 = 1 << (2 * j), 2 << (2 * j)
            for l in range(32):
                q = qs[32 * j + l]
                q1 = (q & 0x0F) + (16 if (qh[l] & u1) else 0)
                q2 = (q >> 4) + (16 if (qh[l] & u2) else 0)
                y[64 * j + l] = d * sc1 * q1 - dmin * m1
                y[64 * j + 32 + l] = d * sc2 * q2 - dmin * m2
        out.extend(y.tolist())
    return np.array(out, np.float32)


def ref_dequant_q2_k(raw):
    out = []
    for blk in raw.reshape(-1, 84):
        scales = blk[:16]
        qs = blk[16:80]
        d = np.frombuffer(blk[80:82].tobytes(), "<f2")[0].astype(np.float32)
        dmin = np.frombuffer(blk[82:84].tobytes(), "<f2")[0].astype(np.float32)
        y = []
        is_ = 0
        qoff = 0
        for n in range(2):
            shift = 0
            for j in range(4):
                sc = scales[is_]
                is_ += 1
                dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
                for l in range(16):
                    y.append(dl * ((qs[qoff + l] >> shift) & 3) - ml)
                sc = scales[is_]
                is_ += 1
                dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
                for l in range(16, 32):
                    y.append(dl * ((qs[qoff + l] >> shift) & 3) - ml)
                shift += 2
            qoff += 32
        out.extend(y)
    return np.array(out, np.float32)


def ref_dequant_q3_k(raw):
    kmask1, kmask2 = 0x03030303, 0x0F0F0F0F
    out = []
    for blk in raw.reshape(-1, 110):
        hmask = blk[:32]
        qs = blk[32:96]
        aux = np.frombuffer(blk[96:108].tobytes(), "<u4").copy()
        d_all = np.frombuffer(blk[108:110].tobytes(), "<f2")[0].astype(np.float32)
        tmp = int(aux[2])
        a = [0] * 4
        a[2] = ((int(aux[0]) >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4)
        a[3] = ((int(aux[1]) >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4)
        a[0] = (int(aux[0]) & kmask2) | (((tmp >> 0) & kmask1) << 4)
        a[1] = (int(aux[1]) & kmask2) | (((tmp >> 2) & kmask1) << 4)
        sc = np.frombuffer(
            np.array(a, "<u4").tobytes(), np.int8
        ).copy()  # 16 signed bytes
        y = []
        is_ = 0
        m = 1
        qoff = 0
        for n in range(2):
            shift = 0
            for j in range(4):
                dl = d_all * (int(sc[is_]) - 32)
                is_ += 1
                for l in range(16):
                    q = (int(qs[qoff + l]) >> shift & 3) - (0 if (hmask[l] & m) else 4)
                    y.append(dl * q)
                dl = d_all * (int(sc[is_]) - 32)
                is_ += 1
                for l in range(16, 32):
                    q = (int(qs[qoff + l]) >> shift & 3) - (0 if (hmask[l] & m) else 4)
                    y.append(dl * q)
                shift += 2
                m <<= 1
            qoff += 32
        out.extend(y)
    return np.array(out, np.float32)


REF_DECODERS = {
    DataType.Q4_0: ref_dequant_q4_0,
    DataType.Q5_1: ref_dequant_q5_1,
    DataType.Q2_K: ref_dequant_q2_k,
    DataType.Q3_K: ref_dequant_q3_k,
    DataType.Q4_K: ref_dequant_q4_k,
    DataType.Q5_K: ref_dequant_q5_k,
    DataType.Q6_K: ref_dequant_q6_k,
}


@pytest.mark.parametrize("dtype", list(REF_DECODERS))
def test_decode_matches_scalar_reference(dtype):
    """Vectorized decoder == independent scalar decoder on random bytes."""
    t = traits(dtype)
    nblocks = 8
    raw = RNG.integers(0, 256, nblocks * t.block_bytes, dtype=np.uint8)
    got = quants.dequantize(raw, dtype)
    want = REF_DECODERS[dtype](raw)
    # random fp16 bytes can be inf/nan; compare with nan-aware equality
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    mask = ~np.isnan(want)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-6, atol=0)


@pytest.mark.parametrize("dtype", ALL_QUANTS)
def test_round_trip(dtype):
    t = traits(dtype)
    n = t.block_elems * 64
    x = RNG.normal(0, 1, n).astype(np.float32)
    raw = quants.quantize(x, dtype)
    assert raw.dtype == np.uint8
    assert raw.size == row_bytes(dtype, n)
    y = quants.dequantize(raw, dtype)
    assert y.shape == x.shape
    rms = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x**2))
    assert rms < RTOL[dtype], f"{t.name}: relative RMS {rms:.4f}"


@pytest.mark.parametrize("dtype", ALL_QUANTS)
def test_quantize_decode_quantize_stable(dtype):
    """quantize(dequantize(quantize(x))) == quantize(x) (idempotent fixpoint
    is not guaranteed in general, but re-encoding the decoded values must
    produce bounded drift)."""
    t = traits(dtype)
    n = t.block_elems * 16
    x = RNG.normal(0, 1, n).astype(np.float32)
    r1 = quants.quantize(x, dtype)
    y1 = quants.dequantize(r1, dtype)
    r2 = quants.quantize(y1, dtype)
    y2 = quants.dequantize(r2, dtype)
    rms = np.sqrt(np.mean((y1 - y2) ** 2)) / (np.sqrt(np.mean(y1**2)) + 1e-12)
    assert rms < RTOL[dtype]


def test_f16_f32_passthrough():
    x = RNG.normal(0, 1, 128).astype(np.float32)
    assert np.array_equal(quants.dequantize(quants.quantize(x, DataType.F32), DataType.F32), x)
    x16 = x.astype(np.float16).astype(np.float32)
    assert np.array_equal(quants.dequantize(quants.quantize(x, DataType.F16), DataType.F16), x16)


def test_zeros_all_formats():
    """All-zero payloads must encode/decode to zeros without NaNs."""
    for dtype in ALL_QUANTS:
        t = traits(dtype)
        x = np.zeros(t.block_elems * 4, np.float32)
        y = quants.dequantize(quants.quantize(x, dtype), dtype)
        np.testing.assert_array_equal(y, x)

"""Fused dequant-matmul tests (interpret mode on CPU; the same kernel
compiles on TPU).  Exactness bar: bf16 MXU rounding over exact dequantized
weights — i.e. the kernel must match x@dequant(w).T to bf16 tolerance."""

import numpy as np
import pytest
import jax.numpy as jnp

from minigpt4_tpu.formats import DataType, quants, traits
from minigpt4_tpu.ops import repack as rp
from minigpt4_tpu.ops.pallas_quant_matmul import qmatmul_repacked

RNG = np.random.default_rng(7)
BF16_TOL = 1.2e-2


def _case(dt, N, K, M):
    x = RNG.normal(0, 1, (M, K)).astype(np.float32)
    w = RNG.normal(0, 1, (N, K)).astype(np.float32)
    raw = quants.quantize(w.reshape(-1), dt)
    wd = quants.dequantize(raw, dt).reshape(N, K)
    want = x @ wd.T
    rq = rp.repack(raw, (N, K), dt)
    got = np.asarray(qmatmul_repacked(jnp.asarray(x), rq, out_dtype=jnp.float32))
    return got, want


@pytest.mark.parametrize("dt", sorted(rp.REPACKABLE))
def test_kernel_matches_dense_dequant(dt):
    got, want = _case(dt, N=256, K=512, M=3)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < BF16_TOL, f"{traits(dt).name}: rel err {err:.2e}"


def test_unaligned_n_and_m():
    # N not a multiple of the 128 tile, M > decode tile
    got, want = _case(DataType.Q4_0, N=192, K=256, M=20)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < BF16_TOL


def test_batched_lead_dims():
    dt = DataType.Q5_K
    N, K = 128, 512
    x = RNG.normal(0, 1, (2, 3, K)).astype(np.float32)
    w = RNG.normal(0, 1, (N, K)).astype(np.float32)
    raw = quants.quantize(w.reshape(-1), dt)
    wd = quants.dequantize(raw, dt).reshape(N, K)
    rq = rp.repack(raw, (N, K), dt)
    got = np.asarray(qmatmul_repacked(jnp.asarray(x), rq, out_dtype=jnp.float32))
    want = np.einsum("abk,nk->abn", x, wd)
    assert got.shape == (2, 3, N)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < BF16_TOL


def test_repack_decode_exact():
    """f32-plane repack decodes bit-identically to the reference codecs; the
    default bf16 planes decode within bf16 scale rounding (<= 2^-8 of the
    group scale — far below 4/5-bit quantization noise)."""
    for dt in sorted(rp.REPACKABLE):
        t = traits(dt)
        N, K = 8, 512
        w = RNG.normal(0, 1, (N, K)).astype(np.float32)
        raw = quants.quantize(w.reshape(-1), dt)
        want = quants.dequantize(raw, dt).reshape(N, K)
        rq32 = rp.repack(raw, (N, K), dt, plane_dtype=jnp.float32)
        got32 = np.asarray(rp.dequantize_repacked(rq32))
        np.testing.assert_array_equal(got32, want, err_msg=t.name)
        rq16 = rp.repack(raw, (N, K), dt)
        got16 = np.asarray(rp.dequantize_repacked(rq16))
        scale = np.abs(want).max() + 1e-9
        assert np.abs(got16 - want).max() / scale < 2e-2, t.name


def test_with_k_shards_decode_exact():
    """K-sharded re-layout decodes identically to the base layout (same
    values, planes contiguously shardable along K)."""
    rng = np.random.default_rng(3)  # own stream: module RNG order is load-bearing
    for dt in sorted(rp.REPACKABLE):
        N, K, S = 8, 512, 4
        w = rng.normal(0, 1, (N, K)).astype(np.float32)
        raw = quants.quantize(w.reshape(-1), dt)
        base = rp.repack(raw, (N, K), dt, plane_dtype=jnp.float32)
        shd = rp.with_k_shards(base, S)
        np.testing.assert_array_equal(
            np.asarray(rp.dequantize_repacked(shd)),
            np.asarray(rp.dequantize_repacked(base)),
            err_msg=traits(dt).name,
        )


def test_k_sharded_local_matmul():
    """Each K/S column slice of a k-sharded weight is a self-consistent
    repack: per-shard kernel calls + sum == the full matmul (the row-parallel
    shard_map contraction)."""
    import jax

    rng = np.random.default_rng(4)  # own stream: module RNG order is load-bearing
    for dt in (DataType.Q5_K, DataType.Q4_0, DataType.Q8_0):
        N, K, S = 128, 1024, 4
        ks = K // S
        x = rng.normal(0, 1, (2, K)).astype(np.float32)
        w = rng.normal(0, 1, (N, K)).astype(np.float32)
        raw = quants.quantize(w.reshape(-1), dt)
        wd = quants.dequantize(raw, dt).reshape(N, K)
        shd = rp.with_k_shards(rp.repack(raw, (N, K), dt), S)
        hi_s = shd.hi.shape[-1] // S if shd.hi is not None else 0
        g_s = shd.scales.shape[-1] // S
        parts = []
        for s in range(S):
            local = rp.RepackedQuant(
                shd.codes[:, s * ks : (s + 1) * ks],
                shd.scales[:, s * g_s : (s + 1) * g_s],
                shd.mins[:, s * g_s : (s + 1) * g_s],
                shd.hi[:, s * hi_s : (s + 1) * hi_s] if shd.hi is not None else None,
                shd.dtype, shd.n_in, shd.group_size, shd.code_bits, shd.hi_bits,
                shd.k_shards,
            )
            parts.append(np.asarray(qmatmul_repacked(
                jnp.asarray(x[:, s * ks : (s + 1) * ks]), local, out_dtype=jnp.float32
            )))
        got = np.sum(parts, axis=0)
        want = x @ wd.T
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert err < BF16_TOL * 2, f"{traits(dt).name}: rel err {err:.2e}"


def test_stacked_repacked_scan_slicing():
    """Stacked RepackedQuant (leading L axis) slices correctly per layer."""
    import jax

    dt = DataType.Q4_0
    N, K, L = 64, 256, 3
    ws, rqs = [], []
    for _ in range(L):
        w = RNG.normal(0, 1, (N, K)).astype(np.float32)
        raw = quants.quantize(w.reshape(-1), dt)
        ws.append(quants.dequantize(raw, dt).reshape(N, K))
        rqs.append(rp.repack(raw, (N, K), dt))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rqs)
    x = jnp.asarray(RNG.normal(0, 1, (1, K)).astype(np.float32))

    def body(carry, rq_l):
        y = qmatmul_repacked(x, rq_l, out_dtype=jnp.float32)
        return carry + y.sum(), None

    total, _ = jax.lax.scan(body, jnp.float32(0), stacked)
    want = sum(float((np.asarray(x) @ w.T).sum()) for w in ws)
    np.testing.assert_allclose(float(total), want, rtol=2e-2)


def test_odd_n_out():
    """Odd output dims (vicuna-v0's 32001-token vocab head) repack with a
    zero-padded codes row and compute correctly."""
    rng = np.random.default_rng(5)
    for dt in (DataType.Q4_0, DataType.Q5_K, DataType.Q8_0):
        N, K = 9, 512
        w = rng.normal(0, 1, (N, K)).astype(np.float32)
        raw = quants.quantize(w.reshape(-1), dt)
        wd = quants.dequantize(raw, dt).reshape(N, K)
        rq = rp.repack(raw, (N, K), dt, plane_dtype=jnp.float32)
        assert rq.n_out == N
        np.testing.assert_array_equal(np.asarray(rp.dequantize_repacked(rq)), wd,
                                      err_msg=traits(dt).name)
        x = rng.normal(0, 1, (2, K)).astype(np.float32)
        got = np.asarray(qmatmul_repacked(jnp.asarray(x), rq, out_dtype=jnp.float32))
        want = x @ wd.T
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert err < BF16_TOL, f"{traits(dt).name}: rel err {err:.2e}"

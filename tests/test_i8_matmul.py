"""W8A8 experimental path: i8 superblock requantization + direct-MXU kernel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minigpt4_tpu.ops.i8_matmul import (
    SB, I8SBQuant, from_ggml, qmatmul_i8sb, quantize_activations, requantize_i8sb,
)

RNG = np.random.default_rng(7)


def _ref(x, w):
    """Reproduce the kernel's math exactly in NumPy: per-row activation
    quant, per-superblock i32 chunk dots, f32 scale accumulation in chunk
    order."""
    codes, scales, n_in = np.asarray(w.codes), np.asarray(w.scales), w.n_in
    xf = np.asarray(x, np.float32)
    sx = np.abs(xf).max(axis=-1, keepdims=True) / 127.0
    sx = np.where(sx == 0, 1.0, sx)
    x_i8 = np.clip(np.rint(xf / sx), -127, 127).astype(np.int8)
    m, n = x_i8.shape[0], codes.shape[0]
    acc = np.zeros((m, n), np.float32)
    for g, c0 in enumerate(range(0, n_in, SB)):
        p = x_i8[:, c0:c0 + SB].astype(np.int32) @ codes[:, c0:c0 + SB].astype(np.int32).T
        acc = acc + p.astype(np.float32) * scales[:, g][None, :]
    return acc * sx


def test_requantize_reconstruction_error():
    n, k = 16, 512
    v = RNG.normal(0, 0.5, (n, k)).astype(np.float32)
    codes, scales = requantize_i8sb(v)
    back = codes.astype(np.float32) * np.repeat(scales, SB, axis=1)
    # symmetric i8: error bounded by half a step per element
    step = np.repeat(scales, SB, axis=1)
    assert np.all(np.abs(back - v) <= step / 2 + 1e-7)


@pytest.mark.parametrize("m", [1, 8, 33])
def test_kernel_matches_reference(m):
    n, k = 384, 512
    v = RNG.normal(0, 0.5, (n, k)).astype(np.float32)
    codes, scales = requantize_i8sb(v)
    w = I8SBQuant(jnp.asarray(codes), jnp.asarray(scales), k)
    x = RNG.normal(0, 1, (m, k)).astype(np.float32)
    got = np.asarray(qmatmul_i8sb(jnp.asarray(x), w, out_dtype=jnp.float32))
    want = _ref(x, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stacked_layer_select():
    L, n, k = 3, 256, 512
    vs = RNG.normal(0, 0.5, (L, n, k)).astype(np.float32)
    packs = [requantize_i8sb(vs[i]) for i in range(L)]
    w = I8SBQuant(
        jnp.stack([jnp.asarray(c) for c, _ in packs]),
        jnp.stack([jnp.asarray(s) for _, s in packs]),
        k,
    )
    x = RNG.normal(0, 1, (4, k)).astype(np.float32)
    for li in range(L):
        got = np.asarray(qmatmul_i8sb(jnp.asarray(x), w, out_dtype=jnp.float32,
                                      layer=li))
        want = _ref(x, I8SBQuant(w.codes[li], w.scales[li], k))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {li}")


def test_from_ggml_quality_vs_source():
    """Re-quantizing a q5_k weight to i8/256-superblock keeps the
    reconstruction within a comparable error envelope."""
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.formats.quants import dequantize_rows, quantize

    n, k = 32, 512
    v = RNG.normal(0, 0.5, (n, k)).astype(np.float32)
    raw = quantize(v.reshape(-1), DataType.Q5_K)
    q5 = np.asarray(dequantize_rows(raw, DataType.Q5_K, (n, k)), np.float32)
    w = from_ggml(raw, (n, k), DataType.Q5_K, row_block=8)
    back = np.asarray(w.dequantize())
    # error vs the q5_k values we encoded FROM (the i8 step is on top of q5)
    rms_extra = np.sqrt(np.mean((back - q5) ** 2))
    rms_q5 = np.sqrt(np.mean((q5 - v) ** 2))
    assert rms_extra < rms_q5, (rms_extra, rms_q5)


def test_k_not_multiple_falls_back():
    from minigpt4_tpu.models.params import load_quant_weight
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.formats.quants import quantize

    n, k = 8, 32  # tiny-fixture geometry: K % 256 != 0
    v = RNG.normal(0, 0.5, (n, k)).astype(np.float32)
    raw = quantize(v.reshape(-1), DataType.Q4_0)
    w = load_quant_weight(raw, (n, k), DataType.Q4_0, mode="w8a8")
    assert not isinstance(w, I8SBQuant)  # routed to the auto path


def test_engine_w8a8_end_to_end(tmp_path):
    """quant_mode='w8a8' through the full engine on tiny fixtures (all
    weights fall back below the superblock width, the mode threads through
    every loader)."""
    from fixtures import build_tiny_models
    from minigpt4_tpu.engine import MiniGPT4Engine, SamplingParams

    model, llm = build_tiny_models(tmp_path)
    eng = MiniGPT4Engine(model, llm, n_ctx=128, n_batch=16, quant_mode="w8a8")
    eng.begin_chat("hello")
    toks = list(eng.generate(limit=4, params=SamplingParams(temp=0.0)))
    assert all(isinstance(t, str) for t in toks)
    eng.close()


def test_activation_quant_roundtrip():
    x = jnp.asarray(RNG.normal(0, 3, (4, 128)).astype(np.float32))
    x_i8, sx = quantize_activations(x)
    back = np.asarray(x_i8, np.float32) * np.asarray(sx)
    assert np.abs(back - np.asarray(x)).max() <= float(np.asarray(sx).max()) / 2 + 1e-6

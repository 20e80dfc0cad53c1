"""Flash-decode attention kernel vs the einsum reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minigpt4_tpu.ops.flash_decode import flash_decode_attention

RNG = np.random.default_rng(11)


def _ref_attention(q, ks, vs, pos0, scale):
    """The models/llama.py einsum path over the full cache length."""
    b, h, s, dh = q.shape
    c = ks.shape[-2]
    key_pos = np.arange(c)
    mask = np.where(key_pos[None, :] <= (pos0 + np.arange(s))[:, None], 0.0,
                    np.finfo(np.float32).min)
    scores = np.einsum("bhsd,bhcd->bhsc", q.astype(np.float32),
                       ks.astype(np.float32)) * scale
    scores = scores + mask[None, None]
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    return np.einsum("bhsc,bhcd->bhsd", np.asarray(probs), vs.astype(np.float32))


@pytest.mark.parametrize(
    "pos0,s",
    [(0, 1), (5, 1), (100, 1), (700, 1), (37, 4),
     # wide verify blocks (speculative decoding, models/llama.py
     # FLASH_DECODE_MAX_S): intra-block causal rows, incl. S spanning a
     # BLK=128 boundary
     (64, 16), (120, 16), (250, 32), (0, 32)],
)
def test_flash_matches_einsum(pos0, s):
    b, h, c, dh = 1, 4, 1024, 128
    q = RNG.normal(0, 1, (b, h, s, dh)).astype(np.float32)
    ks = RNG.normal(0, 1, (b, h, c, dh)).astype(np.float32)
    vs = RNG.normal(0, 1, (b, h, c, dh)).astype(np.float32)
    # zero out dead cache slots like a real run would leave garbage — the
    # kernel must not read past pos0+s regardless
    ks[:, :, pos0 + s:] = 7e3
    vs[:, :, pos0 + s:] = -7e3
    scale = 1.0 / np.sqrt(dh)
    got = np.asarray(
        flash_decode_attention(
            jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs), 0,
            jnp.int32(pos0), scale,
        )
    )
    want = _ref_attention(q, ks, vs, pos0, scale)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_stacked_layer_select():
    b, h, c, dh, L = 2, 2, 512, 128, 3
    pos0, s = 60, 1
    q = RNG.normal(0, 1, (b, h, s, dh)).astype(np.float32)
    ck = RNG.normal(0, 1, (L, b, h, c, dh)).astype(np.float32)
    cv = RNG.normal(0, 1, (L, b, h, c, dh)).astype(np.float32)
    scale = 1.0 / np.sqrt(dh)
    for li in range(L):
        got = np.asarray(
            flash_decode_attention(
                jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv), li,
                jnp.int32(pos0), scale,
            )
        )
        want = _ref_attention(q, ck[li], cv[li], pos0, scale)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5, err_msg=f"layer {li}")


def test_flash_bf16_cache():
    b, h, c, dh = 1, 3, 256, 128
    pos0, s = 19, 1
    q = RNG.normal(0, 1, (b, h, s, dh)).astype(np.float32)
    ks = RNG.normal(0, 1, (b, h, c, dh)).astype(np.float32)
    vs = RNG.normal(0, 1, (b, h, c, dh)).astype(np.float32)
    kb = jnp.asarray(ks, jnp.bfloat16)
    vb = jnp.asarray(vs, jnp.bfloat16)
    scale = 1.0 / np.sqrt(dh)
    got = np.asarray(
        flash_decode_attention(jnp.asarray(q, jnp.bfloat16), kb, vb, 0,
                               jnp.int32(pos0), scale)
    )
    want = _ref_attention(
        np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32),
        np.asarray(kb, np.float32), np.asarray(vb, np.float32), pos0, scale)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_f8_cache():
    """fp8 (e4m3) cache storage decodes within fp8 rounding tolerance.

    The kernel's integer e4m3 unpack flushes subnormals (|v| < 2^-6) to
    zero — well below e4m3's own ~6% mantissa noise; the reference applies
    the same semantics."""
    b, h, c, dh = 1, 3, 256, 128
    pos0, s = 19, 1
    q = RNG.normal(0, 1, (b, h, s, dh)).astype(np.float32)
    ks = RNG.normal(0, 1, (b, h, c, dh)).astype(np.float32)
    vs = RNG.normal(0, 1, (b, h, c, dh)).astype(np.float32)
    k8 = jnp.asarray(ks).astype(jnp.float8_e4m3fn)
    v8 = jnp.asarray(vs).astype(jnp.float8_e4m3fn)
    scale = 1.0 / np.sqrt(dh)
    got = np.asarray(
        flash_decode_attention(jnp.asarray(q), k8, v8, 0, jnp.int32(pos0), scale)
    )

    def flush(a):
        a = np.asarray(a, np.float32)
        return np.where(np.abs(a) < 2.0 ** -6, 0.0, a)

    want = _ref_attention(q, flush(k8.astype(jnp.float32)),
                          flush(v8.astype(jnp.float32)), pos0, scale)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_blockwise_prefill_attention_matches_einsum():
    """The lax.scan XLA-flash prefill path (span > PREFILL_FLASH_SPAN)
    matches the one-shot einsum, including non-block-aligned spans."""
    from minigpt4_tpu.models.llama import _blockwise_attention

    for span, pos0, s in [(1280, 30, 48), (640, 0, 16), (1000, 500, 32)]:
        b, h, dh = 1, 2, 64
        q = RNG.normal(0, 1, (b, h, s, dh)).astype(np.float32)
        ks = RNG.normal(0, 1, (b, h, span, dh)).astype(np.float32)
        vs = RNG.normal(0, 1, (b, h, span, dh)).astype(np.float32)
        scale = 1.0 / np.sqrt(dh)
        got = np.asarray(_blockwise_attention(
            jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs), jnp.int32(pos0), scale
        ))
        want = _ref_attention(q, ks, vs, pos0, scale)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                   err_msg=f"span={span}")


def test_blockwise_prefill_attention_grad():
    """The scan path differentiates (the training/sharded prefill requirement
    a Pallas kernel would not meet)."""
    from minigpt4_tpu.models.llama import _blockwise_attention

    b, h, s, span, dh = 1, 1, 8, 640, 64
    q = jnp.asarray(RNG.normal(0, 1, (b, h, s, dh)).astype(np.float32))
    ks = jnp.asarray(RNG.normal(0, 1, (b, h, span, dh)).astype(np.float32))
    vs = jnp.asarray(RNG.normal(0, 1, (b, h, span, dh)).astype(np.float32))
    g = jax.grad(
        lambda kk: _blockwise_attention(q, kk, vs, jnp.int32(600), 0.125).sum()
    )(ks)
    assert np.all(np.isfinite(np.asarray(g)))

"""Sequence-parallel decode attention: blockwise flash partials merged across
a 'sp' mesh axis (the ring/SP seam of SURVEY §5) match single-device flash
and the einsum reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minigpt4_tpu.ops.flash_decode import (
    flash_decode_attention,
    sp_flash_decode_attention,
)

RNG = np.random.default_rng(21)


def test_stats_mode_consistency():
    """acc/m/l partials renormalize to the standard output."""
    b, h, c, dh, pos0, s = 1, 2, 512, 128, 200, 1
    q = jnp.asarray(RNG.normal(0, 1, (b, h, s, dh)).astype(np.float32))
    ck = jnp.asarray(RNG.normal(0, 1, (b, h, c, dh)).astype(np.float32))
    cv = jnp.asarray(RNG.normal(0, 1, (b, h, c, dh)).astype(np.float32))
    scale = 1.0 / np.sqrt(dh)
    want = np.asarray(flash_decode_attention(q, ck, cv, 0, jnp.int32(pos0), scale))
    acc, m, l = flash_decode_attention(q, ck, cv, 0, jnp.int32(pos0), scale,
                                       return_stats=True)
    got = np.asarray(acc) / np.asarray(l)[..., None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_stats_mode_empty_slice():
    """pos0 < 0 (cache slice beyond the visible range) returns zero partials."""
    b, h, c, dh = 1, 1, 256, 128
    q = jnp.ones((b, h, 1, dh), jnp.float32)
    ck = jnp.ones((b, h, c, dh), jnp.float32)
    acc, m, l = flash_decode_attention(q, ck, ck, 0, jnp.int32(-300),
                                       1.0, return_stats=True)
    assert float(np.asarray(l).max()) == 0.0
    assert float(np.abs(np.asarray(acc)).max()) == 0.0


@pytest.mark.parametrize("pos0", [0, 100, 700, 1000])
def test_sp_matches_single_device(pos0):
    """C-sharded cache over 4 'sp' devices + partial merge == single flash."""
    sp = 4
    b, h, c, dh, s = 1, 2, 1024, 128, 1
    q = RNG.normal(0, 1, (b, h, s, dh)).astype(np.float32)
    ck = RNG.normal(0, 1, (1, b, h, c, dh)).astype(np.float32)
    cv = RNG.normal(0, 1, (1, b, h, c, dh)).astype(np.float32)
    scale = 1.0 / np.sqrt(dh)
    want = np.asarray(flash_decode_attention(
        jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv), 0,
        jnp.int32(pos0), scale))

    devs = np.array(jax.devices()[:sp])
    mesh = Mesh(devs, ("sp",))
    c_local = c // sp

    def fn(q_l, ck_l, cv_l):
        idx = jax.lax.axis_index("sp")
        return sp_flash_decode_attention(
            q_l, ck_l, cv_l, 0, jnp.int32(pos0), scale, "sp", idx * c_local
        )

    sharded = jax.jit(jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(None, None, None, "sp", None), P(None, None, None, "sp", None)),
        out_specs=P(),
        check_vma=False,
    ))
    got = np.asarray(sharded(jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

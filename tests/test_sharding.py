"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded
execution must be numerically consistent with single-device execution, and
the graft dryrun must pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.engine import MiniGPT4Engine
from minigpt4_tpu.models import llama as llama_mod
from minigpt4_tpu.models import minigpt4 as vision_mod
from minigpt4_tpu.parallel import (
    apply_shardings,
    cache_sharding,
    llama_param_shardings,
    make_mesh,
    vision_param_shardings,
)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shard_models")
    return build_tiny_models(tmp)


def test_mesh_construction():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_sharded_forward_matches_single_device(models):
    model, llm = models
    eng = MiniGPT4Engine(model, llm, n_ctx=64, n_batch=32)
    tokens = jnp.asarray(np.array([[1, 7, 9, 4, 22]], np.int32))

    embeds = llama_mod.embed_tokens(eng.llm_params, tokens)
    cache = llama_mod.init_cache(eng.llm_cfg, batch=1)
    want, _ = llama_mod.forward(eng.llm_params, cache, embeds, jnp.int32(0), eng.llm_cfg, use_flash=False)
    want = np.asarray(want)

    mesh = make_mesh(dp=2, tp=4)
    with mesh:
        lparams = apply_shardings(eng.llm_params, llama_param_shardings(mesh, eng.llm_params))
        cache2 = jax.device_put(llama_mod.init_cache(eng.llm_cfg, batch=2), cache_sharding(mesh))
        tok2 = jnp.tile(tokens, (2, 1))
        emb2 = llama_mod.embed_tokens(lparams, tok2)
        got, _ = llama_mod.forward(lparams, cache2, emb2, jnp.int32(0), eng.llm_cfg, use_flash=False)
        got = np.asarray(got)
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1], want[0], rtol=2e-4, atol=2e-5)
    eng.close()


def test_sharded_vision_matches_single_device(models):
    model, llm = models
    eng = MiniGPT4Engine(model, llm, n_ctx=64, n_batch=32)
    pixels = np.random.default_rng(0).normal(0, 1, (2, 3, 28, 28)).astype(np.float32)
    want = np.asarray(vision_mod.encode_image(eng.vision_params, jnp.asarray(pixels), eng.vision_cfg))

    mesh = make_mesh(dp=2, tp=4)
    with mesh:
        vparams = apply_shardings(
            eng.vision_params, vision_param_shardings(mesh, eng.vision_params)
        )
        got = np.asarray(vision_mod.encode_image(vparams, jnp.asarray(pixels), eng.vision_cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    eng.close()


def test_graft_dryrun_multichip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    logits, cache = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_spmd_shard_map_quantized_tp(models):
    """REAL tensor parallelism for quantized weights: shard_map forward with
    column-parallel qkv/w13, K-SHARDED row-parallel wo/w2 (per-shard repack),
    and a fused sharded decode loop — parity vs single device.  Verifies the
    row layers actually carry a tp axis (VERDICT.md round-1 weak #6)."""
    from minigpt4_tpu.formats import DataType
    from minigpt4_tpu.ops.repack import RepackedQuant
    from minigpt4_tpu.parallel import make_mesh
    from minigpt4_tpu.parallel.spmd import (
        cache_specs,
        make_spmd_decode_loop,
        make_spmd_forward,
        place_llama_params,
    )
    import tempfile, pathlib

    tmp = pathlib.Path(tempfile.mkdtemp())
    qmodel, qllm = build_tiny_models(tmp, quant=DataType.Q4_0)
    eng = MiniGPT4Engine(qmodel, qllm, n_ctx=64, n_batch=32, quant_mode="repack")
    tokens = jnp.asarray(np.array([[1, 7, 9, 4, 11, 2]], np.int32))
    embeds = llama_mod.embed_tokens(eng.llm_params, tokens)
    cache = llama_mod.init_cache(eng.llm_cfg, batch=1)
    want_j, cache1 = llama_mod.forward(
        eng.llm_params, cache, embeds, jnp.int32(0), eng.llm_cfg, use_flash=False
    )
    want = np.asarray(want_j)

    mesh = make_mesh(dp=2, tp=4)
    with mesh:
        placed, specs = place_llama_params(mesh, eng.llm_params)
        # row-parallel planes REALLY sharded: w2 (K=128 = tp x group) carries
        # a tp axis via the k-sharded repack; the fixture's wo (K=32 = ONE
        # quant group) legitimately falls back to replication
        w2 = placed["layers"]["w2"]["w"]
        assert isinstance(w2, RepackedQuant) and w2.k_shards == 4
        assert "tp" in str(specs["layers"]["w2"]["w"].codes)
        assert placed["layers"]["wo"]["w"].k_shards == 1
        from jax.sharding import NamedSharding

        cache2 = jax.device_put(
            llama_mod.init_cache(eng.llm_cfg, batch=2),
            jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), cache_specs(),
                is_leaf=lambda x: not isinstance(x, dict),
            ),
        )
        emb2 = jnp.tile(embeds, (2, 1, 1))
        fwd = make_spmd_forward(mesh, eng.llm_cfg, specs, use_flash=False)
        got, cache2 = fwd(placed, cache2, emb2, jnp.int32(0))
        got = np.asarray(got)
        np.testing.assert_allclose(got[0], want[0], rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(got[1], want[0], rtol=5e-3, atol=5e-4)

        # fused sharded decode loop: greedy tokens match the single-device loop
        from minigpt4_tpu.engine.device_sampling import DeviceSamplingConfig

        scfg = DeviceSamplingConfig(temp=0.0)
        key = jax.random.PRNGKey(0)
        dl = make_spmd_decode_loop(mesh, eng.llm_cfg, specs, 4, scfg, use_flash=False)
        toks, _, cache2 = dl(
            placed, cache2, jnp.asarray(got), jnp.int32(tokens.shape[1]), key
        )
        toks = np.asarray(toks)

        want_toks, _, _ = llama_mod.decode_loop(
            eng.llm_params, cache1, want_j, jnp.int32(tokens.shape[1]), 4, key,
            scfg, eng.llm_cfg, use_flash=False,
        )
        want_toks = np.asarray(want_toks)
        np.testing.assert_array_equal(toks[0], want_toks[0])
        np.testing.assert_array_equal(toks[1], want_toks[0])
    eng.close()


def test_spmd_shard_map_i8_tp():
    """Tensor parallelism for the experimental W8A8 weights: contiguous-K
    I8SBQuant shards by plain slicing (column-parallel wqkv/w13/output,
    K-sharded row-parallel w2) — parity vs single device."""
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.models.llama import LlamaConfig
    from minigpt4_tpu.ops.i8_matmul import I8SBQuant
    from minigpt4_tpu.benchmark import synth_llama_params
    from minigpt4_tpu.parallel import make_mesh
    from minigpt4_tpu.parallel.spmd import (
        cache_specs, make_spmd_forward, place_llama_params,
    )
    from jax.sharding import NamedSharding

    cfg = LlamaConfig(n_vocab=512, n_embd=256, n_head=4, n_layer=2, n_rot=64,
                      n_ff=512, n_ctx=64)
    rng = np.random.default_rng(5)
    # f32 activation stream: sharded W8A8 is then EXACT vs single device
    # (global-absmax activation grids + f32 psum partials).  A bf16 stream
    # adds ~1-ulp compilation-reassociation noise common to all TP paths.
    params = synth_llama_params(cfg, DataType.Q5_K, rng, dtype=jnp.float32,
                                quant_mode="w8a8")
    tokens = jnp.asarray(np.array([[1, 7, 9, 4]], np.int32))
    embeds = llama_mod.embed_tokens(params, tokens)
    cache = llama_mod.init_cache(cfg, batch=1)
    want, _ = llama_mod.forward(params, cache, embeds, jnp.int32(0), cfg,
                                use_flash=False)
    want = np.asarray(want)

    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        placed, specs = place_llama_params(mesh, params)
        # w2 (K=512 = tp x 256) K-shards; wo (K=256) legitimately replicates
        assert isinstance(placed["layers"]["w2"]["w"], I8SBQuant)
        assert "tp" in str(specs["layers"]["w2"]["w"].codes)
        assert "tp" not in str(specs["layers"]["wo"]["w"].codes)
        assert "tp" in str(specs["layers"]["wqkv"]["w"].codes)
        cache2 = jax.device_put(
            llama_mod.init_cache(cfg, batch=1),
            jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), cache_specs(),
                is_leaf=lambda x: not isinstance(x, dict),
            ),
        )
        fwd = make_spmd_forward(mesh, cfg, specs, use_flash=False)
        got, _ = fwd(placed, cache2, embeds, jnp.int32(0))
        # K-sharded lanes quantize on the GLOBAL row absmax (pmax over tp in
        # _row_linear) and psum f32 partials, so sharded output matches
        # single-device to float association noise
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_sharded_repacked_forward(models):
    """tp-sharded execution with repacked quantized weights (Pallas interpret
    on CPU) matches single-device."""
    model, llm = models
    from minigpt4_tpu.formats import DataType
    import tempfile, pathlib
    tmp = pathlib.Path(tempfile.mkdtemp())
    qmodel, qllm = build_tiny_models(tmp, quant=DataType.Q4_0)
    eng = MiniGPT4Engine(qmodel, qllm, n_ctx=64, n_batch=32, quant_mode="repack")
    tokens = jnp.asarray(np.array([[1, 7, 9, 4]], np.int32))
    embeds = llama_mod.embed_tokens(eng.llm_params, tokens)
    cache = llama_mod.init_cache(eng.llm_cfg, batch=1)
    want, _ = llama_mod.forward(eng.llm_params, cache, embeds, jnp.int32(0), eng.llm_cfg, use_flash=False)
    want = np.asarray(want)

    mesh = make_mesh(dp=1, tp=4)
    with mesh:
        lparams = apply_shardings(eng.llm_params, llama_param_shardings(mesh, eng.llm_params))
        cache2 = jax.device_put(llama_mod.init_cache(eng.llm_cfg, batch=1), cache_sharding(mesh))
        emb2 = llama_mod.embed_tokens(lparams, tokens)
        got, _ = llama_mod.forward(lparams, cache2, emb2, jnp.int32(0), eng.llm_cfg, use_flash=False)
        got = np.asarray(got)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)
    eng.close()


def test_row_linear_replicated_no_double_reduce():
    """When BOTH the column-parallel producer and the row-parallel weight
    fall back to replication under shard_map, _row_linear must NOT psum
    (round-2 review: the old width-match condition multiplied the output by
    tp)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from minigpt4_tpu.models.llama import _row_linear

    k_full, n = 32, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 3, k_full)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 1, (k_full, n)).astype(np.float32))
    want = np.asarray(x @ w)

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    got = jax.jit(jax.shard_map(
        lambda xx, ww: _row_linear(xx, {"w": ww}, None, "tp", k_full),
        mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False,
    ))(x, w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # and the sharded-weight + replicated-producer case: local K slice + psum
    got2 = jax.jit(jax.shard_map(
        lambda xx, ww: _row_linear(xx, {"w": ww}, None, "tp", k_full),
        mesh=mesh, in_specs=(P(), P("tp", None)), out_specs=P(), check_vma=False,
    ))(x, w)
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-5, atol=1e-5)

"""Dynamic (traced-parameter) device sampling.

The static DeviceSamplingConfig is a compile-time argument: every distinct
(temp, top_k, top_p, tfs_z, typical_p) tuple rebuilt the fused decode loop
(minutes per webui slider tweak on remote-compile backends), and batched
serving could only group requests with identical configs.  The dynamic form
(engine/device_sampling.sample_token_dyn + lane_rows) runs the same chain
with traced scalars: ONE executable serves every configuration, and lanes
of a batched group each sample under their own parameters.

Contracts pinned here:
  * static and dynamic forms pick IDENTICAL tokens for equal params + keys;
  * one executable serves every config (no recompile per knob tuple);
  * mixed-config batched groups keep greedy lanes token-exact;
  * params-list validation on the batched surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.engine import SamplingParams
from minigpt4_tpu.engine.device_sampling import (
    DeviceSamplingConfig,
    lane_rows,
    sample_rows,
    sample_token,
    sample_token_dyn,
)
from minigpt4_tpu.engine.sessions import SessionPool

CONFIGS = [
    dict(temp=0.0),                       # greedy
    dict(temp=0.8, top_k=40, top_p=0.9),  # the default chain
    dict(temp=0.7, top_k=0, top_p=1.0),   # no truncation at all
    dict(temp=1.3, top_k=5, top_p=0.5),   # aggressive truncation
    dict(temp=0.9, top_k=0, top_p=1.0, tfs_z=0.95),
    dict(temp=0.9, top_k=0, top_p=1.0, typical_p=0.8),
    dict(temp=0.6, top_k=12, top_p=0.8, tfs_z=0.9, typical_p=0.9),
]


def _dyn_args(cfg):
    return (jnp.float32(cfg.temp), jnp.int32(cfg.top_k),
            jnp.float32(cfg.top_p), jnp.float32(cfg.tfs_z),
            jnp.float32(cfg.typical_p))


def test_dyn_matches_static_every_config():
    """Same parameters + same key => the traced chain picks the same token
    as the compile-time chain, for every stage combination."""
    rng = np.random.default_rng(0)
    dyn = jax.jit(sample_token_dyn)
    for kw in CONFIGS:
        cfg = DeviceSamplingConfig(**kw)
        logits = jnp.asarray(rng.normal(0, 3, (257,)).astype(np.float32))
        for seed in range(4):
            key = jax.random.PRNGKey(seed)
            want = int(sample_token(logits, key, cfg))
            got = int(dyn(logits, key, *_dyn_args(cfg)))
            assert got == want, (kw, seed)
    # the whole sweep compiled ONE executable — the point of the dyn form
    assert dyn._cache_size() == 1


def test_sample_rows_mixed_lanes():
    """Each lane of a batch samples under its own row: greedy and top_k=1
    lanes are exact argmax, stochastic lanes draw from their own chain."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(0, 3, (4, 127)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    rows = lane_rows([
        SamplingParams(temp=0.0),
        SamplingParams(temp=0.9, top_k=1),      # single survivor == argmax
        SamplingParams(temp=0.8, top_k=40, top_p=0.9),
        SamplingParams(temp=1.1, top_k=0, top_p=0.7),
    ])
    toks = np.asarray(jax.jit(sample_rows)(logits, keys, rows))
    am = np.asarray(jnp.argmax(logits, axis=-1))
    assert toks[0] == am[0]
    assert toks[1] == am[1]
    # stochastic lanes must match their own static-config chain
    for i in (2, 3):
        cfg = DeviceSamplingConfig(
            temp=float(rows["temp"][i]), top_k=int(rows["top_k"][i]),
            top_p=float(rows["top_p"][i]), tfs_z=float(rows["tfs_z"][i]),
            typical_p=float(rows["typical_p"][i]),
        )
        assert toks[i] == int(sample_token(logits[i], keys[i], cfg))


@pytest.fixture(scope="module")
def pool(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("dynpool"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32)
    yield p
    p.close()


def test_decode_loop_dyn_matches_static(pool):
    """The fused decode loop produces IDENTICAL token streams through the
    static-config and traced-config executables (same key, same state)."""
    fns = pool.fns
    s = pool.new_session()
    pool.begin_chat(s, "hello there")
    st = s.state
    key = jax.random.PRNGKey(42)
    p = SamplingParams(temp=0.8, top_k=40, top_p=0.9)
    cfg = DeviceSamplingConfig(temp=p.temp, top_k=p.top_k, top_p=p.top_p,
                               tfs_z=p.tfs_z, typical_p=p.typical_p)
    bucket = fns.attn_bucket(st.n_past + 8)

    def run(loop, scfg):
        cache = {kv: jnp.copy(st.cache[kv]) for kv in ("k", "v")}
        tokens, _, _ = loop(pool.engine.llm_params, cache,
                            st.logits_dev[None], jnp.int32(st.n_past),
                            key, scfg, 8, bucket)
        return np.asarray(tokens[0]).tolist()

    assert run(fns.decode_loop, cfg) == run(fns.decode_loop_dyn,
                                            lane_rows([p]))
    s.close()


def test_generate_nongreedy_one_compile_for_all_configs(pool):
    """Non-greedy single-stream generation rides the dynamic executable:
    changing sampling knobs adds ZERO new decode-loop compilations."""
    s = pool.new_session()
    pool.begin_chat(s, "compile stability")
    list(s.generate(limit=4, params=SamplingParams(temp=0.7)))
    n = pool.fns.decode_loop_dyn._cache_size()
    assert n >= 1
    for p in (SamplingParams(temp=0.9, top_k=7),
              SamplingParams(temp=1.2, top_p=0.5, tfs_z=0.9)):
        pool.begin_chat(s, "again")
        list(s.generate(limit=4, params=p))
    assert pool.fns.decode_loop_dyn._cache_size() == n
    s.close()


def test_generate_batch_mixed_configs_greedy_lane_exact(pool):
    """A mixed-config batch (per-lane params list): the greedy lane's text
    is identical to its single-session greedy generation; the stochastic
    lane streams under its own config."""
    qa, qb = "tell me a story", "hi"
    w = pool.new_session()
    pool.begin_chat(w, qa)
    want = "".join(w.generate(limit=8, params=SamplingParams(temp=0.0)))
    w.close()

    sa = pool.new_session()
    pool.begin_chat(sa, qa)
    sb = pool.new_session()
    pool.begin_chat(sb, qb)
    got = pool.generate_batch(
        [sa, sb], limit=8,
        params=[SamplingParams(temp=0.0),
                SamplingParams(temp=0.9, top_k=30, top_p=0.8)],
        decode_chunk=4,
    )
    assert got[0] == want
    assert isinstance(got[1], str)
    # sessions stay coherent for follow-up turns
    for s in (sa, sb):
        assert len(s.state.tokens) == s.n_past
        s.close()


def test_generate_batch_params_list_validation(pool):
    s = pool.new_session()
    pool.begin_chat(s, "hello")
    with pytest.raises(ValueError, match="params list"):
        pool.generate_batch([s], limit=2,
                            params=[SamplingParams(), SamplingParams()])
    with pytest.raises(ValueError, match="mirostat"):
        pool.generate_batch([s], limit=2,
                            params=[SamplingParams(mirostat=2)])
    s.close()


def test_continuous_mixed_configs_concurrent(pool):
    """The ContinuousBatcher admits mixed-config requests into ONE running
    group (no config deferral): a greedy and a stochastic request proceed
    concurrently and the greedy stream stays token-exact."""
    from minigpt4_tpu.engine.sessions import ContinuousBatcher

    qa = "tell me a story"
    w = pool.new_session()
    pool.begin_chat(w, qa)
    want = "".join(w.generate(limit=8, params=SamplingParams(temp=0.0)))
    w.close()

    cb = ContinuousBatcher(pool, max_batch=2, decode_chunk=2)
    try:
        sa = pool.new_session()
        pool.begin_chat(sa, qa)
        sb = pool.new_session()
        pool.begin_chat(sb, "hi")
        out_a = cb.submit(sa, 8, SamplingParams(temp=0.0))
        out_b = cb.submit(sb, 8, SamplingParams(temp=0.9, top_k=30))
        texts = []
        for out in (out_a, out_b):
            toks = []
            while True:
                t = out.get(timeout=120)
                if t is cb._DONE:
                    break
                if isinstance(t, Exception):
                    raise t
                toks.append(t)
            texts.append("".join(toks))
        assert texts[0] == want
        assert isinstance(texts[1], str)
        sa.close()
        sb.close()
    finally:
        cb.close()


def test_logit_bias_rows_force_token():
    """lane_rows builds a dense per-lane bias plane; greedy rows argmax the
    BIASED logits (the OpenAI logit_bias contract)."""
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(0, 3, (2, 64)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    rows = lane_rows(
        [SamplingParams(temp=0.0, logit_bias={7: 1000.0}),
         SamplingParams(temp=0.0)],  # unbiased lane rides zero rows
        n_vocab=64,
    )
    assert rows["bias"].shape == (2, 64)
    toks = np.asarray(sample_rows(logits, keys, rows))
    assert toks[0] == 7
    assert toks[1] == int(jnp.argmax(logits[1]))
    with pytest.raises(ValueError, match="n_vocab"):
        lane_rows([SamplingParams(logit_bias={1: 1.0})])

"""Paged KV cache pool (engine/paged.py + the paged flash kernel).

Contract under test: batched serving over the shared page pool is
OBSERVABLY IDENTICAL to the dense stacked-cache paths — same greedy
tokens, same session state afterwards — while lanes only hold pages for
positions they have consumed.  (The reference has no serving layer; these
paths are TPU-native capability on top of its chat semantics.)
"""

import pytest

pytestmark = pytest.mark.slow  # serving/speculation suite (see conftest)

import numpy as np
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.engine import SamplingParams
from minigpt4_tpu.engine.sessions import SessionPool

GREEDY = SamplingParams(temp=0.0)


@pytest.fixture(scope="module")
def dense_pool(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("paged_ref"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32)
    yield p
    p.close()


@pytest.fixture(scope="module")
def paged_pool(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("paged"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                    paged_pool_pages=8)
    yield p
    p.close()


def _batch_run(pool, prompts, limit, decode_chunk=4):
    sessions = []
    for q in prompts:
        s = pool.new_session()
        pool.begin_chat(s, q)
        sessions.append(s)
    out = pool.generate_batch(sessions, limit=limit, params=GREEDY,
                              decode_chunk=decode_chunk)
    states = [(s.n_past, list(s.state.tokens)) for s in sessions]
    return out, sessions, states


def test_kernel_paged_matches_dense():
    """The paged flash kernel under a shuffled page table is bit-identical
    to the dense kernel on the same logical cache."""
    import jax.numpy as jnp
    from minigpt4_tpu.ops.flash_decode import (
        flash_decode_attention, paged_flash_decode_attention)

    rng = np.random.default_rng(0)
    L, B, H, C, Dh, PAGE = 2, 3, 2, 512, 64, 128
    maxp = C // PAGE
    ck = jnp.asarray(rng.normal(size=(L, B, H, C, Dh)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(L, B, H, C, Dh)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, H, 1, Dh)), jnp.float32)
    pos0 = jnp.asarray([300, 47, 511], jnp.int32)

    n_pages = B * maxp + 2
    perm = rng.permutation(n_pages - 1)[: B * maxp]  # last page = sink
    pt = np.full((B, maxp + 1), n_pages - 1, np.int32)
    pt[:, :maxp] = perm.reshape(B, maxp)
    pk = np.zeros((L, n_pages, H, PAGE, Dh), np.float32)
    pv = np.zeros((L, n_pages, H, PAGE, Dh), np.float32)
    for b in range(B):
        for p in range(maxp):
            pk[:, pt[b, p]] = np.asarray(ck[:, b, :, p * PAGE:(p + 1) * PAGE])
            pv[:, pt[b, p]] = np.asarray(cv[:, b, :, p * PAGE:(p + 1) * PAGE])
    for li in range(L):
        want = flash_decode_attention(q, ck, cv, li, pos0, 0.125, blk=PAGE)
        got = paged_flash_decode_attention(
            q, jnp.asarray(pk), jnp.asarray(pv), li, pos0,
            jnp.asarray(pt), 0.125)
        assert float(jnp.max(jnp.abs(want - got))) == 0.0


def test_paged_batch_matches_dense(paged_pool, dense_pool):
    """Greedy batched decode over the page pool emits the same tokens and
    leaves the same session state as the dense stacked path, and every page
    returns to the free list afterwards."""
    prompts = ["one two", "three four five", "six"]
    # generation long enough that every lane crosses the 128-position page
    # edge (prompt prefill sits well under 128)
    free0 = paged_pool.paged_pool.free_pages
    got, gs, gstate = _batch_run(paged_pool, prompts, limit=12)
    want, ws, wstate = _batch_run(dense_pool, prompts, limit=12)
    assert got == want
    assert gstate == wstate
    assert paged_pool.paged_pool.free_pages == free0
    # detached sessions continue identically (the gather preserved KV)
    for g, w in zip(gs, ws):
        paged_pool.begin_chat(g, "and?")
        dense_pool.begin_chat(w, "and?")
        a = "".join(g.generate(limit=4, params=GREEDY))
        b = "".join(w.generate(limit=4, params=GREEDY))
        assert a == b
    for s in gs + ws:
        s.close()


def test_paged_page_growth_across_boundary(paged_pool, dense_pool):
    """A lane starting below one page grows page-by-page across the
    128-position edge mid-generation without recompiles or divergence."""
    prompt = "grow " * 20  # prefills to just under the 128-position edge
    free0 = paged_pool.paged_pool.free_pages
    s = paged_pool.new_session()
    paged_pool.begin_chat(s, prompt)
    assert 100 < s.n_past < 128
    got = paged_pool.generate_batch([s], limit=40, params=GREEDY,
                                    decode_chunk=8)
    assert s.n_past > 128  # crossed into a second page
    assert paged_pool.paged_pool.free_pages == free0

    w = dense_pool.new_session()
    dense_pool.begin_chat(w, prompt)
    want = dense_pool.generate_batch([w], limit=40, params=GREEDY,
                                     decode_chunk=8)
    assert got == want
    s.close()
    w.close()


def test_paged_uneven_finish(paged_pool, dense_pool):
    """A lane hitting its limit early overshoots into the trash sink while
    the other lane keeps decoding — no cross-lane corruption."""
    prompts = ["alpha beta", "gamma"]
    gs, ws = [], []
    for q in prompts:
        g = paged_pool.new_session()
        paged_pool.begin_chat(g, q)
        gs.append(g)
        w = dense_pool.new_session()
        dense_pool.begin_chat(w, q)
        ws.append(w)
    got = paged_pool.generate_batch(gs, limit=[3, 24], params=GREEDY,
                                    decode_chunk=4)
    want = dense_pool.generate_batch(ws, limit=[3, 24], params=GREEDY,
                                     decode_chunk=4)
    assert got == want
    assert [s.n_past for s in gs] == [s.n_past for s in ws]
    for s in gs + ws:
        s.close()


def test_paged_pool_exhaustion_falls_back_dense(tmp_path_factory):
    """A group the pool can't admit decodes on the dense path (same
    output), and the pool is left untouched."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("paged_tiny"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                    paged_pool_pages=1)  # one page: a 2-lane group can't fit
    try:
        prompts = ["one two", "three"]
        got, gs, _ = _batch_run(p, prompts, limit=6)
        assert p.paged_pool.free_pages == 1
        for s in gs:
            s.close()
        # same prompts through a pool-less SessionPool agree
        q = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32)
        try:
            want, wsess, _ = _batch_run(q, prompts, limit=6)
            assert got == want
            for s in wsess:
                s.close()
        finally:
            q.close()
    finally:
        p.close()


def test_paged_mid_pool_exhaustion_detaches_cleanly(tmp_path_factory):
    """Pool dries up mid-generation (growth beyond the pool): the group
    stops early, sessions detach with coherent state and can continue."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("paged_dry"))
    # 2 pages: two lanes admit at 1 page each, first growth attempt is dry
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                    paged_pool_pages=2)
    try:
        sessions = []
        for q in ("one two", "three"):
            s = p.new_session()
            p.begin_chat(s, q)
            sessions.append(s)
        out = p.generate_batch(sessions, limit=200, params=GREEDY,
                               decode_chunk=8)
        # generation stopped at the page-growth wall, not the limit
        assert all(s.n_past <= 128 for s in sessions)
        assert p.paged_pool.free_pages == 2
        for s, text in zip(sessions, out):
            assert len(text) > 0  # progress was made before the wall
            assert s.state.cache is not None
            assert len(s.state.tokens) == s.n_past
            p.begin_chat(s, "more")  # continues without error
            assert "".join(s.generate(limit=2, params=GREEDY)) is not None
            s.close()
    finally:
        p.close()


def test_pool_free_rejects_double_free():
    """free() rejects pages that are not currently allocated — a double
    free would hand one page to two lanes (silent cross-session KV
    clobbering)."""
    from minigpt4_tpu.engine.paged import PagedKVPool

    class Cfg:
        n_layer, n_head, head_dim = 1, 1, 8

    pool = PagedKVPool(Cfg, n_pages=4, capacity=256)
    pages = pool.alloc(2)
    pool.free(pages)
    with pytest.raises(ValueError, match="double free"):
        pool.free(pages)
    assert pool.free_pages == 4
    with pytest.raises(ValueError, match="double free"):
        pool.free([99])


def test_admit_failure_falls_back_dense(tmp_path_factory):
    """An exception during group admission frees the already-allocated
    pages, leaves every session on its private dense cache, and the group
    decodes dense — no lane loses its conversation."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("paged_adm"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                    paged_pool_pages=8)
    try:
        pool = p.paged_pool
        orig, calls = pool.admit, []

        def flaky(dense_cache, n_past):
            calls.append(n_past)
            if len(calls) == 2:
                raise RuntimeError("injected admit failure")
            return orig(dense_cache, n_past)

        pool.admit = flaky
        got, gs, _ = _batch_run(p, ["one two", "three"], limit=6)
        assert len(calls) == 2  # the second lane's admission failed
        assert pool.free_pages == pool.n_pages  # lane 1's pages were freed
        pool.admit = orig
        for s in gs:
            assert s.state.cache is not None  # detached dense, coherent
            s.close()
        q = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32)
        try:
            want, ws, _ = _batch_run(q, ["one two", "three"], limit=6)
            assert got == want
            for s in ws:
                s.close()
        finally:
            q.close()
    finally:
        p.close()


def test_dispatch_failure_retires_and_rebuilds_pool(tmp_path_factory):
    """A failed paged decode dispatch (donated pool arrays possibly dead)
    retires the pool instead of poisoning every later group: the failing
    group's lanes reset, and the NEXT group rebuilds a fresh pool and
    decodes paged again."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("paged_ret"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                    paged_pool_pages=8)
    try:
        old_pool = p.paged_pool
        orig = p.fns.paged_decode_loop
        p.fns.paged_decode_loop = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected device failure"))
        with pytest.raises(RuntimeError):
            _batch_run(p, ["one two", "three"], limit=6)
        assert old_pool.broken
        assert old_pool.allocated_pages == 0  # drained by the reset path
        p.fns.paged_decode_loop = orig

        got, gs, _ = _batch_run(p, ["one two", "three"], limit=6)
        assert p.paged_pool is not old_pool and not p.paged_pool.broken
        assert all(len(t) > 0 for t in got)
        for s in gs:
            s.close()
    finally:
        p.close()


def _drain(cb, out):
    toks = []
    while True:
        t = out.get(timeout=300)
        if t is cb._DONE:
            return "".join(toks)
        if isinstance(t, Exception):
            raise t
        toks.append(t)


def test_paged_continuous_matches_dense(paged_pool, dense_pool):
    """The ContinuousBatcher in paged mode (lanes = pool pages, no stacked
    cache preallocated) emits the same greedy tokens as dense continuous
    batching."""
    from minigpt4_tpu.engine.sessions import ContinuousBatcher

    def run(pool):
        sessions = []
        for q in ("one two", "three four"):
            s = pool.new_session()
            pool.begin_chat(s, q)
            sessions.append(s)
        cb = ContinuousBatcher(pool, max_batch=4, decode_chunk=4)
        try:
            outs = [cb.submit(s, 8, GREEDY) for s in sessions]
            texts = [_drain(cb, o) for o in outs]
        finally:
            cb.close()
        states = [(s.n_past, s.state.cache is not None) for s in sessions]
        for s in sessions:
            s.close()
        return texts, states, cb

    got, gstates, cb_p = run(paged_pool)
    assert cb_p.paged and cb_p._cache is None
    assert paged_pool.paged_pool.free_pages == paged_pool.paged_pool.n_pages
    want, wstates, cb_d = run(dense_pool)
    assert not cb_d.paged
    assert got == want
    assert [st[1] for st in gstates] == [True, True]  # dense caches restored
    assert [st[0] for st in gstates] == [st[0] for st in wstates]


def test_paged_continuous_preemption_resumes(tmp_path_factory):
    """Two long generations on a pool too small for both: the youngest lane
    is preempted when the pool runs dry and RESUMES once pages free — both
    clients still receive their complete streams (same tokens as a roomy
    pool)."""
    from minigpt4_tpu.engine.sessions import ContinuousBatcher

    model, llm = build_tiny_models(tmp_path_factory.mktemp("paged_pre"))
    prompts = ("one two", "three four")
    limit = 140  # crosses the 128-position page boundary mid-generation

    def run(n_pages):
        p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                        paged_pool_pages=n_pages)
        try:
            sessions = []
            for q in prompts:
                s = p.new_session()
                p.begin_chat(s, q)
                sessions.append(s)
            cb = ContinuousBatcher(p, max_batch=4, decode_chunk=8)
            try:
                outs = [cb.submit(s, limit, GREEDY) for s in sessions]
                texts = [_drain(cb, o) for o in outs]
                n_pre = cb.preemptions
            finally:
                cb.close()
            for s in sessions:
                s.close()
            assert p.paged_pool.free_pages == p.paged_pool.n_pages
            return texts, n_pre
        finally:
            p.close()

    want, pre_roomy = run(8)   # 8 pages: both lanes fit, no preemption
    assert pre_roomy == 0
    got, pre_tight = run(3)    # 3 pages: second lane preempts at the wall
    assert pre_tight >= 1
    assert got == want


def test_parked_sessions_admit_from_host(paged_pool, dense_pool):
    """Parked sessions join paged groups by scattering their host-trimmed
    pages directly — ensure_device (full-geometry re-upload) is never
    called — with output identical to a never-parked dense run."""
    from minigpt4_tpu.engine.sessions import ContinuousBatcher

    want, ws, _ = _batch_run(dense_pool, ["one two"], limit=6)
    for s in ws:
        s.close()

    calls = []

    def run_parked(use_cb):
        s = paged_pool.new_session()
        paged_pool.begin_chat(s, "one two")
        s.park()
        st = s.state
        orig = type(st).ensure_device

        def counting(self):
            if self is st:
                calls.append(1)
            return orig(self)

        type(st).ensure_device = counting
        try:
            if use_cb:
                cb = ContinuousBatcher(paged_pool, max_batch=2, decode_chunk=4)
                try:
                    text = _drain(cb, cb.submit(s, 6, GREEDY))
                finally:
                    cb.close()
            else:
                text = paged_pool.generate_batch([s], limit=6, params=GREEDY,
                                                 decode_chunk=4)[0]
        finally:
            type(st).ensure_device = orig
        assert st.parked is None and st.cache is not None
        s.close()
        return text

    assert run_parked(use_cb=False) == want[0]
    assert run_parked(use_cb=True) == want[0]
    assert calls == []  # the host fast path never touched ensure_device


def test_paged_continuous_mixed_configs_batch_together(paged_pool):
    """Per-lane sampling configs (device_sampling.lane_rows) share one
    paged dispatch: a greedy and a stochastic request run concurrently —
    neither waits for a config-matched group — and both complete with
    coherent sessions."""
    from minigpt4_tpu.engine.sessions import ContinuousBatcher

    cb = ContinuousBatcher(paged_pool, max_batch=2, decode_chunk=4)
    try:
        subs = []
        for q, p in (("one two", GREEDY), ("three", SamplingParams(temp=0.7))):
            s = paged_pool.new_session()
            paged_pool.begin_chat(s, q)
            subs.append((s, cb.submit(s, 6, p)))
        texts = [_drain(cb, out) for _, out in subs]
        assert all(isinstance(t, str) for t in texts)
        for s, _ in subs:
            assert len(s.state.tokens) == s.n_past
            s.close()
        pool = paged_pool.paged_pool
        assert pool.free_pages == pool.n_pages  # nothing leaked
    finally:
        cb.close()


def test_continuous_admission_failure_frees_pages(paged_pool):
    """A failure AFTER pool admission but before lane activation (the
    logits/hist join) must free the lane's pages — an unactivated slot is
    never evicted, so a leak here shrinks the pool for the process
    lifetime."""
    from minigpt4_tpu.engine.sessions import ContinuousBatcher

    s = paged_pool.new_session()
    paged_pool.begin_chat(s, "one two")
    cb = ContinuousBatcher(paged_pool, max_batch=2, decode_chunk=4)
    try:
        orig = cb._join_lh
        cb._join_lh = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected join failure"))
        out = cb.submit(s, 4, GREEDY)
        first = out.get(timeout=120)
        assert isinstance(first, RuntimeError)  # error forwarded to client
        assert out.get(timeout=120) is cb._DONE
        pool = paged_pool.paged_pool
        assert pool.free_pages == pool.n_pages  # nothing leaked
        assert s.state.cache is not None  # session untouched, can retry
        cb._join_lh = orig
        text = _drain(cb, cb.submit(s, 4, GREEDY))
        assert len(text) > 0
    finally:
        cb.close()
    s.close()


# ---------------------------------------------------------------------------
# Speculative decoding over the page pool: verify spans (S = k_spec) may
# cross a 128-position page edge; llama._layer splits them into two blended
# window writes.  Contract: paged speculative output is token-identical to
# the dense speculative path (which is itself token-identical to plain
# greedy — test_speculative.py).
# ---------------------------------------------------------------------------

def _tiny_cfg():
    from minigpt4_tpu.models.llama import LlamaConfig

    return LlamaConfig(n_vocab=96, n_embd=64, n_head=2, n_layer=2, n_rot=32,
                       n_ff=128, n_ctx=256)


def _tiny_params(cfg, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    d, ff, v, L = cfg.n_embd, cfg.n_ff, cfg.n_vocab, cfg.n_layer

    def lin(k, n):
        return {"w": jnp.asarray(rng.normal(0, 0.08, (L, k, n)), jnp.float32)}

    return {
        "tok_embeddings": jnp.asarray(rng.normal(0, 0.5, (v, d)), jnp.float32),
        "norm": jnp.ones((d,), jnp.float32),
        "output": {"w": jnp.asarray(rng.normal(0, 0.3, (d, v)), jnp.float32)},
        "layers": {
            "attention_norm": jnp.ones((L, d), jnp.float32),
            "ffn_norm": jnp.ones((L, d), jnp.float32),
            "wq": lin(d, d), "wk": lin(d, d), "wv": lin(d, d),
            "wo": lin(d, d), "w1": lin(d, ff), "w2": lin(ff, d),
            "w3": lin(d, ff),
        },
    }


@pytest.mark.parametrize("pos", [32, 119, 123, 127])
def test_paged_span_write_page_edge(pos):
    """A multi-token (verify-span) paged write lands identically to the
    dense cache write — including spans that straddle the 128-position page
    edge (pos 123/127 with s=9), end exactly at it (119), or sit inside one
    page (32)."""
    import jax.numpy as jnp
    from minigpt4_tpu.engine.paged import PAGE, PagedKVPool
    from minigpt4_tpu.models import llama as llama_mod

    cfg = _tiny_cfg()
    params = _tiny_params(cfg)
    s = 9
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.n_vocab, pos).astype(np.int32)
    span_toks = rng.integers(0, cfg.n_vocab, s).astype(np.int32)

    # dense reference: prefill then the span
    cache = llama_mod.init_cache(cfg)
    emb = llama_mod.embed_tokens(params, jnp.asarray(prompt)[None])
    _, cache = llama_mod.forward(params, cache, emb, jnp.int32(0), cfg)
    emb_s = llama_mod.embed_tokens(params, jnp.asarray(span_toks)[None])
    want_logits, cache = llama_mod.forward(
        params, cache, emb_s, jnp.asarray([pos], jnp.int32), cfg,
        all_logits=True)

    # paged: admit the prefilled cache into pool pages, run the same span
    cache2 = llama_mod.init_cache(cfg)
    _, cache2 = llama_mod.forward(params, cache2, emb, jnp.int32(0), cfg)
    pool = PagedKVPool(cfg, n_pages=4, capacity=cfg.n_ctx, dtype=jnp.float32)
    pages = pool.extend(pool.admit(cache2, pos), pos + s)
    pt = jnp.asarray(pool.table_row(pages))[None]
    got_logits, poolkv = llama_mod.forward(
        params, {"k": pool.k, "v": pool.v}, emb_s,
        jnp.asarray([pos], jnp.int32), cfg, all_logits=True,
        page_table=pt)
    pool.k, pool.v = poolkv["k"], poolkv["v"]

    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(want_logits),
                               rtol=2e-4, atol=2e-4)
    dense_back = pool.evict(pages, cfg.n_ctx)
    for kv in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(dense_back[kv][:, :, :, : pos + s]),
            np.asarray(cache[kv][:, :, :, : pos + s]), rtol=2e-4, atol=2e-4)


def test_paged_spec_loop_matches_dense():
    """speculative_decode_loop over page pools == the dense loop: same
    tokens, counts, and final logits, with lane cursors chosen so verify
    spans cross page edges mid-run."""
    import jax.numpy as jnp
    from minigpt4_tpu.engine.paged import PagedKVPool
    from minigpt4_tpu.models import llama as llama_mod

    cfg = _tiny_cfg()
    params = _tiny_params(cfg)
    rng = np.random.default_rng(2)
    k_spec, n_passes = 4, 6  # up to 24 positions: crosses edges from 110+
    prompts = [
        rng.integers(0, cfg.n_vocab, 118).astype(np.int32),
        rng.integers(0, cfg.n_vocab, 97).astype(np.int32),
    ]
    b = len(prompts)

    def prefill_lane(p):
        cache = llama_mod.init_cache(cfg)
        emb = llama_mod.embed_tokens(params, jnp.asarray(p)[None])
        logits, cache = llama_mod.forward(params, cache, emb, jnp.int32(0), cfg)
        return logits, cache

    lanes = [prefill_lane(p) for p in prompts]
    logits0 = jnp.concatenate([l for l, _ in lanes])
    pos0 = jnp.asarray([len(p) for p in prompts], jnp.int32)
    hist_np = np.full((b, cfg.n_ctx), -1, np.int32)
    for i, p in enumerate(prompts):
        hist_np[i, : len(p)] = p
    hist = jnp.asarray(hist_np)

    dense = {
        kv: jnp.concatenate([c[kv] for _, c in lanes], axis=1)
        for kv in ("k", "v")
    }
    want_t, want_c, want_l, _, want_h = llama_mod.speculative_decode_loop(
        params, dense, logits0, pos0, hist, n_passes, k_spec, cfg)

    pool = PagedKVPool(cfg, n_pages=6, capacity=cfg.n_ctx, dtype=jnp.float32)
    span = n_passes * k_spec
    lane_pages = []
    for i, (_, c) in enumerate(lanes):
        pages = pool.admit(c, len(prompts[i]))
        lane_pages.append(pool.extend(pages, len(prompts[i]) + span))
    pt = jnp.asarray(np.stack([pool.table_row(p) for p in lane_pages]))
    got_t, got_c, got_l, poolkv, got_h = llama_mod.speculative_decode_loop(
        params, {"k": pool.k, "v": pool.v}, logits0, pos0, hist,
        n_passes, k_spec, cfg, page_table=pt)
    pool.k, pool.v = poolkv["k"], poolkv["v"]

    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def spec_paged_pool(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("spec_paged"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                    paged_pool_pages=8, speculative_k=4)
    yield p
    p.close()


@pytest.fixture(scope="module")
def spec_dense_pool(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("spec_dense"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                    speculative_k=4)
    yield p
    p.close()


def test_paged_spec_batch_matches_dense(spec_paged_pool, spec_dense_pool):
    """Greedy batched generation under a speculative engine rides the page
    pool (no dense fallback) and emits exactly the dense spec path's
    tokens; all pages return to the free list."""
    prompts = ["one two one two one", "three four three four"]
    free0 = spec_paged_pool.paged_pool.free_pages
    got, gs, gstate = _batch_run(spec_paged_pool, prompts, limit=20,
                                 decode_chunk=8)
    want, ws, wstate = _batch_run(spec_dense_pool, prompts, limit=20,
                                  decode_chunk=8)
    assert got == want
    assert gstate == wstate
    assert spec_paged_pool.paged_pool.free_pages == free0
    # follow-up turns continue identically (gather preserved the KV the
    # accepted spans wrote, including any page-edge crossings)
    for g, w in zip(gs, ws):
        spec_paged_pool.begin_chat(g, "more?")
        spec_dense_pool.begin_chat(w, "more?")
        a = "".join(g.generate(limit=6, params=GREEDY))
        b = "".join(w.generate(limit=6, params=GREEDY))
        assert a == b
    for s in gs + ws:
        s.close()


def test_paged_spec_crosses_page_edge(spec_paged_pool, spec_dense_pool):
    """A lane prefilled to just under the page edge speculates across it:
    verify spans straddle the 128-position boundary and the output still
    matches dense speculation."""
    prompt = "grow " * 20  # ~120 positions: first spec span crosses
    g = spec_paged_pool.new_session()
    spec_paged_pool.begin_chat(g, prompt)
    assert 100 < g.n_past < 128
    got = spec_paged_pool.generate_batch([g], limit=40, params=GREEDY,
                                         decode_chunk=8)
    assert g.n_past > 128
    w = spec_dense_pool.new_session()
    spec_dense_pool.begin_chat(w, prompt)
    want = spec_dense_pool.generate_batch([w], limit=40, params=GREEDY,
                                          decode_chunk=8)
    assert got == want
    g.close()
    w.close()


def test_paged_spec_continuous_matches_dense(spec_paged_pool, spec_dense_pool):
    """The ContinuousBatcher keeps speculation under paging (spec engines
    no longer force dense mode) and emits the dense batcher's tokens."""
    from minigpt4_tpu.engine.sessions import ContinuousBatcher

    def run(pool):
        sessions = []
        for q in ("one two one two", "three four three"):
            s = pool.new_session()
            pool.begin_chat(s, q)
            sessions.append(s)
        cb = ContinuousBatcher(pool, max_batch=4, decode_chunk=4)
        try:
            outs = [cb.submit(s, 10, GREEDY) for s in sessions]
            texts = [_drain(cb, o) for o in outs]
        finally:
            cb.close()
        for s in sessions:
            s.close()
        return texts, cb

    got, cb_p = run(spec_paged_pool)
    assert cb_p.paged
    assert spec_paged_pool.paged_pool.free_pages == \
        spec_paged_pool.paged_pool.n_pages
    want, cb_d = run(spec_dense_pool)
    assert not cb_d.paged
    assert got == want

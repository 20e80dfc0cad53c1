"""Concurrent-session serving tests."""

import pytest

pytestmark = pytest.mark.slow  # serving/speculation suite (see conftest)

import threading

import numpy as np
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.engine import SamplingParams
from minigpt4_tpu.engine.sessions import SessionPool


@pytest.fixture(scope="module")
def pool(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("pool"))
    p = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32)
    yield p
    p.close()


def _img(seed):
    return np.random.default_rng(seed).normal(0, 1, (3, 28, 28)).astype(np.float32)


def test_sessions_are_independent(pool):
    a = pool.new_session()
    b = pool.new_session()
    a.upload_image(_img(1))
    b.upload_image(_img(2))
    a.ask("what?")
    b.ask("what?")
    ta = list(a.generate(limit=5, params=SamplingParams(temp=0.0)))
    tb = list(b.generate(limit=5, params=SamplingParams(temp=0.0)))
    # different images -> independent state; cursors track separately
    assert a.n_past > 0 and b.n_past > 0
    a.close()
    b.close()


def test_session_matches_single_engine_greedy(pool, tmp_path_factory):
    """A pooled session produces the same greedy tokens as a standalone
    engine given the same flow."""
    from minigpt4_tpu.engine import MiniGPT4Engine

    s = pool.new_session()
    pool.system_prompt(s)
    pool.begin_chat(s, "hello")
    pooled = list(s.generate(limit=6, params=SamplingParams(temp=0.0)))
    s.close()

    model, llm = build_tiny_models(tmp_path_factory.mktemp("single"))
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
    eng.system_prompt()
    eng.begin_chat("hello")
    single = list(eng.generate(limit=6, params=SamplingParams(temp=0.0), decode_chunk=1))
    eng.close()
    assert pooled == single


def test_concurrent_generation_threads(pool):
    """Sessions driven from separate threads interleave safely."""
    results = {}

    def run(name, seed):
        s = pool.new_session()
        s.upload_image(_img(seed))
        s.ask("describe")
        results[name] = list(s.generate(limit=6, params=SamplingParams(temp=0.0)))
        s.close()

    threads = [threading.Thread(target=run, args=(f"t{i}", i)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 3
    for toks in results.values():
        assert all(isinstance(t, str) for t in toks)


def test_sessions_share_compilations(pool):
    """Sessions with different prompt lengths reuse the pool's bucketed
    compilations: feeding a new length inside an already-compiled bucket
    adds ZERO new executables (VERDICT.md round-1 weak #7)."""
    a = pool.new_session()
    pool._add_strings(a, "one two three")  # some bucket
    b = pool.new_session()
    pool._add_strings(b, "four five six seven eight nine")  # larger bucket
    fns = pool.fns
    sizes = (fns.forward._cache_size(), fns.decode_step._cache_size())
    c = pool.new_session()
    pool._add_strings(c, "ten eleven")  # same buckets as above
    pool._add_strings(c, "twelve thirteen fourteen fifteen sixteen")
    assert (fns.forward._cache_size(), fns.decode_step._cache_size()) == sizes
    for s in (a, b, c):
        s.close()


def test_session_context_overflow(pool):
    s = pool.new_session()
    with pytest.raises(ValueError, match="overflow"):
        for _ in range(40):
            pool._add_strings(s, "a b c d e f g h")
    s.close()


def test_generate_batch_matches_individual(pool):
    """Batched multi-session decode (stacked caches, per-batch cursors)
    produces the same greedy text as per-session generation — even with
    DIFFERENT prompt lengths/cursors per session."""
    prompts = ["hello", "tell me a much longer story about llamas", "hi"]

    want = []
    for q in prompts:
        s = pool.new_session()
        pool.system_prompt(s)
        pool.begin_chat(s, q)
        want.append("".join(s.generate(limit=8, params=SamplingParams(temp=0.0))))
        s.close()

    batch = []
    for q in prompts:
        s = pool.new_session()
        pool.system_prompt(s)
        pool.begin_chat(s, q)
        batch.append(s)
    got = pool.generate_batch(batch, limit=8, params=SamplingParams(temp=0.0),
                              decode_chunk=4)
    assert got == want
    # session state stays usable after the batch: a follow-up turn works
    pool.begin_chat(batch[0], "and then?")
    more = list(batch[0].generate(limit=3, params=SamplingParams(temp=0.0)))
    assert all(isinstance(t, str) for t in more)
    for s in batch:
        s.close()


def test_generate_batch_speculative_matches_plain(pool, tmp_path_factory):
    """Batched SPECULATIVE decode (per-lane n-gram drafts, variable per-lane
    cursor advance) emits the same greedy text as the plain batched path,
    and sessions remain usable afterwards."""
    prompts = ["hello", "tell me a story about llamas please", "hi"]

    want = []
    for q in prompts:
        s = pool.new_session()
        pool.system_prompt(s)
        pool.begin_chat(s, q)
        want.append("".join(s.generate(limit=8, params=SamplingParams(temp=0.0))))
        s.close()

    model, llm = build_tiny_models(tmp_path_factory.mktemp("specpool"))
    sp = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                     speculative_k=4)
    try:
        batch = []
        for q in prompts:
            s = sp.new_session()
            sp.system_prompt(s)
            sp.begin_chat(s, q)
            batch.append(s)
        got = sp.generate_batch(batch, limit=8, params=SamplingParams(temp=0.0),
                                decode_chunk=8)
        assert got == want
        # rollback left a coherent cursor/history: a follow-up turn works
        sp.begin_chat(batch[0], "and?")
        more = list(batch[0].generate(limit=3, params=SamplingParams(temp=0.0)))
        assert all(isinstance(t, str) for t in more)
        # non-greedy sampling falls back to the plain batched path
        # (rolled-back lanes need a fresh prompt before another batch)
        for s in batch:
            sp.begin_chat(s, "more?")
        got_t = sp.generate_batch(batch, limit=2, params=SamplingParams(temp=0.7),
                                  decode_chunk=2)
        assert len(got_t) == len(batch)
        for s in batch:
            s.close()
    finally:
        sp.close()


class TestContinuousBatching:
    def _prep(self, pool, q):
        s = pool.new_session()
        pool.system_prompt(s)
        pool.begin_chat(s, q)
        return s

    def _drain(self, cb, out, timeout=120):
        toks = []
        while True:
            t = out.get(timeout=timeout)
            if t is cb._DONE:
                return toks
            if isinstance(t, Exception):
                raise t
            toks.append(t)

    def test_mid_flight_join_matches_plain(self, pool):
        """A request that joins a RUNNING batched decode gets the same
        greedy text as per-session generation, and the earlier request is
        unaffected."""
        from minigpt4_tpu.engine.sessions import ContinuousBatcher

        greedy = SamplingParams(temp=0.0)
        qa, qb = "tell me a long story about llamas", "hi"
        want = []
        for q in (qa, qb):
            s = self._prep(pool, q)
            want.append("".join(s.generate(limit=10, params=greedy)))
            s.close()

        cb = ContinuousBatcher(pool, max_batch=2, decode_chunk=2)
        try:
            sa = self._prep(pool, qa)
            sb = self._prep(pool, qb)
            out_a = cb.submit(sa, 10, greedy)
            first = out_a.get(timeout=120)  # decode is in flight now
            assert isinstance(first, str)
            out_b = cb.submit(sb, 10, greedy)  # joins mid-generation
            got_b = "".join(self._drain(cb, out_b))
            got_a = first + "".join(self._drain(cb, out_a))
            assert got_a == want[0]
            assert got_b == want[1]
            # detached sessions stay usable (follow-up turn)
            pool.begin_chat(sa, "and?")
            more = list(sa.generate(limit=3, params=greedy))
            assert all(isinstance(t, str) for t in more)
            sa.close()
            sb.close()
        finally:
            cb.close()

    def test_overcapacity_and_mixed_configs_defer(self, pool):
        """A third request beyond max_batch=2 and a different sampling
        config both wait their turn and still complete."""
        from minigpt4_tpu.engine.sessions import ContinuousBatcher

        greedy = SamplingParams(temp=0.0)
        warm = SamplingParams(temp=0.8, top_k=20)
        cb = ContinuousBatcher(pool, max_batch=2, decode_chunk=2)
        try:
            subs = []
            for q, p in (("one", greedy), ("two", greedy), ("three", greedy),
                         ("four", warm)):
                s = self._prep(pool, q)
                subs.append((s, cb.submit(s, 6, p)))
            texts = ["".join(self._drain(cb, out)) for _, out in subs]
            assert all(isinstance(t, str) for t in texts)
            for s, _ in subs:
                s.close()
        finally:
            cb.close()

    def test_near_context_end_lane_decodes_plain_tail(self, tmp_path_factory):
        """A session too close to the context end for a speculative span is
        still served (the step demotes to plain chunks) and stops cleanly at
        the context boundary instead of being excluded or group-stopped."""
        from minigpt4_tpu.engine.sessions import ContinuousBatcher

        model, llm = build_tiny_models(tmp_path_factory.mktemp("tailpool"))
        sp = SessionPool(model, llm, session_ctx=64, n_ctx=64, n_batch=16,
                         speculative_k=8)
        greedy = SamplingParams(temp=0.0)
        cb = ContinuousBatcher(sp, max_batch=2, decode_chunk=4)
        try:
            s = sp.new_session()
            # land the cursor close to the 64-token context end: too tight
            # for a 2-pass k=8 spec span (16), enough for a plain chunk (4)
            sp.begin_chat(s, "hi")
            while 64 - s.n_past >= 16:
                sp._add_strings(s, "a")
            room = 64 - s.n_past
            assert 4 <= room < 2 * 8, f"fixture drift: room={room}"
            toks = self._drain(cb, cb.submit(s, 64, greedy))
            # decoded a plain tail (or stopped at the boundary) — no hang,
            # no empty rejection while a plain chunk still fit
            assert s.n_past <= 64
            assert len(s.state.tokens) == s.n_past
            assert all(isinstance(t, str) for t in toks)
            s.close()
        finally:
            cb.close()
            sp.close()

    def test_bad_request_does_not_kill_worker(self, pool):
        """An unprepared session gets an error on ITS queue; the worker
        survives and serves the next request (an exception escaping the
        admission path would hang every client forever)."""
        from minigpt4_tpu.engine.sessions import ContinuousBatcher

        greedy = SamplingParams(temp=0.0)
        cb = ContinuousBatcher(pool, max_batch=2, decode_chunk=2)
        try:
            bad = pool.new_session()  # no prompt prepared
            out = cb.submit(bad, 4, greedy)
            err = out.get(timeout=60)
            assert isinstance(err, ValueError)
            assert out.get(timeout=60) is cb._DONE
            bad.close()

            good = self._prep(pool, "hello")
            toks = self._drain(cb, cb.submit(good, 4, greedy))
            assert toks and all(isinstance(t, str) for t in toks)
            good.close()
        finally:
            cb.close()

    def test_close_releases_waiting_clients(self, pool):
        """close() terminates every stream (active or queued) with _DONE and
        rejects later submits — no client blocks on a dead queue."""
        from minigpt4_tpu.engine.sessions import ContinuousBatcher

        greedy = SamplingParams(temp=0.0)
        cb = ContinuousBatcher(pool, max_batch=1, decode_chunk=2)
        s1 = self._prep(pool, "one")
        s2 = self._prep(pool, "two")
        out1 = cb.submit(s1, 500, greedy)  # long generation occupies the lane
        out1.get(timeout=120)  # in flight
        out2 = cb.submit(s2, 4, greedy)  # waits for the slot
        cb.close()
        # both streams terminate (tokens and/or _DONE, no hang)
        for out in (out1, out2):
            while True:
                t = out.get(timeout=60)
                if t is cb._DONE:
                    break
                assert isinstance(t, str)
        # sessions are coherent after shutdown detach
        assert len(s1.state.tokens) == s1.n_past
        assert len(s2.state.tokens) == s2.n_past
        late = cb.submit(s1, 2, greedy)
        assert isinstance(late.get(timeout=10), RuntimeError)
        s1.close()
        s2.close()

    def test_speculative_continuous_matches_plain(self, pool, tmp_path_factory):
        """Continuous batching with speculative decoding stays greedy-exact."""
        from minigpt4_tpu.engine.sessions import ContinuousBatcher

        greedy = SamplingParams(temp=0.0)
        q = "tell me a story about llamas please"
        s = self._prep(pool, q)
        want = "".join(s.generate(limit=10, params=greedy))
        s.close()

        model, llm = build_tiny_models(tmp_path_factory.mktemp("cspec"))
        sp = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                         speculative_k=4)
        cb = ContinuousBatcher(sp, max_batch=2, decode_chunk=4)
        try:
            s = sp.new_session()
            sp.system_prompt(s)
            sp.begin_chat(s, q)
            got = "".join(self._drain(cb, cb.submit(s, 10, greedy)))
            assert got == want
            s.close()
        finally:
            cb.close()
            sp.close()


def test_generate_batch_per_session_limits(pool):
    """Per-session limits in one batch: the low-limit session stops at ITS
    limit (state not polluted by hidden overshoot), the other continues."""
    a = pool.new_session()
    pool.begin_chat(a, "one")
    b = pool.new_session()
    pool.begin_chat(b, "two")

    got = pool.generate_batch([a, b], limit=[2, 8],
                              params=SamplingParams(temp=0.0), decode_chunk=4)

    # references decoded individually
    wa = pool.new_session(); pool.begin_chat(wa, "one")
    wb = pool.new_session(); pool.begin_chat(wb, "two")
    want_a = "".join(wa.generate(limit=2, params=SamplingParams(temp=0.0)))
    want_b = "".join(wb.generate(limit=8, params=SamplingParams(temp=0.0)))
    assert got == [want_a, want_b]
    # cursors match the individually-decoded sessions (no hidden overshoot)
    assert a.n_past == wa.n_past and b.n_past == wb.n_past
    for s in (a, b, wa, wb):
        s.close()


def test_generate_batch_context_end_safety(pool):
    """A session without room for a decode chunk yields an empty stream and
    its LIVE state is untouched; an active session exhausting its context
    stops the group with correct state (no cache corruption)."""
    near = pool.new_session()
    pool.begin_chat(near, "fill")
    # artificially move the cursor near the context end
    near.state.n_past = pool.fns.cfg.n_ctx - 3

    fresh = pool.new_session()
    pool.begin_chat(fresh, "hello")
    want = "".join(fresh.generate(limit=6, params=SamplingParams(temp=0.0)))
    # regenerate the same prompt on another fresh session inside a batch with
    # the near-full one
    fresh2 = pool.new_session()
    pool.begin_chat(fresh2, "hello")
    got = pool.generate_batch([near, fresh2], limit=6,
                              params=SamplingParams(temp=0.0), decode_chunk=4)
    assert got[0] == ""  # no room: excluded, empty output
    assert near.n_past == pool.fns.cfg.n_ctx - 3  # state untouched
    assert got[1] == want
    for s in (near, fresh, fresh2):
        s.close()

def test_batch_releases_private_caches_while_riding(pool):
    """While sessions ride a batched decode, their private KV caches are
    released (the group cache is the only copy — per-lane HBM stays 1x
    cache instead of 2x at 13B scale), and detach hands back a live slice."""
    a = pool.new_session()
    pool.begin_chat(a, "one")
    b = pool.new_session()
    pool.begin_chat(b, "two")

    stream = pool.generate_batch_stream(
        [a, b], limit=6, params=SamplingParams(temp=0.0), decode_chunk=2
    )
    next(stream)  # the group is built on first advance
    assert a.state.cache is None and b.state.cache is None
    for _ in stream:
        pass
    # detach restored per-session slices; a follow-up turn works
    assert a.state.cache is not None and b.state.cache is not None
    pool.begin_chat(a, "and?")
    more = list(a.generate(limit=2, params=SamplingParams(temp=0.0)))
    assert all(isinstance(t, str) for t in more)
    for s in (a, b):
        s.close()


def test_batch_early_close_restores_caches(pool):
    """Closing the batched stream generator early still detaches every lane:
    caches come back (released at entry) and cursors roll back coherently."""
    a = pool.new_session()
    pool.begin_chat(a, "alpha")
    ends_before = a.n_past
    stream = pool.generate_batch_stream(
        [a], limit=8, params=SamplingParams(temp=0.0), decode_chunk=2
    )
    next(stream)
    assert a.state.cache is None
    stream.close()  # generator finalizer -> detach
    assert a.state.cache is not None
    assert a.n_past >= ends_before and len(a.state.tokens) == a.n_past
    a.close()

def test_park_unpark_preserves_greedy_continuation(pool):
    """Parking a session between turns (KV cache trimmed to the consumed
    prefix, moved to host RAM) must not change anything observable: the
    next turn's greedy tokens match an identical never-parked session."""
    a = pool.new_session()
    pool.system_prompt(a)
    pool.begin_chat(a, "hello")
    first_a = "".join(a.generate(limit=4, params=SamplingParams(temp=0.0)))
    a.park()
    assert a.state.cache is None and a.state.parked is not None
    # parked second turn (transparent unpark inside ask/generate)
    pool.begin_chat(a, "and then?")
    got = "".join(a.generate(limit=4, params=SamplingParams(temp=0.0)))
    assert a.state.cache is not None and a.state.parked is None

    b = pool.new_session()
    pool.system_prompt(b)
    pool.begin_chat(b, "hello")
    first_b = "".join(b.generate(limit=4, params=SamplingParams(temp=0.0)))
    pool.begin_chat(b, "and then?")
    want = "".join(b.generate(limit=4, params=SamplingParams(temp=0.0)))
    assert first_a == first_b and got == want
    for s in (a, b):
        s.close()


def test_parked_sessions_join_batched_decode(pool):
    """Parked sessions are admitted to batched decode paths (static group
    and continuous batcher) via transparent unpark, with identical output."""
    import queue as queue_mod

    a = pool.new_session()
    pool.begin_chat(a, "one two")
    want = "".join(a.generate(limit=4, params=SamplingParams(temp=0.0)))
    a.close()

    # static batch path
    b = pool.new_session()
    pool.begin_chat(b, "one two")
    b.park()
    got = pool.generate_batch([b], limit=4, params=SamplingParams(temp=0.0),
                              decode_chunk=2)
    assert got == [want]
    b.close()

    # continuous batcher path (prepared-prompt check must accept parked)
    from minigpt4_tpu.engine.sessions import ContinuousBatcher

    c = pool.new_session()
    pool.begin_chat(c, "one two")
    c.park()
    cb = ContinuousBatcher(pool, max_batch=2, decode_chunk=2)
    try:
        out = cb.submit(c, 4, SamplingParams(temp=0.0))
        toks = []
        while True:
            t = out.get(timeout=120)
            if t is cb._DONE:
                break
            if isinstance(t, Exception):
                raise t
            toks.append(t)
        assert "".join(toks) == want
    finally:
        cb.close()
    c.close()


def test_excluded_parked_session_stays_parked(pool):
    """A parked session with no context room is excluded from the group
    WITHOUT being unparked first — resubmitting it every batch window must
    not pay a full cache re-upload for a lane that never decodes."""
    a = pool.new_session()
    b = pool.new_session()
    pool.begin_chat(a, "one two")
    pool.begin_chat(b, "three")
    a.state.n_past = pool.session_ctx - 1  # no room for any decode chunk
    a.state.tokens = [-1] * a.state.n_past
    a.park()
    got = pool.generate_batch([a, b], limit=3,
                              params=SamplingParams(temp=0.0), decode_chunk=2)
    assert a.state.parked is not None and a.state.cache is None
    assert got[0] == "" and len(got[1]) > 0
    a.close()
    b.close()


def test_restore_into_parked_session(pool, tmp_path):
    """DecodeState.restore on a parked session unparks transparently (the
    symmetric behavior to save()) instead of crashing on the absent cache."""
    a = pool.new_session()
    pool.begin_chat(a, "one two")
    ckpt = tmp_path / "st.npz"
    a.state.save(ckpt)
    want = "".join(a.generate(limit=4, params=SamplingParams(temp=0.0)))
    a.state.restore(ckpt)
    a.park()
    a.state.restore(ckpt)
    assert a.state.parked is None and a.state.cache is not None
    assert "".join(a.generate(limit=4, params=SamplingParams(temp=0.0))) == want
    a.close()


# ---------------------------------------------------------------------------
# System-prompt prefix KV cache: fresh sessions reuse the first session's
# computed SYSTEM_PROMPT prefill (copied, bit-identical) instead of
# recomputing it.
# ---------------------------------------------------------------------------

def test_prefix_cache_state_bit_identical(pool):
    """The installed prefix state (cache bytes + pending logits + token
    history) is bit-identical to a freshly computed prefill."""
    a = pool.new_session()
    pool.system_prompt(a)  # first: computes + captures (miss)
    b = pool.new_session()
    pool.system_prompt(b)  # second: installs from the cache (hit)
    assert pool.metrics["prefix_cache_hits"] >= 1
    assert pool.metrics["prefix_cache_misses"] >= 1
    n = a.n_past
    assert n > 0 and b.n_past == n
    assert a.state.tokens == b.state.tokens
    for kv in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(a.state.cache[kv][:, :, :, :n]).view(np.uint8),
            np.asarray(b.state.cache[kv][:, :, :, :n]).view(np.uint8))
    np.testing.assert_array_equal(a.state.logits, b.state.logits)
    a.close()
    b.close()


def test_prefix_cache_generation_identical(pool, tmp_path_factory):
    """End-to-end greedy generation through the prefix-cache fast path
    matches a pool with the cache disabled."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("nopfx"))
    ref = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                      prefix_cache=False)
    try:
        assert not ref.prefix_cache

        def run(p):
            s = p.new_session()
            p.system_prompt(s)
            p.begin_chat(s, "hello there")
            toks = list(s.generate(limit=8, params=SamplingParams(temp=0.0)))
            s.close()
            return toks

        run(pool)  # ensure the prefix is cached
        hits0 = pool.metrics["prefix_cache_hits"]
        got = run(pool)  # this one rides the cache
        assert pool.metrics["prefix_cache_hits"] == hits0 + 1
        want = run(ref)
        assert got == want
    finally:
        ref.close()


def test_prefix_cache_upload_image_flow(pool):
    """upload_image (reset -> system_prompt -> encode) hits the prefix cache
    on every session after the first, and the chat still works."""
    s1 = pool.new_session()
    s1.upload_image(_img(7))
    hits0 = pool.metrics["prefix_cache_hits"]
    s2 = pool.new_session()
    s2.upload_image(_img(8))
    assert pool.metrics["prefix_cache_hits"] == hits0 + 1
    s2.ask("what is it?")
    toks = list(s2.generate(limit=4, params=SamplingParams(temp=0.0)))
    assert s2.n_past > 0
    s1.close()
    s2.close()


# ---------------------------------------------------------------------------
# Adaptive speculation governor: batched groups demote off speculation when
# acceptance sits below the batch-scaled break-even (a batched verify pass
# costs ~1.4x a plain step), and re-probe after a cooldown.  Output is
# token-identical either way.
# ---------------------------------------------------------------------------

def test_spec_governor_unit():
    from minigpt4_tpu.engine.sessions import _SpecGovernor

    g = _SpecGovernor(cooldown=3)
    assert g.threshold(1) < 1.1 < g.threshold(8) <= 1.5
    assert g.want_spec()
    g.observe(tokens=8, passes=2, lanes=4)  # 1.0/pass < threshold(4)
    assert g.demotions == 1
    assert not g.want_spec() and not g.want_spec() and not g.want_spec()
    assert g.want_spec()  # cooldown expired: re-probe
    # high acceptance never demotes
    g2 = _SpecGovernor()
    for _ in range(10):
        g2.observe(tokens=8 * 8 * 2, passes=2, lanes=8)
        assert g2.want_spec()
    assert g2.demotions == 0


def test_spec_governor_demotes_and_stays_exact(tmp_path_factory, monkeypatch):
    """With the break-even forced above any possible acceptance, every
    batched spec probe demotes — the group decodes plain chunks — and the
    emitted tokens still equal a speculation-free pool's output."""
    from minigpt4_tpu.engine import sessions as S

    model, llm = build_tiny_models(tmp_path_factory.mktemp("gov"))
    spec = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                       speculative_k=4)
    plain = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32)
    try:
        monkeypatch.setattr(S._SpecGovernor, "threshold",
                            lambda self, lanes: 1e9)

        def run(pool):
            ss = []
            for q in ("one two", "three four"):
                s = pool.new_session()
                pool.begin_chat(s, q)
                ss.append(s)
            out = pool.generate_batch(ss, limit=16, params=SamplingParams(temp=0.0),
                                      decode_chunk=4)
            for s in ss:
                s.close()
            return out

        got = run(spec)
        assert spec.metrics["spec_demotions"] >= 1
        want = run(plain)
        assert got == want
    finally:
        spec.close()
        plain.close()


def test_spec_governor_pass_scaling():
    """Passes per dispatch scale inversely with observed acceptance (a spec
    dispatch should emit ~decode_chunk tokens), bounded to powers of two in
    [2, 16]."""
    from minigpt4_tpu.engine.sessions import _SpecGovernor

    g = _SpecGovernor()
    assert g.passes_for(16, 8) == 2  # optimistic start: est = k
    g.ewma = 8.0                     # saturated acceptance
    assert g.passes_for(16, 8) == 2
    g.ewma = 4.0
    assert g.passes_for(16, 8) == 4
    g.ewma = 1.0                     # floor: want 16 passes
    assert g.passes_for(16, 8) == 16
    g.ewma = 0.5                     # clamp: never above 16
    assert g.passes_for(16, 8) == 16
    g.ewma = 2.0
    assert g.passes_for(16, 4) == 8

"""Stochastic speculative decoding (speculative SAMPLING).

The contract (models/llama.stochastic_speculative_decode_loop): sampled
(temperature/top-k/top-p) streams speculate too, and the emitted token
distribution is EXACTLY the plain autoregressive chain's — speculative
sampling (Leviathan/Chen) specialized to the point-mass n-gram proposal:
accept draft d with its post-chain target probability p(d); resample a
rejection from the residual norm(p with d zeroed), carried across pass and
dispatch boundaries as a ban token.  Greedy lanes reduce to the
argmax-verify rule of the greedy loop (the reference's greedy decode
contract, /root/reference/minigpt4.cpp:2449-2452, is untouched).
"""

import pytest

pytestmark = pytest.mark.slow  # serving/speculation suite (see conftest)

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

from minigpt4_tpu.engine.device_sampling import (
    DeviceSamplingConfig, chain_logits_dyn, lane_rows, sample_res_rows)
from minigpt4_tpu.models import llama as llama_mod
from minigpt4_tpu.models.llama import LlamaConfig

from test_speculative import _prefill, _rand_params


def _emit(tokens, counts):
    """Host emission order for one lane: [n_passes, k] + counts -> flat."""
    t = np.asarray(tokens)
    c = np.asarray(counts)
    return np.concatenate([t[i, : c[i]] for i in range(t.shape[0])])


def _zero_layer(v: int, w: np.ndarray) -> tuple[dict, LlamaConfig]:
    """0-layer model: logits after evaluating token t are sqrt(v) * w[t]
    (one-hot embed -> rms_norm -> head), a fully analytic target."""
    cfg = LlamaConfig(n_vocab=v, n_embd=v, n_head=1, n_layer=0, n_rot=4,
                      n_ff=4, n_ctx=64)
    params = {
        "tok_embeddings": jnp.eye(v, dtype=jnp.float32),
        "norm": jnp.ones((v,), jnp.float32),
        "output": {"w": jnp.asarray(w, jnp.float32)},
        "layers": {},
    }
    return params, cfg


class TestLoopGreedyIdentity:
    def test_greedy_rows_match_greedy_spec_loop(self):
        cfg = LlamaConfig(n_vocab=97, n_embd=64, n_head=4, n_layer=2,
                          n_rot=16, n_ff=128, n_ctx=128)
        rng = np.random.default_rng(0)
        params = _rand_params(cfg, rng)
        prompt = [3, 11, 4, 11, 4, 11, 4, 9]
        n_passes, k = 6, 4
        hist = np.full((1, cfg.n_ctx), -1, np.int32)
        hist[0, : len(prompt)] = prompt

        logits, cache = _prefill(params, cfg, prompt)
        tg, cg, _, _, _ = llama_mod.speculative_decode_loop(
            params, cache, logits, jnp.int32(len(prompt)), jnp.asarray(hist),
            n_passes, k, cfg,
        )

        logits2, cache2 = _prefill(params, cfg, prompt)
        rows = lane_rows([DeviceSamplingConfig(temp=0.0)])
        keys = jax.random.split(jax.random.PRNGKey(5), n_passes)
        ts, cs, _, _, _, ban = llama_mod.stochastic_speculative_decode_loop(
            params, cache2, logits2, jnp.int32(len(prompt)), jnp.asarray(hist),
            jnp.asarray([-1], jnp.int32), keys, rows, k, cfg,
        )
        np.testing.assert_array_equal(
            _emit(ts[0], cs[0]), _emit(tg[0], cg[0]))
        # greedy emissions are key-independent
        keys2 = jax.random.split(jax.random.PRNGKey(99), n_passes)
        ts2, cs2, _, _, _, _ = llama_mod.stochastic_speculative_decode_loop(
            params, *_prefill(params, cfg, prompt)[::-1],
            jnp.int32(len(prompt)), jnp.asarray(hist),
            jnp.asarray([-1], jnp.int32), keys2, rows, k, cfg,
        )
        np.testing.assert_array_equal(_emit(ts2[0], cs2[0]),
                                      _emit(tg[0], cg[0]))


class TestDistributionalExactness:
    def test_second_token_marginal_matches_chain(self):
        """MC check of the accept/residual algebra: with a forced t0 and a
        forced draft d, the SECOND emitted token's marginal must equal the
        post-chain target distribution p — the defining property of
        speculative sampling (accept d w.p. p(d), else residual)."""
        v, B = 12, 16384
        rng = np.random.default_rng(1)
        w = rng.normal(0, 1.0, (v, v)).astype(np.float32)
        params, cfg = _zero_layer(v, w)

        a = 3  # forced t0
        sp = DeviceSamplingConfig(temp=0.9, top_k=5, top_p=0.85)
        # analytic target: chain distribution of logits after evaluating `a`
        z = chain_logits_dyn(
            jnp.asarray(np.sqrt(v) * w[a]), sp.temp, sp.top_k, sp.top_p,
            sp.tfs_z, sp.typical_p,
        )
        p = np.asarray(jax.nn.softmax(z))
        # forced n-gram continuation: the SECOND most probable token, so the
        # accept test genuinely branches (p(d) strictly between 0 and 1)
        d = int(np.argsort(-p)[1])
        assert 0.02 < p[d] < 0.95
        # hist [9, a, d, 6, 9] with t0=a: bigram (9, a) at idx 1 ->
        # continuation [d] for k_spec=2
        seq = [9, a, d, 6, 9]
        pos = len(seq)
        hist = np.full((B, cfg.n_ctx), -1, np.int32)
        hist[:, : pos] = seq

        # pending logits: a point mass at `a` (t0 = a surely, chain or not)
        logits0 = jnp.full((B, v), -1e4, jnp.float32).at[:, a].set(1e4)
        rows = lane_rows([sp] * B)
        cache = llama_mod.init_cache(cfg, batch=B)

        keys = jax.random.split(jax.random.PRNGKey(2), 2)
        ts, cs, _, _, _, _ = llama_mod.stochastic_speculative_decode_loop(
            params, cache, logits0, jnp.int32(pos),
            jnp.asarray(hist), jnp.full((B,), -1, jnp.int32),
            keys, rows, 2, cfg,
        )
        t = np.asarray(ts)  # [B, 2, 2]
        c = np.asarray(cs)  # [B, 2]
        np.testing.assert_array_equal(t[:, 0, 0], a)  # forced t0
        # second token: the accepted draft, else next pass's residual t0
        second = np.where(c[:, 0] >= 2, t[:, 0, 1], t[:, 1, 0])

        emp = np.bincount(second, minlength=v) / B
        tv = 0.5 * np.abs(emp - p).sum()
        assert tv < 0.025, f"TV {tv:.4f}: emp {emp} vs target {p}"
        # both branches of the accept test must actually occur
        acc_rate = (c[:, 0] >= 2).mean()
        assert 0.02 < acc_rate < 0.98, acc_rate

    def test_rejection_rate_matches_target_prob(self):
        """Acceptance frequency of the forced draft == its target
        probability p(d)."""
        v, B = 12, 16384
        rng = np.random.default_rng(4)
        w = rng.normal(0, 1.0, (v, v)).astype(np.float32)
        params, cfg = _zero_layer(v, w)
        a, d = 5, 2
        seq = [9, a, d, 6, 9]
        pos = len(seq)
        hist = np.full((B, cfg.n_ctx), -1, np.int32)
        hist[:, : pos] = seq
        logits0 = jnp.full((B, v), -1e4, jnp.float32).at[:, a].set(1e4)
        sp = DeviceSamplingConfig(temp=1.2, top_k=0, top_p=1.0)
        rows = lane_rows([sp] * B)
        cache = llama_mod.init_cache(cfg, batch=B)
        keys = jax.random.split(jax.random.PRNGKey(6), 1)
        _, cs, _, _, _, ban = llama_mod.stochastic_speculative_decode_loop(
            params, cache, logits0, jnp.int32(pos), jnp.asarray(hist),
            jnp.full((B,), -1, jnp.int32), keys, rows, 2, cfg,
        )
        z = chain_logits_dyn(jnp.asarray(np.sqrt(v) * w[a]), sp.temp,
                             sp.top_k, sp.top_p, sp.tfs_z, sp.typical_p)
        p_d = float(jax.nn.softmax(z)[d])
        acc_rate = float((np.asarray(cs)[:, 0] >= 2).mean())
        assert abs(acc_rate - p_d) < 0.02, (acc_rate, p_d)
        # rejected lanes carry the rejected draft as the ban
        rej = np.asarray(cs)[:, 0] < 2
        np.testing.assert_array_equal(np.asarray(ban)[rej], d)
        np.testing.assert_array_equal(np.asarray(ban)[~rej], -1)

    def test_residual_excludes_banned_token(self):
        """sample_res_rows never returns the banned token (temp > 0) and
        its conditional distribution is the renormalized chain."""
        v, B = 10, 8192
        rng = np.random.default_rng(8)
        logits = jnp.asarray(rng.normal(0, 1.5, (v,)).astype(np.float32))
        sp = DeviceSamplingConfig(temp=1.0, top_k=0, top_p=1.0)
        rows = lane_rows([sp] * B)
        ban_id = 4
        toks = sample_res_rows(
            jnp.broadcast_to(logits, (B, v)),
            jnp.full((B,), ban_id, jnp.int32),
            jax.random.split(jax.random.PRNGKey(0), B), rows,
        )
        t = np.asarray(toks)
        assert not (t == ban_id).any()
        z = np.asarray(chain_logits_dyn(logits, sp.temp, sp.top_k, sp.top_p,
                                        sp.tfs_z, sp.typical_p))
        p = np.exp(z - z.max())
        p[ban_id] = 0.0
        p /= p.sum()
        emp = np.bincount(t, minlength=v) / B
        assert 0.5 * np.abs(emp - p).sum() < 0.03


class TestCarryAcrossDispatches:
    def test_two_dispatches_equal_one(self):
        """Threading (logits, ban, cache, hist) through two 1-pass dispatches
        with the same per-pass keys == one 2-pass dispatch, token for token
        — the engine's cross-dispatch ban carry is exact."""
        cfg = LlamaConfig(n_vocab=64, n_embd=48, n_head=4, n_layer=2,
                          n_rot=12, n_ff=96, n_ctx=128)
        rng = np.random.default_rng(11)
        params = _rand_params(cfg, rng)
        prompt = [3, 11, 4, 11, 4, 11, 4, 9]
        rows = lane_rows([DeviceSamplingConfig(temp=1.0, top_k=0, top_p=1.0)])
        hist0 = np.full((1, cfg.n_ctx), -1, np.int32)
        hist0[0, : len(prompt)] = prompt
        keys = jax.random.split(jax.random.PRNGKey(13), 2)
        k = 4

        logits, cache = _prefill(params, cfg, prompt)
        ts, cs, _, _, _, _ = llama_mod.stochastic_speculative_decode_loop(
            params, cache, logits, jnp.int32(len(prompt)),
            jnp.asarray(hist0), jnp.asarray([-1], jnp.int32),
            keys, rows, k, cfg,
        )
        want = _emit(ts[0], cs[0])

        logits2, cache2 = _prefill(params, cfg, prompt)
        st_logits, st_cache = logits2, cache2
        st_hist = jnp.asarray(hist0)
        st_ban = jnp.asarray([-1], jnp.int32)
        pos = len(prompt)
        got = []
        for i in range(2):
            ts1, cs1, st_logits, st_cache, st_hist, st_ban = (
                llama_mod.stochastic_speculative_decode_loop(
                    params, st_cache, st_logits, jnp.int32(pos), st_hist,
                    st_ban, keys[i : i + 1], rows, k, cfg,
                )
            )
            got.append(_emit(ts1[0], cs1[0]))
            pos += int(np.asarray(cs1).sum())
        np.testing.assert_array_equal(np.concatenate(got), want)


class TestBatchedStochasticSpec:
    def _greedy_want(self, model, llm, q, limit):
        from minigpt4_tpu.engine.sessions import SessionPool
        from minigpt4_tpu.engine.sampling import SamplingParams

        sp = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32)
        try:
            s = sp.new_session()
            sp.begin_chat(s, q)
            want = "".join(s.generate(limit=limit,
                                      params=SamplingParams(temp=0.0)))
            s.close()
        finally:
            sp.close()
        return want

    def test_window_batch_mixed_configs_speculates(self, tmp_path_factory):
        """A MIXED-config batch under a speculative engine runs the
        stochastic spec loop: the greedy lane stays token-exact vs
        single-stream greedy (argmax lanes reduce to argmax verification),
        the sampled lane streams under its own config, and sessions stay
        coherent (incl. the residual-ban writeback)."""
        from fixtures import build_tiny_models
        from minigpt4_tpu.engine.sessions import SessionPool
        from minigpt4_tpu.engine.sampling import SamplingParams

        model, llm = build_tiny_models(tmp_path_factory.mktemp("stochwin"))
        q = "tell me a story"
        want = self._greedy_want(model, llm, q, 8)

        sp = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                         speculative_k=4)
        try:
            sa = sp.new_session()
            sp.begin_chat(sa, q)
            sb = sp.new_session()
            sp.begin_chat(sb, "hi")
            got = sp.generate_batch(
                [sa, sb], limit=8,
                params=[SamplingParams(temp=0.0),
                        SamplingParams(temp=0.9, top_k=30, top_p=0.8)],
                decode_chunk=4,
            )
            assert got[0] == want
            assert isinstance(got[1], str)
            for s in (sa, sb):
                assert len(s.state.tokens) == s.n_past
                assert s.state.spec_ban == -1 or s.state.spec_ban >= 0
                s.close()
        finally:
            sp.close()

    def test_paged_window_batch_mixed_configs_speculates(self, tmp_path_factory):
        """Same contract over the paged pool (paged_spec_loop_stoch)."""
        from fixtures import build_tiny_models
        from minigpt4_tpu.engine.sessions import SessionPool
        from minigpt4_tpu.engine.sampling import SamplingParams

        model, llm = build_tiny_models(tmp_path_factory.mktemp("stochpag"))
        q = "tell me a story"
        want = self._greedy_want(model, llm, q, 8)

        sp = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                         speculative_k=4, paged_pool_pages=8)
        try:
            sa = sp.new_session()
            sp.begin_chat(sa, q)
            sb = sp.new_session()
            sp.begin_chat(sb, "hi")
            got = sp.generate_batch(
                [sa, sb], limit=8,
                params=[SamplingParams(temp=0.0),
                        SamplingParams(temp=0.9, top_k=30, top_p=0.8)],
                decode_chunk=4,
            )
            assert got[0] == want
            assert isinstance(got[1], str)
            for s in (sa, sb):
                assert len(s.state.tokens) == s.n_past
                s.close()
        finally:
            sp.close()

    def test_continuous_batcher_mixed_configs_speculates(self, tmp_path_factory):
        """The ContinuousBatcher speculates on mixed-config steps: greedy
        request stays token-exact, sampled request streams concurrently."""
        from fixtures import build_tiny_models
        from minigpt4_tpu.engine.sessions import ContinuousBatcher, SessionPool
        from minigpt4_tpu.engine.sampling import SamplingParams

        model, llm = build_tiny_models(tmp_path_factory.mktemp("stochcb"))
        q = "tell me a story"
        want = self._greedy_want(model, llm, q, 8)

        sp = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=32,
                         speculative_k=4)
        cb = ContinuousBatcher(sp, max_batch=2, decode_chunk=4)
        try:
            sa = sp.new_session()
            sp.begin_chat(sa, q)
            sb = sp.new_session()
            sp.begin_chat(sb, "hi")
            out_a = cb.submit(sa, 8, SamplingParams(temp=0.0))
            out_b = cb.submit(sb, 8, SamplingParams(temp=0.9, top_k=30))
            texts = []
            for out in (out_a, out_b):
                toks = []
                while True:
                    t = out.get(timeout=300)
                    if t is cb._DONE:
                        break
                    if isinstance(t, Exception):
                        raise t
                    toks.append(t)
                texts.append("".join(toks))
            assert texts[0] == want
            assert isinstance(texts[1], str)
            for s in (sa, sb):
                assert len(s.state.tokens) == s.n_past
                s.close()
        finally:
            cb.close()
            sp.close()


class TestEngineStochasticSpec:
    def test_generate_sampled_with_spec(self, tmp_path):
        from fixtures import build_tiny_models
        from minigpt4_tpu.engine import MiniGPT4Engine
        from minigpt4_tpu.engine.sampling import SamplingParams

        model, llm = build_tiny_models(tmp_path)
        eng = MiniGPT4Engine(model, llm, seed=7)
        sp = SamplingParams(temp=0.9, top_k=8, top_p=0.95)

        eng.system_prompt()
        eng.begin_chat("hello there")
        out = list(eng.generate(limit=24, params=sp, decode_chunk=8,
                                speculative_k=4))
        assert len(out) >= 1
        # cursor/history coherence after mixed spec/plain dispatches
        assert len(eng._st.tokens) == eng._st.n_past
        # ban never escapes a finished stream into a stale state silently:
        # either cleared or pointing at a real token id
        assert eng._st.spec_ban == -1 or 0 <= eng._st.spec_ban
        # follow-up turn still decodes (prefill cleared any carried ban)
        eng.begin_chat("and then?")
        assert eng._st.spec_ban == -1
        out2 = list(eng.generate(limit=12, params=sp, decode_chunk=8,
                                 speculative_k=4))
        assert len(eng._st.tokens) == eng._st.n_past
        eng.close()

    def test_seeded_stream_deterministic(self, tmp_path):
        from fixtures import build_tiny_models
        from minigpt4_tpu.engine import MiniGPT4Engine
        from minigpt4_tpu.engine.sampling import SamplingParams

        model, llm = build_tiny_models(tmp_path)
        sp = SamplingParams(temp=1.0, top_k=0, top_p=1.0)

        def run():
            eng = MiniGPT4Engine(model, llm, seed=123)
            eng.system_prompt()
            eng.begin_chat("hi")
            toks = list(eng.generate(limit=20, params=sp, decode_chunk=8,
                                     speculative_k=4))
            eng.close()
            return toks

        assert run() == run()

    def test_plain_tail_resolves_ban_near_context_end(self, tmp_path):
        """Force the spec -> plain switch: close to n_ctx there is no room
        for a k-wide pass, so the stream falls to plain chunks — a pending
        residual ban must be consumed (resolve_ban), not ignored."""
        from fixtures import build_tiny_models
        from minigpt4_tpu.engine import MiniGPT4Engine
        from minigpt4_tpu.engine.sampling import SamplingParams

        model, llm = build_tiny_models(tmp_path)
        # n_ctx just past the system prompt (~142 tokens) + one short turn:
        # the stream starts speculative and hits the no-room-for-a-pass tail
        eng = MiniGPT4Engine(model, llm, seed=3, n_ctx=192)
        sp = SamplingParams(temp=1.1, top_k=0, top_p=1.0)
        eng.system_prompt()
        eng.begin_chat("x")
        room = eng.llm_cfg.n_ctx - eng._st.n_past
        out = list(eng.generate(limit=room + 32, params=sp, decode_chunk=8,
                                speculative_k=4))
        # decoded into the tail without overflow; history stays coherent
        assert eng._st.n_past <= eng.llm_cfg.n_ctx
        assert len(eng._st.tokens) == eng._st.n_past
        eng.close()

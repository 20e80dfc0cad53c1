"""Speculative decoding: greedy-exactness, drafting, and engine integration.

The contract (models/llama.speculative_decode_loop): greedy output is
token-for-token IDENTICAL to the plain fused decode loop — drafts are only
accepted when they equal the model's own argmax at that position — so the
reference's greedy decode behavior (/root/reference/minigpt4.cpp:2449-2452)
is preserved while a verify pass of k tokens costs one weight read.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from minigpt4_tpu.engine.device_sampling import DeviceSamplingConfig
from minigpt4_tpu.models import llama as llama_mod
from minigpt4_tpu.models.llama import LlamaConfig, _ngram_draft


def _rand_params(cfg: LlamaConfig, rng: np.random.Generator, dtype=jnp.float32):
    d, ff, v, L = cfg.n_embd, cfg.n_ff, cfg.n_vocab, cfg.n_layer

    def lin(k, n):
        return {"w": jnp.asarray(rng.normal(0, 0.08, (L, k, n)).astype(np.float32), dtype)}

    layers = {
        "attention_norm": jnp.ones((L, d), dtype),
        "wq": lin(d, d), "wk": lin(d, d), "wv": lin(d, d), "wo": lin(d, d),
        "ffn_norm": jnp.ones((L, d), dtype),
        "w1": lin(d, ff), "w2": lin(ff, d), "w3": lin(d, ff),
    }
    return {
        "tok_embeddings": jnp.asarray(rng.normal(0, 0.5, (v, d)).astype(np.float32), dtype),
        "norm": jnp.ones((d,), dtype),
        "output": {"w": jnp.asarray(rng.normal(0, 0.3, (d, v)).astype(np.float32), dtype)},
        "layers": layers,
    }


def _prefill(params, cfg, tokens):
    cache = llama_mod.init_cache(cfg)
    emb = llama_mod.embed_tokens(params, jnp.asarray(tokens, jnp.int32)[None])
    logits, cache = llama_mod.forward(params, cache, emb, jnp.int32(0), cfg)
    return logits, cache


class TestNgramDraft:
    def test_trigram_preferred_and_most_recent(self):
        c = 32
        hist = np.full(c, -1, np.int32)
        # two earlier bigram (7, 9) occurrences with different continuations;
        # the later one also matches the trigram (5, 7, 9)
        seq = [1, 7, 9, 2, 3, 5, 7, 9, 4, 6, 8, 5, 7]  # now t0 = 9
        hist[: len(seq)] = seq
        pos = len(seq)  # ...5, 7 evaluated; t0 = 9 pending
        d = np.asarray(_ngram_draft(jnp.asarray(hist), jnp.int32(pos), jnp.int32(9), 3, c))
        # trigram (5, 7, 9) ends at index 7 -> continuation [4, 6, 8]
        np.testing.assert_array_equal(d, [4, 6, 8])

    def test_bigram_fallback(self):
        c = 32
        hist = np.full(c, -1, np.int32)
        seq = [1, 7, 9, 2, 3, 0, 0, 7]  # t0 = 9: only bigram (7, 9) at idx 2
        hist[: len(seq)] = seq
        d = np.asarray(_ngram_draft(jnp.asarray(hist), jnp.int32(len(seq)), jnp.int32(9), 2, c))
        np.testing.assert_array_equal(d, [2, 3])

    def test_4gram_preferred_over_trigram(self):
        c = 40
        hist = np.full(c, -1, np.int32)
        # an EARLIER 4-gram (2, 5, 7, 9) match must beat a LATER trigram
        # (5, 7, 9) match
        seq = [2, 5, 7, 9, 11, 12, 4, 5, 7, 9, 20, 21, 0, 2, 5, 7]  # t0 = 9
        hist[: len(seq)] = seq
        pos = len(seq)
        d = np.asarray(_ngram_draft(jnp.asarray(hist), jnp.int32(pos), jnp.int32(9), 2, c))
        # 4-gram ends at idx 3 -> continuation [11, 12]
        np.testing.assert_array_equal(d, [11, 12])

    def test_repeated_token_stream_drafts_fully(self):
        """A period-1 stream (the model looping one token) must draft its
        repetition: the cursor-adjacent match is skipped (unwritten
        continuation) and the -1 tail forward-fills."""
        c = 32
        hist = np.full(c, -1, np.int32)
        hist[:5] = [5, 5, 5, 5, 5]
        d = np.asarray(_ngram_draft(jnp.asarray(hist), jnp.int32(5), jnp.int32(5), 4, c))
        np.testing.assert_array_equal(d, [5, 5, 5, 5])

    def test_no_match_returns_something(self):
        c = 16
        hist = np.full(c, -1, np.int32)
        hist[:3] = [1, 2, 3]
        d = np.asarray(_ngram_draft(jnp.asarray(hist), jnp.int32(3), jnp.int32(99), 4, c))
        assert d.shape == (4,)  # garbage draft is fine: verification rejects


class TestSpeculativeLoop:
    CFG = LlamaConfig(n_vocab=97, n_embd=64, n_head=4, n_layer=2, n_rot=16,
                      n_ff=128, n_ctx=128)

    def test_greedy_exactness_vs_plain_loop(self):
        cfg = self.CFG
        rng = np.random.default_rng(0)
        params = _rand_params(cfg, rng)
        prompt = [3, 11, 4, 11, 4, 11, 4, 9]
        logits, cache = _prefill(params, cfg, prompt)

        n_tokens = 24
        toks_plain, _, _ = llama_mod.decode_loop(
            params, cache, logits, jnp.int32(len(prompt)), n_tokens,
            jax.random.PRNGKey(0), DeviceSamplingConfig(temp=0.0), cfg,
        )
        want = np.asarray(toks_plain[0])

        logits2, cache2 = _prefill(params, cfg, prompt)
        hist = np.full((1, cfg.n_ctx), -1, np.int32)
        hist[0, : len(prompt)] = prompt
        tokens, counts, _, _, _ = llama_mod.speculative_decode_loop(
            params, cache2, logits2, jnp.int32(len(prompt)), jnp.asarray(hist),
            n_tokens, 4, cfg,
        )
        tok_host = np.asarray(tokens[0])
        cnt_host = np.asarray(counts[0])
        emitted = np.concatenate([tok_host[i, : cnt_host[i]] for i in range(n_tokens)])
        assert len(emitted) >= n_tokens  # >= 1 token per pass
        np.testing.assert_array_equal(emitted[:n_tokens], want)

    def test_greedy_exactness_w8a8_weights(self):
        """Speculative == plain greedy under the experimental W8A8 weights:
        per-row activation quantization must be position-independent (a row
        in an S=k verify block quantizes on the same grid as the same row
        in an S=1 step)."""
        from minigpt4_tpu.benchmark import synth_llama_params
        from minigpt4_tpu.formats.dtypes import DataType

        cfg = LlamaConfig(n_vocab=512, n_embd=256, n_head=4, n_layer=2,
                          n_rot=64, n_ff=512, n_ctx=128)
        rng = np.random.default_rng(3)
        params = synth_llama_params(cfg, DataType.Q5_K, rng, quant_mode="w8a8")
        prompt = [3, 11, 4, 11, 4, 11, 4, 9]
        logits, cache = _prefill(params, cfg, prompt)
        n_passes = 6
        toks_plain, _, _ = llama_mod.decode_loop(
            params, cache, logits, jnp.int32(len(prompt)), n_passes,
            jax.random.PRNGKey(0), DeviceSamplingConfig(temp=0.0), cfg,
        )
        want = np.asarray(toks_plain[0])

        logits2, cache2 = _prefill(params, cfg, prompt)
        hist = np.full((1, cfg.n_ctx), -1, np.int32)
        hist[0, : len(prompt)] = prompt
        tokens, counts, _, _, _ = llama_mod.speculative_decode_loop(
            params, cache2, logits2, jnp.int32(len(prompt)), jnp.asarray(hist),
            n_passes, 4, cfg,
        )
        tok_host = np.asarray(tokens[0])
        cnt_host = np.asarray(counts[0])
        emitted = np.concatenate([tok_host[i, : cnt_host[i]] for i in range(n_passes)])
        np.testing.assert_array_equal(emitted[: n_passes], want[: n_passes])

    def test_deterministic_acceptance_on_cyclic_model(self):
        """A 0-layer model whose head maps token t -> t+1 (mod V): after one
        full cycle in the prompt, every n-gram lookup hits and every draft
        verifies — counts must saturate at k."""
        v = 16
        cfg = LlamaConfig(n_vocab=v, n_embd=v, n_head=1, n_layer=0, n_rot=4,
                          n_ff=4, n_ctx=128)
        params = {
            "tok_embeddings": jnp.eye(v, dtype=jnp.float32),
            "norm": jnp.ones((v,), jnp.float32),
            # h (≈ one-hot of t) @ roll(I): argmax = t+1 mod V
            "output": {"w": jnp.asarray(np.roll(np.eye(v, dtype=np.float32), 1, axis=1))},
            "layers": {},
        }
        prompt = [(i % v) for i in range(2 * v)]  # two full cycles
        logits, cache = _prefill(params, cfg, prompt)
        hist = np.full((1, cfg.n_ctx), -1, np.int32)
        hist[0, : len(prompt)] = prompt

        k = 6
        tokens, counts, _, _, _ = llama_mod.speculative_decode_loop(
            params, cache, logits, jnp.int32(len(prompt)), jnp.asarray(hist),
            4, k, cfg,
        )
        cnt = np.asarray(counts[0])
        np.testing.assert_array_equal(cnt, [k] * 4)  # full acceptance
        tok = np.asarray(tokens[0]).reshape(-1)
        want = [(len(prompt) + i) % v for i in range(4 * k)]
        np.testing.assert_array_equal(tok, want)

    def test_partial_acceptance_cursor_consistency(self):
        """After a speculative run, continuing PLAIN from the final state
        must equal an all-plain run — i.e. rejected-draft cache garbage above
        the cursor is invisible."""
        cfg = self.CFG
        rng = np.random.default_rng(7)
        params = _rand_params(cfg, rng)
        prompt = [5, 2, 5, 2, 5, 8]
        n_spec, k = 6, 4

        # all-plain reference: 40 tokens
        logits, cache = _prefill(params, cfg, prompt)
        toks_ref, _, _ = llama_mod.decode_loop(
            params, cache, logits, jnp.int32(len(prompt)), 40,
            jax.random.PRNGKey(0), DeviceSamplingConfig(temp=0.0), cfg,
        )
        ref = np.asarray(toks_ref[0])

        # spec passes, then plain continuation from the spec state
        logits2, cache2 = _prefill(params, cfg, prompt)
        hist = np.full((1, cfg.n_ctx), -1, np.int32)
        hist[0, : len(prompt)] = prompt
        tokens, counts, logits3, cache3, _ = llama_mod.speculative_decode_loop(
            params, cache2, logits2, jnp.int32(len(prompt)), jnp.asarray(hist),
            n_spec, k, cfg,
        )
        cnt = np.asarray(counts[0])
        tok_host = np.asarray(tokens[0])
        emitted = np.concatenate([tok_host[i, : cnt[i]] for i in range(n_spec)])
        n_em = len(emitted)
        np.testing.assert_array_equal(emitted, ref[:n_em])

        more, _, _ = llama_mod.decode_loop(
            params, cache3, logits3, jnp.int32(len(prompt) + n_em), 12,
            jax.random.PRNGKey(0), DeviceSamplingConfig(temp=0.0), cfg,
        )
        np.testing.assert_array_equal(np.asarray(more[0]), ref[n_em : n_em + 12])


class TestEngineSpeculative:
    def test_engine_generate_spec_equals_plain(self, tmp_path):
        from fixtures import build_tiny_models
        from minigpt4_tpu.engine import MiniGPT4Engine
        from minigpt4_tpu.engine.sampling import SamplingParams

        model, llm = build_tiny_models(tmp_path)
        eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
        greedy = SamplingParams(temp=0.0)

        def run(spec_k):
            eng.reset_chat()
            eng.system_prompt()
            eng.begin_chat("hello there")
            return "".join(eng.generate(limit=24, params=greedy,
                                        speculative_k=spec_k))

        plain = run(0)
        spec = run(4)
        assert spec == plain
        assert len(eng._st.tokens) == eng.n_past
        eng.close()

    def test_history_invariant_across_ops(self, tmp_path):
        from fixtures import build_tiny_models
        from minigpt4_tpu.engine import MiniGPT4Engine
        from minigpt4_tpu.engine.sampling import SamplingParams

        model, llm = build_tiny_models(tmp_path)
        eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
        eng.system_prompt()
        assert len(eng._st.tokens) == eng.n_past
        n_img = eng.vision_cfg.qformer.query_length
        emb = np.zeros((n_img, eng.llm_cfg.n_embd), np.float32)
        eng.begin_chat_image(emb, "what?")
        assert len(eng._st.tokens) == eng.n_past
        # image rows recorded as sentinels
        assert eng._st.tokens.count(-1) == n_img
        list(eng.generate(limit=8, params=SamplingParams(temp=0.0),
                          speculative_k=4))
        assert len(eng._st.tokens) == eng.n_past
        eng.reset_chat()
        assert eng._st.tokens == [] and eng.n_past == 0
        eng.close()

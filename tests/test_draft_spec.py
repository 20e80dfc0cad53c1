"""Draft-MODEL speculative decoding (llama.draft_speculative_decode_loop +
engine draft_llm_path).

Contract: greedy output is token-for-token IDENTICAL to plain greedy decode
regardless of the drafter (a draft token is only accepted when it equals
the main model's own argmax at that position), preserving the reference's
greedy decode behavior (/root/reference/minigpt4.cpp:2449-2452).  The
drafter only changes throughput.  This is the llama.cpp "speculative"
example pattern (the reference's engine vendor), rebuilt TPU-native: each
draft-k + verify pass is ONE fused dispatch.
"""

import pytest

pytestmark = pytest.mark.slow  # serving/speculation suite (see conftest)

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from fixtures import build_container, build_llm
from minigpt4_tpu.engine import SamplingParams
from minigpt4_tpu.engine.device_sampling import DeviceSamplingConfig
from minigpt4_tpu.models import llama as llama_mod
from minigpt4_tpu.models.llama import LlamaConfig

CFG = LlamaConfig(n_vocab=96, n_embd=64, n_head=2, n_layer=2, n_rot=32,
                  n_ff=128, n_ctx=128)
DCFG = LlamaConfig(n_vocab=96, n_embd=32, n_head=2, n_layer=1, n_rot=16,
                   n_ff=64, n_ctx=128)


def _params(cfg, seed):
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


def _prefill(params, cfg, tokens):
    cache = llama_mod.init_cache(cfg)
    emb = llama_mod.embed_tokens(params, jnp.asarray(tokens, jnp.int32)[None])
    logits, cache = llama_mod.forward(params, cache, emb, jnp.int32(0), cfg)
    return logits, cache


def _run_draft(params, dparams, dcfg, prompt, n_passes, k):
    logits, cache = _prefill(params, CFG, prompt)
    dcache = llama_mod.init_cache(dcfg)
    # draft catch-up on the prompt
    demb = llama_mod.embed_tokens(dparams, jnp.asarray(prompt, jnp.int32)[None])
    _, dcache = llama_mod.forward(dparams, dcache, demb, jnp.int32(0), dcfg)
    tokens, counts, _, _, _ = llama_mod.draft_speculative_decode_loop(
        params, cache, dparams, dcache, logits, jnp.int32(len(prompt)),
        n_passes, k, CFG, dcfg)
    tok = np.asarray(tokens[0])
    cnt = np.asarray(counts[0])
    return np.concatenate([tok[i, : cnt[i]] for i in range(n_passes)]), cnt


class TestDraftLoop:
    PROMPT = [3, 11, 4, 11, 4, 11, 4, 9]

    def _plain(self, params, n_tokens):
        logits, cache = _prefill(params, CFG, self.PROMPT)
        toks, _, _ = llama_mod.decode_loop(
            params, cache, logits, jnp.int32(len(self.PROMPT)), n_tokens,
            jax.random.PRNGKey(0), DeviceSamplingConfig(temp=0.0), CFG)
        return np.asarray(toks[0])

    def test_self_draft_accepts_everything(self):
        """Draft == main model: every draft equals the main argmax, so every
        pass accepts k tokens (the mechanism's sanity bound)."""
        params = _params(CFG, 0)
        emitted, cnt = _run_draft(params, params, CFG, self.PROMPT, 4, 4)
        np.testing.assert_array_equal(cnt, np.full(4, 4))
        np.testing.assert_array_equal(emitted, self._plain(params, 16))

    def test_weak_draft_is_still_exact(self):
        """An unrelated drafter (different weights, even a different
        architecture) accepts little but NEVER changes the greedy output."""
        params = _params(CFG, 0)
        dparams = _params(DCFG, 7)
        emitted, cnt = _run_draft(params, dparams, DCFG, self.PROMPT, 6, 4)
        assert (cnt >= 1).all()
        want = self._plain(params, int(cnt.sum()))
        np.testing.assert_array_equal(emitted, want)

    def test_draft_cache_stays_gap_free(self):
        """After a fully-accepted pass the drafter has evaluated every
        position below the new cursor (the k-th draft step exists solely to
        close that gap) — a second run of passes stays exact."""
        params = _params(CFG, 0)
        emitted, cnt = _run_draft(params, params, CFG, self.PROMPT, 8, 4)
        np.testing.assert_array_equal(emitted[: len(emitted)],
                                      self._plain(params, int(cnt.sum())))


@pytest.fixture(scope="module")
def model_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("draft")
    rng = np.random.default_rng(42)
    model = build_container(tmp / "minigpt4-tiny.bin", rng, None)
    llm = build_llm(tmp / "vicuna-tiny.bin", rng, None)
    draft = build_llm(tmp / "draft-tiny.bin", np.random.default_rng(1234), None)
    return model, llm, draft


class TestEngineDraft:
    def test_engine_generate_equals_plain(self, model_files):
        """MiniGPT4Engine(draft_llm_path=...) emits exactly the no-draft
        engine's greedy tokens through the full chat flow, including the
        image-embedding prefill (which the drafter sees as zeros)."""
        from minigpt4_tpu.engine import MiniGPT4Engine

        model, llm, draft = model_files
        img = np.random.default_rng(0).normal(0, 1, (3, 28, 28)).astype(np.float32)

        def run(**kw):
            eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32, **kw)
            try:
                eng.system_prompt()
                emb = eng.encode_image(img)
                eng.begin_chat_image(emb, "what is this?")
                first = list(eng.generate(limit=12,
                                          params=SamplingParams(temp=0.0)))
                eng.begin_chat("and?")
                second = list(eng.generate(limit=6,
                                           params=SamplingParams(temp=0.0)))
                return first, second
            finally:
                eng.close()

        want = run()
        got = run(draft_llm_path=draft)
        assert got == want

    def test_mixed_sampling_then_greedy(self, model_files):
        """A stochastic (non-draft) generation between greedy ones leaves the
        draft cache behind the cursor; the catch-up prefill closes the gap
        and greedy output still matches a draft-free engine driven with the
        same seeds."""
        from minigpt4_tpu.engine import MiniGPT4Engine

        model, llm, draft = model_files

        def run(**kw):
            eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32, seed=77,
                                 **kw)
            try:
                eng.system_prompt()
                eng.begin_chat("hello")
                a = list(eng.generate(limit=5,
                                      params=SamplingParams(temp=0.8, top_k=5)))
                eng.begin_chat("more")
                b = list(eng.generate(limit=8, params=SamplingParams(temp=0.0)))
                return a, b
            finally:
                eng.close()

        want = run()
        got = run(draft_llm_path=draft)
        assert got == want

    def test_vocab_mismatch_rejected(self, model_files, tmp_path):
        from minigpt4_tpu.engine import MiniGPT4Engine
        import minigpt4_tpu.formats.ggml_llama as gl
        from fixtures import VOCAB

        import fixtures as fx

        model, llm, _ = model_files
        # a draft file with a different vocab size must be refused
        bad = tmp_path / "bad-draft.bin"
        hp = gl.LlamaHParams(n_vocab=VOCAB - 4, n_embd=fx.LLM_D,
                             n_mult=fx.LLM_FF, n_head=fx.LLM_HEADS,
                             n_layer=fx.LLM_LAYERS,
                             n_rot=fx.LLM_D // fx.LLM_HEADS, ftype=0)
        toks = [b"<unk>", b"<s>", b"</s>"] + [
            bytes([b]) for b in range(VOCAB - 7)]
        vocab = gl.LlamaVocab(tokens=toks, scores=[0.0] * len(toks))
        w = gl.LlamaFileWriter(bad, hp, vocab)
        rng = np.random.default_rng(5)

        def add(name, arr):
            a = np.ascontiguousarray(arr, np.float32).astype("<f4")
            w.add_tensor(name, a.shape, gl.DataType.F32,
                         a.view(np.uint8).reshape(-1))

        add("tok_embeddings.weight", rng.normal(0, 0.2, (VOCAB - 4, fx.LLM_D)))
        add("norm.weight", np.ones(fx.LLM_D))
        add("output.weight", rng.normal(0, 0.2, (VOCAB - 4, fx.LLM_D)))
        for i in range(fx.LLM_LAYERS):
            p = f"layers.{i}."
            add(p + "attention_norm.weight", np.ones(fx.LLM_D))
            for nm in ("wq", "wk", "wv", "wo"):
                add(p + f"attention.{nm}.weight",
                    rng.normal(0, 0.05, (fx.LLM_D, fx.LLM_D)))
            add(p + "ffn_norm.weight", np.ones(fx.LLM_D))
            add(p + "feed_forward.w1.weight",
                rng.normal(0, 0.05, (fx.LLM_FF, fx.LLM_D)))
            add(p + "feed_forward.w2.weight",
                rng.normal(0, 0.05, (fx.LLM_D, fx.LLM_FF)))
            add(p + "feed_forward.w3.weight",
                rng.normal(0, 0.05, (fx.LLM_FF, fx.LLM_D)))
        w.write()
        with pytest.raises(ValueError, match="vocab"):
            MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32,
                           draft_llm_path=bad)

    def test_checkpoint_restore_with_draft(self, model_files, tmp_path):
        """save/restore invalidates the drafter's cache (it describes the
        pre-restore history); generation after restore matches a draft-free
        engine following the same flow."""
        from minigpt4_tpu.engine import MiniGPT4Engine

        model, llm, draft = model_files

        def run(**kw):
            eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32, **kw)
            try:
                eng.system_prompt()
                eng.begin_chat("checkpoint me")
                a = list(eng.generate(limit=6, params=SamplingParams(temp=0.0)))
                p = tmp_path / f"st{bool(kw)}.npz"
                eng.save_state(p)
                eng.begin_chat("diverge")  # mutate, then roll back via restore
                list(eng.generate(limit=3, params=SamplingParams(temp=0.0)))
                eng.restore_state(p)
                eng.begin_chat("after restore")
                b = list(eng.generate(limit=6, params=SamplingParams(temp=0.0)))
                return a, b
            finally:
                eng.close()

        want = run()
        got = run(draft_llm_path=draft)
        assert got == want

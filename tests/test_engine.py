"""End-to-end engine tests on the tiny fixture models: the full reference
flow (load -> encode image -> system prompt -> image chat -> streamed decode
-> follow-up turn -> reset), plus determinism and chat-state semantics."""

import numpy as np
import pytest

from minigpt4_tpu.engine import MiniGPT4Engine, SamplingParams
from minigpt4_tpu.formats import DataType

from fixtures import build_tiny_models, QF_QUERIES, LLM_D


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("models")
    model, llm = build_tiny_models(tmp)
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
    yield eng
    eng.close()


def _rand_image(seed=0):
    return np.random.default_rng(seed).normal(0, 1, (3, 28, 28)).astype(np.float32)


def test_encode_image_shape(engine):
    emb = engine.encode_image(_rand_image())
    assert emb.shape == (QF_QUERIES, LLM_D)
    assert np.all(np.isfinite(emb))


def test_full_chat_flow(engine):
    engine.reset_chat()
    emb = engine.encode_image(_rand_image())
    engine.system_prompt()
    n_after_system = engine.n_past
    assert n_after_system > 0

    engine.begin_chat_image(emb, "what is this?")
    assert engine.n_past > n_after_system

    greedy = SamplingParams(temp=0.0)
    tokens = [engine.end_chat(greedy) for _ in range(8)]
    assert all(isinstance(t, str) for t in tokens)

    # follow-up turn
    engine.begin_chat("and then?")
    more = [engine.end_chat(greedy) for _ in range(4)]
    assert all(isinstance(t, str) for t in more)


def test_greedy_determinism(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("det")
    model, llm = build_tiny_models(tmp)
    outs = []
    for _ in range(2):
        eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16)
        eng.system_prompt()
        eng.begin_chat("hello")
        outs.append([eng.end_chat(SamplingParams(temp=0.0)) for _ in range(6)])
        eng.close()
    assert outs[0] == outs[1]


def test_reset_restores_initial_state(engine):
    engine.reset_chat()
    assert engine.n_past == 0
    engine.add_strings("abc")
    n1 = engine.n_past
    engine.reset_chat()
    assert engine.n_past == 0
    engine.add_strings("abc")
    assert engine.n_past == n1


def test_prefill_chunking_matches_oneshot(tmp_path_factory):
    """n_batch chunked prefill gives the same logits as one-shot."""
    tmp = tmp_path_factory.mktemp("chunk")
    model, llm = build_tiny_models(tmp)
    text = "The quick brown fox jumps over the lazy dog"

    e1 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=8)
    e1.add_strings(text)
    l1 = e1._last_logits.copy()
    e1.close()

    e2 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=512)
    e2.add_strings(text)
    l2 = e2._last_logits.copy()
    e2.close()
    # n_batch=8 chunks take the flash-decode attention path (s <= 8) whose
    # blockwise online softmax reorders f32 accumulation vs the one-shot
    # einsum; ~1e-3 relative drift on logits is expected, not a chunking bug
    np.testing.assert_allclose(l1, l2, rtol=5e-3, atol=5e-4)


def test_state_checkpoint_resume(tmp_path_factory):
    """A saved chat resumes in a fresh engine with identical greedy output
    (the reference's cursor is reset-only, minigpt4.cpp:2499-2502)."""
    tmp = tmp_path_factory.mktemp("ckpt")
    model, llm = build_tiny_models(tmp)

    e1 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
    e1.system_prompt()
    e1.begin_chat("tell me about llamas")
    e1.save_state(tmp / "state.npz")
    want = [e1.end_chat(SamplingParams(temp=0.0)) for _ in range(5)]
    e1.close()

    e2 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
    e2.restore_state(tmp / "state.npz")
    got = [e2.end_chat(SamplingParams(temp=0.0)) for _ in range(5)]
    e2.close()
    assert got == want

    # geometry mismatch is refused
    e3 = MiniGPT4Engine(model, llm, n_ctx=64, n_batch=32)
    with pytest.raises(ValueError, match="cache shape"):
        e3.restore_state(tmp / "state.npz")
    e3.close()


def test_f8_cache_end_to_end(tmp_path_factory):
    """fp8 (e4m3) KV-cache storage: generation runs, stays deterministic,
    and checkpoints round-trip (serving capacity option — halves cache
    memory per session)."""
    import jax.numpy as jnp

    tmp = tmp_path_factory.mktemp("f8")
    model, llm = build_tiny_models(tmp)

    e1 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32,
                        cache_dtype=jnp.float8_e4m3fn)
    assert e1.cache["k"].dtype == jnp.float8_e4m3fn
    e1.system_prompt()
    e1.begin_chat("tell me about llamas")
    e1.save_state(tmp / "state.npz")
    want = [e1.end_chat(SamplingParams(temp=0.0)) for _ in range(5)]
    e1.close()

    e2 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32,
                        cache_dtype=jnp.float8_e4m3fn)
    e2.restore_state(tmp / "state.npz")
    got = [e2.end_chat(SamplingParams(temp=0.0)) for _ in range(5)]
    e2.close()
    assert got == want
    assert all(isinstance(t, str) for t in want)


def test_eos_rules(engine):
    assert engine.contains_eos_token("##")
    assert not engine.contains_eos_token("#")
    assert not engine.contains_eos_token("x##")
    assert engine.is_eos("something###")
    assert not engine.is_eos("##")


def test_sampling_modes_run(engine):
    engine.reset_chat()
    engine.add_strings("Hi")
    for p in [
        SamplingParams(temp=0.8),
        SamplingParams(temp=0.8, mirostat=1),
        SamplingParams(temp=0.8, mirostat=2),
        SamplingParams(temp=0.8, top_k=0, top_p=0.5, tfs_z=0.9, typical_p=0.9),
    ]:
        tid = engine.sample_token(p)
        assert 0 <= tid < engine.llm_cfg.n_vocab


def test_context_overflow_raises(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ovf")
    model, llm = build_tiny_models(tmp)
    eng = MiniGPT4Engine(model, llm, n_ctx=16, n_batch=8)
    with pytest.raises(ValueError, match="context overflow"):
        eng.add_strings("a b c d e f g h i j k l m n o p q r s t")
    eng.close()


def test_quantized_models_end_to_end(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("qmodels")
    model, llm = build_tiny_models(tmp, quant=DataType.Q4_1)
    eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16)
    emb = eng.encode_image(_rand_image())
    assert np.all(np.isfinite(emb))
    eng.system_prompt()
    eng.begin_chat_image(emb, "ok?")
    toks = [eng.end_chat(SamplingParams(temp=0.0)) for _ in range(4)]
    assert all(isinstance(t, str) for t in toks)
    eng.close()


def test_repacked_quant_mode_end_to_end(tmp_path_factory):
    """quant_mode='repack' exercises the Pallas kernel (interpret mode on
    CPU) through the full engine."""
    tmp = tmp_path_factory.mktemp("repack_models")
    model, llm = build_tiny_models(tmp, quant=DataType.Q4_0)
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16, quant_mode="repack")
    eng.add_strings("Hi")
    tid = eng.sample_token(SamplingParams(temp=0.0))
    assert 0 <= tid < eng.llm_cfg.n_vocab

    eng2 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16, quant_mode="qtensor")
    eng2.add_strings("Hi")
    tid2 = eng2.sample_token(SamplingParams(temp=0.0))
    # bf16 kernel vs f32 fallback: logits correlated, argmax usually equal
    l1, l2 = eng._last_logits, eng2._last_logits
    corr = np.corrcoef(l1, l2)[0, 1]
    assert corr > 0.999
    eng.close()
    eng2.close()


def test_fused_decode_matches_stepwise_greedy(tmp_path_factory):
    """Chunked on-device decode == per-token host decode for greedy."""
    tmp = tmp_path_factory.mktemp("fused")
    model, llm = build_tiny_models(tmp)
    greedy = SamplingParams(temp=0.0)

    eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16)
    eng.system_prompt()
    eng.begin_chat("hello")
    stepwise = list(eng.generate(limit=10, params=greedy, decode_chunk=1))
    eng.close()

    eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16)
    eng.system_prompt()
    eng.begin_chat("hello")
    fused = list(eng.generate(limit=10, params=greedy, decode_chunk=4))
    eng.close()
    assert fused == stepwise


def test_wide_speculative_matches_plain_greedy(tmp_path_factory):
    """Wide verify blocks (k=16 > the old flash-decode S cap of 8) emit the
    same greedy tokens as the plain path, with >=2 passes per dispatch
    (_spec_passes)."""
    tmp = tmp_path_factory.mktemp("widespec")
    model, llm = build_tiny_models(tmp)
    greedy = SamplingParams(temp=0.0)

    eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16)
    eng.system_prompt()
    eng.begin_chat("hello hello hello")
    plain = list(eng.generate(limit=12, params=greedy, decode_chunk=1))
    eng.close()

    eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16, speculative_k=16)
    eng.system_prompt()
    eng.begin_chat("hello hello hello")
    spec = list(eng.generate(limit=12, params=greedy))
    eng.close()
    assert spec == plain


def test_fused_decode_stochastic_runs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fused_s")
    model, llm = build_tiny_models(tmp)
    eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16)
    eng.begin_chat("hi")
    toks = list(eng.generate(limit=6, params=SamplingParams(temp=0.9, top_k=20), decode_chunk=3))
    assert len(toks) <= 6
    assert all(isinstance(t, str) for t in toks)
    eng.close()


def test_warmup_runs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("warm")
    model, llm = build_tiny_models(tmp)
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
    eng.warmup(prefill_buckets=(8, 32), decode_chunks=(4,))
    # engine still fully functional afterwards
    eng.add_strings("hi")
    assert eng.sample_token(SamplingParams(temp=0.0)) >= 0
    eng.close()


def _stepwise_tokens(eng, prompt, n, params):
    eng.system_prompt()
    eng.begin_chat(prompt)
    return [eng.end_chat(params) for _ in range(n)]


@pytest.mark.parametrize("params", [
    SamplingParams(temp=0.0),
    SamplingParams(temp=0.9, top_k=20),
])
def test_step_lookahead_matches_unpipelined(tmp_path_factory, params):
    """The run-ahead pipeline on the strict per-token path (end_chat) emits
    exactly the sequence the depth-0 dispatch-then-fetch path emits, for
    both greedy and device-sampled configs (rng threading is deterministic
    through the queue)."""
    tmp = tmp_path_factory.mktemp("lookahead")
    model, llm = build_tiny_models(tmp)

    outs = []
    for depth in (0, 3):
        eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16, seed=7)
        eng.step_lookahead = depth
        outs.append(_stepwise_tokens(eng, "hello there", 12, params))
        eng.close()
    assert outs[0] == outs[1]


def test_step_lookahead_flushes_on_state_mutation(tmp_path_factory):
    """Interleaving end_chat with prefills/resets/cursor writes discards the
    run-ahead queue; the observable sequence matches the depth-0 engine."""
    tmp = tmp_path_factory.mktemp("lookahead_flush")
    model, llm = build_tiny_models(tmp)
    greedy = SamplingParams(temp=0.0)

    def drive(eng):
        out = []
        eng.system_prompt()
        eng.begin_chat("hello")
        out += [eng.end_chat(greedy) for _ in range(5)]
        eng.begin_chat("and then?")  # prefill mid-stream: must flush
        out += [eng.end_chat(greedy) for _ in range(5)]
        n = eng.n_past
        eng.n_past = n  # cursor write: must flush (ABI path)
        out += [eng.end_chat(greedy) for _ in range(3)]
        return out

    outs = []
    for depth in (0, 4):
        eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16)
        eng.step_lookahead = depth
        outs.append(drive(eng))
        eng.close()
    assert outs[0] == outs[1]


def test_step_lookahead_param_change_redispatches(tmp_path_factory):
    """Changing sampling knobs mid-stream flushes the queue dispatched under
    the old knobs; every emitted token was sampled with the params of the
    call that returned it."""
    tmp = tmp_path_factory.mktemp("lookahead_params")
    model, llm = build_tiny_models(tmp)

    def drive(eng):
        eng.system_prompt()
        eng.begin_chat("hi")
        a = [eng.end_chat(SamplingParams(temp=0.0)) for _ in range(4)]
        b = [eng.end_chat(SamplingParams(temp=0.9, top_k=10)) for _ in range(4)]
        c = [eng.end_chat(SamplingParams(temp=0.0)) for _ in range(4)]
        return a + b + c

    outs = []
    for depth in (0, 3):
        eng = MiniGPT4Engine(model, llm, n_ctx=512, n_batch=16, seed=11)
        eng.step_lookahead = depth
        outs.append(drive(eng))
        eng.close()
    assert outs[0] == outs[1]


def test_step_lookahead_context_shift(tmp_path_factory):
    """The run-ahead frontier stops at n_ctx; draining the queue then
    shifting against the COMMITTED cursor keeps decode exact across the
    boundary (same tokens as the depth-0 engine)."""
    tmp = tmp_path_factory.mktemp("lookahead_shift")
    model, llm = build_tiny_models(tmp)
    greedy = SamplingParams(temp=0.0)

    outs = []
    for depth in (0, 3):
        eng = MiniGPT4Engine(model, llm, n_ctx=32, n_batch=8,
                             context_shift=True)
        eng.step_lookahead = depth
        eng.add_strings("a b c d e f g h")
        eng._st.n_keep = eng.n_past
        # decode well past n_ctx=32: multiple shifts under the pipeline
        outs.append([eng.end_chat(greedy) for _ in range(40)])
        eng.close()
    assert outs[0] == outs[1]

"""Context shift (llama.cpp-style K-shift): unbounded-length chats.

The reference has NO overflow handling at all — decoding past n_ctx is
simply unguarded (SURVEY §5 "long-context": "overflow beyond n_ctx is not
even guarded in this repo").  This framework raises a typed error by
default (strict behavior) and, with ``context_shift=True``, instead drops
the oldest turns after the system-prompt/image keep prefix and slides the
KV cache down with K re-rotation (llama.shift_kv_cache) — the llama.cpp
"context shift" serving behavior, exact in its position algebra.
"""

import pytest

pytestmark = pytest.mark.slow  # serving/speculation suite (see conftest)

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minigpt4_tpu.models import llama as llama_mod
from minigpt4_tpu.models.llama import LlamaConfig

from fixtures import build_tiny_models


def _tiny_cfg(n_layer: int) -> LlamaConfig:
    return LlamaConfig(
        n_vocab=96, n_embd=64, n_head=4, n_layer=n_layer, n_rot=16,
        n_ff=128, n_ctx=64,
    )


def _dense_params(cfg: LlamaConfig, seed: int = 0) -> dict:
    key = jax.random.PRNGKey(seed)

    def lin(n_in, n_out, lead=(cfg.n_layer,)):
        nonlocal key
        key, sub = jax.random.split(key)
        return {"w": jax.random.normal(sub, (*lead, n_in, n_out), jnp.float32) * 0.05}

    d, ff = cfg.n_embd, cfg.n_ff
    key, sub = jax.random.split(key)
    return {
        "tok_embeddings": jax.random.normal(sub, (cfg.n_vocab, d), jnp.float32) * 0.3,
        "norm": jnp.ones((d,), jnp.float32),
        "output": lin(d, cfg.n_vocab, lead=()),
        "layers": {
            "attention_norm": jnp.ones((cfg.n_layer, d), jnp.float32),
            "ffn_norm": jnp.ones((cfg.n_layer, d), jnp.float32),
            "wqkv": lin(d, 3 * d),
            "wo": lin(d, d),
            "w13": lin(d, 2 * ff),
            "w2": lin(ff, d),
        },
    }


def test_shift_rerotation_matches_new_positions():
    """The moved K rows must equal RoPE applied at their NEW absolute
    positions: row j (>= keep) after a shift of ``drop`` holds the raw
    vector of old position j+drop rotated to position j.  V rows move
    unrotated.  The keep prefix is untouched."""
    cfg = _tiny_cfg(n_layer=2)
    L, B, H, C, Dh = cfg.n_layer, 1, cfg.n_head, cfg.n_ctx, cfg.head_dim
    rng = np.random.default_rng(0)
    raw_k = jnp.asarray(rng.normal(0, 1, (L, B, H, C, Dh)).astype(np.float32))
    raw_v = jnp.asarray(rng.normal(0, 1, (L, B, H, C, Dh)).astype(np.float32))

    def rope_all(x, positions):
        # rope_interleaved takes [B', H, S, Dh]: fold L into the batch dim
        return llama_mod.rope_interleaved(
            x.reshape(L * B, H, C, Dh), positions, cfg.rope_theta
        ).reshape(x.shape)

    pos = jnp.arange(C, dtype=jnp.int32)
    cache = {"k": rope_all(raw_k, pos), "v": raw_v}

    keep, drop, n_past = 5, 7, 24
    out = jax.jit(
        lambda c: llama_mod.shift_kv_cache(
            c, jnp.int32(keep), jnp.int32(drop), jnp.int32(n_past), cfg
        )
    )(cache)

    k, v = np.asarray(out["k"]), np.asarray(out["v"])
    ref_k = np.asarray(rope_all(raw_k, pos))  # rows at original positions
    # keep prefix: bit-identical rows
    np.testing.assert_array_equal(k[:, :, :, :keep], ref_k[:, :, :, :keep])
    np.testing.assert_array_equal(v[:, :, :, :keep],
                                  np.asarray(raw_v)[:, :, :, :keep])
    # moved region [keep, n_past-drop): raw of old pos j+drop at new pos j
    src = np.arange(keep, n_past - drop) + drop
    moved = jnp.take(raw_k, jnp.asarray(src), axis=3)
    want_k = np.asarray(
        llama_mod.rope_interleaved(
            moved.reshape(L * B, H, len(src), Dh),
            jnp.asarray(np.arange(keep, n_past - drop), jnp.int32),
            cfg.rope_theta,
        ).reshape(L, B, H, len(src), Dh)
    )
    np.testing.assert_allclose(
        k[:, :, :, keep : n_past - drop], want_k, rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(
        v[:, :, :, keep : n_past - drop],
        np.asarray(raw_v)[:, :, :, keep + drop : n_past],
    )


def test_shift_exact_on_one_layer_model():
    """For a 1-LAYER model, layer-0 K/V depend only on the own token, so a
    context shift is EXACTLY equivalent to having prefilled the surviving
    tokens alone — including the next step's logits.  (Deeper models share
    llama.cpp's approximation: surviving K/V values were computed while the
    dropped tokens were attendable.)"""
    cfg = _tiny_cfg(n_layer=1)
    params = _dense_params(cfg)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.n_vocab, 20, dtype=np.int64)
    keep, drop = 4, 6
    n_past = len(toks)

    fwd = jax.jit(
        lambda p, c, e, pos0: llama_mod.forward(p, c, e, pos0, cfg),
    )

    # A: full prefill, then shift
    cache = llama_mod.init_cache(cfg, 1, jnp.float32)
    _, cache = fwd(params, cache,
                   llama_mod.embed_tokens(params, jnp.asarray(toks)[None]),
                   jnp.int32(0))
    cache_a = llama_mod.shift_kv_cache(
        cache, jnp.int32(keep), jnp.int32(drop), jnp.int32(n_past), cfg)

    # B: prefill the survivors only
    survivors = np.concatenate([toks[:keep], toks[keep + drop:]])
    cache_b = llama_mod.init_cache(cfg, 1, jnp.float32)
    _, cache_b = fwd(params, cache_b,
                     llama_mod.embed_tokens(params, jnp.asarray(survivors)[None]),
                     jnp.int32(0))

    live = n_past - drop
    np.testing.assert_allclose(
        np.asarray(cache_a["k"])[:, :, :, :live],
        np.asarray(cache_b["k"])[:, :, :, :live], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(cache_a["v"])[:, :, :, :live],
        np.asarray(cache_b["v"])[:, :, :, :live], rtol=2e-5, atol=2e-5)

    # one more decode step from both caches: logits must agree
    nxt = jnp.asarray([[int(toks[-1])]])
    la, _ = fwd(params, cache_a, llama_mod.embed_tokens(params, nxt),
                jnp.int32(live))
    lb, _ = fwd(params, cache_b, llama_mod.embed_tokens(params, nxt),
                jnp.int32(live))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=5e-5, atol=5e-5)


@pytest.fixture(scope="module")
def shift_engine(tmp_path_factory):
    from minigpt4_tpu.engine import MiniGPT4Engine

    tmp = tmp_path_factory.mktemp("ctx_shift_models")
    model, llm = build_tiny_models(tmp)
    # the tiny-fixture tokenizer spends ~142 tokens on SYSTEM_PROMPT (the
    # un-droppable keep prefix) — n_ctx must exceed it with decode room
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16, context_shift=True)
    yield eng
    eng.close()


def test_engine_unbounded_chat(shift_engine):
    """With context_shift=True a chat decodes arbitrarily far past n_ctx:
    the cursor never overflows, the keep prefix (system prompt) survives
    every shift, and the token-history invariant holds throughout."""
    from minigpt4_tpu.engine import SamplingParams

    eng = shift_engine
    eng.reset_chat()
    eng.system_prompt()
    keep = eng._st.n_keep
    assert keep > 0
    kept_tokens = list(eng._st.tokens[:keep])
    eng.begin_chat("tell me everything")

    n_ctx = eng.llm_cfg.n_ctx
    total = 0
    params = SamplingParams(temp=0.7, top_k=40)
    steps = n_ctx + 33  # well past the context end, odd remainder
    for _ in range(steps):
        tok = eng.end_chat(params)
        assert isinstance(tok, str)
        total += 1
        assert eng.n_past <= n_ctx
        assert len(eng._st.tokens) == eng.n_past
    assert total == steps
    assert list(eng._st.tokens[:keep]) == kept_tokens

    # a follow-up turn still works after multiple shifts
    eng.begin_chat("and then?")
    more = [eng.end_chat(params) for _ in range(8)]
    assert all(isinstance(t, str) for t in more)
    assert eng.n_past <= n_ctx


def test_engine_fused_stream_shifts(shift_engine):
    """generate() (fused-chunk path) shifts mid-stream instead of stopping
    at the context end."""
    from minigpt4_tpu.engine import SamplingParams

    eng = shift_engine
    eng.reset_chat()
    eng.system_prompt()
    eng.begin_chat("go on")
    n_ctx = eng.llm_cfg.n_ctx
    room = n_ctx - eng.n_past
    got = 0
    # ask for far more than the remaining room; without shift the stream
    # would end at the context boundary
    for tok in eng.generate(limit=room + 64, params=SamplingParams(temp=0.8),
                            decode_chunk=16):
        got += 1
        assert eng.n_past <= n_ctx
    # EOS can stop it early, but it must be able to PASS the boundary
    if got < room + 16:
        pytest.skip(f"EOS before the context boundary (got {got})")
    assert eng.n_past <= n_ctx


def test_session_pool_shifts(tmp_path_factory):
    """Serving path: a SessionPool session with context_shift=True decodes
    past its session_ctx; the keep prefix (system prompt) survives."""
    from minigpt4_tpu.engine import SamplingParams
    from minigpt4_tpu.engine.sessions import SessionPool

    tmp = tmp_path_factory.mktemp("pool_shift_models")
    model, llm = build_tiny_models(tmp)
    pool = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=16,
                       context_shift=True)
    try:
        s = pool.new_session()
        pool.system_prompt(s)
        keep = s.state.n_keep
        assert keep > 0
        kept = list(s.state.tokens[:keep])
        s.ask("tell me more")
        room = 256 - s.n_past
        got = sum(1 for _ in s.generate(limit=room + 48,
                                        params=SamplingParams(temp=0.9)))
        assert s.n_past <= 256
        assert list(s.state.tokens[:keep]) == kept
        if got < room + 16:
            pytest.skip(f"EOS before the context boundary (got {got})")
    finally:
        pool.close()


def test_disabled_by_default(tmp_path_factory):
    """Strict parity: without context_shift the engine still refuses to
    decode past n_ctx (typed overflow error on the per-token path)."""
    from minigpt4_tpu.engine import MiniGPT4Engine, SamplingParams

    tmp = tmp_path_factory.mktemp("noshift_models")
    model, llm = build_tiny_models(tmp)
    eng = MiniGPT4Engine(model, llm, n_ctx=192, n_batch=16)
    try:
        eng.system_prompt()
        eng.begin_chat("hi")
        with pytest.raises(ValueError, match="context overflow"):
            for _ in range(2 * 192):
                eng.end_chat(SamplingParams(temp=0.5))
    finally:
        eng.close()


@pytest.mark.parametrize("paged", [False, True])
def test_continuous_batcher_shifts(tmp_path_factory, paged):
    """ContinuousBatcher + context_shift: a lane reaching the context end
    detaches, slides its cache down (K-shift) and RESUMES — the stream
    continues past the boundary instead of ending early.  Works in both
    dense-slot and paged-pool modes (the detach path evicts pages to a
    dense cache, shifts it, and re-admission scatters it back)."""
    from minigpt4_tpu.engine import SamplingParams
    from minigpt4_tpu.engine.sessions import ContinuousBatcher, SessionPool

    model, llm = build_tiny_models(
        tmp_path_factory.mktemp(f"cbshift{int(paged)}"))
    pool = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=16,
                       context_shift=True,
                       paged_pool_pages=8 if paged else None)
    cb = ContinuousBatcher(pool, max_batch=2, decode_chunk=8)
    try:
        s = pool.new_session()
        pool.system_prompt(s)
        keep = s.state.n_keep
        assert keep > 0
        kept = list(s.state.tokens[:keep])
        pool.begin_chat(s, "tell me more")
        room = 256 - s.n_past
        out = cb.submit(s, room + 48, SamplingParams(temp=0.9))
        got = 0
        while True:
            t = out.get(timeout=600)
            if t is cb._DONE:
                break
            if isinstance(t, Exception):
                raise t
            got += 1
        # cursor never overflowed, keep prefix survived, state coherent
        assert s.n_past <= 256
        assert len(s.state.tokens) == s.n_past
        assert list(s.state.tokens[:keep]) == kept
        if got < room + 8:
            pytest.skip(f"EOS before the context boundary (got {got})")
        s.close()
    finally:
        cb.close()
        pool.close()

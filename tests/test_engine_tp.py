"""Engine-level tensor parallelism: MiniGPT4Engine(tp=N) must produce
token-for-token identical greedy output to the single-chip engine, through
the full chat flow (prefill buckets, fused decode chunks, speculative
verify, per-token step) — on the 8-virtual-device CPU mesh (conftest).
"""

import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.engine.engine import MiniGPT4Engine
from minigpt4_tpu.engine.sampling import SamplingParams
from minigpt4_tpu.formats.dtypes import DataType

GREEDY = SamplingParams(temp=0.0)


def _chat(eng, limit=10, **gen):
    eng.system_prompt()
    eng.begin_chat("what is this?")
    return list(eng.generate(limit=limit, params=GREEDY, **gen))


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    return build_tiny_models(tmp_path_factory.mktemp("tp"))


@pytest.fixture(scope="module")
def baseline(models):
    model, llm = models
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16)
    toks = _chat(eng)
    eng.close()
    return toks


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_greedy_identical(models, baseline, tp):
    model, llm = models
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16, tp=tp)
    assert eng.mesh is not None and eng.mesh.shape["tp"] == tp
    toks = _chat(eng)
    eng.close()
    assert toks == baseline


def test_tp_speculative_greedy_identical(models, baseline):
    model, llm = models
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16, tp=2,
                         speculative_k=4)
    toks = _chat(eng)
    eng.close()
    assert toks == baseline


def test_tp_stepwise_end_chat(models, baseline):
    model, llm = models
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16, tp=2)
    eng.system_prompt()
    eng.begin_chat("what is this?")
    toks = [eng.end_chat(GREEDY) for _ in range(6)]
    eng.close()
    # end_chat returns raw tokens (no EOS filtering): compare the prefix of
    # the filtered baseline stream where they overlap
    assert "".join(baseline).startswith("".join(t for t in toks if t)[:4])


def test_tp_quantized_file(models, tmp_path_factory, baseline):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("tpq"),
                                   quant=DataType.Q5_0)
    e1 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16)
    t1 = _chat(e1)
    e1.close()
    e2 = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16, tp=2)
    t2 = _chat(e2)
    e2.close()
    assert t1 == t2


def test_engine_rejects_dp():
    # the chat/serving surface prefills at batch 1, which cannot shard over
    # a dp axis — the constructor refuses before any file IO rather than
    # crashing at the first prompt (dp lives in parallel.spmd's batched
    # entry points and in multi-session batching)
    with pytest.raises(ValueError, match="dp=2"):
        MiniGPT4Engine("x", "y", dp=2)


def test_session_pool_under_tp(models):
    """The serving layer runs unchanged over a TP engine: per-session caches
    are plain single-device arrays that jit reshards at dispatch (a
    device-side copy per join — acceptable; the stacked group cache then
    stays sharded across the group's lifetime)."""
    import numpy as np

    from minigpt4_tpu.engine.sessions import SessionPool

    model, llm = models
    pool = SessionPool(model, llm, session_ctx=256, tp=2)
    s = pool.new_session()
    s.upload_image(np.zeros((3, 28, 28), np.float32))
    s.ask("what?")
    toks = list(s.generate(limit=5, params=GREEDY))
    assert len(toks) >= 1
    s.close()
    pool.close()


def _pool_batch(pool, prompts, limit=12, decode_chunk=4):
    from minigpt4_tpu.engine.sessions import SessionPool  # noqa: F401

    sessions = []
    for q in prompts:
        s = pool.new_session()
        pool.begin_chat(s, q)
        sessions.append(s)
    out = pool.generate_batch(sessions, limit=limit, params=GREEDY,
                              decode_chunk=decode_chunk)
    states = [(s.n_past, list(s.state.tokens)) for s in sessions]
    for s in sessions:
        s.close()
    return out, states


@pytest.mark.slow
def test_paged_pool_composes_with_tp(models):
    """Paged KV serving under a tp=2 mesh (VERDICT r3 next #6): the pool's
    heads shard over 'tp' (parallel/spmd.pool_specs), SpmdStepFns carries
    sharded paged_* loops, and the greedy batched output is identical to
    the single-chip paged path — the capacity lever (paging) and the scale
    lever (tp) compose instead of silently falling back to dense."""
    from minigpt4_tpu.engine.sessions import SessionPool

    model, llm = models
    prompts = ["one two", "three four five", "six"]

    ref = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=16,
                      paged_pool_pages=8)
    want, wstate = _pool_batch(ref, prompts)
    ref.close()

    pool = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=16,
                       tp=2, paged_pool_pages=8)
    assert pool.paged_pool is not None, "pool must exist under a tp mesh"
    # the pool arrays carry the mesh placement (heads over tp)
    assert pool.paged_pool.sharding is not None
    # spy: the group must actually ADMIT paged (not fall back dense)
    admitted_flag = []
    orig = pool._try_admit_paged

    def spy(batch):
        r = orig(batch)
        admitted_flag.append(r is not None)
        return r

    pool._try_admit_paged = spy
    free0 = pool.paged_pool.free_pages
    got, gstate = _pool_batch(pool, prompts)
    assert admitted_flag and admitted_flag[0], "group fell back to dense"
    assert got == want
    assert gstate == wstate
    assert pool.paged_pool.free_pages == free0  # every page returned
    pool.close()


@pytest.mark.slow
def test_paged_spec_composes_with_tp(models):
    """Greedy speculative verify passes over the sharded pool
    (SpmdStepFns.paged_spec_loop) stay token-identical to the single-chip
    plain-paged output (the greedy speculation contract)."""
    from minigpt4_tpu.engine.sessions import SessionPool

    model, llm = models
    prompts = ["alpha beta", "gamma"]

    ref = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=16,
                      paged_pool_pages=8)
    want, wstate = _pool_batch(ref, prompts)
    ref.close()

    pool = SessionPool(model, llm, session_ctx=256, n_ctx=256, n_batch=16,
                       tp=2, paged_pool_pages=8, speculative_k=4)
    got, gstate = _pool_batch(pool, prompts)
    assert got == want
    assert gstate == wstate
    pool.close()

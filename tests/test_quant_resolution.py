"""Engine "auto" quant-mode resolution + default cache-dtype policy
(engine.resolve_llm_quant_mode / pick_cache_dtype).

The decoder's default TPU representation is direct-MXU i8 (w8a8) once the
quality harness recorded it default-eligible; these tests pin the
resolution rules without needing a TPU (backend passed explicitly).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.engine.engine import pick_cache_dtype, resolve_llm_quant_mode
from minigpt4_tpu.formats.dtypes import DataType
from minigpt4_tpu.formats.ggml_llama import LlamaFileReader


class FakeRec:
    def __init__(self, shape, dtype):
        self.shape = shape
        self.dtype = dtype
        self.n_elems = int(np.prod(shape))


class FakeReader:
    def __init__(self, recs, hparams=None):
        self.tensors = {str(i): r for i, r in enumerate(recs)}
        self.hparams = hparams


class HP:
    n_embd, n_head, n_layer = 5120, 40, 40


def _13b_like():
    # all major weights K % 256 == 0
    return FakeReader([
        FakeRec((5120, 5120), DataType.Q5_K),
        FakeRec((13824, 5120), DataType.Q5_K),
        FakeRec((5120, 13824), DataType.Q5_K),
        FakeRec((32000, 5120), DataType.Q6_K),
    ])


def test_auto_prefers_exact_gq_when_it_fits():
    # round-3 policy: EXACT group-quant is the default whenever codes +
    # scale planes + this config's cache fit the chip
    assert resolve_llm_quant_mode(_13b_like(), "auto", "tpu") == "gq"


def _real_13b_residency():
    r = _13b_like()
    r.hparams = HP
    # ~13 GB of quantized codes (real 13B scale)
    r.tensors["bulk"] = FakeRec((12_600_000_000 // 5120, 5120), DataType.Q5_K)
    return r


def test_auto_falls_to_w8a8_when_gq_does_not_fit(monkeypatch):
    r = _real_13b_residency()
    # single stream: gq + f8 cache fits (the measured 41 tok/s config)
    assert resolve_llm_quant_mode(r, "auto", "tpu", n_ctx=2048, batch=1) == "gq"
    # 8-lane dense serving NOW fits the exact path too: sub-byte packing
    # (group_i8.pack_codes, the load default) cuts q5_k codes to 0.625
    # B/weight — serving no longer silently re-quantizes (r3 weak #6)
    assert resolve_llm_quant_mode(r, "auto", "tpu", n_ctx=512, batch=8) == "gq"
    # with packing disabled the old 1 B/code residency is back over budget
    monkeypatch.setenv("MINIGPT4_TPU_GQ_PACK", "0")
    assert resolve_llm_quant_mode(r, "auto", "tpu", n_ctx=512, batch=8) == "w8a8"
    monkeypatch.delenv("MINIGPT4_TPU_GQ_PACK")
    # genuinely over-budget residency (no packing can save ~18.7e9 codes):
    # w8a8's re-quantized 1 B + smaller planes is the correct demotion
    r.tensors["bulk"] = FakeRec((18_700_000_000 // 5120, 5120), DataType.Q5_K)
    assert resolve_llm_quant_mode(r, "auto", "tpu", n_ctx=512, batch=8) == "w8a8"


def test_auto_gq_kill_switch(monkeypatch):
    import minigpt4_tpu.engine.engine as E

    monkeypatch.setattr(E, "AUTO_GQ", False)
    assert resolve_llm_quant_mode(_13b_like(), "auto", "tpu") == "w8a8"


def test_auto_unchanged_off_tpu_and_for_explicit_modes():
    r = _13b_like()
    assert resolve_llm_quant_mode(r, "auto", "cpu") == "auto"
    assert resolve_llm_quant_mode(r, "repack", "tpu") == "repack"
    assert resolve_llm_quant_mode(r, "qtensor", "tpu") == "qtensor"


def test_auto_keeps_exact_path_for_odd_geometries():
    r = FakeReader([FakeRec((64, 96), DataType.Q5_0)])  # K % 256 != 0
    assert resolve_llm_quant_mode(r, "auto", "tpu") == "auto"


def test_auto_unchanged_for_dense_files():
    r = FakeReader([FakeRec((64, 64), DataType.F16)])
    assert resolve_llm_quant_mode(r, "auto", "tpu") == "auto"


def test_env_kill_switch(monkeypatch):
    import minigpt4_tpu.engine.engine as E

    monkeypatch.setattr(E, "AUTO_W8A8", False)
    assert resolve_llm_quant_mode(_13b_like(), "auto", "tpu") == "auto"


def test_cache_dtype_f8_only_when_13b_w8a8_would_not_fit():
    big = _13b_like()
    big.hparams = HP
    # ~13 GB of i8 codes + 3.4 GB bf16 cache -> f8
    big.tensors["big"] = FakeRec((13_000_000_000 // 5120, 5120), DataType.Q5_K)
    assert pick_cache_dtype(big, "w8a8", 2048, 1, "tpu") == jnp.float8_e4m3fn
    # small residency: bf16 stays
    small = _13b_like()
    small.hparams = HP
    assert pick_cache_dtype(small, "w8a8", 2048, 1, "tpu") == jnp.bfloat16
    # non-w8a8 / non-tpu: bf16
    assert pick_cache_dtype(big, "repack", 2048, 1, "tpu") == jnp.bfloat16
    assert pick_cache_dtype(big, "w8a8", 2048, 1, "cpu") == jnp.bfloat16


def test_cpu_engine_behavior_unchanged(tmp_path):
    """On CPU the resolution is a no-op: the tiny fixture engine loads and
    decodes exactly as before."""
    from minigpt4_tpu.engine.engine import MiniGPT4Engine
    from minigpt4_tpu.engine.sampling import SamplingParams

    model, llm = build_tiny_models(tmp_path)
    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=16)
    assert eng.quant_mode in ("auto", "qtensor")
    assert eng.cache["k"].dtype == jnp.bfloat16
    eng.system_prompt()
    toks = [eng.end_chat(SamplingParams(temp=0.0)) for _ in range(3)]
    assert all(isinstance(t, str) for t in toks)
    eng.close()


def test_residency_driven_packing_override():
    """Round-5 policy: unpacked gq decodes faster (41.5 vs 38.8 tok/s,
    same-session A/B), so auto prefers UNPACKED when it fits and flips
    PACK_OVERRIDE to packed only when packing is what makes gq fit."""
    from minigpt4_tpu.ops import group_i8 as gq

    r = _real_13b_residency()
    try:
        # single stream: unpacked fits -> gq, packing OFF
        assert resolve_llm_quant_mode(r, "auto", "tpu", n_ctx=2048,
                                      batch=1) == "gq"
        assert gq.PACK_OVERRIDE is False and gq.pack_enabled() is False
        # 8-lane dense: only the packed codes fit -> gq, packing ON
        assert resolve_llm_quant_mode(r, "auto", "tpu", n_ctx=512,
                                      batch=8) == "gq"
        assert gq.PACK_OVERRIDE is True and gq.pack_enabled() is True
    finally:
        gq.PACK_OVERRIDE = None


def test_env_var_beats_pack_override(monkeypatch):
    from minigpt4_tpu.ops import group_i8 as gq

    monkeypatch.setenv("MINIGPT4_TPU_GQ_PACK", "0")
    try:
        gq.PACK_OVERRIDE = True
        assert gq.pack_enabled() is False  # explicit user choice wins
    finally:
        gq.PACK_OVERRIDE = None


def test_gate_pack_forcing_beats_env(monkeypatch):
    """_check_gq(pack=...) must produce the forced storage even when the
    user exported MINIGPT4_TPU_GQ_PACK (env beats PACK_OVERRIDE inside
    pack_enabled, so the gate forces via the env var itself)."""
    import numpy as np

    from minigpt4_tpu.kernel_gate import _gq_weight
    from minigpt4_tpu.ops import group_i8 as gq

    monkeypatch.setenv("MINIGPT4_TPU_GQ_PACK", "1")
    # reproduce _check_gq's forcing block for pack=False
    import os

    old = os.environ.get("MINIGPT4_TPU_GQ_PACK")
    os.environ["MINIGPT4_TPU_GQ_PACK"] = "0"
    try:
        w = _gq_weight(np.random.default_rng(0), 64, 512)
    finally:
        os.environ["MINIGPT4_TPU_GQ_PACK"] = old
    assert w.packing == "none"  # the nopack case really is unpacked
    assert os.environ["MINIGPT4_TPU_GQ_PACK"] == "1"  # restored


def test_bench_pack_policy_matches_engine_budget():
    """bench_pack_policy shares the engine's budget constants: 13B/7B
    single-stream resolve to UNPACKED (False), and a hypothetical
    geometry past the budget resolves to packed (True)."""
    from minigpt4_tpu import benchmark as B
    from minigpt4_tpu.models.llama import LlamaConfig
    from minigpt4_tpu.ops import group_i8 as gq

    try:
        assert B.bench_pack_policy(B.GEOMETRIES["13B"]) is False
        assert B.bench_pack_policy(B.GEOMETRIES["7B"]) is False
        big = LlamaConfig(n_vocab=32000, n_embd=8192, n_head=64,
                          n_layer=80, n_rot=128, n_ff=22016, n_ctx=2048)
        assert B.bench_pack_policy(big) is True
        assert gq.PACK_OVERRIDE is True
    finally:
        gq.PACK_OVERRIDE = None

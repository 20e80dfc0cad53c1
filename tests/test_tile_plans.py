"""Pin the kernel tile plans for the MEASURED engine configurations.

The 41.7 tok/s round-5 headline was measured on specific decode/prefill
tiles; `decode_plan`/`prefill_plan` are heuristics that a future refactor
could silently shift, changing the shipped perf without any test noticing
(tile choice is invisible to numerics tests).  These tests freeze the
plans for the headline shapes — change them ONLY together with a fresh
same-session engine A/B on TPU (docs/ROUND5_NOTES.md §5 records why:
per-shape microbenches were actively misleading here).
"""

import pytest

from minigpt4_tpu.ops.group_i8 import decode_plan, prefill_plan

# (k_stored, gs, exact, packing) for the 13B q5_k engine shapes in both
# code storages; K is the PADDED stored K for p5
SHAPES_13B_Q5K = [
    (5120, 32, True, "none"),
    (13824, 32, True, "none"),
    (5120, 32, True, "p5"),
    (14336, 32, True, "p5"),
]


@pytest.mark.parametrize("k,gs,exact,packing", SHAPES_13B_Q5K)
@pytest.mark.parametrize("m", [1, 8])
def test_decode_tiles_pinned_for_13b_q5k(k, gs, exact, packing, m):
    # every measured decode config runs tn=256 (TN 128 measured 35.0 tok/s
    # vs 41.7; 384/512 measured no better)
    assert decode_plan(k, m, gs, exact, packing, 256) == 256


def test_decode_tile_shrinks_only_for_the_q6k_overflow():
    # the one observed scoped-VMEM overflow (q6_k p6, padded K, M=8):
    # 16.07 MB vs the 16 MB limit -> tn halves; M=1 stays at 256
    assert decode_plan(14336, 8, 16, False, "p6", 256) == 128
    assert decode_plan(14336, 1, 16, False, "p6", 256) == 256


@pytest.mark.parametrize("k,packing,tk_want,tm_want", [
    # unpacked: largest chunk-multiple divisor of K within 2 KB/row
    (5120, "none", 1280, 512),
    (13824, "none", 1536, 512),
    # p5: 1024-multiples (the round-4 legality fix) at full tm
    (5120, "p5", 1024, 512),
    (14336, "p5", 2048, 512),
])
def test_prefill_tiles_pinned_for_13b_q5k(k, packing, tk_want, tm_want):
    tm, tn, tk = prefill_plan(k, 512, 32, packing, 256)
    assert (tm, tk) == (tm_want, tk_want), (tm, tn, tk)


@pytest.mark.parametrize("k,packing,plan_want", [
    # PREFILL_TN=1024 measured uniformly ~25% over tn=256 at M=512 (87-88
    # -> 116-119 TF/s on every 13B shape, same session — the x block
    # re-fetch per n step shrinks 4x; tools/sweep_prefill_tn.py)
    (5120, "none", (512, 1024, 1280)),
    (13824, "none", (512, 1024, 1536)),
    # p5 VMEM: tn shrinks BEFORE tm (tm=64 would re-run the dequant 8x
    # per M tile — the 462 ms pathology prefill_plan exists to avoid)
    (5120, "p5", (512, 1024, 1024)),
    (14336, "p5", (512, 512, 2048)),
])
def test_prefill_tn_default_plans_13b(k, packing, plan_want):
    from minigpt4_tpu.ops.group_i8 import PREFILL_TN

    assert PREFILL_TN == 1024
    assert prefill_plan(k, 512, 32, packing, PREFILL_TN) == plan_want

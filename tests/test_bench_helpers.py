"""Benchmark/kernel helper policies: realistic speculative acceptance and
the window-scaled flash KV block selection."""

import numpy as np

from minigpt4_tpu.benchmark import (
    REALISTIC_TEXT,
    spec_acceptance_on_stream,
    word_tokenize,
)
from minigpt4_tpu.ops.flash_decode import pick_blk


def test_acceptance_saturates_on_cyclic_stream():
    cyc = np.tile(np.arange(13, dtype=np.int32), 40)
    assert spec_acceptance_on_stream(cyc, k_spec=8) == 8.0


def test_acceptance_near_one_on_random_stream():
    rng = np.random.default_rng(0)
    stream = rng.integers(0, 5000, 600).astype(np.int32)
    acc = spec_acceptance_on_stream(stream, k_spec=8)
    assert 1.0 <= acc < 1.2  # random tokens: drafts almost never accepted


def test_acceptance_realistic_text_between_floor_and_bound():
    ids = word_tokenize(REALISTIC_TEXT)
    acc = spec_acceptance_on_stream(ids, k_spec=8)
    assert 1.0 <= acc < 8.0


def test_pick_blk_policy():
    # window-scaled: <=512 -> 128, 1024 -> 256, 2048 -> 512 (2048 cache)
    assert pick_blk(128, 2048) == 128
    assert pick_blk(512, 2048) == 128
    assert pick_blk(1024, 2048) == 256
    assert pick_blk(2048, 2048) == 512
    # never exceeds the cache, stays a divisor of it
    for w in (128, 512, 2048):
        for c in (64, 96, 128, 1024, 2048):
            b = pick_blk(w, c)
            assert b <= c and c % b == 0, (w, c, b)

"""Sampler chain unit tests (llama.cpp semantics)."""

import numpy as np

from minigpt4_tpu.engine.sampling import (
    Sampler,
    SamplingParams,
    tail_free_filter,
    top_k_filter,
    top_p_filter,
    typical_filter,
)


def test_greedy_is_argmax():
    s = Sampler(1)
    logits = np.array([0.1, 5.0, -2.0, 4.9], np.float32)
    assert s.sample(logits, SamplingParams(temp=0.0)) == 1


def test_top_k():
    logits = np.array([1.0, 3.0, 2.0, 5.0, 4.0], np.float32)
    idx = top_k_filter(logits, 3)
    assert list(idx) == [3, 4, 1]
    assert list(top_k_filter(logits, 100)) == [3, 4, 1, 2, 0]


def test_top_p_keeps_nucleus():
    probs = np.array([0.5, 0.3, 0.1, 0.06, 0.04])
    assert top_p_filter(probs, 0.79) == 2
    assert top_p_filter(probs, 0.8) == 2
    assert top_p_filter(probs, 0.81) == 3
    assert top_p_filter(probs, 1.0) == 5
    assert top_p_filter(probs, 0.0) == 1  # min_keep


def test_tail_free_passthrough_cases():
    probs = np.array([0.6, 0.4])
    assert tail_free_filter(probs, 0.5) == 2  # size <= 2
    probs = np.array([0.5, 0.3, 0.2])
    assert tail_free_filter(probs, 1.0) == 3  # z >= 1


def test_typical_keeps_near_entropy():
    probs = np.full(8, 1 / 8)
    kept = typical_filter(probs, 0.5)
    # uniform: all equally typical; cumulative crosses 0.5 after 4
    assert len(kept) == 4


def test_top_k_zero_means_full_vocab():
    s = Sampler(7)
    logits = np.zeros(50, np.float32)
    logits[10] = 100.0
    tid = s.sample(logits, SamplingParams(temp=0.5, top_k=0, top_p=1.0))
    assert tid == 10


def test_sampling_reproducible_with_seed():
    logits = np.random.default_rng(0).normal(0, 2, 100).astype(np.float32)
    p = SamplingParams(temp=1.0, top_k=40)
    a = [Sampler(123).sample(logits, p) for _ in range(5)]
    b = [Sampler(123).sample(logits, p) for _ in range(5)]
    assert a == b


def test_mirostat_mu_persists_and_updates():
    logits = np.random.default_rng(0).normal(0, 2, 100).astype(np.float32)
    s = Sampler(1)
    p = SamplingParams(temp=1.0, mirostat=2, mirostat_tau=5.0, mirostat_eta=0.5)
    s.sample(logits, p)
    mu1 = s.mirostat_mu
    assert mu1 is not None
    s.sample(logits, p)
    assert s.mirostat_mu != 2.0 * p.mirostat_tau or mu1 != s.mirostat_mu


def test_repeat_penalty_opt_in():
    s = Sampler(1)
    logits = np.array([2.0, 1.9, 0.0], np.float32)
    p = SamplingParams(temp=0.0, repeat_penalty=10.0, repeat_last_n=4)
    # reference behaviour: knobs accepted, not applied
    assert s.sample(logits, p, last_tokens=[0]) == 0
    # opt-in path applies them
    assert s.sample(logits, p, last_tokens=[0], apply_repeat_penalty=True) == 1

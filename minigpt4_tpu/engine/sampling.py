"""Token sampling: the llama.cpp sampler chain the reference drives.

Reference behaviour (MiniGPT4::sample_token, /root/reference/minigpt4.cpp:
2425-2483): greedy when temp <= 0; otherwise mirostat v1/v2 or the chain
top_k -> tail_free -> typical -> top_p -> temperature -> softmax-sample.
``top_k <= 0`` means the whole vocab.  The repeat/presence/frequency penalty
knobs are accepted but **never applied** — the reference never calls
llama_sample_repetition_penalty (SURVEY §3.4) — and we replicate that
capability-vs-behaviour quirk, while also providing an opt-in
``apply_repeat_penalty`` for users who want the knobs to work.

Mirostat mu persists across calls (the reference keeps it in a C++ ``static``
local — i.e. global state); we keep it per-sampler.

Runs on host over the downloaded logits: at >=30 tok/s the [V] float32
download plus numpy chain costs ~1 ms/token, far below the 33 ms budget, and
keeping it on host preserves bit-reproducible RNG behaviour across backends.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class SamplingParams:
    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.9
    tfs_z: float = 1.0
    typical_p: float = 1.0
    repeat_last_n: int = 64
    repeat_penalty: float = 1.1
    alpha_presence: float = 1.0
    alpha_frequency: float = 1.0
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 1.0
    penalize_nl: bool = True
    # additive per-token-id logit offsets (the OpenAI ``logit_bias`` knob —
    # an extension over the reference's sampler surface).  Applied BEFORE
    # the whole chain, on host and device alike; greedy with a bias picks
    # the argmax of the biased logits.
    logit_bias: dict | None = None


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max())
    return e / e.sum()


def top_k_filter(logits: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k highest logits, sorted descending."""
    k = min(max(k, 1), logits.size)
    idx = np.argpartition(-logits, k - 1)[:k]
    return idx[np.argsort(-logits[idx], kind="stable")]


def tail_free_filter(probs: np.ndarray, z: float, min_keep: int = 1) -> int:
    """Number of (desc-sorted) probs to keep under tail-free sampling."""
    n = probs.size
    if z >= 1.0 or n <= 2:
        return n
    fd = np.abs(np.diff(probs, n=2))  # |second derivative|, length n-2
    s = fd.sum()
    if s > 0:
        fd = fd / s
    else:
        fd = np.full(n - 2, 1.0 / (n - 2))
    cum = np.cumsum(fd)
    keep = int(np.searchsorted(cum, z) + 1)
    return max(min_keep, min(keep, n))


def typical_filter(probs: np.ndarray, p: float, min_keep: int = 1) -> np.ndarray:
    """Locally-typical sampling: reorder by |surprise - entropy| ascending and
    keep the smallest prefix with cumulative prob >= p.  Returns kept indices
    into the input array."""
    if p >= 1.0:
        return np.arange(probs.size)
    eps = 1e-12
    surprise = -np.log(probs + eps)
    entropy = float((probs * surprise).sum())
    shifted = np.abs(surprise - entropy)
    order = np.argsort(shifted, kind="stable")
    cum = np.cumsum(probs[order])
    last = int(np.searchsorted(cum, p) + 1)
    last = max(min_keep, min(last, probs.size))
    return order[:last]


def top_p_filter(probs: np.ndarray, p: float, min_keep: int = 1) -> int:
    """Number of (desc-sorted) probs to keep under nucleus sampling."""
    if p >= 1.0:
        return probs.size
    cum = np.cumsum(probs)
    keep = int(np.searchsorted(cum, p) + 1)
    return max(min_keep, min(keep, probs.size))


class Sampler:
    """Stateful sampler: RNG stream + mirostat mu (reference keeps mu in a
    function-static, minigpt4.cpp:2458-2468)."""

    def __init__(self, seed: int = 1337):
        self.rng = np.random.default_rng(seed if seed != 0 else None)
        self.mirostat_mu: float | None = None

    def reset(self, seed: int | None = None) -> None:
        if seed is not None:
            self.rng = np.random.default_rng(seed)
        self.mirostat_mu = None

    def sample(
        self,
        logits: np.ndarray,
        params: SamplingParams,
        last_tokens: list[int] | None = None,
        apply_repeat_penalty: bool = False,
        newline_id: int = 13,
    ) -> int:
        logits = np.asarray(logits, np.float32).copy()

        if params.logit_bias:
            for tid, b in params.logit_bias.items():
                tid = int(tid)
                if 0 <= tid < logits.size:
                    logits[tid] += float(b)

        if apply_repeat_penalty and last_tokens and params.repeat_penalty != 1.0:
            recent = np.unique(np.asarray(last_tokens[-params.repeat_last_n :], np.int64))
            has_nl = newline_id < logits.size
            nl_logit = logits[newline_id] if has_nl else 0.0
            sel = logits[recent]
            logits[recent] = np.where(sel > 0, sel / params.repeat_penalty, sel * params.repeat_penalty)
            if not params.penalize_nl and has_nl:
                logits[newline_id] = nl_logit

        if params.temp <= 0:
            return int(np.argmax(logits))

        if params.mirostat == 1:
            return self._mirostat_v1(logits, params)
        if params.mirostat == 2:
            return self._mirostat_v2(logits, params)

        top_k = params.top_k if params.top_k > 0 else logits.size
        idx = top_k_filter(logits, top_k)

        probs = _softmax(logits[idx])
        keep = tail_free_filter(probs, params.tfs_z)
        idx, probs = idx[:keep], probs[:keep]
        probs = probs / probs.sum()

        t_keep = typical_filter(probs, params.typical_p)
        idx, probs = idx[t_keep], probs[t_keep]
        probs = probs / probs.sum()

        keep = top_p_filter(probs, params.top_p)
        idx, probs = idx[:keep], probs[:keep]

        scaled = logits[idx] / params.temp
        probs = _softmax(scaled)
        choice = self.rng.choice(idx.size, p=probs)
        return int(idx[choice])

    # -- mirostat (Basu et al. 2021), llama.cpp variants --
    def _mirostat_v1(self, logits: np.ndarray, p: SamplingParams) -> int:
        if self.mirostat_mu is None:
            self.mirostat_mu = 2.0 * p.mirostat_tau
        m = 100
        logits = logits / p.temp
        probs = _softmax(logits)
        order = np.argsort(-probs, kind="stable")
        sp = probs[order]
        # estimate Zipf exponent s_hat from the top-m probabilities
        num = 0.0
        den = 0.0
        for i in range(min(m - 1, sp.size - 1)):
            t_i = np.log((i + 2) / (i + 1))
            b_i = np.log(sp[i] / sp[i + 1]) if sp[i + 1] > 0 else 0.0
            num += t_i * b_i
            den += t_i * t_i
        s_hat = num / den if den > 0 else 1.0
        eps = s_hat - 1.0
        n = logits.size
        k = ((eps * (2.0**self.mirostat_mu)) / (1 - n ** (-eps))) ** (1.0 / s_hat) if eps != 0 else n
        k = int(max(1, min(np.floor(k) if np.isfinite(k) else n, n)))
        idx = order[:k]
        kp = probs[idx] / probs[idx].sum()
        choice = int(idx[self.rng.choice(idx.size, p=kp)])
        surprise = -np.log2(probs[choice] + 1e-30)
        self.mirostat_mu -= p.mirostat_eta * (surprise - p.mirostat_tau)
        return choice

    def _mirostat_v2(self, logits: np.ndarray, p: SamplingParams) -> int:
        if self.mirostat_mu is None:
            self.mirostat_mu = 2.0 * p.mirostat_tau
        logits = logits / p.temp
        probs = _softmax(logits)
        surprises = -np.log2(probs + 1e-30)
        keep = surprises <= self.mirostat_mu
        if not keep.any():
            keep[np.argmax(probs)] = True
        idx = np.flatnonzero(keep)
        kp = probs[idx] / probs[idx].sum()
        choice = int(idx[self.rng.choice(idx.size, p=kp)])
        surprise = -np.log2(probs[choice] + 1e-30)
        self.mirostat_mu -= p.mirostat_eta * (surprise - p.mirostat_tau)
        return choice

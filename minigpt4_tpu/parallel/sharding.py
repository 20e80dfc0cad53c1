"""Sharding rules: NamedSharding pytrees for model params and caches.

Megatron-style tensor parallelism expressed purely as placement — XLA inserts
the (all-reduce) collectives over ICI from the shardings:

  LLaMA layer (stacked [L, ...]):
    wq/wk/wv   column-parallel  (output/head dim over tp)
    wo         row-parallel     (contracting dim over tp -> psum)
    w1/w3      column-parallel
    w2         row-parallel
    norms      replicated
    KV cache   sharded over heads (axis 2 of [L, B, H, C, Dh]) + dp batch

  ViT blocks mirror the same pattern (qkv/fc1 column, proj/fc2 row).

Dense weights are stored [K, N]; a "column" shard is the last axis, a "row"
shard the first (after the stacked L axis).  Quantized weights are packed
[*, N, row_bytes]: a column shard splits N (axis -2); a row shard splits the
packed byte axis (axis -1), which is legal because byte offsets are
proportional to K when K/tp is a multiple of the quant block size (256 | K/tp
holds for every supported geometry).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.params import QTensor


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _linear_sharding(mesh: Mesh, p: dict, kind: str, stacked: bool) -> dict:
    """kind: 'col' | 'row' | 'rep'.  Returns sharding pytree matching p.

    Falls back to replication per-array when the target dimension is not
    divisible by the tp extent (e.g. odd vocab sizes)."""
    tp = mesh.shape["tp"]

    def axis_ok(size: int) -> bool:
        return size % tp == 0

    from ..ops.repack import RepackedQuant

    w = p["w"]
    out: dict = {}
    if isinstance(w, list):
        # heterogeneous per-layer formats (mixed-quant files): replicate
        return _rep_tree(mesh, p)
    if isinstance(w, RepackedQuant):
        # TPU-plane weights: column (N) sharding splits every plane's -2
        # axis.  Row (K) sharding needs the per-shard repack + shard_map
        # execution in parallel/spmd.py (auto-SPMD has no partitioning rule
        # for the Pallas call anyway); under THIS auto-SPMD placement,
        # row-parallel quantized layers stay replicated.
        nd = w.codes.ndim
        col_ok = kind == "col" and axis_ok(w.codes.shape[-2])
        axes = [None] * nd
        if col_ok:
            axes[-2] = "tp"
        spec = _ns(mesh, *axes)
        out["w"] = RepackedQuant(
            spec, spec, spec, spec if w.hi is not None else None,
            w.dtype, w.n_in, w.group_size, w.code_bits, w.hi_bits,
        )
        if "b" in p:
            b = p["b"]
            baxes = [None] * b.ndim
            if col_ok and axis_ok(b.shape[-1]):
                baxes[-1] = "tp"
            out["b"] = _ns(mesh, *baxes)
        return out
    if isinstance(w, QTensor):
        nd = w.packed.ndim  # [L?, N, rb]
        axes = [None] * nd
        if kind == "col" and axis_ok(w.packed.shape[-2]):
            axes[-2] = "tp"
        elif kind == "row" and axis_ok(w.packed.shape[-1]) and axis_ok(w.n_in):
            # K-sharding the packed byte axis: legal iff K/tp is a whole
            # number of quant blocks, i.e. row_bytes and K both divide
            from ..formats.dtypes import traits

            if (w.n_in // tp) % traits(w.dtype).block_elems == 0:
                axes[-1] = "tp"
        out["w"] = QTensor(_ns(mesh, *axes), w.dtype, w.n_in)  # sharding in packed slot
        col_sharded = axes[-2] == "tp" if nd >= 2 else False
    else:
        nd = w.ndim  # [L?, K, N]
        axes = [None] * nd
        if kind == "col" and axis_ok(w.shape[-1]):
            axes[-1] = "tp"
        elif kind == "row" and axis_ok(w.shape[-2]):
            axes[-2] = "tp"
        out["w"] = _ns(mesh, *axes)
        col_sharded = axes[-1] == "tp"
    if "b" in p:
        b = p["b"]
        axes = [None] * b.ndim
        if kind == "col" and col_sharded and axis_ok(b.shape[-1]):
            axes[-1] = "tp"
        out["b"] = _ns(mesh, *axes)
    return out


def _rep_tree(mesh: Mesh, tree):
    from ..ops.repack import RepackedQuant

    def rep(x):
        if isinstance(x, QTensor):
            return QTensor(_ns(mesh), x.dtype, x.n_in)
        if isinstance(x, RepackedQuant):
            r = _ns(mesh)
            return RepackedQuant(
                r, r, r, r if x.hi is not None else None,
                x.dtype, x.n_in, x.group_size, x.code_bits, x.hi_bits,
            )
        return _ns(mesh)

    return jax.tree_util.tree_map(
        rep, tree,
        is_leaf=lambda x: isinstance(x, (QTensor, RepackedQuant))
        or not isinstance(x, (dict, list, tuple)),
    )


def llama_param_shardings(mesh: Mesh, params: dict) -> dict:
    layers = params["layers"]
    ls: dict = {}
    for name in layers:
        if name in ("attention_norm", "ffn_norm"):
            ls[name] = _ns(mesh)
        elif name in ("wq", "wk", "wv", "w1", "w3"):
            ls[name] = _linear_sharding(mesh, layers[name], "col", stacked=True)
        elif name in ("wo", "w2"):
            ls[name] = _linear_sharding(mesh, layers[name], "row", stacked=True)
        else:
            ls[name] = _rep_tree(mesh, layers[name])
    return {
        "tok_embeddings": _ns(mesh),
        "norm": _ns(mesh),
        # vocab-parallel head: logits all-gather is one [B, V/tp] collective
        "output": _linear_sharding(mesh, params["output"], "col", stacked=False),
        "layers": ls,
    }


def cache_sharding(mesh: Mesh) -> dict:
    # [L, B, H, C, Dh]: batch over dp, heads over tp
    s = _ns(mesh, None, "dp", "tp", None, None)
    return {"k": s, "v": s}


def vit_param_shardings(mesh: Mesh, params: dict) -> dict:
    blocks = params["blocks"]
    bs: dict = {}
    for name in blocks:
        if name in ("qkv", "fc1"):
            bs[name] = _linear_sharding(mesh, blocks[name], "col", stacked=True)
        elif name in ("proj", "fc2"):
            bs[name] = _linear_sharding(mesh, blocks[name], "row", stacked=True)
        else:
            bs[name] = _rep_tree(mesh, blocks[name])
    return {
        "patch_embed": _rep_tree(mesh, params["patch_embed"]),
        "cls_token": _ns(mesh),
        "pos_embed": _ns(mesh),
        "blocks": bs,
    }


def vision_param_shardings(mesh: Mesh, params: dict) -> dict:
    return {
        "visual_encoder": vit_param_shardings(mesh, params["visual_encoder"]),
        "ln_vision": _rep_tree(mesh, params["ln_vision"]),
        # Q-Former is small (~100M): replicate
        "qformer": _rep_tree(mesh, params["qformer"]),
        "llama_proj": _rep_tree(mesh, params["llama_proj"]),
    }


def apply_shardings(params, shardings):
    """device_put the param pytree with its sharding pytree (quantized-weight
    shardings ride in the container's array slots)."""
    from ..ops.repack import RepackedQuant

    def put(p, s):
        if isinstance(p, QTensor):
            return QTensor(jax.device_put(p.packed, s.packed), p.dtype, p.n_in)
        if isinstance(p, RepackedQuant):
            return RepackedQuant(
                jax.device_put(p.codes, s.codes),
                jax.device_put(p.scales, s.scales),
                jax.device_put(p.mins, s.mins),
                jax.device_put(p.hi, s.hi) if p.hi is not None else None,
                p.dtype, p.n_in, p.group_size, p.code_bits, p.hi_bits,
            )
        return jax.device_put(p, s)

    return jax.tree_util.tree_map(
        put, params, shardings,
        is_leaf=lambda x: isinstance(x, (QTensor, RepackedQuant)),
    )

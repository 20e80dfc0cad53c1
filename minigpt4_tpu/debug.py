"""Debug-by-dump tooling: per-stage intermediate capture for parity work.

The reference's correctness workflow was manual tensor diffing via a
``DUMP_TENSOR`` macro that computes one intermediate, writes every value to
``out.txt`` and exits (/root/reference/minigpt4.cpp:520-549).  The TPU-native
analogue captures *all* pipeline stages in one pass as named arrays, so a
greedy-parity investigation can bisect the first diverging stage against a
reference dump in one run instead of a recompile per tensor.

Usage::

    from minigpt4_tpu.debug import dump_vision_stages, save_dump
    stages = dump_vision_stages(engine.vision_params, pixels, engine.vision_cfg)
    save_dump(stages, "dump_tpu.npz")
    # compare with another dump:
    report = compare_dumps("dump_tpu.npz", "dump_ref.npz")
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .models import eva_vit, qformer
from .models.layers import layer_norm, linear
from .models.minigpt4 import LN_VISION_EPS, VisionConfig


def dump_vision_stages(params: dict, pixels: jnp.ndarray, cfg: VisionConfig) -> dict[str, np.ndarray]:
    """Run encode_image stage-by-stage, returning named intermediates:
    patch_embed, embeddings(+cls+pos), vit_block_{i}, ln_vision,
    qformer_layer_{i}, llama_proj."""
    import jax

    out: dict[str, np.ndarray] = {}
    vit = params["visual_encoder"]
    x = eva_vit.patch_embed(pixels, vit["patch_embed"], cfg.vit)
    out["patch_embed"] = np.asarray(x)
    b = x.shape[0]
    cls = jnp.broadcast_to(vit["cls_token"].astype(x.dtype), (b, 1, cfg.vit.embed_dim))
    x = jnp.concatenate([cls, x], axis=1) + vit["pos_embed"].astype(x.dtype)
    out["embeddings"] = np.asarray(x)
    for i in range(cfg.vit.depth):
        bp = jax.tree_util.tree_map(lambda l: l[i], vit["blocks"])
        x = eva_vit.block_forward(x, bp, cfg.vit)
        out[f"vit_block_{i}"] = np.asarray(x)
    x = layer_norm(x, params["ln_vision"], LN_VISION_EPS)
    out["ln_vision"] = np.asarray(x)

    qf = params["qformer"]
    q = qf["query_tokens"].astype(x.dtype)
    h = jnp.broadcast_to(q, (b, *q.shape))
    h = layer_norm(h, qf["ln_embed"], qformer.LN_EPS)
    out["qformer_embed"] = np.asarray(h)
    for i, lp in enumerate(qf["layers"]):
        h = qformer.layer_forward(h, lp, cfg.qformer, x)
        out[f"qformer_layer_{i}"] = np.asarray(h)
    y = linear(h, params["llama_proj"])
    out["llama_proj"] = np.asarray(y)
    return out


def save_dump(stages: dict[str, np.ndarray], path: str) -> None:
    np.savez_compressed(path, **stages)


def compare_dumps(path_a: str, path_b: str, rtol: float = 1e-4, atol: float = 1e-5) -> list[dict]:
    """Per-stage divergence report (sorted in pipeline order)."""
    a = np.load(path_a)
    b = np.load(path_b)
    report = []
    for name in a.files:
        if name not in b.files:
            report.append({"stage": name, "status": "missing-in-b"})
            continue
        x, y = a[name], b[name]
        if x.shape != y.shape:
            report.append({"stage": name, "status": "shape", "a": x.shape, "b": y.shape})
            continue
        diff = np.abs(x.astype(np.float64) - y.astype(np.float64))
        scale = np.abs(y).max() + 1e-12
        ok = np.allclose(x, y, rtol=rtol, atol=atol)
        report.append(
            {
                "stage": name,
                "status": "ok" if ok else "DIVERGED",
                "max_abs": float(diff.max()),
                "max_rel": float(diff.max() / scale),
            }
        )
    return report


def first_divergence(report: list[dict]) -> dict | None:
    for r in report:
        if r["status"] != "ok":
            return r
    return None

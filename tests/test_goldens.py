"""Committed golden parity fixtures: stage-by-stage agreement with torch
ground truth (the systematic DUMP_TENSOR workflow — VERDICT.md round-1
missing #3; generated once by tools/make_goldens.py from independent torch /
HuggingFace implementations at a mid-size real-structure geometry: 257 ViT
positions, head_dim 88, Q-Former head_dim 64, 32 queries).

No torch at test time: the container is rebuilt from the stored weights and
compared via minigpt4_tpu.debug.compare_dumps."""

import json
from pathlib import Path

import numpy as np
import pytest

from minigpt4_tpu.debug import compare_dumps, dump_vision_stages, first_divergence, save_dump
from minigpt4_tpu.formats import ContainerReader, ContainerWriter, DataType

GOLDENS = Path(__file__).parent / "goldens" / "vision_goldens.npz"


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


def _build_container(g, path):
    cfg = json.loads(bytes(g["cfg/json"]).decode())
    cfg["ftype"] = "f32"
    w = ContainerWriter(path, ftype=1, config=cfg)
    models: dict[str, list] = {
        "visual_encoder": [], "ln_vision": [], "query_tokens": [],
        "Qformer": [], "llama_proj": [],
    }
    for key in g.files:
        if not key.startswith("w/"):
            continue
        _, model, name = key.split("/", 2)
        a = np.ascontiguousarray(g[key]).astype("<f4")
        models[model].append((name, a.shape, DataType.F32, a.view(np.uint8).reshape(-1)))
    for model, tensors in models.items():
        w.add_model(model, tensors)
    w.write()
    return path


def test_vision_stages_match_torch_goldens(goldens, tmp_path):
    import jax.numpy as jnp

    from minigpt4_tpu.models import minigpt4 as vision_mod

    path = _build_container(goldens, tmp_path / "goldens.bin")
    with ContainerReader(path) as r:
        params, cfg = vision_mod.load_params(r)
    stages = dump_vision_stages(
        params, jnp.asarray(goldens["in/pixels"]), cfg
    )

    save_dump(stages, tmp_path / "tpu.npz")
    save_dump(
        {k[len("g/"):]: goldens[k] for k in goldens.files if k.startswith("g/")},
        tmp_path / "ref.npz",
    )
    report = compare_dumps(str(tmp_path / "tpu.npz"), str(tmp_path / "ref.npz"),
                           rtol=2e-3, atol=2e-3)
    bad = first_divergence(report)
    assert bad is None, f"first divergence: {bad}\nfull report: {report}"
    # every stage present on both sides
    names = {r["stage"] for r in report}
    assert "patch_embed" in names and "llama_proj" in names
    assert any(n.startswith("qformer_layer_") for n in names)

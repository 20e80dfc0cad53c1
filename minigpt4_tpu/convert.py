"""Checkpoint converter: PyTorch MiniGPT-4 weights -> minigpt4 container.

Equivalent of the reference converter (/root/reference/minigpt4/convert.py).
The reference reconstructs the model by importing the MiniGPT-4 repo and
downloading EVA/Q-Former weights, then serializes five state dicts; this
converter takes the already-assembled weights — a checkpoint file (.pth /
.bin / .safetensors) whose keys carry the standard MiniGPT-4 prefixes:

    visual_encoder.*   ln_vision.*   query_tokens   Qformer.*   llama_proj.*

dtype policy (convert.py:104-121):
  * ftype f16: any ``*weight`` tensor with >= 2 dims inside an eligible
    sub-model is written f16 (query_tokens / ln_vision excluded);
  * ``patch_embed.proj.weight`` is always f16 (the reference forces this
    because ggml lacked f32 conv2d; we keep it for byte-compatible output);
  * everything else f32.  All tensors are squeezed like the reference.

CLI:  python -m minigpt4_tpu.convert checkpoint.pth -o minigpt4-7B-f16.bin --ftype f16
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from .formats import ContainerWriter, DataType

PREFIXES = ("visual_encoder.", "ln_vision.", "query_tokens", "Qformer.", "llama_proj.")

DEFAULT_QFORMER_CONFIG = {
    # BertConfig fields the engine consults (minigpt4.cpp:2146, 2227, 2293)
    "encoder_width": 1408,
    "query_length": 32,
    "num_hidden_layers": 12,
    "hidden_size": 768,
    "num_attention_heads": 12,
    "intermediate_size": 3072,
    "vocab_size": 30523,
    "layer_norm_eps": 1e-12,
    "add_cross_attention": True,
    "cross_attention_freq": 2,
}


def load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]  # MiniGPT-4 stage checkpoints wrap in {'model': ...}
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


def split_submodels(sd: dict[str, np.ndarray]) -> dict[str, dict[str, np.ndarray]]:
    out: dict[str, dict[str, np.ndarray]] = {
        "visual_encoder": {},
        "ln_vision": {},
        "query_tokens": {},
        "Qformer": {},
        "llama_proj": {},
    }
    for k, v in sd.items():
        if k.startswith("visual_encoder."):
            out["visual_encoder"][k[len("visual_encoder.") :]] = v
        elif k.startswith("ln_vision."):
            out["ln_vision"][k[len("ln_vision.") :]] = v
        elif k == "query_tokens" or k.startswith("query_tokens."):
            out["query_tokens"]["weight"] = v
        elif k.startswith("Qformer."):
            out["Qformer"][k[len("Qformer.") :]] = v
        elif k.startswith("llama_proj."):
            out["llama_proj"][k[len("llama_proj.") :]] = v
    return out


def convert(
    checkpoint: str | Path,
    out_path: str | Path,
    ftype: str = "f16",
    qformer_config: dict | None = None,
) -> Path:
    sd = load_state_dict(checkpoint)
    models = split_submodels(sd)
    missing = [m for m, t in models.items() if not t]
    if missing:
        raise ValueError(
            f"checkpoint lacks sub-models {missing}; expected keys with "
            f"prefixes {PREFIXES} (an assembled MiniGPT-4 state dict)"
        )

    qcfg = dict(DEFAULT_QFORMER_CONFIG)
    # derive what we can from the weights themselves
    qt = models["query_tokens"]["weight"]
    qt = np.squeeze(qt)
    qcfg["query_length"] = qt.shape[0]
    qcfg["hidden_size"] = qt.shape[1]
    layer_ids = [
        int(k.split(".")[3])
        for k in models["Qformer"]
        if k.startswith("bert.encoder.layer.")
    ]
    if layer_ids:
        qcfg["num_hidden_layers"] = max(layer_ids) + 1
    if "patch_embed.proj.weight" in models["visual_encoder"]:
        qcfg["encoder_width"] = models["visual_encoder"]["patch_embed.proj.weight"].shape[0]
    if qformer_config:
        qcfg.update(qformer_config)

    config = {"ftype": ftype, "Qformer": qcfg}
    writer = ContainerWriter(out_path, ftype=0 if ftype == "f16" else 1, config=config)

    for model_name, tensors in models.items():
        recs = []
        for layer_name, arr in tensors.items():
            arr = np.squeeze(np.asarray(arr))
            to_f16 = False
            if ftype == "f16":
                if model_name not in ("query_tokens", "ln_vision"):
                    if layer_name.endswith("weight") and arr.ndim >= 2:
                        to_f16 = True
            if layer_name == "patch_embed.proj.weight":
                to_f16 = True  # forced f16 like the reference (convert.py:113-117)
            if to_f16:
                a = arr.astype("<f2")
                recs.append((layer_name, a.shape, DataType.F16, a.view(np.uint8).reshape(-1)))
            elif arr.dtype == np.int32:
                a = arr.astype("<i4")
                recs.append((layer_name, a.shape, DataType.I32, a.view(np.uint8).reshape(-1)))
            elif arr.dtype == np.int64:
                a = arr.astype("<i8")
                recs.append((layer_name, a.shape, DataType.L64, a.view(np.uint8).reshape(-1)))
            else:
                a = arr.astype("<f4")
                recs.append((layer_name, a.shape, DataType.F32, a.view(np.uint8).reshape(-1)))
        writer.add_model(model_name, recs)
    writer.write()
    return Path(out_path)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Convert MiniGPT-4 torch weights to container")
    ap.add_argument("checkpoint", help=".pth/.bin/.safetensors with assembled MiniGPT-4 weights")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--ftype", default="f16", choices=["f16", "f32"])
    args = ap.parse_args(argv)
    out = args.out or f"minigpt4-{args.ftype}.bin"
    path = convert(args.checkpoint, out, args.ftype)
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main())

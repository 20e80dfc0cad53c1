"""Generate committed golden parity fixtures (tests/goldens/vision_goldens.npz).

The systematic version of the reference's DUMP_TENSOR workflow
(/root/reference/minigpt4.cpp:520-549): per-stage intermediates computed by
INDEPENDENT torch implementations (the TorchViT from tests/test_vision_parity
and HuggingFace's Blip2QFormerModel) at a mid-size geometry that keeps the
real structure — 257 ViT positions (224x224, patch 14), ViT head_dim 88,
Q-Former head_dim 64, 32 query tokens, cross-attention every 2 layers — with
reduced width/depth so the npz stays ~2 MB.

tests/test_goldens.py rebuilds the container from the stored weights, runs
minigpt4_tpu.debug.dump_vision_stages, and asserts per-stage agreement; no
torch is needed at test time.

Run once; commit the npz:  python tools/make_goldens.py
"""
import sys, pathlib
ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import numpy as np
import torch

# geometry: real structure, reduced width/depth
IMG, PATCH = 224, 14
VIT_D, VIT_DEPTH, VIT_HEADS, VIT_MLP = 88, 3, 1, 176  # head_dim 88 (real)
QF_H, QF_LAYERS, QF_HEADS, QF_Q, QF_FF = 64, 2, 1, 32, 128  # head_dim 64 (real)
PROJ = 128


def main():
    from test_vision_parity import TorchViT
    from transformers.models.blip_2.configuration_blip_2 import Blip2QFormerConfig
    from transformers.models.blip_2.modeling_blip_2 import Blip2QFormerModel

    torch.manual_seed(1234)
    out: dict[str, np.ndarray] = {}

    vit = TorchViT(img=IMG, patch=PATCH, d=VIT_D, depth=VIT_DEPTH,
                   heads=VIT_HEADS, mlp=VIT_MLP).eval()
    hf_cfg = Blip2QFormerConfig(
        vocab_size=30,
        hidden_size=QF_H,
        num_hidden_layers=QF_LAYERS,
        num_attention_heads=QF_HEADS,
        intermediate_size=QF_FF,
        encoder_hidden_size=VIT_D,
        cross_attention_frequency=2,
    )
    hf = Blip2QFormerModel(hf_cfg).eval()
    query_tokens = torch.randn(1, QF_Q, QF_H) * 0.5
    ln_vision_w = 1 + torch.randn(VIT_D) * 0.05
    ln_vision_b = torch.randn(VIT_D) * 0.05
    proj = torch.nn.Linear(QF_H, PROJ).eval()

    pixels = torch.randn(1, 3, IMG, IMG)
    out["in/pixels"] = pixels.numpy()

    # ---- staged torch ground truth (names match debug.dump_vision_stages)
    with torch.no_grad():
        x = vit.patch_embed(pixels).flatten(2).transpose(1, 2)
        out["g/patch_embed"] = x.numpy()
        cls = vit.cls_token.expand(1, -1, -1)
        x = torch.cat([cls, x], dim=1) + vit.pos_embed
        out["g/embeddings"] = x.numpy()
        for i, blk in enumerate(vit.blocks):
            x = blk(x)
            out[f"g/vit_block_{i}"] = x.numpy()
        x = torch.nn.functional.layer_norm(
            x, (VIT_D,), weight=ln_vision_w, bias=ln_vision_b, eps=1e-6
        )
        out["g/ln_vision"] = x.numpy()

        res = hf(
            query_embeds=query_tokens,
            encoder_hidden_states=x,
            output_hidden_states=True,
        )
        hs = res.hidden_states  # (embed_ln_out, layer1_out, ..., layerN_out)
        out["g/qformer_embed"] = hs[0].numpy()
        for i in range(QF_LAYERS):
            out[f"g/qformer_layer_{i}"] = hs[i + 1].numpy()
        y = proj(res.last_hidden_state)
        out["g/llama_proj"] = y.numpy()

    # ---- weights under container tensor names
    def w(model, name, t, squeeze=True):
        a = t.detach().numpy()
        if squeeze:
            a = np.squeeze(a)
        out[f"w/{model}/{name}"] = a.astype(np.float32)

    # visual_encoder (names per the reference's eva state dict)
    w("visual_encoder", "patch_embed.proj.weight", vit.patch_embed.weight, squeeze=False)
    w("visual_encoder", "patch_embed.proj.bias", vit.patch_embed.bias)
    w("visual_encoder", "cls_token", vit.cls_token)
    w("visual_encoder", "pos_embed", vit.pos_embed)
    for i, blk in enumerate(vit.blocks):
        p = f"blocks.{i}."
        w("visual_encoder", p + "norm1.weight", blk.norm1.weight)
        w("visual_encoder", p + "norm1.bias", blk.norm1.bias)
        w("visual_encoder", p + "attn.qkv.weight", blk.qkv.weight)
        w("visual_encoder", p + "attn.q_bias", blk.q_bias)
        w("visual_encoder", p + "attn.v_bias", blk.v_bias)
        w("visual_encoder", p + "attn.proj.weight", blk.proj.weight)
        w("visual_encoder", p + "attn.proj.bias", blk.proj.bias)
        w("visual_encoder", p + "norm2.weight", blk.norm2.weight)
        w("visual_encoder", p + "norm2.bias", blk.norm2.bias)
        w("visual_encoder", p + "mlp.fc1.weight", blk.fc1.weight)
        w("visual_encoder", p + "mlp.fc1.bias", blk.fc1.bias)
        w("visual_encoder", p + "mlp.fc2.weight", blk.fc2.weight)
        w("visual_encoder", p + "mlp.fc2.bias", blk.fc2.bias)
    w("ln_vision", "weight", ln_vision_w)
    w("ln_vision", "bias", ln_vision_b)
    w("query_tokens", "weight", query_tokens)

    sd = dict(hf.named_parameters())
    w("Qformer", "bert.embeddings.LayerNorm.weight", sd["layernorm.weight"])
    w("Qformer", "bert.embeddings.LayerNorm.bias", sd["layernorm.bias"])
    for i in range(QF_LAYERS):
        src = f"encoder.layer.{i}."
        dst = f"bert.encoder.layer.{i}."
        pairs = [
            ("attention.self.query", src + "attention.attention.query"),
            ("attention.self.key", src + "attention.attention.key"),
            ("attention.self.value", src + "attention.attention.value"),
            ("attention.output.dense", src + "attention.output.dense"),
        ]
        if src + "crossattention.attention.query.weight" in sd:
            pairs += [
                ("crossattention.self.query", src + "crossattention.attention.query"),
                ("crossattention.self.key", src + "crossattention.attention.key"),
                ("crossattention.self.value", src + "crossattention.attention.value"),
                ("crossattention.output.dense", src + "crossattention.output.dense"),
            ]
        for ours, theirs in pairs:
            w("Qformer", dst + ours + ".weight", sd[theirs + ".weight"])
            w("Qformer", dst + ours + ".bias", sd[theirs + ".bias"])
        for ln in ("attention.output.LayerNorm",) + (
            ("crossattention.output.LayerNorm",)
            if src + "crossattention.attention.query.weight" in sd else ()
        ):
            w("Qformer", dst + ln + ".weight", sd[src + ln + ".weight"])
            w("Qformer", dst + ln + ".bias", sd[src + ln + ".bias"])
        for tail in ("intermediate_query.dense", "output_query.dense",
                     "output_query.LayerNorm"):
            w("Qformer", dst + tail + ".weight", sd[src + tail + ".weight"])
            w("Qformer", dst + tail + ".bias", sd[src + tail + ".bias"])
    w("llama_proj", "weight", proj.weight)
    w("llama_proj", "bias", proj.bias)

    out["cfg/json"] = np.frombuffer(
        __import__("json").dumps({
            "vit": {"head_dim": VIT_D // VIT_HEADS},
            "Qformer": {
                "encoder_width": VIT_D,
                "query_length": QF_Q,
                "num_hidden_layers": QF_LAYERS,
                "hidden_size": QF_H,
                "num_attention_heads": QF_HEADS,
                "intermediate_size": QF_FF,
            },
        }).encode(), dtype=np.uint8)

    dest = ROOT / "tests" / "goldens"
    dest.mkdir(exist_ok=True)
    np.savez_compressed(dest / "vision_goldens.npz", **out)
    size = (dest / "vision_goldens.npz").stat().st_size
    print(f"wrote {dest/'vision_goldens.npz'} ({size/1e6:.2f} MB, {len(out)} arrays)")


if __name__ == "__main__":
    main()

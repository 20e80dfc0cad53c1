"""EVA-CLIP ViT-G visual encoder, TPU-native.

Architecture (reference graph: MiniGPT4::encode_image ViT section,
/root/reference/minigpt4.cpp:2144-2196; attention NNQKVAttention,
minigpt4.cpp:1246-1315):

  * 14x14 patch embedding over a 224x224 RGB image -> 256 patches, expressed
    as one [256, 588] x [588, 1408] MXU matmul (not a conv — XLA lowers small
    convs worse than an explicit patch-matmul);
  * learned cls token prepended (257 positions) + learned position embedding;
  * 39 pre-LN transformer blocks, 16 heads x head_dim 88 (= 1408), fused QKV
    projection whose bias is concat(q_bias, zeros, v_bias) — EVA trains no
    k bias (minigpt4.cpp:1259-1262);
  * MLP fc1 -> exact GELU -> fc2 (hidden 6144);
  * blocks run under ``lax.scan`` over stacked parameters: one compiled block,
    39 iterations — fast compiles and a layer-sharding seam for pipelining.

LayerNorm eps is 1e-6 (EVA/timm convention the torch ground truth uses).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .layers import gelu, layer_norm, merge_heads, mha, split_heads
from .params import QTensor, dense_from_numpy, linear

LN_EPS = 1e-6


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 39
    head_dim: int = 88
    mlp_dim: int = 6144

    @property
    def n_heads(self) -> int:
        return self.embed_dim // self.head_dim

    @property
    def n_patches_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_positions(self) -> int:
        return self.n_patches_side**2 + 1


def patch_embed(pixels: jnp.ndarray, p: dict, cfg: ViTConfig) -> jnp.ndarray:
    """pixels [B, 3, H, W] (CHW like the C ABI input, minigpt4.h image
    contract) -> [B, n_patches, D]."""
    b = pixels.shape[0]
    s, ps = cfg.n_patches_side, cfg.patch_size
    # [B, 3, s, ps, s, ps] -> [B, s, s, 3, ps, ps] -> [B, s*s, 3*ps*ps]
    x = pixels.reshape(b, 3, s, ps, s, ps).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, s * s, 3 * ps * ps)
    return linear(x, p)


def block_forward(x: jnp.ndarray, bp: dict, cfg: ViTConfig, li: int | None = None) -> jnp.ndarray:
    """One pre-LN ViT block. x [B, S, D].

    ``bp`` is either one block's params (li None) or the stacked blocks with
    a static index ``li`` (unrolled loop — quantized weights then stream
    zero-copy from the stacked arrays, see params.linear)."""

    def ln(p):
        return {"g": p["g"][li], "b": p["b"][li]} if li is not None else p

    h = layer_norm(x, ln(bp["norm1"]), LN_EPS)
    qkv = linear(h, bp["qkv"], li)  # [B, S, 3D]; bias = (q_bias, 0, v_bias)
    d = cfg.embed_dim
    q = split_heads(qkv[..., :d], cfg.n_heads)
    k = split_heads(qkv[..., d : 2 * d], cfg.n_heads)
    v = split_heads(qkv[..., 2 * d :], cfg.n_heads)
    attn = merge_heads(mha(q, k, v, scale=1.0 / float(np.sqrt(cfg.head_dim))))
    x = x + linear(attn, bp["proj"], li)

    h = layer_norm(x, ln(bp["norm2"]), LN_EPS)
    h = linear(h, bp["fc1"], li)
    h = gelu(h)
    h = linear(h, bp["fc2"], li)
    return x + h


def forward(params: dict, pixels: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """[B, 3, 224, 224] f32 -> [B, 257, 1408] (pre-ln_vision hidden states)."""
    x = patch_embed(pixels, params["patch_embed"], cfg)  # [B, 256, D]
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    for li in range(cfg.depth):
        x = block_forward(x, params["blocks"], cfg, li)
    return x


# ---------------------------------------------------------------------------
# parameter loading
# ---------------------------------------------------------------------------


def _stack(trees: list):
    """List of identical pytrees -> single pytree with leading L axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def load_params(reader, dtype=jnp.float32, quant_mode: str = "auto") -> tuple[dict, ViTConfig]:
    """Build ViT params from a ContainerReader's ``visual_encoder`` sub-model.

    Weight names follow the reference checkpoint (load_visual_encoder,
    /root/reference/minigpt4.cpp:1874-2000): ``patch_embed.proj.*``,
    ``cls_token``, ``pos_embed``, ``blocks.{i}.{norm1,attn.qkv,attn.q_bias,
    attn.v_bias,attn.proj,norm2,mlp.fc1,mlp.fc2}``.
    """
    sm = reader.models["visual_encoder"]
    names = sm.tensors.keys()
    depth = 1 + max(int(n.split(".")[1]) for n in names if n.startswith("blocks."))

    def t(name):
        return reader.tensor_f32("visual_encoder", name)

    pe_w = t("patch_embed.proj.weight")  # [D, 3, ps, ps]
    d_model = pe_w.shape[0]
    ps = pe_w.shape[-1]
    pos = t("pos_embed")  # [257, D] (squeezed)
    pos = pos.reshape(-1, d_model)
    # EVA ViT-G has head_dim 88; the reference derives heads = embed_dim/88
    # (minigpt4.cpp:2147).  Honor an optional container-config override so
    # non-EVA geometries load too.
    head_dim = reader.config.get("vit", {}).get(
        "head_dim", 88 if d_model % 88 == 0 else d_model // 4
    )
    cfg = ViTConfig(
        image_size=ps * int(np.sqrt(pos.shape[0] - 1)),
        patch_size=ps,
        embed_dim=d_model,
        depth=depth,
        head_dim=head_dim,
        mlp_dim=t("blocks.0.mlp.fc1.bias").shape[0],
    )

    params: dict = {
        "patch_embed": dense_from_numpy(pe_w.reshape(d_model, -1), t("patch_embed.proj.bias"), dtype),
        "cls_token": jnp.asarray(t("cls_token").reshape(-1), dtype),
        "pos_embed": jnp.asarray(pos, dtype),
    }

    blocks = []
    for i in range(depth):
        pfx = f"blocks.{i}."
        q_bias = t(pfx + "attn.q_bias").reshape(-1)
        v_bias = t(pfx + "attn.v_bias").reshape(-1)
        qkv_bias = np.concatenate([q_bias, np.zeros_like(q_bias), v_bias])
        qkv = _load_linear(reader, "visual_encoder", pfx + "attn.qkv.weight", qkv_bias, dtype, quant_mode)
        blocks.append(
            {
                "norm1": _ln(t, pfx + "norm1", dtype),
                "qkv": qkv,
                "proj": _load_linear(
                    reader, "visual_encoder", pfx + "attn.proj.weight",
                    t(pfx + "attn.proj.bias"), dtype, quant_mode,
                ),
                "norm2": _ln(t, pfx + "norm2", dtype),
                "fc1": _load_linear(
                    reader, "visual_encoder", pfx + "mlp.fc1.weight",
                    t(pfx + "mlp.fc1.bias"), dtype, quant_mode,
                ),
                "fc2": _load_linear(
                    reader, "visual_encoder", pfx + "mlp.fc2.weight",
                    t(pfx + "mlp.fc2.bias"), dtype, quant_mode,
                ),
            }
        )
    params["blocks"] = _stack(blocks)
    return params, cfg


def _ln(t, prefix: str, dtype) -> dict:
    return {"g": jnp.asarray(t(prefix + ".weight"), dtype), "b": jnp.asarray(t(prefix + ".bias"), dtype)}


def _load_linear(reader, model: str, wname: str, bias, dtype, quant_mode: str = "auto") -> dict:
    """Dense or quantized linear from the container; torch layout [out, in]."""
    from ..formats.dtypes import is_quantized
    from .params import load_quant_weight

    rec = reader.models[model].tensors[wname]
    if is_quantized(rec.dtype):
        p = {"w": load_quant_weight(reader.raw(model, wname), rec.shape, rec.dtype, quant_mode)}
        if bias is not None:
            p["b"] = jnp.asarray(bias, dtype)
        return p
    w = reader.tensor_f32(model, wname)
    return dense_from_numpy(w, bias, dtype)

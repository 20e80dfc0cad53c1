"""BLIP-2 Q-Former, TPU-native.

Reference graph: the Q-Former section of MiniGPT4::encode_image
(/root/reference/minigpt4.cpp:2203-2339) with NNSelfAttention
(minigpt4.cpp:1096-1244) and NNBertEncoderLayer (minigpt4.cpp:1324-1463).

Behavioural notes pinned to the reference:
  * the input sequence is exactly the 32 learned query tokens, LayerNormed by
    ``bert.embeddings.LayerNorm`` (minigpt4.cpp:2246);
  * self-attention runs over the queries; layers at the cross-attention
    frequency (every 2nd in BLIP-2) also cross-attend to the 257 ViT states;
  * with no text input, all attention masks are all-ones which inverts to an
    all-zero additive mask (minigpt4.cpp:2252-2268) — a no-op, so we omit
    mask tensors entirely;
  * the FFN is the query path only: ``intermediate_query`` -> GELU ->
    ``output_query`` (+residual, +LN) — the text FFN weights were stripped by
    the converter (convert.py:222-224);
  * 12 heads x 64 = hidden 768; LayerNorm eps 1e-12 (BertConfig default).

The 12 layers alternate structure (cross-attention on even layers), so the
loop is unrolled in Python rather than scanned — at 12 layers the compile-time
cost is negligible and uniform stacking would waste cross-attn weights on
layers that lack them.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .layers import gelu, layer_norm, merge_heads, mha, split_heads
from .params import linear

LN_EPS = 1e-12


@dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    n_heads: int = 12
    n_layers: int = 12
    encoder_width: int = 1408  # ViT embed dim (cross-attn K/V source)
    query_length: int = 32
    intermediate_size: int = 3072

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_heads

    @classmethod
    def from_container_config(cls, config: dict) -> "QFormerConfig":
        """From the JSON blob embedded in the model file (written by
        convert.py:162-167, read at minigpt4.cpp:1500-1501)."""
        q = config.get("Qformer", {})
        return cls(
            hidden_size=q.get("hidden_size", 768),
            n_heads=q.get("num_attention_heads", 12),
            n_layers=q.get("num_hidden_layers", 12),
            encoder_width=q.get("encoder_width", 1408),
            query_length=q.get("query_length", 32),
            intermediate_size=q.get("intermediate_size", 3072),
        )


def attention(
    x: jnp.ndarray,
    p: dict,
    cfg: QFormerConfig,
    kv_states: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """BERT-style attention block: projections + MHA + dense + residual + LN.

    ``kv_states`` switches to cross-attention (keys/values from the image
    encoder states), mirroring NNSelfAttention's is_cross_attention branch.
    """
    src = kv_states if kv_states is not None else x
    q = split_heads(linear(x, p["query"]), cfg.n_heads)
    k = split_heads(linear(src, p["key"]), cfg.n_heads)
    v = split_heads(linear(src, p["value"]), cfg.n_heads)
    ctx = merge_heads(mha(q, k, v, scale=1.0 / float(np.sqrt(cfg.head_dim))))
    h = linear(ctx, p["dense"])
    return layer_norm(h + x, p["ln"], LN_EPS)


def layer_forward(
    x: jnp.ndarray, lp: dict, cfg: QFormerConfig, image_states: jnp.ndarray
) -> jnp.ndarray:
    x = attention(x, lp["self"], cfg)
    if "cross" in lp:
        x = attention(x, lp["cross"], cfg, kv_states=image_states)
    h = linear(x, lp["intermediate_query"])
    h = gelu(h)
    h = linear(h, lp["output_query"])
    return layer_norm(h + x, lp["output_ln"], LN_EPS)


def forward(params: dict, image_states: jnp.ndarray, cfg: QFormerConfig) -> jnp.ndarray:
    """image_states [B, 257, encoder_width] -> [B, query_length, hidden]."""
    b = image_states.shape[0]
    q = params["query_tokens"].astype(image_states.dtype)  # [32, hidden]
    x = jnp.broadcast_to(q, (b, *q.shape))
    x = layer_norm(x, params["ln_embed"], LN_EPS)
    for lp in params["layers"]:
        x = layer_forward(x, lp, cfg, image_states)
    return x


# ---------------------------------------------------------------------------
# parameter loading
# ---------------------------------------------------------------------------


def load_params(reader, dtype=jnp.float32, quant_mode: str = "auto") -> tuple[dict, QFormerConfig]:
    """Build Q-Former params from the container's ``Qformer`` + ``query_tokens``
    sub-models (weight names: load_qformer, minigpt4.cpp:2002-2070)."""
    from .eva_vit import _load_linear, _ln

    cfg = QFormerConfig.from_container_config(reader.config)

    def t(name):
        return reader.tensor_f32("Qformer", name)

    names = set(reader.models["Qformer"].tensors.keys())
    n_layers = 1 + max(
        int(n.split(".")[3]) for n in names if n.startswith("bert.encoder.layer.")
    )

    params: dict = {
        "query_tokens": jnp.asarray(
            reader.tensor_f32("query_tokens", "weight").reshape(-1, cfg.hidden_size), dtype
        ),
        "ln_embed": _ln(t, "bert.embeddings.LayerNorm", dtype),
    }

    def attn_params(pfx: str) -> dict:
        return {
            "query": _load_linear(reader, "Qformer", pfx + "self.query.weight", t(pfx + "self.query.bias"), dtype, quant_mode),
            "key": _load_linear(reader, "Qformer", pfx + "self.key.weight", t(pfx + "self.key.bias"), dtype, quant_mode),
            "value": _load_linear(reader, "Qformer", pfx + "self.value.weight", t(pfx + "self.value.bias"), dtype, quant_mode),
            "dense": _load_linear(reader, "Qformer", pfx + "output.dense.weight", t(pfx + "output.dense.bias"), dtype, quant_mode),
            "ln": _ln(t, pfx + "output.LayerNorm", dtype),
        }

    layers = []
    for i in range(n_layers):
        pfx = f"bert.encoder.layer.{i}."
        lp = {"self": attn_params(pfx + "attention.")}
        if pfx + "crossattention.self.query.weight" in names:
            lp["cross"] = attn_params(pfx + "crossattention.")
        lp["intermediate_query"] = _load_linear(
            reader, "Qformer", pfx + "intermediate_query.dense.weight",
            t(pfx + "intermediate_query.dense.bias"), dtype, quant_mode,
        )
        lp["output_query"] = _load_linear(
            reader, "Qformer", pfx + "output_query.dense.weight",
            t(pfx + "output_query.dense.bias"), dtype, quant_mode,
        )
        lp["output_ln"] = _ln(t, pfx + "output_query.LayerNorm", dtype)
        layers.append(lp)
    params["layers"] = layers
    return params, cfg

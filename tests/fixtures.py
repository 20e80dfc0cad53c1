"""Builders for tiny synthetic model files (container + ggjt) with mutually
consistent dimensions — the fixture pair every end-to-end test drives.

Geometry: ViT(img 28, patch 14, d 32, depth 2, heads 4) -> Q-Former(hidden 16,
2 layers, cross on even, 4 queries) -> proj to 32 = LLM n_embd;
LLaMA(D 32, 4 heads, 2 layers, vocab 262 incl. 256 byte tokens).
"""

from __future__ import annotations

import numpy as np

from minigpt4_tpu.formats import (
    ContainerWriter,
    DataType,
    LlamaFileWriter,
    LlamaHParams,
    LlamaVocab,
    quants,
)

VIT_D, VIT_DEPTH, VIT_HEADS, VIT_MLP = 32, 2, 4, 64
QF_HIDDEN, QF_LAYERS, QF_HEADS, QF_QUERIES = 16, 2, 2, 4
LLM_D, LLM_HEADS, LLM_LAYERS, LLM_FF = 32, 4, 2, 128
VOCAB = 3 + 256 + 3  # specials + byte tokens + a few pieces


def _f32_payload(a: np.ndarray):
    a = np.ascontiguousarray(a, np.float32).astype("<f4")
    return a.shape, DataType.F32, a.view(np.uint8).reshape(-1)


def build_container(path, rng: np.random.Generator, quant: DataType | None = None,
                    llm_d: int = LLM_D):
    """Write a tiny but structurally faithful minigpt4 container."""
    cfg = {
        "ftype": "f32",
        "vit": {"head_dim": VIT_D // VIT_HEADS},
        "Qformer": {
            "encoder_width": VIT_D,
            "query_length": QF_QUERIES,
            "num_hidden_layers": QF_LAYERS,
            "hidden_size": QF_HIDDEN,
            "num_attention_heads": QF_HEADS,
            "intermediate_size": QF_HIDDEN * 2,
        },
    }
    w = ContainerWriter(path, ftype=1, config=cfg)

    def n(*shape, scale=0.05):
        return rng.normal(0, scale, shape).astype(np.float32)

    def add_t(tensors, name, arr, q=False):
        if q and quant is not None and arr.ndim == 2 and arr.size % 256 == 0:
            raw = quants.quantize(arr.reshape(-1), quant)
            tensors.append((name, arr.shape, quant, raw))
        else:
            shape, dt, raw = _f32_payload(arr)
            tensors.append((name, shape, dt, raw))

    ve = []
    add_t(ve, "patch_embed.proj.weight", n(VIT_D, 3, 14, 14))
    add_t(ve, "patch_embed.proj.bias", n(VIT_D))
    add_t(ve, "cls_token", n(VIT_D))
    add_t(ve, "pos_embed", n(5, VIT_D))  # (28/14)^2 + 1 positions
    for i in range(VIT_DEPTH):
        p = f"blocks.{i}."
        add_t(ve, p + "norm1.weight", 1 + n(VIT_D))
        add_t(ve, p + "norm1.bias", n(VIT_D))
        add_t(ve, p + "attn.qkv.weight", n(3 * VIT_D, VIT_D), q=True)
        add_t(ve, p + "attn.q_bias", n(VIT_D))
        add_t(ve, p + "attn.v_bias", n(VIT_D))
        add_t(ve, p + "attn.proj.weight", n(VIT_D, VIT_D), q=True)
        add_t(ve, p + "attn.proj.bias", n(VIT_D))
        add_t(ve, p + "norm2.weight", 1 + n(VIT_D))
        add_t(ve, p + "norm2.bias", n(VIT_D))
        add_t(ve, p + "mlp.fc1.weight", n(VIT_MLP, VIT_D), q=True)
        add_t(ve, p + "mlp.fc1.bias", n(VIT_MLP))
        add_t(ve, p + "mlp.fc2.weight", n(VIT_D, VIT_MLP), q=True)
        add_t(ve, p + "mlp.fc2.bias", n(VIT_D))
    w.add_model("visual_encoder", ve)

    ln = []
    add_t(ln, "weight", 1 + n(VIT_D))
    add_t(ln, "bias", n(VIT_D))
    w.add_model("ln_vision", ln)

    qt = []
    add_t(qt, "weight", n(QF_QUERIES, QF_HIDDEN))
    w.add_model("query_tokens", qt)

    qf = []
    add_t(qf, "bert.embeddings.LayerNorm.weight", 1 + n(QF_HIDDEN))
    add_t(qf, "bert.embeddings.LayerNorm.bias", n(QF_HIDDEN))
    for i in range(QF_LAYERS):
        p = f"bert.encoder.layer.{i}."
        for blk, width in [("attention.", QF_HIDDEN)] + (
            [("crossattention.", VIT_D)] if i % 2 == 0 else []
        ):
            add_t(qf, p + blk + "self.query.weight", n(QF_HIDDEN, QF_HIDDEN))
            add_t(qf, p + blk + "self.query.bias", n(QF_HIDDEN))
            add_t(qf, p + blk + "self.key.weight", n(QF_HIDDEN, width))
            add_t(qf, p + blk + "self.key.bias", n(QF_HIDDEN))
            add_t(qf, p + blk + "self.value.weight", n(QF_HIDDEN, width))
            add_t(qf, p + blk + "self.value.bias", n(QF_HIDDEN))
            add_t(qf, p + blk + "output.dense.weight", n(QF_HIDDEN, QF_HIDDEN))
            add_t(qf, p + blk + "output.dense.bias", n(QF_HIDDEN))
            add_t(qf, p + blk + "output.LayerNorm.weight", 1 + n(QF_HIDDEN))
            add_t(qf, p + blk + "output.LayerNorm.bias", n(QF_HIDDEN))
        add_t(qf, p + "intermediate_query.dense.weight", n(QF_HIDDEN * 2, QF_HIDDEN))
        add_t(qf, p + "intermediate_query.dense.bias", n(QF_HIDDEN * 2))
        add_t(qf, p + "output_query.dense.weight", n(QF_HIDDEN, QF_HIDDEN * 2))
        add_t(qf, p + "output_query.dense.bias", n(QF_HIDDEN))
        add_t(qf, p + "output_query.LayerNorm.weight", 1 + n(QF_HIDDEN))
        add_t(qf, p + "output_query.LayerNorm.bias", n(QF_HIDDEN))
    w.add_model("Qformer", qf)

    pj = []
    add_t(pj, "weight", n(llm_d, QF_HIDDEN))
    add_t(pj, "bias", n(llm_d))
    w.add_model("llama_proj", pj)
    w.write()
    return path


def build_llm(path, rng: np.random.Generator, quant: DataType | None = None):
    """Write a tiny ggjt-v3 LLaMA with a byte-fallback-complete vocab."""
    hp = LlamaHParams(
        n_vocab=VOCAB, n_embd=LLM_D, n_mult=LLM_FF, n_head=LLM_HEADS,
        n_layer=LLM_LAYERS, n_rot=LLM_D // LLM_HEADS, ftype=0,
    )
    assert hp.n_ff == LLM_FF
    toks = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)]
    toks += [b" Human", b" Assistant", b"###"]
    scores = [0.0] * 259 + [1.0, 1.0, 2.0]
    vocab = LlamaVocab(tokens=toks, scores=scores)
    w = LlamaFileWriter(path, hp, vocab)

    def n(*shape, scale=0.05):
        return rng.normal(0, scale, shape).astype(np.float32)

    def add(name, arr, q=False):
        if q and quant is not None and arr.size % 256 == 0:
            w.add_tensor(name, arr.shape, quant, quants.quantize(arr.reshape(-1), quant))
        else:
            a = np.ascontiguousarray(arr, np.float32).astype("<f4")
            w.add_tensor(name, a.shape, DataType.F32, a.view(np.uint8).reshape(-1))

    add("tok_embeddings.weight", n(VOCAB, LLM_D, scale=0.2))
    add("norm.weight", 1 + n(LLM_D))
    add("output.weight", n(VOCAB, LLM_D, scale=0.2), q=True)
    for i in range(LLM_LAYERS):
        p = f"layers.{i}."
        add(p + "attention_norm.weight", 1 + n(LLM_D))
        add(p + "attention.wq.weight", n(LLM_D, LLM_D), q=True)
        add(p + "attention.wk.weight", n(LLM_D, LLM_D), q=True)
        add(p + "attention.wv.weight", n(LLM_D, LLM_D), q=True)
        add(p + "attention.wo.weight", n(LLM_D, LLM_D), q=True)
        add(p + "ffn_norm.weight", 1 + n(LLM_D))
        add(p + "feed_forward.w1.weight", n(LLM_FF, LLM_D), q=True)
        add(p + "feed_forward.w2.weight", n(LLM_D, LLM_FF), q=True)
        add(p + "feed_forward.w3.weight", n(LLM_FF, LLM_D), q=True)
    w.write()
    return path


def build_tiny_models(tmp_path, quant: DataType | None = None, seed: int = 42):
    rng = np.random.default_rng(seed)
    model = build_container(tmp_path / "minigpt4-tiny.bin", rng, quant)
    llm = build_llm(tmp_path / "vicuna-tiny.bin", rng, quant)
    return model, llm


# GQ-ELIGIBLE geometry: every quantized matmul K is a 256 multiple, so the
# byte-code paths (gq / w8a8) load for real instead of falling back — the
# default 13B TPU resolution, exercised at test size (engine e2e in
# tests/test_engine_gq.py; the 32-wide geometry above can never take it).
GQ_D, GQ_HEADS, GQ_LAYERS, GQ_FF = 256, 4, 2, 768


def build_llm_gq(path, rng: np.random.Generator,
                 quant: DataType = DataType.Q5_K):
    """Tiny ggjt llama whose K dims (256/768) satisfy the byte-code
    eligibility rule (K % 256 == 0)."""
    hp = LlamaHParams(
        n_vocab=VOCAB, n_embd=GQ_D, n_mult=256, n_head=GQ_HEADS,
        n_layer=GQ_LAYERS, n_rot=GQ_D // GQ_HEADS, ftype=0,
    )
    assert hp.n_ff == GQ_FF, hp.n_ff
    toks = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)]
    toks += [b" Human", b" Assistant", b"###"]
    vocab = LlamaVocab(tokens=toks, scores=[0.0] * 259 + [1.0, 1.0, 2.0])
    w = LlamaFileWriter(path, hp, vocab)

    def n(*shape, scale=0.05):
        return rng.normal(0, scale, shape).astype(np.float32)

    def add(name, arr, q=False):
        if q and arr.size % 256 == 0:
            w.add_tensor(name, arr.shape, quant, quants.quantize(arr.reshape(-1), quant))
        else:
            a = np.ascontiguousarray(arr, np.float32).astype("<f4")
            w.add_tensor(name, a.shape, DataType.F32, a.view(np.uint8).reshape(-1))

    add("tok_embeddings.weight", n(VOCAB, GQ_D, scale=0.2))
    add("norm.weight", 1 + n(GQ_D))
    add("output.weight", n(VOCAB, GQ_D, scale=0.2), q=True)
    for i in range(GQ_LAYERS):
        p = f"layers.{i}."
        add(p + "attention_norm.weight", 1 + n(GQ_D))
        add(p + "attention.wq.weight", n(GQ_D, GQ_D), q=True)
        add(p + "attention.wk.weight", n(GQ_D, GQ_D), q=True)
        add(p + "attention.wv.weight", n(GQ_D, GQ_D), q=True)
        add(p + "attention.wo.weight", n(GQ_D, GQ_D), q=True)
        add(p + "ffn_norm.weight", 1 + n(GQ_D))
        add(p + "feed_forward.w1.weight", n(GQ_FF, GQ_D), q=True)
        add(p + "feed_forward.w2.weight", n(GQ_D, GQ_FF), q=True)
        add(p + "feed_forward.w3.weight", n(GQ_FF, GQ_D), q=True)
    w.write()
    return path


def build_gq_models(tmp_path, seed: int = 42):
    rng = np.random.default_rng(seed)
    model = build_container(tmp_path / "minigpt4-gq.bin", rng, llm_d=GQ_D)
    llm = build_llm_gq(tmp_path / "vicuna-gq.bin", rng)
    return model, llm


def ensure_capi_lib():
    """Build build_capi/libminigpt4.so if missing (build artifacts are not
    committed).  Returns the library path, or None if it cannot be built."""
    import subprocess
    from pathlib import Path

    import sys

    root = Path(__file__).parent.parent
    ext = "dylib" if sys.platform == "darwin" else "so"
    lib = root / "build_capi" / f"libminigpt4.{ext}"
    if lib.exists():
        return lib
    try:
        subprocess.run(
            ["cmake", "-S", str(root / "minigpt4_tpu" / "c_api"), "-B",
             str(root / "build_capi"), "-DCMAKE_BUILD_TYPE=Release"],
            check=True, capture_output=True, timeout=300,
        )
        subprocess.run(
            ["cmake", "--build", str(root / "build_capi"), "-j"],
            check=True, capture_output=True, timeout=300,
        )
    except Exception:
        return None
    return lib if lib.exists() else None


def build_llm_mixed(path, rng: np.random.Generator):
    """Tiny ggjt llama with DIFFERENT quant formats per layer for the same
    tensor name (wv: q8_0 on layer 0, q4_0 on layer 1) — the K_M-style mixed
    file shape."""
    hp = LlamaHParams(
        n_vocab=VOCAB, n_embd=LLM_D, n_mult=LLM_FF, n_head=LLM_HEADS,
        n_layer=LLM_LAYERS, n_rot=LLM_D // LLM_HEADS, ftype=0,
    )
    toks = [b"<unk>", b"<s>", b"</s>"] + [bytes([b]) for b in range(256)]
    toks += [b" Human", b" Assistant", b"###"]
    vocab = LlamaVocab(tokens=toks, scores=[0.0] * 259 + [1.0, 1.0, 2.0])
    w = LlamaFileWriter(path, hp, vocab)

    def n(*shape, scale=0.05):
        return rng.normal(0, scale, shape).astype(np.float32)

    def add(name, arr, q=None):
        if q is not None and arr.size % 256 == 0:
            w.add_tensor(name, arr.shape, q, quants.quantize(arr.reshape(-1), q))
        else:
            a = np.ascontiguousarray(arr, np.float32).astype("<f4")
            w.add_tensor(name, a.shape, DataType.F32, a.view(np.uint8).reshape(-1))

    add("tok_embeddings.weight", n(VOCAB, LLM_D, scale=0.2))
    add("norm.weight", 1 + n(LLM_D))
    add("output.weight", n(VOCAB, LLM_D, scale=0.2))
    wv_quants = [DataType.Q8_0, DataType.Q4_0]
    for i in range(LLM_LAYERS):
        p = f"layers.{i}."
        add(p + "attention_norm.weight", 1 + n(LLM_D))
        add(p + "attention.wq.weight", n(LLM_D, LLM_D))
        add(p + "attention.wk.weight", n(LLM_D, LLM_D))
        add(p + "attention.wv.weight", n(LLM_D, LLM_D), q=wv_quants[i % 2])
        add(p + "attention.wo.weight", n(LLM_D, LLM_D))
        add(p + "ffn_norm.weight", 1 + n(LLM_D))
        add(p + "feed_forward.w1.weight", n(LLM_FF, LLM_D))
        add(p + "feed_forward.w2.weight", n(LLM_D, LLM_FF), q=wv_quants[(i + 1) % 2])
        add(p + "feed_forward.w3.weight", n(LLM_FF, LLM_D))
    w.write()
    return path

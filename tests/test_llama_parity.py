"""LLaMA decoder parity vs HuggingFace transformers (random weights).

Weights are written through our ggjt-v3 writer in llama.cpp's *Meta* layout
(wq/wk un-permuted from HF's half-split RoPE arrangement, exactly what
llama.cpp conversion does), then loaded by our reader — so this covers the
file format, the layout conversion, interleaved RoPE, the KV cache, and the
mixed prefill/decode path in one test.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from minigpt4_tpu.formats import DataType, LlamaFileReader, LlamaFileWriter, LlamaHParams, LlamaVocab
from minigpt4_tpu.models import llama

torch.manual_seed(0)

# FF must be reachable by llama.cpp's n_ff derivation: with n_embd=32 and
# n_mult=128, n_ff = ceil(85/128)*128 = 128.
D, HEADS, LAYERS, VOCAB, FF_HF = 32, 4, 2, 48, 128


def _hf_model():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    cfg = HFConfig(
        vocab_size=VOCAB,
        hidden_size=D,
        intermediate_size=FF_HF,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=HEADS,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    return LlamaForCausalLM(cfg).eval()


def _unpermute(w: np.ndarray) -> np.ndarray:
    """HF half-split RoPE layout -> Meta interleaved layout (inverse of the
    permutation llama.cpp's converter applies)."""
    dh = D // HEADS
    return (
        w.reshape(HEADS, 2, dh // 2, D).transpose(0, 2, 1, 3).reshape(D, D)
    )


def _write_ggjt(tmp_path, hf):
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in hf.state_dict().items()}
    # pick n_mult so llama.cpp's n_ff formula reproduces FF_HF:
    # n_ff = ((2*4*D/3 + n_mult - 1) // n_mult) * n_mult; with D=32: 85.33 -> 64?
    # formula can't hit arbitrary FF; instead verify the derived value matches.
    hp = LlamaHParams(
        n_vocab=VOCAB, n_embd=D, n_mult=FF_HF, n_head=HEADS, n_layer=LAYERS,
        n_rot=D // HEADS, ftype=0,
    )
    assert hp.n_ff == FF_HF, f"choose n_mult so n_ff == {FF_HF}, got {hp.n_ff}"
    toks = [b"<unk>", b"<s>", b"</s>"] + [bytes([65 + i % 26]) for i in range(VOCAB - 3)]
    vocab = LlamaVocab(tokens=toks, scores=[0.0] * VOCAB)
    w = LlamaFileWriter(tmp_path / "llm.bin", hp, vocab)

    def add(name, arr):
        a = np.ascontiguousarray(arr, np.float32).astype("<f4")
        w.add_tensor(name, a.shape, DataType.F32, a.view(np.uint8).reshape(-1))

    add("tok_embeddings.weight", sd["model.embed_tokens.weight"])
    add("norm.weight", sd["model.norm.weight"])
    add("output.weight", sd["lm_head.weight"])
    for i in range(LAYERS):
        src = f"model.layers.{i}."
        dst = f"layers.{i}."
        add(dst + "attention_norm.weight", sd[src + "input_layernorm.weight"])
        add(dst + "attention.wq.weight", _unpermute(sd[src + "self_attn.q_proj.weight"]))
        add(dst + "attention.wk.weight", _unpermute(sd[src + "self_attn.k_proj.weight"]))
        add(dst + "attention.wv.weight", sd[src + "self_attn.v_proj.weight"])
        add(dst + "attention.wo.weight", sd[src + "self_attn.o_proj.weight"])
        add(dst + "ffn_norm.weight", sd[src + "post_attention_layernorm.weight"])
        add(dst + "feed_forward.w1.weight", sd[src + "mlp.gate_proj.weight"])
        add(dst + "feed_forward.w2.weight", sd[src + "mlp.down_proj.weight"])
        add(dst + "feed_forward.w3.weight", sd[src + "mlp.up_proj.weight"])
    w.write()
    return tmp_path / "llm.bin"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    hf = _hf_model()
    path = _write_ggjt(tmp_path_factory.mktemp("llm"), hf)
    with LlamaFileReader(path) as r:
        params, cfg = llama.load_params(r, n_ctx=32)
    return hf, params, cfg


def test_prefill_logits_match(setup):
    hf, params, cfg = setup
    tokens = np.array([[1, 5, 9, 20, 7]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens).long()).logits[0, -1].numpy()
    cache = llama.init_cache(cfg, batch=1)
    embeds = llama.embed_tokens(params, jnp.asarray(tokens))
    logits, _ = llama.forward(params, cache, embeds, jnp.int32(0), cfg)
    np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=2e-4, atol=2e-5)


def test_incremental_decode_matches_full_prefill(setup):
    """Token-by-token decode through the cache == one-shot prefill."""
    hf, params, cfg = setup
    tokens = np.array([[1, 5, 9, 20, 7, 33, 2, 14]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens).long()).logits[0, -1].numpy()

    cache = llama.init_cache(cfg, batch=1)
    logits = None
    for i in range(tokens.shape[1]):
        emb = llama.embed_tokens(params, jnp.asarray(tokens[:, i : i + 1]))
        logits, cache = llama.forward(params, cache, emb, jnp.int32(i), cfg)
    np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=5e-4, atol=5e-5)


def test_chunked_prefill_matches(setup):
    """Prefill in two chunks (llama.cpp n_batch chunking, add_tokens
    minigpt4.cpp:2365-2382) == one-shot."""
    hf, params, cfg = setup
    tokens = np.array([[1, 5, 9, 20, 7, 33]], np.int32)
    cache = llama.init_cache(cfg, batch=1)
    e1 = llama.embed_tokens(params, jnp.asarray(tokens[:, :4]))
    _, cache = llama.forward(params, cache, e1, jnp.int32(0), cfg)
    e2 = llama.embed_tokens(params, jnp.asarray(tokens[:, 4:]))
    logits, cache = llama.forward(params, cache, e2, jnp.int32(4), cfg)

    cache2 = llama.init_cache(cfg, batch=1)
    eall = llama.embed_tokens(params, jnp.asarray(tokens))
    logits2, _ = llama.forward(params, cache2, eall, jnp.int32(0), cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=2e-4, atol=2e-5)


def test_embedding_injection_prefill(setup):
    """Mixed token/embedding prefill (llama_eval_embd analogue,
    minigpt4.cpp:2399-2422): feeding embeds directly == feeding the tokens
    those embeds were looked up from."""
    hf, params, cfg = setup
    tokens = np.array([[1, 5, 9, 20]], np.int32)
    cache = llama.init_cache(cfg, batch=1)
    embeds = llama.embed_tokens(params, jnp.asarray(tokens))
    # inject raw embedding rows (as the image soft prompt does)
    logits, _ = llama.forward(params, cache, embeds, jnp.int32(0), cfg)
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens).long()).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=2e-4, atol=2e-5)


def test_quantized_weights_load_and_run(tmp_path):
    """q4_0-quantized projections run through the QTensor path."""
    from minigpt4_tpu.formats import quants

    hf = _hf_model()
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in hf.state_dict().items()}
    hp = LlamaHParams(VOCAB, D, FF_HF, HEADS, LAYERS, D // HEADS, ftype=2)
    toks = [b"<unk>", b"<s>", b"</s>"] + [bytes([65 + i]) for i in range(VOCAB - 3)]
    w = LlamaFileWriter(tmp_path / "q.bin", hp, LlamaVocab(toks, [0.0] * VOCAB))

    def addq(name, arr):
        raw = quants.quantize(np.ascontiguousarray(arr, np.float32).reshape(-1), DataType.Q4_0)
        w.add_tensor(name, arr.shape, DataType.Q4_0, raw)

    def addf(name, arr):
        a = np.ascontiguousarray(arr, np.float32).astype("<f4")
        w.add_tensor(name, a.shape, DataType.F32, a.view(np.uint8).reshape(-1))

    addf("tok_embeddings.weight", sd["model.embed_tokens.weight"])
    addf("norm.weight", sd["model.norm.weight"])
    addq("output.weight", sd["lm_head.weight"])
    for i in range(LAYERS):
        src, dst = f"model.layers.{i}.", f"layers.{i}."
        addf(dst + "attention_norm.weight", sd[src + "input_layernorm.weight"])
        addq(dst + "attention.wq.weight", _unpermute(sd[src + "self_attn.q_proj.weight"]))
        addq(dst + "attention.wk.weight", _unpermute(sd[src + "self_attn.k_proj.weight"]))
        addq(dst + "attention.wv.weight", sd[src + "self_attn.v_proj.weight"])
        addq(dst + "attention.wo.weight", sd[src + "self_attn.o_proj.weight"])
        addf(dst + "ffn_norm.weight", sd[src + "post_attention_layernorm.weight"])
        addq(dst + "feed_forward.w1.weight", sd[src + "mlp.gate_proj.weight"])
        addq(dst + "feed_forward.w2.weight", sd[src + "mlp.down_proj.weight"])
        addq(dst + "feed_forward.w3.weight", sd[src + "mlp.up_proj.weight"])
    w.write()

    with LlamaFileReader(tmp_path / "q.bin") as r:
        params, cfg = llama.load_params(r, n_ctx=16)
    tokens = np.array([[1, 5, 9]], np.int32)
    cache = llama.init_cache(cfg, batch=1)
    embeds = llama.embed_tokens(params, jnp.asarray(tokens))
    logits, _ = llama.forward(params, cache, embeds, jnp.int32(0), cfg)
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens).long()).logits[0, -1].numpy()
    # quantized: correlation must be high even though values differ
    got = np.asarray(logits[0])
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.98, f"quantized logits decorrelated: {corr}"
    assert np.all(np.isfinite(got))


def test_mixed_quant_layers_load_and_run(tmp_path):
    """K_M-style ggml files mix quant formats across layers (llama.cpp puts
    q6_k on some wv/w2); heterogeneous names fall back to per-layer lists
    (statically indexed) while uniform names stack."""
    import numpy as np

    from fixtures import LLM_D, VOCAB, build_llm_mixed
    from minigpt4_tpu.formats import LlamaFileReader
    from minigpt4_tpu.models import llama as llama_mod

    path = build_llm_mixed(tmp_path / "mixed.bin", np.random.default_rng(3))

    outs = {}
    for mode in ("repack", "qtensor"):
        with LlamaFileReader(path) as r:
            params, cfg = llama_mod.load_params(r, n_ctx=64, quant_mode=mode)
        # wv heterogeneous -> per-layer list; wq uniform f32 -> stacked dense
        assert isinstance(params["layers"]["wv"]["w"], list)
        assert not isinstance(params["layers"]["wq"]["w"], list)
        cache = llama_mod.init_cache(cfg, batch=1)
        emb = llama_mod.embed_tokens(
            params, jnp.asarray(np.array([[1, 5, 9]], np.int32))
        )
        logits, _ = llama_mod.forward(params, cache, emb, jnp.int32(0), cfg,
                                      use_flash=False)
        outs[mode] = np.asarray(logits)
    corr = np.corrcoef(outs["repack"].ravel(), outs["qtensor"].ravel())[0, 1]
    assert corr > 0.999

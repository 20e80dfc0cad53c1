"""Client-layer tests: quantizer CLI, converter, library chatbot surface."""

import numpy as np
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.formats import ContainerReader, DataType
from minigpt4_tpu.quantize import quantize_model, _eligible
from minigpt4_tpu.utils import MiniGPT4Error


class TestQuantizer:
    def test_eligibility_policy(self):
        f32, f16 = DataType.F32, DataType.F16
        assert _eligible("visual_encoder", "blocks.0.attn.qkv.weight", f16, 2)
        assert _eligible("Qformer", "bert.encoder.layer.0.attention.self.query.weight", f32, 2)
        # exclusions (minigpt4.cpp:2896-2923)
        assert not _eligible("visual_encoder", "blocks.0.norm1.weight", f16, 1)
        assert not _eligible("Qformer", "bert.embeddings.LayerNorm.weight", f32, 1)
        assert not _eligible("ln_vision", "weight", f32, 1)
        assert not _eligible("query_tokens", "weight", f32, 2)
        assert not _eligible("llama_proj", "weight", f16, 2)
        assert not _eligible("visual_encoder", "patch_embed.proj.weight", f16, 4)
        assert not _eligible("visual_encoder", "blocks.0.attn.q_bias", f32, 1)
        assert not _eligible("visual_encoder", "blocks.0.attn.qkv.weight", DataType.Q4_0, 2)

    def test_quantize_and_reload(self, tmp_path):
        # tiny rows are 32 wide: q8_0 (block 32) applies, k-quants are
        # skipped by the divisibility guard
        model, _ = build_tiny_models(tmp_path)
        out = tmp_path / "model-q8_0.bin"
        rc = quantize_model(str(model), str(out), DataType.Q8_0)
        assert rc == int(MiniGPT4Error.NONE)
        with ContainerReader(model) as orig, ContainerReader(out) as q:
            assert q.config == orig.config
            rec = q.models["visual_encoder"].tensors["blocks.0.attn.qkv.weight"]
            assert rec.dtype == DataType.Q8_0
            # excluded tensors unchanged
            assert q.models["ln_vision"].tensors["weight"].dtype == DataType.F32
            assert q.models["llama_proj"].tensors["weight"].dtype == DataType.F32
            # quantized values close to originals
            w0 = orig.tensor_f32("visual_encoder", "blocks.0.attn.qkv.weight")
            w1 = q.tensor_f32("visual_encoder", "blocks.0.attn.qkv.weight")
            rel = np.abs(w0 - w1).mean() / (np.abs(w0).mean() + 1e-9)
            assert rel < 0.05

    def test_kquant_skips_indivisible_rows(self, tmp_path):
        model, _ = build_tiny_models(tmp_path)
        out = tmp_path / "model-q5k.bin"
        assert quantize_model(str(model), str(out), DataType.Q5_K) == 0
        with ContainerReader(out) as q:
            # rows of 32 elements are not divisible by the 256 super-block
            rec = q.models["visual_encoder"].tensors["blocks.0.attn.qkv.weight"]
            assert rec.dtype == DataType.F32

    def test_quantized_container_runs(self, tmp_path):
        from minigpt4_tpu.engine import MiniGPT4Engine

        model, llm = build_tiny_models(tmp_path)
        qmodel = tmp_path / "model-q4_0.bin"
        assert quantize_model(str(model), str(qmodel), DataType.Q4_0) == 0
        eng = MiniGPT4Engine(qmodel, llm, n_ctx=64, n_batch=16)
        emb = eng.encode_image(np.zeros((3, 28, 28), np.float32))
        assert np.all(np.isfinite(emb))
        eng.close()

    def test_missing_file(self, tmp_path):
        rc = quantize_model(str(tmp_path / "nope.bin"), str(tmp_path / "out.bin"), DataType.Q4_0)
        assert rc == int(MiniGPT4Error.PATH_DOES_NOT_EXIST)


class TestConverter:
    def _torch_checkpoint(self, tmp_path):
        import torch

        rng = np.random.default_rng(0)
        sd = {}

        def t(*shape):
            return torch.from_numpy(rng.normal(0, 0.05, shape).astype(np.float32))

        sd["visual_encoder.patch_embed.proj.weight"] = t(32, 3, 14, 14)
        sd["visual_encoder.patch_embed.proj.bias"] = t(32)
        sd["visual_encoder.cls_token"] = t(1, 1, 32)
        sd["visual_encoder.pos_embed"] = t(1, 5, 32)
        for i in range(2):
            p = f"visual_encoder.blocks.{i}."
            sd[p + "norm1.weight"] = t(32)
            sd[p + "norm1.bias"] = t(32)
            sd[p + "attn.qkv.weight"] = t(96, 32)
            sd[p + "attn.q_bias"] = t(32)
            sd[p + "attn.v_bias"] = t(32)
            sd[p + "attn.proj.weight"] = t(32, 32)
            sd[p + "attn.proj.bias"] = t(32)
            sd[p + "norm2.weight"] = t(32)
            sd[p + "norm2.bias"] = t(32)
            sd[p + "mlp.fc1.weight"] = t(64, 32)
            sd[p + "mlp.fc1.bias"] = t(64)
            sd[p + "mlp.fc2.weight"] = t(32, 64)
            sd[p + "mlp.fc2.bias"] = t(32)
        sd["ln_vision.weight"] = t(32)
        sd["ln_vision.bias"] = t(32)
        sd["query_tokens"] = t(1, 4, 16)
        sd["Qformer.bert.embeddings.LayerNorm.weight"] = t(16)
        sd["Qformer.bert.embeddings.LayerNorm.bias"] = t(16)
        for i in range(2):
            p = f"Qformer.bert.encoder.layer.{i}."
            blocks = [("attention.", 16)] + ([("crossattention.", 32)] if i % 2 == 0 else [])
            for blk, width in blocks:
                sd[p + blk + "self.query.weight"] = t(16, 16)
                sd[p + blk + "self.query.bias"] = t(16)
                sd[p + blk + "self.key.weight"] = t(16, width)
                sd[p + blk + "self.key.bias"] = t(16)
                sd[p + blk + "self.value.weight"] = t(16, width)
                sd[p + blk + "self.value.bias"] = t(16)
                sd[p + blk + "output.dense.weight"] = t(16, 16)
                sd[p + blk + "output.dense.bias"] = t(16)
                sd[p + blk + "output.LayerNorm.weight"] = t(16)
                sd[p + blk + "output.LayerNorm.bias"] = t(16)
            sd[p + "intermediate_query.dense.weight"] = t(32, 16)
            sd[p + "intermediate_query.dense.bias"] = t(32)
            sd[p + "output_query.dense.weight"] = t(16, 32)
            sd[p + "output_query.dense.bias"] = t(16)
            sd[p + "output_query.LayerNorm.weight"] = t(16)
            sd[p + "output_query.LayerNorm.bias"] = t(16)
        sd["llama_proj.weight"] = t(32, 16)
        sd["llama_proj.bias"] = t(32)
        path = tmp_path / "ckpt.pth"
        torch.save({"model": sd}, path)
        return path, sd

    def test_convert_and_load(self, tmp_path):
        import jax.numpy as jnp

        from minigpt4_tpu.convert import convert
        from minigpt4_tpu.models import minigpt4 as vision_mod

        ckpt, sd = self._torch_checkpoint(tmp_path)
        out = convert(ckpt, tmp_path / "model-f16.bin", ftype="f16",
                      qformer_config={"num_attention_heads": 2},)
        with ContainerReader(out) as r:
            assert r.ftype == 0
            assert r.config["Qformer"]["query_length"] == 4
            assert r.config["Qformer"]["encoder_width"] == 32
            # f16 policy: 2D weights f16, biases/norms f32
            ve = r.models["visual_encoder"].tensors
            assert ve["blocks.0.attn.qkv.weight"].dtype == DataType.F16
            assert ve["blocks.0.attn.qkv.weight"].shape == (96, 32)
            assert ve["blocks.0.norm1.weight"].dtype == DataType.F32
            assert ve["patch_embed.proj.weight"].dtype == DataType.F16
            # converter f16-casts llama_proj.weight (convert.py:105-111);
            # only the *quantizer* excludes llama_proj
            assert r.models["llama_proj"].tensors["weight"].dtype == DataType.F16
            assert r.models["llama_proj"].tensors["bias"].dtype == DataType.F32
            # squeeze applied
            assert r.models["query_tokens"].tensors["weight"].shape == (4, 16)

            # converted container loads and runs through the vision stack
            # (need head_dim override for the toy geometry)
            r.config["vit"] = {"head_dim": 8}
            params, cfg = vision_mod.load_params(r)
            out_emb = vision_mod.encode_image(
                params, jnp.zeros((1, 3, 28, 28), jnp.float32), cfg
            )
            assert np.all(np.isfinite(np.asarray(out_emb)))

    def test_convert_roundtrip_values(self, tmp_path):
        from minigpt4_tpu.convert import convert

        ckpt, sd = self._torch_checkpoint(tmp_path)
        out = convert(ckpt, tmp_path / "model-f32.bin", ftype="f32")
        with ContainerReader(out) as r:
            got = r.tensor_f32("ln_vision", "weight")
            want = sd["ln_vision.weight"].numpy()
            np.testing.assert_array_equal(got, want)

    def test_convert_projection_stage_checkpoint(self, tmp_path):
        """Real MiniGPT-4 stage checkpoints contain ONLY llama_proj; the
        converter assembles visual_encoder/Q-Former from their pretrained
        sources like the reference (convert.py:182-243), stripping the
        Q-Former's text branches (:219-224)."""
        import torch

        from minigpt4_tpu.convert import convert

        _, sd = self._torch_checkpoint(tmp_path)

        def t(*shape):
            return torch.from_numpy(
                np.random.default_rng(1).normal(0, 0.05, shape).astype(np.float32)
            )

        # EVA ViT pretrained: unprefixed keys + classifier junk to drop
        vit_sd = {
            k[len("visual_encoder.") :]: v
            for k, v in sd.items()
            if k.startswith("visual_encoder.")
        }
        vit_sd["head.weight"] = t(10, 32)
        vit_sd["fc_norm.weight"] = t(32)
        vit_path = tmp_path / "eva_vit_g.pth"
        torch.save(vit_sd, vit_path)

        # BLIP-2 pretrained: Qformer + query_tokens + ln_vision, PLUS the
        # text branches the reference strips
        qf_sd = {
            k: v
            for k, v in sd.items()
            if k.startswith(("Qformer.", "ln_vision.")) or k == "query_tokens"
        }
        qf_sd["Qformer.cls.predictions.bias"] = t(30523)
        qf_sd["Qformer.bert.embeddings.word_embeddings.weight"] = t(30523, 16)
        qf_sd["Qformer.bert.embeddings.position_embeddings.weight"] = t(512, 16)
        qf_sd["Qformer.bert.encoder.layer.0.output.dense.weight"] = t(16, 32)
        qf_sd["Qformer.bert.encoder.layer.0.intermediate.dense.weight"] = t(32, 16)
        qf_path = tmp_path / "blip2_pretrained.pth"
        torch.save({"model": qf_sd}, qf_path)

        # projection-only stage checkpoint (what HuggingFace actually ships)
        stage_path = tmp_path / "pretrained_minigpt4_7b.pth"
        torch.save(
            {"model": {"llama_proj.weight": sd["llama_proj.weight"],
                       "llama_proj.bias": sd["llama_proj.bias"]}},
            stage_path,
        )

        # a projection-only checkpoint alone must fail with the assembly hint
        with pytest.raises(ValueError, match="--vit"):
            convert(stage_path, tmp_path / "nope.bin", ftype="f32")

        out = convert(stage_path, tmp_path / "assembled-f32.bin", ftype="f32",
                      vit_ckpt=vit_path, qformer_ckpt=qf_path)
        with ContainerReader(out) as r:
            qf = r.models["Qformer"].tensors
            # text branches stripped; image (query) branch kept
            assert "bert.encoder.layer.0.output.dense.weight" not in qf
            assert "bert.encoder.layer.0.intermediate.dense.weight" not in qf
            assert "cls.predictions.bias" not in qf
            assert "bert.encoder.layer.0.output_query.dense.weight" in qf
            ve = r.models["visual_encoder"].tensors
            assert "head.weight" not in ve and "fc_norm.weight" not in ve
            # values identical to the assembled-checkpoint conversion
            np.testing.assert_array_equal(
                r.tensor_f32("llama_proj", "weight"), sd["llama_proj.weight"].numpy()
            )
            np.testing.assert_array_equal(
                r.tensor_f32("visual_encoder", "blocks.0.attn.qkv.weight"),
                sd["visual_encoder.blocks.0.attn.qkv.weight"].numpy(),
            )

            # assembled container loads and runs through the vision stack
            import jax.numpy as jnp

            from minigpt4_tpu.models import minigpt4 as vision_mod

            r.config["vit"] = {"head_dim": 8}
            r.config["Qformer"]["num_attention_heads"] = 2
            params, cfg = vision_mod.load_params(r)
            emb = vision_mod.encode_image(
                params, jnp.zeros((1, 3, 28, 28), jnp.float32), cfg
            )
            assert np.all(np.isfinite(np.asarray(emb)))


class TestLibrary:
    def test_chatbot_surface(self, tmp_path):
        from PIL import Image

        from minigpt4_tpu.library import MiniGPT4ChatBot

        model, llm = build_tiny_models(tmp_path)
        bot = MiniGPT4ChatBot(str(model), str(llm))
        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
        )
        bot.upload_image(img)
        assert bot.is_image_chat
        toks = []
        for t in bot.generate("hi", limit=5, temp=0.0):
            toks.append(t)
        assert all(isinstance(t, str) for t in toks)
        bot.reset_chat()
        assert not bot.is_image_chat
        bot.free()

    def test_webui_callbacks(self, tmp_path, monkeypatch):
        """The gradio callback set drives a real ChatBot end-to-end (gradio
        itself is optional; a stub stands in for gr.update — the reference
        surface is webui.py:27-107)."""
        import sys
        import types

        from PIL import Image

        from minigpt4_tpu import webui
        from minigpt4_tpu.library import MiniGPT4ChatBot

        fake_gr = types.SimpleNamespace(update=lambda **kw: dict(kw))
        monkeypatch.setitem(sys.modules, "gradio", fake_gr)

        model, llm = build_tiny_models(tmp_path)
        monkeypatch.setitem(webui._state, "bot", MiniGPT4ChatBot(str(model), str(llm)))
        monkeypatch.setitem(webui._state, "image_ready", False)

        # chat before upload: polite refusal, no crash
        _, hist = webui.user("hi", None)
        out = list(webui.chat(hist, limit=4, temp=0.0))
        assert out[0][0] == "Please upload an image first."

        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
        )
        ret = webui.upload_image(img, hist)
        assert webui._state["image_ready"] and ret[-1] == []

        _, hist = webui.user("what is this?", [])
        streamed = list(webui.chat(hist, limit=4, temp=0.0))
        assert streamed, "expected streamed history updates"
        assert all(isinstance(h[-1][-1][1], str) for h in streamed)

        cleared = webui.clear_state(hist, None, None)
        assert cleared[0] == [] and not webui._state["image_ready"]
        webui._state["bot"].free()

    def test_shared_library_surface(self, tmp_path):
        from minigpt4_tpu.library import ImageFormat, load_library

        model, llm = build_tiny_models(tmp_path)
        lib = load_library()
        ctx = lib.minigpt4_model_load(str(model), str(llm), 0)
        pre_shape = (3, 28, 28)
        from minigpt4_tpu.library import MiniGPT4Image

        pre = MiniGPT4Image(
            np.zeros(pre_shape, np.float32), 28, 28, 3, ImageFormat.F32
        )
        emb = lib.minigpt4_encode_image(ctx, pre)
        assert emb.elements == emb.data.size
        lib.minigpt4_system_prompt(ctx)
        lib.minigpt4_begin_chat_image(ctx, emb, "what?")
        tok = lib.minigpt4_end_chat_image(ctx, temp=0.0)
        assert isinstance(tok, str)
        assert lib.minigpt4_is_eos("abc###")
        assert lib.minigpt4_error_code_to_string(0) == "None"
        lib.minigpt4_free(ctx)


class TestDebugDump:
    def test_stage_dump_matches_pipeline(self, tmp_path):
        import jax.numpy as jnp

        from minigpt4_tpu.debug import compare_dumps, dump_vision_stages, first_divergence, save_dump
        from minigpt4_tpu.engine import MiniGPT4Engine
        from minigpt4_tpu.models import minigpt4 as vision_mod

        model, llm = build_tiny_models(tmp_path)
        eng = MiniGPT4Engine(model, llm, n_ctx=64, n_batch=16)
        pixels = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 3, 28, 28)).astype(np.float32))
        stages = dump_vision_stages(eng.vision_params, pixels, eng.vision_cfg)
        # final stage equals the fused pipeline output
        want = np.asarray(vision_mod.encode_image(eng.vision_params, pixels, eng.vision_cfg))
        np.testing.assert_allclose(stages["llama_proj"], want, rtol=1e-5, atol=1e-6)

        save_dump(stages, str(tmp_path / "a.npz"))
        save_dump(stages, str(tmp_path / "b.npz"))
        report = compare_dumps(str(tmp_path / "a.npz"), str(tmp_path / "b.npz"))
        assert first_divergence(report) is None
        eng.close()

"""Two-stage (vision | decoder) pipeline parallelism over disjoint devices."""

import numpy as np
import jax
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.engine import MiniGPT4Engine, SamplingParams
from minigpt4_tpu.parallel.pipeline import TwoStagePipeline


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_pipeline_matches_sequential(tmp_path):
    model, llm = build_tiny_models(tmp_path)
    imgs = [np.random.default_rng(s).normal(0, 1, (3, 28, 28)).astype(np.float32)
            for s in range(3)]
    q = "what is this?"

    # sequential reference on a fresh engine
    ref_eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
    want = []
    for im in imgs:
        ref_eng.reset_chat()
        ref_eng.system_prompt()
        emb = ref_eng.encode_image(im)
        ref_eng.begin_chat_image(emb, q)
        want.append("".join(ref_eng.generate(limit=6, params=SamplingParams(temp=0.0))))
    ref_eng.close()

    eng = MiniGPT4Engine(model, llm, n_ctx=256, n_batch=32)
    pipe = TwoStagePipeline(eng)
    assert pipe.vision_device != pipe.llm_device
    for i, im in enumerate(imgs):
        pipe.submit(i, im)  # all encodes dispatched before any decode blocks
    got = list(pipe.results(q, limit=6))
    eng.close()

    assert [t for t, _ in got] == [0, 1, 2]
    assert [txt for _, txt in got] == want
    # stage placement held: params resident on their own devices
    lp = jax.tree_util.tree_leaves(pipe.llm_params)[0]
    vp = jax.tree_util.tree_leaves(pipe.vision_params)[0]
    assert list(lp.devices())[0] == pipe.llm_device
    assert list(vp.devices())[0] == pipe.vision_device

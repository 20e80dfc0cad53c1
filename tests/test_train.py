"""Stage-1 projection trainer (minigpt4_tpu/train/projection.py).

The reference ships the RESULT of this training (the .pth its converter
reads) but no trainer; this is TPU-native new capability and the
framework's full forward+backward path, so it gets direct unit coverage
beyond the multichip dryrun that also drives it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.engine.engine import MiniGPT4Engine
from minigpt4_tpu.train import caption_loss, make_train_step


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("train"))
    eng = MiniGPT4Engine(model, llm, n_ctx=64, n_batch=32,
                         compute_dtype=jnp.float32)
    vp = eng.vision_params
    frozen = {"vision": {k: v for k, v in vp.items() if k != "llama_proj"},
              "llm": eng.llm_params}
    proj = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                  vp["llama_proj"])
    rng = np.random.default_rng(0)
    vs = eng.vision_cfg.vit.image_size
    batch = {
        "pixels": jnp.asarray(rng.normal(size=(2, 3, vs, vs)), jnp.float32),
        "tokens": jnp.asarray(
            rng.integers(1, eng.llm_cfg.n_vocab, (2, 6)), jnp.int32),
        "mask": jnp.ones((2, 6), jnp.float32),
    }
    yield eng, frozen, proj, batch
    eng.close()


def test_train_step_reduces_caption_loss(setup):
    """A few optimizer steps on one fixed batch fit the projection: the
    masked caption NLL strictly drops and only proj params move."""
    eng, frozen, proj, b = setup
    opt = optax.adam(1e-2)
    step = make_train_step(eng.vision_cfg, eng.llm_cfg, opt)
    opt_state = opt.init(proj)
    losses = []
    p = proj
    for _ in range(5):
        p, opt_state, loss = step(p, opt_state, frozen,
                                  b["pixels"], b["tokens"], b["mask"])
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.98  # actually learning
    assert not np.allclose(np.asarray(p["w"]), np.asarray(proj["w"]))


def test_caption_loss_respects_mask(setup):
    """Masked-out positions contribute nothing: changing their token ids
    leaves the loss bit-identical."""
    eng, frozen, proj, b = setup
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 0, 0]], jnp.float32)

    def loss(tokens):
        return caption_loss(proj, frozen, b["pixels"], tokens, mask,
                            eng.vision_cfg, eng.llm_cfg)

    l1 = loss(b["tokens"])
    mangled = b["tokens"].at[:, 4:].set(7)  # only masked positions change
    l2 = loss(mangled)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    # and the mask actually matters: unmasking changes the loss
    l3 = caption_loss(proj, frozen, b["pixels"], b["tokens"],
                      jnp.ones_like(mask), eng.vision_cfg, eng.llm_cfg)
    assert float(l3) != pytest.approx(float(l1), abs=1e-6)

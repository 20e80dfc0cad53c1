"""Image preprocessing tests: PIL-convention bicubic resize + CLIP normalize."""

import numpy as np
import pytest

from minigpt4_tpu import image as img_mod


def test_resize_matches_pil_downscale():
    from PIL import Image

    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)
    pil = Image.fromarray(src).convert("F")  # exercise float path per channel
    # compare per-channel in float mode (avoids PIL's uint8 fixed-point)
    for c in range(3):
        ref = np.asarray(
            Image.fromarray(src[:, :, c].astype(np.float32), mode="F").resize(
                (224, 224), Image.BICUBIC
            )
        )
        got = img_mod.resize_bicubic(src[:, :, c : c + 1].astype(np.float32))[:, :, 0]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_resize_matches_pil_upscale():
    from PIL import Image

    rng = np.random.default_rng(1)
    src = rng.normal(128, 40, (100, 80)).astype(np.float32)
    ref = np.asarray(Image.fromarray(src, mode="F").resize((224, 224), Image.BICUBIC))
    got = img_mod.resize_bicubic(src[:, :, None])[:, :, 0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_preprocess_contract():
    rng = np.random.default_rng(2)
    src = rng.integers(0, 256, (640, 480, 3), dtype=np.uint8)
    out = img_mod.preprocess(src)
    assert out.shape == (3, 224, 224)
    assert out.dtype == np.float32
    # a mid-gray image maps near (0.5 - mean)/std
    gray = np.full((64, 64, 3), 128, np.uint8)
    out = img_mod.preprocess(gray)
    want = (128 / 255.0 - img_mod.CLIP_MEAN) / img_mod.CLIP_STD
    np.testing.assert_allclose(out[:, 100:120, 100:120].mean(axis=(1, 2)), want, atol=1e-4)


def test_jit_preprocess_matches_numpy():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (97, 133, 3), dtype=np.uint8)
    want = img_mod.preprocess(src)
    fn = img_mod.jit_preprocess(97, 133)
    got = np.asarray(fn(src))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

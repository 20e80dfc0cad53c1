"""Acceptance test: the REFERENCE's own ctypes bindings, loaded verbatim from
the read-only reference checkout, drive our libminigpt4.so.

This is the API-compatibility contract (BASELINE.md: "minigpt4_library.py
ctypes surface preserved") checked directly: if the reference's Python layer
works against our .so, any client of the reference does too.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from fixtures import build_tiny_models

from fixtures import ensure_capi_lib

LIB = ensure_capi_lib() or Path(__file__).parent.parent / "build_capi" / "libminigpt4.so"
REF_BINDINGS = Path("/root/reference/minigpt4/minigpt4_library.py")

pytestmark = pytest.mark.skipif(
    not (LIB.exists() and REF_BINDINGS.exists()),
    reason="libminigpt4.so or reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_lib():
    spec = importlib.util.spec_from_file_location("ref_minigpt4_library", REF_BINDINGS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_minigpt4_library"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_reference_bindings_full_flow(ref_lib, tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("refbind"))
    lib = ref_lib.MiniGPT4SharedLibrary(str(LIB))

    ctx = lib.minigpt4_model_load(str(model), str(llm), verbosity=0)
    assert ctx is not None

    # preprocessed image in the reference's POD struct (fixture: 28x28)
    import ctypes

    pix = np.zeros((3, 28, 28), np.float32)
    image = ref_lib.MiniGPT4Image(
        data=pix.ctypes.data_as(ctypes.c_void_p),
        width=28,
        height=28,
        channels=3,
        format=ref_lib.ImageFormat.F32,
    )
    embedding = lib.minigpt4_encode_image(ctx, image, n_threads=0)
    assert embedding.n_embeddings == 4 * 32  # reference field name for elements

    lib.minigpt4_system_prompt(ctx, 0)
    lib.minigpt4_begin_chat_image(ctx, embedding, "what is this?", 0)
    tokens = []
    for _ in range(4):
        tok = lib.minigpt4_end_chat_image(
            ctx, 0, 0.0, 40, 0.9, 1.0, 1.0, 64, 1.1, 1.0, 1.0, 0, 5.0, 1.0, 1
        )
        tokens.append(tok)
    assert all(isinstance(t, str) for t in tokens)

    lib.minigpt4_begin_chat(ctx, "more?", 0)
    tok = lib.minigpt4_end_chat(ctx, 0, 0.0, 40, 0.9, 1.0, 1.0, 64, 1.1, 1.0, 1.0, 0, 5.0, 1.0, 1)
    assert isinstance(tok, str)

    assert lib.minigpt4_reset_chat(ctx) is None or True  # returns None on success
    lib.minigpt4_free(ctx)


def test_reference_bindings_failure_codes(ref_lib, tmp_path_factory):
    """Failure paths must surface the reference's EXACT per-failure enum
    values through the unmodified bindings (minigpt4.cpp:97-119; round 1
    collapsed every failure to the entry point's single fallback code)."""
    import ctypes

    model, llm = build_tiny_models(tmp_path_factory.mktemp("refbind_neg"))
    lib = ref_lib.MiniGPT4SharedLibrary(str(LIB))
    ctx = lib.minigpt4_model_load(str(model), str(llm), verbosity=0)

    # the bindings' panic_if_error stringifies a raw char pointer (a
    # reference-side quirk), so assert the RAW return codes, which is the
    # actual ABI contract (minigpt4.cpp:97-119)
    raw = lib.library
    I32 = ctypes.c_int32

    # wrong embedding size -> LLamaProjectionEmbeddingInvalidSize (9)
    bad = np.zeros(7, np.float32)
    emb = ref_lib.MiniGPT4Embedding(
        data=bad.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_embeddings=7
    )
    rc = raw.minigpt4_begin_chat_image(ctx.ptr, ctypes.pointer(emb), b"q",
                                       0)
    assert rc == 9, rc

    # wrong image dims -> ImageNot224_244_3 (13; fixture geometry is 28x28)
    pix = np.zeros((3, 10, 10), np.float32)
    img = ref_lib.MiniGPT4Image(
        data=pix.ctypes.data_as(ctypes.c_void_p), width=10, height=10,
        channels=3, format=ref_lib.ImageFormat.F32,
    )
    out_emb = ref_lib.MiniGPT4Embedding()
    rc = raw.minigpt4_encode_image(ctx.ptr, ctypes.pointer(img),
                                   ctypes.pointer(out_emb), 0)
    assert rc == 13, rc

    # U8 image into encode -> ImageNotF32 (14)
    img_u8 = ref_lib.MiniGPT4Image(
        data=pix.ctypes.data_as(ctypes.c_void_p), width=10, height=10,
        channels=3, format=ref_lib.ImageFormat.U8,
    )
    rc = raw.minigpt4_encode_image(ctx.ptr, ctypes.pointer(img_u8),
                                   ctypes.pointer(out_emb), 0)
    assert rc == 14, rc

    # F32 image into preprocess -> ImageFormatExpectedU8 (16)
    pre = ref_lib.MiniGPT4Image()
    rc = raw.minigpt4_preprocess_image(ctx.ptr, ctypes.pointer(img),
                                       ctypes.pointer(pre), 0)
    assert rc == 16, rc

    # missing image file -> OpenImage (5)
    out_img = ref_lib.MiniGPT4Image()
    rc = raw.minigpt4_image_load_from_file(ctx.ptr, b"/nonexistent/img.png",
                                           ctypes.pointer(out_img), 0)
    assert rc == 5, rc

    # the session must still be usable after failed calls
    lib.minigpt4_system_prompt(ctx, 0)
    tok = lib.minigpt4_end_chat(
        ctx, 0, 0.0, 40, 0.9, 1.0, 1.0, 64, 1.1, 1.0, 1.0, 0, 5.0, 1.0, 1
    )
    assert isinstance(tok, str)
    lib.minigpt4_free(ctx)


def test_reference_bindings_quantize_missing_path(ref_lib, tmp_path):
    lib = ref_lib.MiniGPT4SharedLibrary(str(LIB))
    rc = lib.library.minigpt4_quantize_model(
        str(tmp_path / "missing.bin").encode(),
        str(tmp_path / "out.bin").encode(),
        int(ref_lib.DataType.Q5_K),
    )
    assert rc == 17, rc  # PathDoesNotExist

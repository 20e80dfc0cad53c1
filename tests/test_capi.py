"""C ABI conformance: drive build_capi/libminigpt4.so through ctypes with
the reference binding conventions (argtypes copied from the reference
minigpt4_library.py contract) on the tiny fixture models."""

import ctypes
from pathlib import Path

import numpy as np
import pytest

from fixtures import build_tiny_models

from fixtures import ensure_capi_lib

LIB = ensure_capi_lib() or Path(__file__).parent.parent / "build_capi" / "libminigpt4.so"

pytestmark = pytest.mark.skipif(not LIB.exists(), reason="libminigpt4.so not built")


class CImage(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("channels", ctypes.c_int),
        ("format", ctypes.c_int),
    ]


class CEmbedding(ctypes.Structure):
    _fields_ = [("data", ctypes.POINTER(ctypes.c_float)), ("elements", ctypes.c_size_t)]


@pytest.fixture(scope="module")
def lib():
    lib = ctypes.CDLL(str(LIB))
    lib.minigpt4_model_load.restype = ctypes.c_void_p
    lib.minigpt4_model_load.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_bool,
    ]
    lib.minigpt4_encode_image.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(CImage), ctypes.POINTER(CEmbedding), ctypes.c_size_t,
    ]
    lib.minigpt4_begin_chat_image.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(CEmbedding), ctypes.c_char_p, ctypes.c_size_t,
    ]
    end_argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_size_t,
        ctypes.c_float, ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
    ]
    lib.minigpt4_end_chat_image.argtypes = end_argtypes
    lib.minigpt4_end_chat.argtypes = end_argtypes
    lib.minigpt4_begin_chat.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.minigpt4_system_prompt.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.minigpt4_reset_chat.argtypes = [ctypes.c_void_p]
    lib.minigpt4_free.argtypes = [ctypes.c_void_p]
    lib.minigpt4_error_code_to_string.restype = ctypes.c_char_p
    lib.minigpt4_error_code_to_string.argtypes = [ctypes.c_int]
    lib.minigpt4_contains_eos_token.argtypes = [ctypes.c_char_p]
    lib.minigpt4_is_eos.argtypes = [ctypes.c_char_p]
    return lib


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    return build_tiny_models(tmp_path_factory.mktemp("capi_models"))


def test_error_strings(lib):
    assert lib.minigpt4_error_code_to_string(0) == b"None"
    assert lib.minigpt4_error_code_to_string(12) == b"Eos"


def test_eos_functions(lib):
    assert lib.minigpt4_contains_eos_token(b"##") != 0
    assert lib.minigpt4_contains_eos_token(b"#") == 0
    assert lib.minigpt4_is_eos(b"abc###") != 0
    assert lib.minigpt4_is_eos(b"abc") == 0


def test_full_chat_through_abi(lib, models):
    model, llm = models
    ctx = lib.minigpt4_model_load(str(model).encode(), str(llm).encode(), 0, 1337, 256, 32, False)
    assert ctx

    # preprocessed image: f32 CHW 28x28 (fixture geometry)
    pix = np.zeros((3, 28, 28), np.float32)
    img = CImage(
        pix.ctypes.data_as(ctypes.c_void_p), 28, 28, 3, 1  # F32
    )
    emb = CEmbedding()
    rc = lib.minigpt4_encode_image(ctx, ctypes.byref(img), ctypes.byref(emb), 0)
    assert rc == 0, lib.minigpt4_error_code_to_string(rc)
    assert emb.elements == 4 * 32  # query_length * n_embd
    vals = np.ctypeslib.as_array(emb.data, shape=(emb.elements,))
    assert np.all(np.isfinite(vals))

    assert lib.minigpt4_system_prompt(ctx, 0) == 0
    assert lib.minigpt4_begin_chat_image(ctx, ctypes.byref(emb), b"what?", 0) == 0

    token = ctypes.c_char_p()
    out = []
    for _ in range(4):
        rc = lib.minigpt4_end_chat_image(
            ctx, ctypes.byref(token), 0,
            0.0, 40, 0.9, 1.0, 1.0, 64, 1.1, 1.0, 1.0, 0, 5.0, 1.0, 1,
        )
        assert rc == 0
        out.append(token.value.decode("utf-8", "replace"))
    assert all(isinstance(t, str) for t in out)

    # follow-up turn + reset
    assert lib.minigpt4_begin_chat(ctx, b"and?", 0) == 0
    rc = lib.minigpt4_end_chat(
        ctx, ctypes.byref(token), 0,
        0.0, 40, 0.9, 1.0, 1.0, 64, 1.1, 1.0, 1.0, 0, 5.0, 1.0, 1,
    )
    assert rc == 0
    assert lib.minigpt4_reset_chat(ctx) == 0

    lib.minigpt4_free_embedding(ctypes.byref(emb))
    assert not emb.data
    assert lib.minigpt4_free(ctx) == 0


def test_quantize_through_abi(lib, models, tmp_path):
    model, _ = models
    out = tmp_path / "q.bin"
    lib.minigpt4_quantize_model.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    rc = lib.minigpt4_quantize_model(str(model).encode(), str(out).encode(), 8)  # Q8_0
    assert rc == 0
    assert out.exists()

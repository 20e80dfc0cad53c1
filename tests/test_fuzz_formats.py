"""Systematic corruption fuzzing of the model-file readers.

The reference parses untrusted files with raw pointer arithmetic over an
mmap (minigpt4.cpp:427-514); a malformed file there is a segfault or a
silent garbage load.  Production loaders must instead fail CLOSED: every
truncation and every header-byte corruption either still parses (payload
bytes are opaque) or raises a SANCTIONED, typed error — never a crash, an
unbounded allocation (flipped count fields), or a hang (flipped loop
bounds).  This complements test_ggml_llama.test_corrupt_files_fail_cleanly
(four hand-picked cases) with seeded systematic sweeps.
"""

import struct

import numpy as np
import pytest

from fixtures import build_tiny_models
from minigpt4_tpu.formats import ContainerReader, LlamaFileReader

# The sanctioned failure surface.  MiniGPT4TypedError subclasses ValueError
# (carrying the reference ABI code); UnicodeDecodeError and JSONDecodeError
# subclass ValueError too.  struct.error covers short fixed-width unpacks.
# NOT sanctioned: MemoryError (allocation bomb from a flipped count),
# OSError/BusError (mmap fault), RecursionError, or any silent hang.
SANCTIONED = (ValueError, EOFError, KeyError, IndexError, struct.error,
              NotImplementedError, OverflowError)


@pytest.fixture(scope="module")
def tiny_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fuzz_models")
    model, llm = build_tiny_models(tmp)
    return model.read_bytes(), llm.read_bytes(), tmp


def _try_container(path):
    with ContainerReader(path) as r:
        # touch every decoded tensor: corruption must surface at parse or
        # decode, not as an mmap fault later
        for m in r.models.values():
            for t in m.tensors:
                r.tensor(m.name, t)


def _try_llm(path):
    r = LlamaFileReader(path)
    for name in list(r.tensors)[:4]:
        r.tensor_f32(name)


def _sweep_truncations(data: bytes, tmp, loader, n_cuts: int = 40):
    """Every prefix must parse-or-raise-sanctioned (only the full file is
    guaranteed to parse)."""
    p = tmp / "trunc.bin"
    cuts = sorted({int(c) for c in np.linspace(0, len(data) - 1, n_cuts)})
    for cut in cuts:
        p.write_bytes(data[:cut])
        try:
            loader(p)
        except SANCTIONED:
            pass  # the contract: typed, catchable, bounded


def _sweep_bitflips(data: bytes, tmp, loader, n_flips: int = 120, seed: int = 0):
    """Single-byte corruptions across the whole file (headers AND payload):
    parse-or-raise-sanctioned, bounded time and memory."""
    rng = np.random.default_rng(seed)
    p = tmp / "flip.bin"
    # dense coverage of the header region (counts, lengths, dtypes live
    # there), sparse over the payload
    header_span = min(len(data), 4096)
    offsets = list(rng.integers(0, header_span, n_flips // 2))
    offsets += list(rng.integers(0, len(data), n_flips - n_flips // 2))
    for off in offsets:
        off = int(off)
        blob = bytearray(data)
        blob[off] ^= int(rng.integers(1, 256))
        p.write_bytes(bytes(blob))
        try:
            loader(p)
        except SANCTIONED:
            pass


def test_container_truncation_sweep(tiny_files):
    data, _, tmp = tiny_files
    _sweep_truncations(data, tmp, _try_container)


def test_container_bitflip_sweep(tiny_files):
    data, _, tmp = tiny_files
    _sweep_bitflips(data, tmp, _try_container)


def test_llm_truncation_sweep(tiny_files):
    _, ldata, tmp = tiny_files
    _sweep_truncations(ldata, tmp, _try_llm)


def test_llm_bitflip_sweep(tiny_files):
    _, ldata, tmp = tiny_files
    _sweep_bitflips(ldata, tmp, _try_llm)


def test_count_field_bomb_is_bounded(tiny_files, tmp_path):
    """Worst-case adversarial counts (0x7FFFFFFF tensor/string counts) must
    fail fast via short reads, not allocate or spin."""
    data, _, _ = tiny_files
    # container layout: magic(4) version(4) ftype(4) json_len(4) ...
    for off in (12, 16):  # json length field / first submodel name length
        blob = bytearray(data)
        blob[off : off + 4] = struct.pack("<i", 0x7FFFFFFF)
        p = tmp_path / "bomb.bin"
        p.write_bytes(bytes(blob))
        with pytest.raises(SANCTIONED):
            _try_container(p)

"""llama.cpp model-file reader tests (ggjt v3 write -> read round-trip)."""

import numpy as np
import pytest

from minigpt4_tpu.formats import (
    DataType,
    LlamaFileReader,
    LlamaFileWriter,
    LlamaHParams,
    LlamaVocab,
    quants,
)


def tiny_vocab(n=32):
    toks = [b"<unk>", b"<s>", b"</s>"]
    toks += [bytes([ord("a") + i % 26]) for i in range(n - 3)]
    return LlamaVocab(tokens=toks, scores=[0.0] * n)


def test_ggjt3_round_trip(tmp_path):
    hp = LlamaHParams(n_vocab=32, n_embd=64, n_mult=256, n_head=4, n_layer=2, n_rot=16, ftype=1)
    vocab = tiny_vocab(32)
    rng = np.random.default_rng(11)

    emb = rng.normal(0, 1, (32, 64)).astype("<f2")
    wq = rng.normal(0, 1, (64, 64)).astype(np.float32)
    wq_q = quants.quantize(wq.reshape(-1), DataType.Q4_0)

    w = LlamaFileWriter(tmp_path / "llm.bin", hp, vocab)
    w.add_tensor("tok_embeddings.weight", (32, 64), DataType.F16, emb.view(np.uint8).reshape(-1))
    w.add_tensor("layers.0.attention.wq.weight", (64, 64), DataType.Q4_0, wq_q)
    w.write()

    with LlamaFileReader(tmp_path / "llm.bin") as r:
        assert r.hparams.n_vocab == 32
        assert r.hparams.n_embd == 64
        assert r.hparams.head_dim == 16
        assert r.vocab.tokens[1] == b"<s>"
        np.testing.assert_array_equal(r.tensor("tok_embeddings.weight"), emb)
        got = r.tensor("layers.0.attention.wq.weight")
        want = quants.dequantize(wq_q, DataType.Q4_0).reshape(64, 64)
        np.testing.assert_array_equal(got, want)
        # data is 32-byte aligned in ggjt
        for rec in r.tensors.values():
            assert rec.offset % 32 == 0


def test_n_ff_derivation():
    # llama-7B: n_embd 4096, n_mult 256 -> n_ff 11008 (llama.cpp formula)
    hp = LlamaHParams(32000, 4096, 256, 32, 32, 128, 1)
    assert hp.n_ff == 11008
    # llama-13B: n_embd 5120 -> 13824
    hp = LlamaHParams(32000, 5120, 256, 40, 40, 128, 1)
    assert hp.n_ff == 13824


def test_unknown_magic(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x00\x01\x02\x03" + b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        LlamaFileReader(p)


def test_corrupt_files_fail_cleanly(tmp_path):
    """Corrupt/truncated model files raise typed errors at parse time — not
    mmap faults or silent partial loads (failure-detection surface)."""
    import pytest

    from fixtures import build_tiny_models
    from minigpt4_tpu.formats import ContainerReader, LlamaFileReader

    model, llm = build_tiny_models(tmp_path)

    data = model.read_bytes()
    for name, blob, exc in [
        ("bad magic", b"XXXX" + data[4:], ValueError),
        ("truncated header", data[:40], EOFError),
        ("truncated payload", data[: len(data) // 2], EOFError),
        ("empty", b"", ValueError),
    ]:
        p = tmp_path / "corrupt.bin"
        p.write_bytes(blob)
        with pytest.raises(exc):
            with ContainerReader(p) as r:
                _ = r.models

    ldata = llm.read_bytes()
    for name, blob, exc in [
        ("bad magic", b"XXXX" + ldata[4:], ValueError),
        ("truncated payload", ldata[: len(ldata) // 3], EOFError),
    ]:
        p = tmp_path / "corrupt_llm.bin"
        p.write_bytes(blob)
        with pytest.raises(exc):
            LlamaFileReader(p)

"""Python host for the C ABI library: one class per MiniGPT4Context.

Marshalling layer between libminigpt4.so's embedded interpreter and the
engine: bytes in, bytes/strings/ints out — no numpy objects cross the C
boundary.  Mirrors the per-call semantics of the reference's C++ MiniGPT4
class (sample-then-eval, n_past cursor, chat templates).
"""

from __future__ import annotations

import numpy as np

from .. import image as image_mod
from ..engine import MiniGPT4Engine, SamplingParams


class Host:
    def __init__(self, path: str, llm_model: str, verbosity: int, seed: int,
                 n_ctx: int, n_batch: int):
        # the 18-function reference ABI has fixed signatures; engine options
        # beyond it are environment opt-ins:
        #   MINIGPT4_TPU_WARMUP=1         precompile buckets/chunks/encoder
        #   MINIGPT4_TPU_CACHE_DTYPE      bf16 | f32 | f8
        #   MINIGPT4_TPU_QUANT_MODE       auto | repack | qtensor | w8a8
        #   MINIGPT4_TPU_SPECULATIVE_K    greedy speculative verify width
        #   MINIGPT4_TPU_SMOOTH_SCALES    calibration npz (quality.py) for
        #                                 the w8a8 activation-quant grids
        import os

        from ..engine.engine import CACHE_DTYPES

        kw = {}
        cd = os.environ.get("MINIGPT4_TPU_CACHE_DTYPE")
        if cd:
            if cd not in CACHE_DTYPES:
                raise ValueError(
                    f"MINIGPT4_TPU_CACHE_DTYPE={cd!r}: expected "
                    f"{' | '.join(CACHE_DTYPES)}"
                )
            kw["cache_dtype"] = CACHE_DTYPES[cd]
        qm = os.environ.get("MINIGPT4_TPU_QUANT_MODE")
        if qm:
            if qm not in ("auto", "repack", "qtensor", "w8a8", "gq"):
                raise ValueError(
                    f"MINIGPT4_TPU_QUANT_MODE={qm!r}: expected "
                    "auto | repack | qtensor | w8a8"
                )
            kw["quant_mode"] = qm
        sm = os.environ.get("MINIGPT4_TPU_SMOOTH_SCALES")
        if sm:
            if not os.path.exists(sm):
                raise FileNotFoundError(
                    f"MINIGPT4_TPU_SMOOTH_SCALES={sm!r} does not exist"
                )
            kw["smooth_scales"] = sm
        sk = os.environ.get("MINIGPT4_TPU_SPECULATIVE_K")
        if sk:
            try:
                kw["speculative_k"] = int(sk)
            except ValueError:
                raise ValueError(
                    f"MINIGPT4_TPU_SPECULATIVE_K={sk!r}: expected an integer"
                ) from None
        self.engine = MiniGPT4Engine(
            path, llm_model, verbosity=verbosity, seed=seed, n_ctx=n_ctx,
            n_batch=n_batch, **kw,
        )
        if os.environ.get("MINIGPT4_TPU_WARMUP"):
            self.engine.warmup()

    # -- images --
    def image_load_from_file(self, path: str):
        arr = image_mod.load_image(path)
        h, w, c = arr.shape
        return (arr.tobytes(), w, h, c)

    def preprocess_image(self, data: bytes, width: int, height: int):
        arr = np.frombuffer(data, np.uint8).reshape(height, width, 3)
        size = self.engine.vision_cfg.vit.image_size
        out = image_mod.preprocess(arr, size=size)
        return (out.astype("<f4").tobytes(), size)

    def encode_image(self, data: bytes, width: int, height: int):
        arr = np.frombuffer(data, "<f4").reshape(3, height, width)
        emb = self.engine.encode_image(arr)
        return np.asarray(emb, "<f4").tobytes()

    # -- chat --
    def begin_chat_image(self, embedding: bytes, s: str) -> int:
        emb = np.frombuffer(embedding, "<f4")
        self.engine.begin_chat_image(emb, s)
        return 0

    def begin_chat(self, s: str) -> int:
        self.engine.begin_chat(s)
        return 0

    def system_prompt(self) -> int:
        self.engine.system_prompt()
        return 0

    def end_chat(self, temp, top_k, top_p, tfs_z, typical_p, repeat_last_n,
                 repeat_penalty, alpha_presence, alpha_frequency, mirostat,
                 mirostat_tau, mirostat_eta, penalize_nl) -> str:
        params = SamplingParams(
            temp=temp, top_k=int(top_k), top_p=top_p, tfs_z=tfs_z, typical_p=typical_p,
            repeat_last_n=int(repeat_last_n), repeat_penalty=repeat_penalty,
            alpha_presence=alpha_presence, alpha_frequency=alpha_frequency,
            mirostat=int(mirostat), mirostat_tau=mirostat_tau, mirostat_eta=mirostat_eta,
            penalize_nl=bool(penalize_nl),
        )
        return self.engine.end_chat(params)

    def reset_chat(self) -> int:
        self.engine.reset_chat()
        return 0

    def close(self) -> None:
        self.engine.close()

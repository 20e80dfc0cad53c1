"""Concurrent chat sessions over one shared model (serving layer).

The reference is strictly single-session — one global ``n_past`` cursor in
the C++ engine (minigpt4.cpp:2521) — so its webui serializes users.  Here
model weights and compiled functions are shared while each session owns its
decode state (KV cache, cursor, sampler, pending logits), so several chats
proceed concurrently on one chip.

Design notes:
  * per-session caches are allocated at a configurable ``session_ctx``
    (full-n_ctx caches for many sessions would exhaust HBM: a 13B bf16
    cache is ~0.8 MB/position);
  * a lock serializes device dispatches (single-chip; XLA queues are
    per-process) while host-side work (tokenize/sample/detokenize)
    interleaves freely — at 30 tok/s the device is the bottleneck anyway;
  * dp-sharded batched serving (sessions mapped to mesh 'dp' slots) is the
    scale-out path: the cache layout already carries the batch axis.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod
from .engine import MiniGPT4Engine
from .sampling import Sampler, SamplingParams


class ChatSession:
    """One conversation: owns cache + cursor + sampler; shares the model."""

    def __init__(self, pool: "SessionPool", session_id: int, n_ctx: int, seed: int):
        self._pool = pool
        self.session_id = session_id
        self.n_ctx = n_ctx
        self.cache = llama_mod.init_cache(
            pool._session_cfg(n_ctx), batch=1, dtype=pool.cache_dtype
        )
        self.n_past = 0
        self.sampler = Sampler(seed)
        self.last_logits: np.ndarray | None = None
        self.embedding: np.ndarray | None = None
        self.is_image_chat = False

    # -- the engine operation set, bound to this session's state --
    def encode_image(self, pixels: np.ndarray) -> np.ndarray:
        emb = self._pool.encode_image(pixels)
        self.embedding = emb
        return emb

    def upload_image(self, pixels: np.ndarray) -> None:
        self.reset()
        self._pool.system_prompt(self)
        self.encode_image(pixels)
        self.is_image_chat = True

    def ask(self, question: str) -> None:
        if self.is_image_chat and self.embedding is not None:
            self._pool.begin_chat_image(self, self.embedding, question)
            self.is_image_chat = False
        else:
            self._pool.begin_chat(self, question)

    def generate(self, limit: int = 256, params: SamplingParams | None = None):
        yield from self._pool.generate(self, limit, params or SamplingParams())

    def reset(self) -> None:
        self.n_past = 0
        self.last_logits = None
        self.is_image_chat = False
        self.embedding = None

    def close(self) -> None:
        self._pool._release(self)


class SessionPool:
    """Shared engine + per-session decode state."""

    def __init__(
        self,
        model_path,
        llm_path,
        session_ctx: int = 512,
        seed: int = 1337,
        **engine_kwargs,
    ):
        self.engine = MiniGPT4Engine(model_path, llm_path, seed=seed, **engine_kwargs)
        self.session_ctx = session_ctx
        self.cache_dtype = self.engine.cache["k"].dtype
        self.seed = seed
        self._lock = threading.Lock()
        self._next_id = 0
        self._sessions: dict[int, ChatSession] = {}
        # session-ctx jitted forward (smaller static cache length)
        cfg = self._session_cfg(session_ctx)
        self._fwd = jax.jit(
            lambda p, c, e, pos0, last: llama_mod.forward(p, c, e, pos0, cfg, last),
            donate_argnums=(1,),
        )

    def _session_cfg(self, n_ctx: int):
        import dataclasses

        return dataclasses.replace(self.engine.llm_cfg, n_ctx=n_ctx)

    # -- session lifecycle --
    def new_session(self) -> ChatSession:
        with self._lock:
            sid = self._next_id
            self._next_id += 1
            s = ChatSession(self, sid, self.session_ctx, self.seed + sid)
            self._sessions[sid] = s
            return s

    def _release(self, s: ChatSession) -> None:
        self._sessions.pop(s.session_id, None)

    # -- shared device ops (dispatch under the lock) --
    def encode_image(self, pixels: np.ndarray) -> np.ndarray:
        with self._lock:
            return self.engine.encode_image(pixels)

    def _prefill(self, s: ChatSession, embeds: jnp.ndarray) -> None:
        stotal = embeds.shape[1]
        if s.n_past + stotal > s.n_ctx:
            raise ValueError(f"session {s.session_id}: context overflow")
        with self._lock:
            nb = self.engine.n_batch
            for off in range(0, stotal, nb):
                chunk = embeds[:, off : off + nb]
                logits, s.cache = self._fwd(
                    self.engine.llm_params, s.cache, chunk,
                    jnp.int32(s.n_past), jnp.int32(chunk.shape[1] - 1),
                )
                s.n_past += chunk.shape[1]
            s.last_logits = np.asarray(logits[0])

    def _add_tokens(self, s: ChatSession, tokens: list[int]) -> None:
        if not tokens:
            return
        arr = jnp.asarray(np.asarray(tokens, np.int32)[None])
        embeds = self.engine._embed(self.engine.llm_params, arr)
        self._prefill(s, embeds)

    def _add_strings(self, s: ChatSession, text: str) -> None:
        self._add_tokens(s, self.engine.tokenizer.tokenize(text, add_bos=True))

    # -- chat protocol (same templates as the engine) --
    def system_prompt(self, s: ChatSession) -> None:
        from .engine import SYSTEM_PROMPT

        self._add_strings(s, SYSTEM_PROMPT)

    def begin_chat_image(self, s: ChatSession, embedding: np.ndarray, q: str) -> None:
        emb = np.asarray(embedding, np.float32).reshape(1, -1, self.engine.llm_cfg.n_embd)
        self._add_strings(s, "Human: <Img>")
        self._prefill(s, jnp.asarray(emb))
        self._add_strings(s, "</Img> ")
        self._add_strings(s, q)
        self._add_strings(s, "### Assistant:")

    def begin_chat(self, s: ChatSession, q: str) -> None:
        self._add_strings(s, "Human: ")
        self._add_strings(s, q)
        self._add_strings(s, "### Assistant:")

    def generate(self, s: ChatSession, limit: int, params: SamplingParams):
        from .engine import MiniGPT4Engine as E

        chat = ""
        for _ in range(limit):
            if s.last_logits is None or s.n_past >= s.n_ctx:
                return
            tid = s.sampler.sample(s.last_logits, params)
            token = self.engine.tokenizer.id_to_str(tid)
            self._add_tokens(s, [tid])
            chat += token
            if E.contains_eos_token(token):
                continue
            if E.is_eos(chat):
                break
            yield token

    def close(self) -> None:
        self.engine.close()

"""Two-stage pipeline parallelism: vision encoder and LLM decoder on
DISJOINT device sets, overlapped via async dispatch.

The reference is single-process/single-device so it has no pipelining
(SURVEY §2.3); this module is the PP seam the TPU design keeps open: the
vision stack and the decoder are already separate jitted computations with a
single [B, 32, n_embd] activation crossing the boundary, so stage
parallelism is pure *placement* —

  * vision params live on stage-0 devices, decoder params + KV caches on
    stage-1 devices;
  * `encode` dispatches asynchronously on stage 0 while stage 1 decodes the
    PREVIOUS request (JAX dispatch is async: the overlap needs no threads,
    just issuing stage-0 work before blocking on stage-1 results);
  * the hand-off is one `jax.device_put` of the 32-row soft prompt
    (32 x 5120 x 4 B = 640 KB — negligible next to either stage).

On a pod this generalizes: each stage's device set becomes a (dp, tp)
sub-mesh and the hand-off rides ICI/DCN.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import minigpt4 as vision_mod


@dataclass
class _Pending:
    tag: object
    embedding: jnp.ndarray  # [B, 32, n_embd] on the LLM device


class TwoStagePipeline:
    """Overlapped image-encode / caption-decode over two device sets.

    ``submit(tag, pixels)`` enqueues an encode on the vision devices and
    returns immediately; ``results(prompt, ...)`` yields (tag, text) in
    submission order, decoding request i on the LLM devices while request
    i+1 (and later) encode concurrently on the vision devices.
    """

    def __init__(self, engine, vision_device=None, llm_device=None):
        devs = jax.devices()
        if (vision_device is None or llm_device is None) and len(devs) < 2:
            raise ValueError("pipeline parallelism needs >= 2 devices")
        if vision_device is None:
            vision_device = devs[0] if devs[0] != llm_device else devs[1]
        if llm_device is None:
            llm_device = devs[1] if devs[1] != vision_device else devs[0]
        self.engine = engine
        self.vision_device = vision_device
        self.llm_device = llm_device
        # stage placement: vision params -> stage 0, decoder (+cache) -> stage 1
        self.vision_params = jax.device_put(engine.vision_params, vision_device)
        self.llm_params = jax.device_put(engine.llm_params, llm_device)
        engine.llm_params = self.llm_params
        engine.cache = jax.device_put(engine.cache, llm_device)
        # jit runs where its operands live: vision params are pinned to the
        # vision device, so the encode executes on stage 0
        self._encode = jax.jit(
            lambda p, x: vision_mod.encode_image(p, x, engine.vision_cfg)
        )
        self._queue: deque[_Pending] = deque()

    def submit(self, tag, pixels: np.ndarray) -> None:
        """Dispatch the encode on the vision stage (non-blocking)."""
        if pixels.ndim == 3:
            pixels = pixels[None]
        x = jax.device_put(jnp.asarray(pixels, jnp.float32), self.vision_device)
        emb = self._encode(self.vision_params, x)  # async on stage 0
        # stage hand-off: one small transfer, also async
        emb = jax.device_put(emb, self.llm_device)
        self._queue.append(_Pending(tag, emb))

    def results(self, question: str, limit: int = 64, params=None):
        """Yield (tag, generated_text) in submission order.  Decoding request
        i on stage 1 overlaps the still-running encodes of requests > i on
        stage 0 — no threads, just async dispatch order."""
        from ..engine.sampling import SamplingParams

        eng = self.engine
        while self._queue:
            p = self._queue.popleft()
            eng.reset_chat()
            eng.system_prompt()
            eng.add_strings("Human: <Img>")
            # device-resident hand-off: the embedding is already on stage 1
            eng._prefill_embeds(p.embedding.astype(jnp.float32))
            eng.add_strings("</Img> ")
            eng.add_strings(question)
            eng.add_strings("### Assistant:")
            text = "".join(
                eng.generate(limit=limit, params=params or SamplingParams(temp=0.0))
            )
            yield p.tag, text

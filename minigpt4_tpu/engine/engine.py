"""MiniGPT4Engine: the TPU-native equivalent of the reference's ``MiniGPT4``
orchestrator class (/root/reference/minigpt4.cpp:1740-2522).

Owns: vision + decoder params (HBM-resident), the preallocated KV cache, the
decode cursor ``n_past``, the tokenizer and sampler.  Exposes the same
operation set the C ABI drives:

    encode_image        minigpt4.cpp:2094-2363
    add_strings/tokens  minigpt4.cpp:2365-2397   (always add_bos=true)
    add_embedding       minigpt4.cpp:2399-2422   (soft-prompt injection)
    sample_token        minigpt4.cpp:2425-2483   (sample-then-eval ordering)
    begin/end chat, system_prompt, reset          minigpt4.cpp:2671-2762

TPU specifics:
  * prefill lengths are padded up to power-of-two buckets so each bucket
    compiles once (XLA static shapes); the cache write/mask arithmetic makes
    padding invisible (see llama.forward);
  * the KV cache is donated through every step — XLA updates it in place, no
    HBM copy per token;
  * decode is one jitted step: embed row gather -> L scanned layers ->
    last-logits head; logits (the only download) are sampled on host.
"""

from __future__ import annotations

import collections
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils
from ..formats import ContainerReader, LlamaFileReader
from ..models import llama as llama_mod
from ..models import minigpt4 as vision_mod
from ..tokenizer import LlamaTokenizer
from .sampling import Sampler, SamplingParams

# Vicuna-v0 conversation constants (minigpt4.cpp:139-141)
# KV-cache storage dtypes selectable from the CLIs / server.  fp8 (e4m3)
# halves per-session cache memory (13B: 0.82 -> 0.41 MB/position) — double
# the serving batch in the same HBM — at a small attention-precision cost
# (scores/PV still compute in bf16/f32; see models/llama.py).
CACHE_DTYPES = {
    "f32": jnp.float32,
    "bf16": jnp.bfloat16,
    "f8": jnp.float8_e4m3fn,
}

# "auto" quant-mode resolution for the DECODER on TPU.  Round 3 made the
# EXACT group-quant path (ops/group_i8.py, quant_mode="gq") as fast as the
# approximate w8a8 path (41.1 vs 42.1 tok/s at 13B — PERFORMANCE.md
# round-3), so the default became: **exact when it fits, w8a8 when serving
# density demands it** — gq's scale planes cost ~1.2 GB over w8a8 at 13B,
# which single-stream chat affords and 8-lane dense serving does not.
# MINIGPT4_TPU_AUTO_W8A8=0 disables BOTH byte-code auto paths (restores
# the round-1 exact bf16-staging resolution); MINIGPT4_TPU_AUTO_GQ=0
# disables only the gq preference (w8a8 everywhere it fits, the round-2
# default).  See docs/QUALITY.md for the recorded decision history.
import os as _os

AUTO_W8A8 = _os.environ.get("MINIGPT4_TPU_AUTO_W8A8", "1") != "0"
AUTO_GQ = _os.environ.get("MINIGPT4_TPU_AUTO_GQ", "1") != "0"
# calibrated to the measured 13B single-stream gq+f8 success (15.1 GB
# resident incl. vision/emb) and the measured w8a8 8-lane dense capacity
_HBM_BUDGET = 15_900_000_000
_AUTO_HEADROOM = 600_000_000

# Run-ahead depth for the strict per-token decode path (end_chat / the C
# ABI loop): how many sample+eval steps the engine dispatches beyond what
# the client has consumed.  Depth D hides D-1 tunnel round-trips behind
# device time; 0 disables (one blocking fetch per call, round-2 behavior).
STEP_LOOKAHEAD = int(_os.environ.get("MINIGPT4_TPU_STEP_LOOKAHEAD", "3"))


def resolve_llm_quant_mode(reader, quant_mode: str, backend: str,
                           n_ctx: int = 2048, batch: int = 1) -> str:
    """Resolve "auto" for the decoder on TPU.

    Preference order: "gq" (EXACT ggml dequant semantics at byte-code
    speed) when the codes + scale planes + this configuration's KV cache
    fit the chip; else "w8a8" (re-quantized, ~1.2 GB smaller at 13B) when
    that fits; else unchanged (the bf16-staging exact kernel at 0.75
    B/weight).  Both byte paths need every major quantized weight at
    K % 256 == 0 (true for all real LLaMA geometries).

    Side effect: sets group_i8.PACK_OVERRIDE for the residency-driven
    packing decision.  Every call starts by RESETTING it to None so a
    previous resolution in the same process (another engine, the draft
    model) can never leak a stale decision into this load — explicit
    quant modes and non-auto paths get the documented packed default
    back."""
    from ..ops import group_i8 as _gq

    _gq.PACK_OVERRIDE = None
    if quant_mode != "auto" or backend != "tpu" or not AUTO_W8A8:
        return quant_mode
    from ..formats.dtypes import DataType, is_quantized

    qrecs = [r for r in reader.tensors.values() if is_quantized(r.dtype)]
    if not qrecs:
        return quant_mode
    if any(len(r.shape) == 2 and r.shape[1] % 256 for r in qrecs):
        return quant_mode  # tiny/test geometries: keep the exact path

    def _gq_bytes(r, pack_on: bool) -> float:
        # codes: 1 B/elem, or 0.5 (p4) / 0.625 (p5) once sub-byte packed
        # (p5 additionally pads stored K to a 1024-multiple for legal
        # prefill tiles — group_i8.pad_k_chunks); planes: raw-sub-scale
        # formats carry sc6+mn6 u8 per 32 + d/dmin f32 per 256
        # (~0.094 B/elem); generic formats 2 bf16 per GROUP = 4/gs B/elem
        # — the gs-16 k-quants (q2_k/q3_k/q6_k) cost 0.25, not a flat
        # 0.125 (a 13B q6_k file was under-estimated ~1.7 GB and a
        # borderline auto-resolution could OOM at load, ADVICE r4 #1)
        d = DataType(r.dtype)
        per = 1.0
        if pack_on and _gq.packable(d):
            per = (0.625 if d in _gq.PACK5 else
                   0.75 if d in _gq.PACK6 else 0.5)
            if (d in _gq.PACK5 or d in _gq.PACK6) and len(r.shape) == 2 \
                    and r.shape[1] % 1024:
                k = r.shape[1]
                per *= (k + (-k % 1024)) / k
        if d in _gq.EXACT_PLANE:
            per += 0.094
        else:
            gs = 16 if d in (DataType.Q2_K, DataType.Q3_K,
                             DataType.Q6_K) else 32
            per += 4.0 / gs
        return r.n_elems * per

    hp = getattr(reader, "hparams", None)
    cache_f8 = (hp.n_layer * batch * hp.n_embd * n_ctx * 2  # 1 B/entry, k+v
                if hp is not None else 0)

    def gq_est(pack_on: bool) -> int:
        return (int(sum(_gq_bytes(r, pack_on) for r in qrecs)) + cache_f8
                + _AUTO_HEADROOM)

    env_pack = _os.environ.get("MINIGPT4_TPU_GQ_PACK")
    if env_pack is not None:
        # explicit user choice: estimate with it, never override it
        if AUTO_GQ and gq_est(env_pack != "0") <= _HBM_BUDGET:
            return "gq"
        return "w8a8"
    # Residency-driven packing (round-5 same-session A/B: UNPACKED gq
    # decodes 41.5 tok/s vs packed 38.8 at 13B — the in-kernel unpack +
    # bit-plane dot cost more than the byte saving returns).  Prefer
    # unpacked when it fits this configuration; pack only when packing is
    # what makes exact gq fit (e.g. dense multi-lane serving); else w8a8.
    if AUTO_GQ and gq_est(False) <= _HBM_BUDGET:
        _gq.PACK_OVERRIDE = False
        return "gq"
    if AUTO_GQ and gq_est(True) <= _HBM_BUDGET:
        _gq.PACK_OVERRIDE = True
        return "gq"
    return "w8a8"


def pick_cache_dtype(reader, llm_mode: str, n_ctx: int, batch: int,
                     backend: str):
    """Default KV-cache dtype: bf16, EXCEPT when the i8 weight residency
    plus a bf16 cache would not fit a 16 GB chip — then fp8 (e4m3), whose
    in-kernel integer unpack costs ~the bf16 path (ops/flash_decode.py).
    Applies to both byte-code representations: w8a8 (1 B/weight) and gq
    (1 B/weight codes + ~0.1 B/weight exact scale planes)."""
    if backend != "tpu" or llm_mode not in ("w8a8", "gq"):
        return jnp.bfloat16
    from ..formats.dtypes import is_quantized

    hp = reader.hparams
    i8_bytes = sum(r.n_elems for r in reader.tensors.values()
                   if is_quantized(r.dtype))
    if llm_mode == "gq":
        i8_bytes = int(i8_bytes * 1.1)  # sc6/mn6 u8 + d/dmin f32 planes
    dh = hp.n_embd // hp.n_head
    bf16_cache = hp.n_layer * batch * hp.n_head * n_ctx * dh * 2 * 2
    # ~2.5 GB headroom: vision params, dense embeddings, XLA transients
    if i8_bytes + bf16_cache + 2_500_000_000 > 15_500_000_000:
        return jnp.float8_e4m3fn
    return jnp.bfloat16


SYSTEM_PROMPT = (
    "Give the following image: <Img>ImageContent</Img>. "
    "You will be able to see the image once I provide it to you. "
    "Please answer my questions.###"
)
EOS_TOKEN_SUFFIX = "##"
EOS_SUFFIX = "###"
N_IMG_EMBED = 32  # LLAMA_PROJECTION_EMBEDDING_SIZE1, minigpt4.cpp:133


def _bucket(n: int, cap: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return min(b, cap)


class DecodeState:
    """One decode cursor: KV cache + n_past + pending logits + PRNG stream.

    The engine owns one (the reference's single global cursor,
    minigpt4.cpp:2521); the serving layer owns one per session — all sharing
    the same :class:`StepFns` compilations.
    """

    def __init__(self, cache: dict, seed: int = 0):
        self.cache = cache
        self.n_past = 0
        self.logits_dev = None  # [V] on device
        self.logits_host: np.ndarray | None = None
        self.rng_key = jax.random.PRNGKey(seed)
        # evaluated token ids, one per cache position (-1 sentinel for
        # injected embedding rows) — the n-gram history speculative decode
        # drafts from; invariant: len(tokens) == n_past
        self.tokens: list[int] = []
        # context-shift keep marker: positions [0, n_keep) — the system
        # prompt + image prefix — survive every shift (llama.cpp's n_keep)
        self.n_keep = 0
        # host-side copy of the cache while parked (see :meth:`park`)
        self.parked: dict | None = None
        # draft-model speculative decoding (engine.DraftFns): the drafter's
        # own KV cache + its evaluated frontier.  Lazily (re)built from
        # ``tokens`` by MiniGPT4Engine._draft_catchup — every non-draft
        # decode path stays oblivious, the catch-up prefill closes the gap
        # before the next draft-spec dispatch.
        self.dcache: dict | None = None
        self.draft_past = 0
        # stochastic speculation's carried residual exclusion: the token id
        # the NEXT sample from the pending logits must exclude (the last
        # dispatch's rejected draft; -1 = none).  Exactness of speculative
        # sampling requires the rejection resample to come from the residual
        # distribution — llama.stochastic_speculative_decode_loop threads it
        # between dispatches, StepFns.resolve_ban consumes it before any
        # plain-path sample from the same logits.
        self.spec_ban = -1

    @property
    def logits(self) -> np.ndarray | None:
        """Host view of the pending logits (fetched lazily, memoized)."""
        if self.logits_dev is None:
            return None
        if self.logits_host is None:
            self.logits_host = np.asarray(self.logits_dev)
        return self.logits_host

    def reset(self) -> None:
        self.n_past = 0
        self.logits_dev = None
        self.logits_host = None
        self.tokens = []
        self.parked = None
        self.dcache = None
        self.draft_past = 0
        self.n_keep = 0
        self.spec_ban = -1

    def park(self) -> None:
        """Move the KV cache off the device, trimmed to the consumed prefix,
        freeing the session's HBM while it idles between turns (turn gaps
        are human-scale; :meth:`ensure_device` re-uploads in ~cache-size /
        PCIe-bandwidth, invisible next to them).  A parked 13B/f8/512-ctx
        session costs 0 HBM instead of 210 MB — the serving-density lever
        for many concurrent conversations.  No-op while the cache is not
        resident (riding a batched decode, or already parked)."""
        if self.cache is None or self.parked is not None:
            return
        k = self.cache["k"]
        n = min(self.n_past, k.shape[3])
        self.parked = {
            "shape": tuple(k.shape),
            "dtype": k.dtype,
            "k": np.asarray(self.cache["k"][:, :, :, :n, :]),
            "v": np.asarray(self.cache["v"][:, :, :, :n, :]),
        }
        if self.logits_dev is not None:
            self.logits_host = np.asarray(self.logits_dev)
            self.logits_dev = None
        self.cache = None
        # the draft cache is cheap to rebuild (tiny model): drop it rather
        # than round-tripping it through host RAM
        self.dcache = None
        self.draft_past = 0

    def ensure_device(self) -> None:
        """Re-upload a parked cache (zero-padded back to the session
        geometry; positions past ``n_past`` are causally invisible).  Raises
        if the session has no cache at all (it is riding a batched decode —
        two device copies would corrupt)."""
        if self.parked is not None:
            p, self.parked = self.parked, None
            n = p["k"].shape[3]
            full = jnp.zeros(p["shape"], p["dtype"])
            self.cache = {
                kv: full.at[:, :, :, :n, :].set(jnp.asarray(p[kv]))
                if n else full
                for kv in ("k", "v")
            }
            if self.logits_dev is None and self.logits_host is not None:
                self.logits_dev = jnp.asarray(self.logits_host)
            return
        if self.cache is None:
            raise ValueError(
                "session cache is not resident (riding a batched decode?)"
            )

    def save(self, path) -> None:
        """Checkpoint the decode state (KV cache + cursor + pending logits +
        PRNG stream) so a chat resumes across processes.  The reference has
        no runtime-state persistence at all — its cursor is reset-only
        (minigpt4.cpp:2499-2502)."""
        self.ensure_device()  # a parked session checkpoints its live state

        def pack(a):
            # npz has no bf16/fp8 codec: store the bit pattern + dtype name
            a = np.asarray(a)
            if a.dtype.name == "bfloat16":
                return a.view(np.uint16)
            if a.dtype.name.startswith("float8"):
                return a.view(np.uint8)
            return a

        np.savez_compressed(
            path,
            k=pack(self.cache["k"]),
            v=pack(self.cache["v"]),
            kv_dtype=np.bytes_(str(self.cache["k"].dtype)),
            n_past=np.int64(self.n_past),
            has_logits=np.bool_(self.logits_dev is not None),
            logits=(np.asarray(self.logits_dev)
                    if self.logits_dev is not None else np.zeros(1, np.float32)),
            rng_key=np.asarray(self.rng_key),
            tokens=np.asarray(self.tokens, np.int64),
            n_keep=np.int64(self.n_keep),
            spec_ban=np.int64(self.spec_ban),
        )

    def restore(self, path) -> None:
        """Restore a state saved by :meth:`save` into this state's arrays
        (dtypes/shapes must match the session geometry)."""
        self.ensure_device()  # symmetric with save(): parked sessions restore
        # transparently (and parked is cleared, so nothing stale resurrects)
        z = np.load(path)
        k, v = self.cache["k"], self.cache["v"]
        if tuple(z["k"].shape) != tuple(k.shape):
            raise ValueError(
                f"checkpoint cache shape {z['k'].shape} != session {k.shape}"
            )

        def unpack(a, dtype):
            name = z["kv_dtype"].item().decode()
            if name == "bfloat16" or name.startswith("float8"):
                import ml_dtypes

                a = a.view(getattr(ml_dtypes, name))
            return jnp.asarray(a, dtype)

        self.cache = {"k": unpack(z["k"], k.dtype), "v": unpack(z["v"], v.dtype)}
        self.n_past = int(z["n_past"])
        self.logits_dev = jnp.asarray(z["logits"]) if bool(z["has_logits"]) else None
        self.logits_host = None
        self.rng_key = jnp.asarray(z["rng_key"])
        if "tokens" in z.files:
            self.tokens = [int(t) for t in z["tokens"]]
        else:  # older checkpoints: sentinel history (no n-gram matches)
            self.tokens = [-1] * self.n_past
        self.n_keep = int(z["n_keep"]) if "n_keep" in z.files else 0
        self.spec_ban = int(z["spec_ban"]) if "spec_ban" in z.files else -1
        # a pre-restore draft cache describes the OLD history: drop it (the
        # next draft-spec dispatch rebuilds it from the restored tokens)
        self.dcache = None
        self.draft_past = 0


def _attn_bucket(needed: int, n_ctx: int) -> int:
    """Power-of-two attention window covering ``needed`` positions, capped
    at the model's context (shared by StepFns and DraftFns — the two must
    bucket consistently)."""
    b = 128
    while b < needed:
        b *= 2
    return min(b, n_ctx)


class StepFns:
    """Jitted decoder step functions + the bucketed feeding policy for ONE
    config.  Built once per (cfg.n_ctx, ...) and shared by every
    :class:`DecodeState` — the engine cursor and every serving session reuse
    the same compiled executables (round 1 compiled a fresh executable per
    distinct session prompt length; VERDICT.md weak #7)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.forward = jax.jit(
            lambda p, c, e, pos0, last, attn_len: llama_mod.forward(
                p, c, e, pos0, cfg, last, attn_len=attn_len
            ),
            static_argnums=(5,),
            donate_argnums=(1,),
        )
        self.embed = jax.jit(llama_mod.embed_tokens)

        def _step(p, c, tok, pos0, attn_len):
            e = llama_mod.embed_tokens(p, tok)
            return llama_mod.forward(p, c, e, pos0, cfg, attn_len=attn_len)

        # single-token step: embed + forward in ONE dispatch (the strict
        # per-token C ABI path pays a tunnel round-trip per dispatch)
        self.decode_step = jax.jit(_step, static_argnums=(4,), donate_argnums=(1,))
        self.decode_loop = jax.jit(
            lambda p, c, l0, pos0, key, scfg, n, attn_len: llama_mod.decode_loop(
                p, c, l0, pos0, n, key, scfg, cfg, attn_len=attn_len
            ),
            static_argnums=(5, 6, 7),
            donate_argnums=(1,),
        )
        # dynamic-sampling twin: the config is a TRACED pytree of per-lane
        # parameter arrays (device_sampling.lane_rows) — one executable
        # serves every sampling configuration (the static form recompiles
        # per distinct config) and batched lanes mix configs in one dispatch
        self.decode_loop_dyn = jax.jit(
            lambda p, c, l0, pos0, key, rows, n, attn_len: llama_mod.decode_loop(
                p, c, l0, pos0, n, key, rows, cfg, attn_len=attn_len
            ),
            static_argnums=(6, 7),
            donate_argnums=(1,),
        )
        self.spec_loop = jax.jit(
            lambda p, c, l0, pos0, hist, n, k, attn_len: llama_mod.speculative_decode_loop(
                p, c, l0, pos0, hist, n, k, cfg, attn_len=attn_len
            ),
            static_argnums=(5, 6, 7),
            donate_argnums=(1,),
        )
        # SAMPLED speculation (speculative sampling with a point-mass n-gram
        # proposal, llama.stochastic_speculative_decode_loop): the sampling
        # config is the traced per-lane pytree, so one executable serves
        # every temperature/top-k/top-p configuration; emitted tokens are
        # distributionally EXACT vs the plain sampled loop (greedy lanes
        # reduce to the argmax-verify rule).  Pass count is static via the
        # keys shape.
        self.spec_loop_stoch = jax.jit(
            lambda p, c, l0, pos0, hist, ban, keys, rows, k, attn_len: (
                llama_mod.stochastic_speculative_decode_loop(
                    p, c, l0, pos0, hist, ban, keys, rows, k, cfg,
                    attn_len=attn_len
                )
            ),
            static_argnums=(8, 9),
            donate_argnums=(1,),
        )
        from .device_sampling import sample_res_rows as _srr

        # residual-aware single sample (consumes a carried spec ban)
        self.sample_res = jax.jit(_srr)
        # ban-aware plain loop: a stochastic-spec group demoted to plain
        # chunks (governor) must still resample carried rejections from the
        # residual — the ban applies to the first step only
        self.decode_loop_dyn_ban = jax.jit(
            lambda p, c, l0, pos0, key, rows, ban, n, attn_len: (
                llama_mod.decode_loop(
                    p, c, l0, pos0, n, key, rows, cfg, attn_len=attn_len,
                    ban0=ban,
                )
            ),
            static_argnums=(7, 8),
            donate_argnums=(1,),
        )
        self.paged_decode_loop_dyn_ban = jax.jit(
            lambda p, pool, pt, l0, pos0, key, rows, ban, n: (
                llama_mod.decode_loop(
                    p, pool, l0, pos0, n, key, rows, cfg, page_table=pt,
                    ban0=ban,
                )
            ),
            static_argnums=(8,),
            donate_argnums=(1,),
        )
        self.paged_spec_loop_stoch = jax.jit(
            lambda p, pool, pt, l0, pos0, hist, ban, keys, rows, k: (
                llama_mod.stochastic_speculative_decode_loop(
                    p, pool, l0, pos0, hist, ban, keys, rows, k, cfg,
                    page_table=pt,
                )
            ),
            static_argnums=(9,),
            donate_argnums=(1,),
        )
        # paged-KV serving decode: the cache argument holds the shared page
        # POOLS (engine/paged.py) and ``pt`` the per-lane page tables; the
        # pool is donated (in-place page writes), the table is data — lane
        # growth/admission never recompiles
        self.paged_decode_loop = jax.jit(
            lambda p, pool, pt, l0, pos0, key, scfg, n: llama_mod.decode_loop(
                p, pool, l0, pos0, n, key, scfg, cfg, page_table=pt
            ),
            static_argnums=(6, 7),
            donate_argnums=(1,),
        )
        self.paged_decode_loop_dyn = jax.jit(
            lambda p, pool, pt, l0, pos0, key, rows, n: llama_mod.decode_loop(
                p, pool, l0, pos0, n, key, rows, cfg, page_table=pt
            ),
            static_argnums=(7,),
            donate_argnums=(1,),
        )
        # paged + speculative: greedy verify passes over the page pool —
        # verify spans route through the table (edge-crossing writes are
        # split inside llama._layer), so speculation no longer forces a
        # group off the paged capacity path
        self.paged_spec_loop = jax.jit(
            lambda p, pool, pt, l0, pos0, hist, n, k: (
                llama_mod.speculative_decode_loop(
                    p, pool, l0, pos0, hist, n, k, cfg, page_table=pt
                )
            ),
            static_argnums=(6, 7),
            donate_argnums=(1,),
        )

        def _sample(logits, key, scfg):
            from .device_sampling import sample_token as dev_sample

            if scfg.greedy:
                return jnp.argmax(logits).astype(jnp.int32), key
            key, sub = jax.random.split(key)
            return dev_sample(logits, sub, scfg), key

        # on-device sample for the strict per-token path: downloads one
        # token id (4 B) instead of the full [V] f32 logits per step
        self.sample = jax.jit(_sample, static_argnums=(2,))

        def _sample_dyn(logits, key, rows):
            from .device_sampling import sample_token_dyn

            key, sub = jax.random.split(key)
            tok = sample_token_dyn(
                logits, sub, rows["temp"][0], rows["top_k"][0],
                rows["top_p"][0], rows["tfs_z"][0], rows["typical_p"][0],
                bias=rows["bias"][0] if "bias" in rows else None,
            )
            return tok, key

        # traced-config twin (one compile for every non-greedy config; the
        # per-token ABI path otherwise recompiles per sampling-knob tuple)
        self.sample_dyn = jax.jit(_sample_dyn)
        # llama.cpp-style context shift (llama.shift_kv_cache): traced
        # keep/drop/n_past scalars — one compilation serves every shift
        self.shift_cache = jax.jit(
            lambda c, keep, drop, n_past: llama_mod.shift_kv_cache(
                c, keep, drop, n_past, cfg
            ),
            donate_argnums=(0,),
        )

    def attn_bucket(self, needed: int) -> int:
        """Power-of-two attention window covering ``needed`` positions (the
        einsum prefill path reads cache[:bucket]; the flash decode kernel
        reads only live blocks regardless)."""
        return _attn_bucket(needed, self.cfg.n_ctx)

    def prefill_embeds(
        self, params, st: DecodeState, embeds, n_batch: int,
        token_ids: list[int] | None = None,
    ) -> None:
        """Feed [1, S, D] embeddings in n_batch chunks with power-of-two
        bucket padding per chunk (each bucket compiles once).

        ``token_ids``: the ids these embeddings came from (recorded into the
        speculative n-gram history); None = raw injected embeddings, recorded
        as -1 sentinels."""
        s_total = embeds.shape[1]
        if st.n_past + s_total > self.cfg.n_ctx:
            raise ValueError(
                f"context overflow: n_past {st.n_past} + {s_total} > {self.cfg.n_ctx}"
            )
        st.tokens.extend(token_ids if token_ids is not None else [-1] * s_total)
        for off in range(0, s_total, n_batch):
            chunk = embeds[:, off : off + n_batch]
            s = chunk.shape[1]
            # cap the pad bucket at the remaining context: writes past n_ctx
            # would make dynamic_update_slice clamp-shift the whole chunk
            b = min(_bucket(s, n_batch), self.cfg.n_ctx - st.n_past)
            if b != s:
                pad = jnp.zeros((chunk.shape[0], b - s, chunk.shape[2]), chunk.dtype)
                chunk = jnp.concatenate([chunk, pad], axis=1)
            logits, st.cache = self.forward(
                params,
                st.cache,
                chunk,
                jnp.int32(st.n_past),
                jnp.int32(s - 1),
                self.attn_bucket(st.n_past + chunk.shape[1]),
            )
            st.n_past += s
        # keep logits ON DEVICE: dispatches queue asynchronously, so a whole
        # multi-segment prompt (begin_chat_image = 5 prefill calls) costs one
        # host round-trip at first sample instead of one per segment — at
        # ~40 ms tunnel RTT that is the difference between 40 ms and 400 ms
        # per turn
        st.logits_dev = logits[0]
        st.logits_host = None
        st.spec_ban = -1  # fresh pending logits: any carried ban is dead

    def add_tokens(self, params, st: DecodeState, tokens: list[int], n_batch: int) -> None:
        """llama_eval in n_batch chunks (add_tokens, minigpt4.cpp:2365-2382)."""
        if not tokens:
            return
        if len(tokens) == 1 and st.n_past + 1 <= self.cfg.n_ctx:
            # decode fast path: one fused embed+forward dispatch
            arr = jnp.asarray(np.asarray(tokens, np.int32)[None])
            logits, st.cache = self.decode_step(
                params, st.cache, arr, jnp.int32(st.n_past),
                self.attn_bucket(st.n_past + 1),
            )
            st.n_past += 1
            st.tokens.append(int(tokens[0]))
            st.logits_dev = logits[0]
            st.logits_host = None
            st.spec_ban = -1
            return
        arr = jnp.asarray(np.asarray(tokens, np.int32)[None])
        self.prefill_embeds(
            params, st, self.embed(params, arr), n_batch,
            token_ids=[int(t) for t in tokens],
        )

    def decode_chunk(self, params, st: DecodeState, n: int, scfg) -> np.ndarray:
        """Fused on-device decode of ``n`` tokens (ONE dispatch, one small
        download); updates the cursor/pending logits.  Returns token ids.
        ``scfg``: static DeviceSamplingConfig or a lane_rows dict (dynamic —
        one compile for every sampling config)."""
        loop = self.decode_loop_dyn if isinstance(scfg, dict) else self.decode_loop
        st.rng_key, sub = jax.random.split(st.rng_key)
        tokens, final_logits, st.cache = loop(
            params, st.cache, st.logits_dev[None], jnp.int32(st.n_past),
            sub, scfg, n, self.attn_bucket(st.n_past + n),
        )
        token_ids = np.asarray(tokens[0])
        st.n_past += n
        st.tokens.extend(int(t) for t in token_ids)
        st.logits_dev = final_logits[0]
        st.logits_host = None
        st.spec_ban = -1
        return token_ids

    def decode_chunk_spec(self, params, st: DecodeState, n_passes: int,
                          k_spec: int) -> np.ndarray:
        """Speculative greedy decode: ``n_passes`` on-device verify passes of
        width ``k_spec`` in ONE dispatch (llama.speculative_decode_loop).
        Emits a VARIABLE number of tokens (n_passes..n_passes*k_spec) —
        greedy-identical to the plain path, just more tokens per weight read.
        Caller must ensure n_past + n_passes*k_spec <= n_ctx."""
        c = self.cfg.n_ctx
        hist = np.full((1, c), -1, np.int32)
        hist[0, : st.n_past] = np.asarray(st.tokens, np.int32)
        tokens, counts, final_logits, st.cache, _ = self.spec_loop(
            params, st.cache, st.logits_dev[None], jnp.int32(st.n_past),
            jnp.asarray(hist), n_passes, k_spec,
            self.attn_bucket(st.n_past + n_passes * k_spec),
        )
        tok_host = np.asarray(tokens[0])  # [n_passes, k]
        cnt_host = np.asarray(counts[0])  # [n_passes]
        emitted = np.concatenate(
            [tok_host[i, : cnt_host[i]] for i in range(n_passes)]
        )
        st.n_past += int(cnt_host.sum())
        st.tokens.extend(int(t) for t in emitted)
        st.logits_dev = final_logits[0]
        st.logits_host = None
        st.spec_ban = -1
        return emitted

    def decode_chunk_spec_stoch(self, params, st: DecodeState, n_passes: int,
                                k_spec: int, rows: dict) -> np.ndarray:
        """SAMPLED speculative decode: ``n_passes`` verify passes of width
        ``k_spec`` in ONE dispatch (llama.stochastic_speculative_decode_loop)
        under the per-lane traced sampling config ``rows``.  Emitted tokens
        are distributionally exact vs the plain sampled chunk; the residual
        ban carries across dispatches through ``st.spec_ban``."""
        c = self.cfg.n_ctx
        hist = np.full((1, c), -1, np.int32)
        hist[0, : st.n_past] = np.asarray(st.tokens, np.int32)
        st.rng_key, sub = jax.random.split(st.rng_key)
        keys = jax.random.split(sub, n_passes)
        tokens, counts, final_logits, st.cache, _, ban = self.spec_loop_stoch(
            params, st.cache, st.logits_dev[None], jnp.int32(st.n_past),
            jnp.asarray(hist), jnp.asarray([st.spec_ban], jnp.int32),
            keys, rows, k_spec,
            self.attn_bucket(st.n_past + n_passes * k_spec),
        )
        tok_host = np.asarray(tokens[0])  # [n_passes, k]
        cnt_host = np.asarray(counts[0])  # [n_passes]
        emitted = np.concatenate(
            [tok_host[i, : cnt_host[i]] for i in range(n_passes)]
        )
        st.n_past += int(cnt_host.sum())
        st.tokens.extend(int(t) for t in emitted)
        st.logits_dev = final_logits[0]
        st.logits_host = None
        st.spec_ban = int(np.asarray(ban[0]))
        return emitted

    def resolve_ban(self, params, st: DecodeState, rows: dict) -> np.ndarray:
        """Consume a carried residual ban before a NON-speculative path
        samples from the same pending logits: draw one token from the
        post-chain distribution with the rejected draft excluded (the exact
        residual), evaluate it (sample-then-eval), clear the ban."""
        st.rng_key, sub = jax.random.split(st.rng_key)
        tid_dev = self.sample_res(
            st.logits_dev[None], jnp.asarray([st.spec_ban], jnp.int32),
            jax.random.split(sub, 1), rows,
        )
        logits, st.cache = self.decode_step(
            params, st.cache, tid_dev.reshape(1, 1), jnp.int32(st.n_past),
            self.attn_bucket(st.n_past + 1),
        )
        st.n_past += 1
        st.logits_dev = logits[0]
        st.logits_host = None
        tid = int(np.asarray(tid_dev[0]))
        st.tokens.append(tid)
        st.spec_ban = -1
        return np.asarray([tid], np.int32)


class _Lookahead:
    """Run-ahead pipeline for the strict per-token decode path (end_chat).

    Sample-then-eval semantics make every future greedy/device-sampled token
    computable with no host input, so the engine dispatches ``depth`` steps
    ahead of what the client has consumed: call N fetches a token whose
    sample+eval (and host copy, via ``copy_to_host_async``) was dispatched
    ``depth`` calls earlier — the per-call wall time collapses from
    device-step + tunnel round-trip to max(device-step, RTT/depth).

    The committed state in :class:`DecodeState` (n_past / tokens / logits /
    rng) only advances when a token is CONSUMED; each queue entry carries the
    post-step (tid, logits, rng) needed to commit it.  Discarding the queue is
    therefore a complete rollback: speculative KV rows live at positions >=
    the committed cursor, which attention masks off (the same invariant the
    chunked generate's EOS rollback relies on).  Any state mutation
    (add_tokens / prefill / reset / restore / cursor writes / context shift)
    flushes; reads need nothing — committed state is the observable truth.
    """

    def __init__(self, st: DecodeState, params):
        self.queue: collections.deque = collections.deque()
        self.params = params
        # shadow frontier: where the NEXT dispatch continues from
        self.n_past = st.n_past
        self.logits = st.logits_dev
        self.rng = st.rng_key


def _rollback(st: DecodeState, n: int) -> None:
    """Rewind ``n`` overshoot evaluations after an EOS/limit stop.  The
    pending logits belong to the rolled-back continuation, so they are
    INVALIDATED rather than left to be sampled against the rewound cursor
    (the next begin_chat/prefill installs fresh logits; sampling before that
    now fails loudly instead of silently diverging)."""
    if n > 0:
        st.n_past -= n
        del st.tokens[st.n_past :]
        st.logits_dev = None
        st.logits_host = None
        st.spec_ban = -1  # the ban belonged to the invalidated logits
        # the draft frontier may not outrun the cursor (positions above it
        # are stale and must be re-evaluated by the next catch-up)
        st.draft_past = min(st.draft_past, st.n_past)


class DraftFns:
    """Jitted entry points for DRAFT-MODEL speculative decoding (a second,
    smaller ggml llama proposes tokens; the main model verifies — llama.cpp's
    "speculative" pattern, TPU-native: the whole draft-k + verify pass is ONE
    dispatch, llama.draft_speculative_decode_loop).

    Complements the built-in n-gram drafting: prompt lookup is free but
    finds nothing on novel text (measured 1.04 tok/pass realistic); a
    trained drafter proposes real continuations everywhere.  Greedy output
    is token-identical either way."""

    def __init__(self, cfg, dcfg):
        self.cfg = cfg
        self.dcfg = dcfg
        self.spec_loop = jax.jit(
            lambda p, c, dp, dc, l0, pos0, n, k, attn_len, d_attn: (
                llama_mod.draft_speculative_decode_loop(
                    p, c, dp, dc, l0, pos0, n, k, cfg, dcfg,
                    attn_len=attn_len, d_attn_len=d_attn)
            ),
            static_argnums=(6, 7, 8, 9),
            donate_argnums=(1, 3),
        )
        # catch-up prefill on the drafter (logits discarded; the draft cache
        # is the product).  ``ids`` may carry -1 sentinels (injected image
        # embedding rows): those positions feed ZERO embeddings — the
        # drafter can't consume the main model's projection dim, and
        # verification makes drafting around images merely less effective,
        # never incorrect.
        def _catchup(dp, dc, ids, pos0, attn_len):
            emb = llama_mod.embed_tokens(dp, jnp.maximum(ids, 0))
            emb = jnp.where((ids < 0)[..., None], 0.0, emb).astype(emb.dtype)
            _, dc = llama_mod.forward(dp, dc, emb, pos0, dcfg,
                                      attn_len=attn_len)
            return dc

        self.catchup = jax.jit(_catchup, static_argnums=(4,),
                               donate_argnums=(1,))

    def attn_bucket(self, needed: int) -> int:
        return _attn_bucket(needed, self.dcfg.n_ctx)


def _spec_passes(decode_chunk: int, k: int) -> int:
    """Verify passes per speculative dispatch: at least 2 (a dispatch pays
    one host round-trip and a pass can emit a single token), at least
    ``decode_chunk`` worth of width."""
    return max(1, max(decode_chunk, 2 * k) // k)


def _draft_catchup(dfns: DraftFns, dparams, st: DecodeState,
                   chunk: int = 64) -> None:
    """Bring the draft cache's evaluated frontier up to the main cursor by
    prefilling ``st.tokens[draft_past:n_past]`` through the drafter (-1
    sentinels — injected image embeddings — feed zero embeddings).  Chunks
    pad to power-of-two buckets (bounded compiles); padded junk positions
    are overwritten by the next chunk, the standard prefill invariant."""
    dcfg = dfns.dcfg
    if st.dcache is None:
        st.dcache = llama_mod.init_cache(dcfg, batch=1, dtype=jnp.bfloat16)
        st.draft_past = 0
    while st.draft_past < st.n_past:
        span = st.tokens[st.draft_past : st.draft_past + chunk]
        b = 8
        while b < len(span):
            b *= 2
        if st.draft_past + b > dcfg.n_ctx:
            # a padded write near the context end would clamp into valid
            # history: feed the exact remainder (rare odd-shape compile)
            b = len(span)
        ids = np.full((1, b), -1, np.int32)
        ids[0, : len(span)] = span
        st.dcache = dfns.catchup(
            dparams, st.dcache, jnp.asarray(ids), jnp.int32(st.draft_past),
            dfns.attn_bucket(st.draft_past + b),
        )
        st.draft_past += len(span)


def _draft_chunk(fns, dfns: DraftFns, params, dparams, st: DecodeState,
                 n_passes: int, k: int) -> np.ndarray:
    """One draft-model speculative dispatch (catch-up + n_passes verify
    passes); same emission bookkeeping as StepFns.decode_chunk_spec."""
    _draft_catchup(dfns, dparams, st)
    span = n_passes * k
    tokens, counts, final_logits, st.cache, st.dcache = dfns.spec_loop(
        params, st.cache, dparams, st.dcache, st.logits_dev[None],
        jnp.int32(st.n_past), n_passes, k,
        fns.attn_bucket(st.n_past + span), dfns.attn_bucket(st.n_past + span),
    )
    tok_host = np.asarray(tokens[0])  # [n_passes, k]
    cnt_host = np.asarray(counts[0])  # [n_passes]
    emitted = np.concatenate(
        [tok_host[i, : cnt_host[i]] for i in range(n_passes)]
    )
    st.n_past += int(cnt_host.sum())
    st.tokens.extend(int(t) for t in emitted)
    # draft positions past the cursor hold junk/rejected evals: the next
    # catch-up (or the next pass's own drafting) re-evaluates from here
    st.draft_past = st.n_past
    st.logits_dev = final_logits[0]
    st.logits_host = None
    return emitted


def generate_stream(
    fns: StepFns,
    params,
    st: DecodeState,
    tokenizer,
    limit: int,
    sparams: "SamplingParams",
    decode_chunk: int = 16,
    dispatch_lock=None,
    speculative_k: int = 0,
    draft: tuple | None = None,
    ctx_shift=None,
):
    """Streaming fused-chunk decode with the reference's EOS logic
    (MiniGPT4ChatBot.generate, minigpt4_library.py:609-657) — shared by the
    engine and the serving SessionPool.

    Tokens are generated in fused on-device chunks of ``decode_chunk`` (one
    dispatch + one small download per chunk) and yielded one at a time.  On
    EOS the decode cursor rolls back over the overshot tokens (stale cache
    positions >= n_past are unreachable by the causal mask).
    ``dispatch_lock`` (if given) is held around each device dispatch so
    concurrent sessions interleave at chunk granularity.

    ``speculative_k`` > 1 enables speculative decoding (n-gram prompt-lookup
    drafting + on-device block verification): greedy streams verify by
    argmax (llama.speculative_decode_loop) and are token-for-token identical
    to the plain path; sampled streams run SPECULATIVE SAMPLING
    (llama.stochastic_speculative_decode_loop) — accept each draft with its
    post-chain target probability, resample rejections from the exact
    residual — so the emitted distribution equals plain sampling's while
    bandwidth-bound decode still reads the weights once per verify pass of
    up to k tokens.

    ``draft`` = (DraftFns, draft_params, k): greedy chunks are instead
    drafted by a second, smaller llama model and block-verified
    (llama.draft_speculative_decode_loop) — same token-identical contract,
    but the drafter proposes real continuations on novel text where n-gram
    lookup finds nothing.  Takes precedence over ``speculative_k``.
    """
    import contextlib

    from .device_sampling import DeviceSamplingConfig, lane_rows

    scfg = DeviceSamplingConfig(
        temp=sparams.temp, top_k=sparams.top_k, top_p=sparams.top_p,
        tfs_z=sparams.tfs_z, typical_p=sparams.typical_p,
    )
    # a logit_bias forces the dynamic path even at temp<=0 (greedy must
    # argmax the BIASED logits; the static/speculative paths argmax raw)
    greedy = scfg.greedy and not sparams.logit_bias
    if not greedy:
        # traced per-lane parameters: one decode-loop compile serves every
        # sampling configuration (the static config form recompiles the
        # fused loop per distinct knob tuple — minutes per webui slider
        # tweak on remote-compile backends).  Greedy keeps the static form
        # (bare argmax; also the speculative-verify contract).
        scfg = lane_rows([sparams], n_vocab=fns.cfg.n_vocab)
    lock = dispatch_lock if dispatch_lock is not None else contextlib.nullcontext()
    if st.logits_dev is None:
        return  # nothing evaluated yet: empty stream, like the per-token path
    use_draft = draft is not None and greedy
    use_spec = speculative_k > 1 and greedy and not use_draft
    # SAMPLED speculation (speculative sampling, exact): non-greedy streams
    # speculate through llama.stochastic_speculative_decode_loop — emitted
    # tokens are distributionally identical to the plain sampled chunks
    # (draft-model drafting stays greedy-only for now)
    use_spec_stoch = speculative_k > 1 and not greedy and draft is None
    chat = ""
    emitted = 0
    accept_ewma = None  # observed tokens/pass (scales passes per dispatch)
    while emitted < limit:
        # context shift (``ctx_shift`` = engine.ctx_shift when enabled):
        # free room before the context fills instead of truncating/stopping
        if ctx_shift is not None and st.n_past + decode_chunk > fns.cfg.n_ctx:
            with lock:
                ctx_shift(st, decode_chunk)
        # always decode a FULL chunk (one compile per (chunk, bucket));
        # overshoot past `limit` or EOS is rolled back via the cursor —
        # positions >= n_past are unreachable by the causal mask
        token_ids = None
        if use_draft or use_spec or use_spec_stoch:
            k = draft[2] if use_draft else speculative_k
            # passes per dispatch scale with observed acceptance so a spec
            # dispatch emits ~decode_chunk tokens: the per-dispatch host
            # round-trip then amortizes like the plain fused chunk's (at
            # the acceptance floor a 2-pass dispatch advances ~2 tokens
            # but pays a full RTT).  Powers of two bound the compiles.
            est = accept_ewma if accept_ewma is not None else float(k)
            passes = _spec_passes(decode_chunk, k)
            while passes < min(decode_chunk / max(est, 1.0), 16):
                passes *= 2
            # worst-case advance must stay inside the context (halving keeps
            # the compile set to powers of two)
            while passes > 1 and st.n_past + passes * k > fns.cfg.n_ctx:
                passes = max(1, passes // 2)
            if st.n_past + passes * k <= fns.cfg.n_ctx:
                with lock:
                    if use_draft:
                        token_ids = _draft_chunk(
                            fns, draft[0], params, draft[1], st, passes, k)
                    elif use_spec:
                        token_ids = fns.decode_chunk_spec(params, st, passes, k)
                    else:
                        token_ids = fns.decode_chunk_spec_stoch(
                            params, st, passes, k, scfg)
                r = len(token_ids) / passes
                accept_ewma = (r if accept_ewma is None
                               else 0.5 * accept_ewma + 0.5 * r)
            # else: no room for even one k-wide pass — plain tail chunk
        if token_ids is None:
            if st.spec_ban >= 0:
                # a stochastic-spec dispatch left a residual exclusion on
                # the pending logits; the plain chunk's first sample would
                # ignore it — consume it exactly (one token) first
                if st.n_past + 1 > fns.cfg.n_ctx:
                    return
                with lock:
                    token_ids = fns.resolve_ban(params, st, scfg)
            else:
                n = decode_chunk
                if st.n_past + n > fns.cfg.n_ctx:
                    n = fns.cfg.n_ctx - st.n_past
                    if n <= 0:
                        return
                with lock:
                    token_ids = fns.decode_chunk(params, st, n, scfg)
        # both paths return sequentially-evaluated tokens: the EOS scan and
        # tail rollback below are path-independent
        for j, tid in enumerate(token_ids):
            token = tokenizer.id_to_str(int(tid))
            chat += token
            emitted += 1
            stop = emitted >= limit
            if token == EOS_TOKEN_SUFFIX:
                if stop:
                    _rollback(st, len(token_ids) - j - 1)
                    return
                continue
            if chat.endswith(EOS_SUFFIX):
                # roll back evals past the stopping token
                _rollback(st, len(token_ids) - j - 1)
                return
            yield token
            if stop:
                _rollback(st, len(token_ids) - j - 1)
                return


class MiniGPT4Engine:
    def __init__(
        self,
        model_path: str | Path,
        llm_path: str | Path,
        verbosity: int = utils.Verbosity.SILENT,
        seed: int = 1337,
        n_ctx: int = 2048,
        n_batch: int = 512,
        compute_dtype=jnp.float32,
        cache_dtype=None,
        batch: int = 1,
        quant_mode: str = "auto",
        matmul_precision: str | None = None,
        speculative_k: int = 0,
        draft_llm_path: str | Path | None = None,
        draft_head_path: str | Path | None = None,
        smooth_scales: str | Path | dict | None = None,
        context_shift: bool = False,
        tp: int = 1,
        dp: int = 1,
    ):
        """``tp``: tensor-parallel devices.  tp > 1 places the decoder over
        a (dp=1, tp) device mesh (parallel/spmd.py: column-parallel qkv/w13,
        K-sharded row-parallel wo/w2, vocab-parallel head, heads-sharded KV
        cache) and every decode path runs under shard_map with explicit
        collectives; greedy output is identical to single-chip.  The default
        (tp=1) builds no mesh and inserts no collectives.

        ``dp`` must stay 1 here: the engine's chat cursor (and every serving
        session) prefills at batch 1, which cannot shard over a dp axis —
        a dp>1 engine would crash at the first prompt.  Data parallelism
        lives where there IS a batch to shard: the parallel.spmd batched
        decode/train entry points (dryrun_multichip drives them over a real
        (dp, tp) mesh) and multi-session batching (SessionPool /
        ContinuousBatcher) on the serving side."""
        utils.set_verbosity(verbosity)
        self.n_batch = n_batch
        self.batch = batch
        # default k for greedy speculative decoding in generate() (0 = off);
        # greedy output is identical either way (llama.speculative_decode_loop)
        if speculative_k > llama_mod.FLASH_DECODE_MAX_S:
            # wider verify blocks would silently fall into the einsum/
            # blockwise prefill attention path, which materializes per-layer
            # cache copies (OOMs 13B) — refuse at init, not mid-serving
            raise ValueError(
                f"speculative_k={speculative_k} exceeds the flash-decode "
                f"verify-block limit ({llama_mod.FLASH_DECODE_MAX_S})"
            )
        self.speculative_k = speculative_k
        # llama.cpp-style context shift: when the context fills, drop the
        # oldest non-keep turns and slide the cache (llama.shift_kv_cache)
        # instead of raising/stopping.  Off by default — the reference's
        # behavior at overflow is an error, and strict parity keeps that.
        self.context_shift = context_shift
        if dp != 1:
            raise ValueError(
                f"dp={dp}: the engine's chat/serving surface prefills at "
                "batch 1 and cannot shard it over a dp axis — use "
                "parallel.spmd's batched entry points (see dryrun_multichip) "
                "for dp, or batch sessions (SessionPool/ContinuousBatcher)"
            )
        self.tp, self.dp = tp, dp
        self.mesh = None
        self._llm_specs = None
        if tp > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(dp=1, tp=tp)
        if matmul_precision:
            # 'highest' forces true-f32 MXU passes for f32 params — needed for
            # token-for-token greedy parity with the f16 CPU reference; the
            # default bf16 passes trade ~1e-3 relative error for ~4x speed
            jax.config.update("jax_default_matmul_precision", matmul_precision)

        with utils.phase_timer("Load minigpt4 model"):
            self._container = ContainerReader(model_path)
            vparams, self.vision_cfg = vision_mod.load_params(
                self._container, compute_dtype, quant_mode=quant_mode
            )
            self.vision_params = jax.device_put(vparams)

        if isinstance(smooth_scales, (str, Path)):
            from ..quality import load_smooth_scales

            smooth_scales = load_smooth_scales(smooth_scales)
        with utils.phase_timer("LLM model init"):
            self._llm_file = LlamaFileReader(llm_path)
            backend = jax.default_backend()
            llm_mode = resolve_llm_quant_mode(self._llm_file, quant_mode,
                                              backend, n_ctx=n_ctx, batch=batch)
            if llm_mode != quant_mode:
                utils.log_info(f"quant_mode auto -> {llm_mode} (decoder)")
            if cache_dtype is None:
                cache_dtype = pick_cache_dtype(
                    self._llm_file, llm_mode, n_ctx, batch, backend
                )
            if smooth_scales and llm_mode == "gq" and quant_mode == "auto":
                # calibration scales are a deliberate w8a8 opt-in: auto
                # resolving to the exact path would silently discard them
                llm_mode = "w8a8"
                utils.log_info("quant_mode auto -> w8a8 (smooth_scales given)")
            if smooth_scales and llm_mode != "w8a8":
                # scales only exist to steer i8 activation quantization;
                # the exact packed paths must keep exact file bytes
                utils.log_info("smooth_scales ignored (decoder not on w8a8)")
                smooth_scales = None
            lparams, self.llm_cfg = llama_mod.load_params(
                self._llm_file, compute_dtype, n_ctx=n_ctx, quant_mode=llm_mode,
                smooth=smooth_scales,
            )
            self.quant_mode = llm_mode
            if self.mesh is not None:
                from ..parallel import spmd

                self.llm_params, self._llm_specs = spmd.place_llama_params(
                    self.mesh, lparams
                )
            else:
                self.llm_params = jax.device_put(lparams)
            self.tokenizer = LlamaTokenizer(
                self._llm_file.vocab.tokens, self._llm_file.vocab.scores
            )

        if self.vision_cfg.llama_embed_dim != self.llm_cfg.n_embd:
            raise ValueError(
                f"model mismatch: llama_proj -> {self.vision_cfg.llama_embed_dim}, "
                f"LLM n_embd = {self.llm_cfg.n_embd}"
            )

        # optional DRAFT model (draft-model speculative decoding): a second,
        # smaller ggml llama proposes greedy continuations, the main model
        # verifies (llama.cpp's "speculative" example pattern).  Greedy
        # output stays token-identical; the drafter only changes speed.
        self.draft_params = None
        self.draft_cfg = None
        self._draft_fns_by_ctx: dict[int, DraftFns] = {}
        self.draft_k = 0
        if draft_head_path is not None:
            # distilled draft HEAD (train/draft.py): a tiny decoder over the
            # frozen shared embedding — no second ggml file, no second
            # tokenizer; assembled into a standard llama tree at load
            if draft_llm_path is not None:
                raise ValueError("pass draft_llm_path OR draft_head_path, not both")
            if self.mesh is not None:
                raise ValueError("draft_head_path requires tp=1")
            from ..train import draft as draft_head_mod

            with utils.phase_timer("Draft head init"):
                art, dhc = draft_head_mod.load_artifact(draft_head_path)
                if art["p_in"].shape[0] != self.llm_cfg.n_embd:
                    raise ValueError(
                        f"draft head d_main {art['p_in'].shape[0]} != model "
                        f"n_embd {self.llm_cfg.n_embd}")
                self.draft_cfg = dhc.llama_cfg(self.llm_cfg.n_vocab, n_ctx)
                self.draft_params = jax.device_put(draft_head_mod.assemble_draft(
                    self.llm_params["tok_embeddings"], art,
                    self.llm_params["tok_embeddings"].dtype))
        if draft_llm_path is not None:
            if self.mesh is not None:
                raise ValueError(
                    "draft_llm_path requires tp=1 (the drafter is small "
                    "enough to replicate; sharding it buys nothing)")
            with utils.phase_timer("Draft LLM init"):
                self._draft_file = LlamaFileReader(draft_llm_path)
                try:
                    dmode = resolve_llm_quant_mode(
                        self._draft_file, quant_mode, jax.default_backend())
                    dparams, self.draft_cfg = llama_mod.load_params(
                        self._draft_file, compute_dtype, n_ctx=n_ctx,
                        quant_mode=dmode,
                    )
                    if self.draft_cfg.n_vocab != self.llm_cfg.n_vocab:
                        raise ValueError(
                            f"draft model vocab ({self.draft_cfg.n_vocab}) != "
                            f"main model vocab ({self.llm_cfg.n_vocab}) — the "
                            "drafter must share the tokenizer")
                    self.draft_params = jax.device_put(dparams)
                except Exception:
                    # close() is gated on draft_params; a failed load would
                    # otherwise leak the reader's mmap for the process life
                    self._draft_file.close()
                    self.draft_cfg = None
                    raise
        if self.draft_params is not None:
            # verify-block width: an explicit speculative_k, else 8 (the
            # free-verify width measured on the flash decode path)
            self.draft_k = speculative_k if speculative_k > 1 else 8

        self._fns_by_ctx: dict[int, StepFns] = {}
        self._fns = self.step_fns_for(self.llm_cfg.n_ctx)
        # KV cache defaults to bf16: the reference's llama.cpp cache is f16
        # (kv cache memory_type default), and bf16 halves decode attention
        # traffic vs f32 with comparable range behaviour on TPU
        cache0 = llama_mod.init_cache(
            self.llm_cfg, batch=batch, dtype=cache_dtype or jnp.bfloat16
        )
        if self.mesh is not None:
            from ..parallel import spmd

            cache0 = spmd.place_cache(self.mesh, cache0)
        self._st = DecodeState(cache0, seed=seed if seed else 0)
        # strict per-token run-ahead pipeline (see _Lookahead); depth from
        # MINIGPT4_TPU_STEP_LOOKAHEAD, 0 = round-2 dispatch-then-fetch
        self.step_lookahead = STEP_LOOKAHEAD
        self._la: _Lookahead | None = None
        self.sampler = Sampler(seed)
        self._embed = self._fns.embed
        self._encode = vision_mod.jit_encode_image(self.vision_cfg)

    def step_fns_for(self, n_ctx: int) -> StepFns:
        """Compiled step functions for a given context length, memoized —
        serving sessions with a smaller session_ctx share one StepFns (and
        therefore one set of compilations) across all sessions."""
        fns = self._fns_by_ctx.get(n_ctx)
        if fns is None:
            import dataclasses

            cfg = self.llm_cfg if n_ctx == self.llm_cfg.n_ctx else dataclasses.replace(
                self.llm_cfg, n_ctx=n_ctx
            )
            if self.mesh is not None:
                from ..parallel.spmd import SpmdStepFns

                fns = SpmdStepFns(cfg, self.mesh, self._llm_specs)
            else:
                fns = StepFns(cfg)
            self._fns_by_ctx[n_ctx] = fns
        return fns

    def draft_fns_for(self, cfg) -> "DraftFns | None":
        """DraftFns matched to a main-model StepFns config (sessions run at
        session_ctx geometry; the verify pass must be traced against THAT
        cache shape), memoized per n_ctx.  None when no draft model is
        configured."""
        if self.draft_params is None:
            return None
        fns = self._draft_fns_by_ctx.get(cfg.n_ctx)
        if fns is None:
            fns = DraftFns(cfg, self.draft_cfg)
            self._draft_fns_by_ctx[cfg.n_ctx] = fns
        return fns

    # engine state delegates to its DecodeState (the reference's single
    # global cursor, minigpt4.cpp:2521)
    @property
    def n_past(self) -> int:
        return self._st.n_past

    @n_past.setter
    def n_past(self, v: int) -> None:
        self._flush_lookahead()
        self._st.n_past = v
        # external cursor rewinds (tests/ABI) must also rein in the drafter
        self._st.draft_past = min(self._st.draft_past, v)

    @property
    def cache(self) -> dict:
        return self._st.cache

    @cache.setter
    def cache(self, v: dict) -> None:
        self._flush_lookahead()
        self._st.cache = v

    def warmup(self, prefill_buckets: tuple[int, ...] = (8, 32, 128, 512),
               decode_chunks: tuple[int, ...] = (1, 16)) -> None:
        """Precompile the common prefill buckets, decode steps, and the image
        encoder so first-token latency is not a compile (multi-minute on
        remote-compile backends; the persistent cache makes warmup a reload
        on subsequent processes)."""
        from .device_sampling import DeviceSamplingConfig

        with utils.phase_timer("Warmup"):
            d = self.llm_cfg.n_embd
            emb_dtype = self.llm_params["tok_embeddings"].dtype  # real prefill dtype
            cache = llama_mod.init_cache(self.llm_cfg, self.batch, self.cache["k"].dtype)
            logits = jnp.zeros((self.batch, self.llm_cfg.n_vocab), jnp.float32)
            for b in prefill_buckets:
                if b > self.llm_cfg.n_ctx:
                    continue
                e = jnp.zeros((self.batch, b, d), emb_dtype)
                logits, cache = self._fns.forward(
                    self.llm_params, cache, e, jnp.int32(0), jnp.int32(b - 1),
                    self._fns.attn_bucket(b),
                )
            for n in decode_chunks:
                if n == 1:
                    # the strict per-token path (add_tokens/end_chat/C ABI)
                    tok = jnp.zeros((self.batch, 1), jnp.int32)
                    _, cache = self._fns.decode_step(
                        self.llm_params, cache, tok, jnp.int32(0),
                        self._fns.attn_bucket(1),
                    )
                    continue
                _, _, cache = self._fns.decode_loop(
                    self.llm_params, cache, logits, jnp.int32(0),
                    jax.random.PRNGKey(0), DeviceSamplingConfig(temp=0.0), n,
                    self._fns.attn_bucket(n + 1),
                )
            if self.speculative_k > 1:
                hist = jnp.full((self.batch, self.llm_cfg.n_ctx), -1, jnp.int32)
                passes = _spec_passes(16, self.speculative_k)
                *_, cache, _ = self._fns.spec_loop(
                    self.llm_params, cache, logits, jnp.int32(0), hist,
                    passes, self.speculative_k,
                    self._fns.attn_bucket(passes * self.speculative_k),
                )
            vs = self.vision_cfg.vit.image_size
            self._encode(
                self.vision_params, jnp.zeros((self.batch, 3, vs, vs), jnp.float32)
            )
            jax.block_until_ready(cache["k"])

    # ------------------------------------------------------------------
    # vision
    # ------------------------------------------------------------------

    def encode_image(self, pixels: np.ndarray) -> np.ndarray:
        """Preprocessed pixels [3, 224, 224] (or [B, 3, 224, 224]) f32 ->
        [32, n_embd] float32 (the C ABI embedding payload)."""
        pixels = np.asarray(pixels, np.float32)
        if pixels.ndim == 3:
            pixels = pixels[None]
        expect = self.vision_cfg.vit.image_size
        if pixels.shape[1:] != (3, expect, expect):
            raise utils.MiniGPT4TypedError(
                utils.MiniGPT4Error.IMAGE_NOT_224_224_3,
                f"expected [B, 3, {expect}, {expect}], got {pixels.shape}",
            )
        with utils.phase_timer("Encoding image"):
            emb = self._encode(self.vision_params, jnp.asarray(pixels))
            emb = np.asarray(emb)
        return emb[0] if emb.shape[0] == 1 else emb

    # ------------------------------------------------------------------
    # decoder feeding
    # ------------------------------------------------------------------

    def ctx_shift(self, st: DecodeState, need: int = 0) -> int:
        """llama.cpp-style context shift on ``st``: free room for ``need``
        more positions by dropping the oldest tokens after the keep prefix
        ([0, st.n_keep) — system prompt + image) and sliding the cache down
        with K re-rotation (llama.shift_kv_cache).  Drops at least half the
        non-keep region so shifts stay rare.  Returns positions dropped
        (0 = nothing shiftable: n_keep covers the whole context, or the
        cache is not resident).  Greedy continuation after a shift treats
        surviving tokens exactly at their new positions; the one
        approximation (shared with llama.cpp's context shift) is that
        surviving K/V values were originally computed while the dropped
        tokens were attendable."""
        if st is self._st:
            self._flush_lookahead()  # shift moves the committed cache rows
        if st.cache is None:
            return 0  # parked / riding a batch: not shiftable here
        n_ctx = st.cache["k"].shape[3]  # the state's own geometry (sessions
        # use a smaller session_ctx than the engine cursor)
        keep = min(st.n_keep, st.n_past)
        free = n_ctx - st.n_past
        drop = max(need - free, (st.n_past - keep) // 2)
        drop = min(drop, st.n_past - keep)
        if drop <= 0:
            return 0
        st.cache = self._fns.shift_cache(
            st.cache, jnp.int32(keep), jnp.int32(drop), jnp.int32(st.n_past)
        )
        del st.tokens[keep : keep + drop]
        st.n_past -= drop
        # the drafter's cache rows past keep describe old positions: rewind
        # its frontier; the next draft-spec dispatch re-prefills from tokens
        st.draft_past = min(st.draft_past, keep)
        return drop

    def _maybe_shift(self, st: DecodeState, need: int) -> None:
        if self.context_shift and st.n_past + need > self._fns.cfg.n_ctx:
            self.ctx_shift(st, need)

    def _prefill_embeds(self, embeds: jnp.ndarray) -> None:
        """Feed [1, S, D] embeddings through the decoder in n_batch chunks,
        with power-of-two bucket padding per chunk."""
        self._flush_lookahead()
        self._maybe_shift(self._st, embeds.shape[1])
        self._fns.prefill_embeds(self.llm_params, self._st, embeds, self.n_batch)

    def add_tokens(self, tokens: list[int]) -> None:
        """llama_eval in n_batch chunks (add_tokens, minigpt4.cpp:2365-2382)."""
        self._flush_lookahead()
        self._maybe_shift(self._st, len(tokens))
        self._fns.add_tokens(self.llm_params, self._st, tokens, self.n_batch)

    def add_strings(self, s: str) -> None:
        """Tokenize (always with BOS — reference quirk, minigpt4.cpp:2387)
        and feed (add_strings, minigpt4.cpp:2384-2397)."""
        self.add_tokens(self.tokenizer.tokenize(s, add_bos=True))

    def add_embedding(self, embedding: np.ndarray) -> None:
        """Inject raw embedding rows as pseudo-tokens (llama_eval_embd
        analogue, minigpt4.cpp:2399-2422).  Cast to the token-embedding dtype
        so the image chunk reuses the token-prefill compilation (and doesn't
        silently upcast the whole chunk to f32 under bf16 compute)."""
        emb = np.asarray(embedding, np.float32).reshape(1, -1, self.llm_cfg.n_embd)
        dtype = self.llm_params["tok_embeddings"].dtype
        self._prefill_embeds(jnp.asarray(emb, dtype))

    # ------------------------------------------------------------------
    # sampling / decode
    # ------------------------------------------------------------------

    @property
    def _last_logits(self) -> np.ndarray | None:
        """Host view of the pending logits (fetched lazily, memoized)."""
        return self._st.logits

    def sample_token(self, params: SamplingParams | None = None) -> int:
        """Sample from the logits of the *previous* eval (the reference's
        sample-then-eval ordering, minigpt4.cpp:2704-2716)."""
        logits = self._last_logits
        if logits is None:
            raise RuntimeError("nothing evaluated yet")
        return self.sampler.sample(logits, params or SamplingParams())

    def id_to_token(self, token_id: int) -> str:
        return self.tokenizer.id_to_str(token_id)

    def reset(self) -> None:
        """reset(): n_past = 0 (minigpt4.cpp:2499-2502).  The cache needs no
        clearing — masking makes positions >= n_past unreachable."""
        self._flush_lookahead()
        self._st.reset()

    # ------------------------------------------------------------------
    # chat state machine (minigpt4.cpp:2671-2782)
    # ------------------------------------------------------------------

    def system_prompt(self) -> None:
        self.add_strings(SYSTEM_PROMPT)
        # context-shift keep marker: the system prompt always survives
        self._st.n_keep = self._st.n_past

    def begin_chat_image(self, embedding: np.ndarray, question: str) -> None:
        # The reference validates against 32*4096 / 32*5120 and truncates to
        # 32 pseudo-tokens (minigpt4.cpp:2682-2689); the general rule is
        # query_length * n_embd, which those are the 7B/13B instances of.
        n_img = self.vision_cfg.qformer.query_length
        emb = np.asarray(embedding, np.float32).reshape(-1)
        expect = n_img * self.llm_cfg.n_embd
        if emb.size != expect:
            # reference code for this exact failure (minigpt4.cpp:2682-2689)
            raise utils.MiniGPT4TypedError(
                utils.MiniGPT4Error.LLAMA_PROJECTION_EMBEDDING_INVALID_SIZE,
                f"image embedding size {emb.size} != {expect}",
            )
        self.add_strings("Human: <Img>")
        self.add_embedding(emb[:expect])
        self.add_strings("</Img> ")
        # context-shift keep marker: the image prefix (system prompt +
        # "<Img>" + 32 embedding rows + "</Img> ") survives every shift —
        # only conversation turns after it are evictable
        self._st.n_keep = self._st.n_past
        self.add_strings(question)
        self.add_strings("### Assistant:")

    def begin_chat(self, question: str) -> None:
        self.add_strings("Human: ")
        self.add_strings(question)
        self.add_strings("### Assistant:")

    def end_chat(self, params: SamplingParams | None = None) -> str:
        """One decode step: sample from previous logits, return its text, and
        eval the sampled token (minigpt4.cpp:2704-2716).

        When the sampling mode is device-expressible (no mirostat), sampling
        runs ON DEVICE and only the token id (4 B) crosses the host boundary
        — the eval dispatch is queued before the id download, so the decode
        step's device time overlaps the fetch round-trip.  Round 1 measured
        the host path at 192 ms/token on the tunneled backend (full [V] f32
        logits download + host sampling per step; VERDICT.md weak #3).
        Greedy output is identical on both paths; stochastic device sampling
        draws from the DecodeState PRNG stream instead of the host sampler
        (the same trade generate() makes)."""
        params = params or SamplingParams()
        if params.mirostat == 0 and self._st.logits_dev is not None:
            return self._end_chat_device(params)
        # host path (mirostat): a carried stochastic-spec residual exclusion
        # is dropped — mirostat's adaptive truncation defines its own
        # distribution, so the residual of the device chain does not apply
        self._st.spec_ban = -1
        tid = self.sample_token(params)
        token = self.id_to_token(tid)
        self.add_tokens([tid])
        return token

    def _flush_lookahead(self) -> None:
        """Discard run-ahead dispatches.  Committed DecodeState never moved,
        so this IS the rollback: speculative KV rows sit at positions >= the
        committed cursor, which attention masks off (the chunked generate's
        EOS rollback relies on the same invariant)."""
        self._la = None

    def _dispatch_ahead(self, la: _Lookahead, params: SamplingParams) -> bool:
        """Queue one sample+eval at the shadow frontier (no host fetch)."""
        from .device_sampling import DeviceSamplingConfig, lane_rows

        if la.n_past + 1 > self.llm_cfg.n_ctx:
            return False  # consume-time handles shift/overflow once drained
        if params.temp <= 0 and not params.logit_bias:
            # greedy: static argmax fast path
            tid_dev, la.rng = self._fns.sample(
                la.logits, la.rng, DeviceSamplingConfig(temp=0.0))
        else:
            # traced config: one compile for every non-greedy knob tuple
            tid_dev, la.rng = self._fns.sample_dyn(
                la.logits, la.rng,
                lane_rows([params], n_vocab=self.llm_cfg.n_vocab))
        st = self._st
        logits, st.cache = self._fns.decode_step(
            self.llm_params, st.cache, tid_dev.reshape(1, 1),
            jnp.int32(la.n_past), self._fns.attn_bucket(la.n_past + 1),
        )
        la.n_past += 1
        la.logits = logits[0]
        # start the 4-byte id transfer now: by consume time (depth calls
        # later) it is host-resident and the fetch costs no round-trip
        if hasattr(tid_dev, "copy_to_host_async"):
            tid_dev.copy_to_host_async()
        la.queue.append((tid_dev, la.logits, la.rng))
        return True

    def _end_chat_device(self, params: SamplingParams) -> str:
        from .device_sampling import lane_rows

        st = self._st
        if st.spec_ban >= 0:
            # a stochastic-speculative dispatch left a residual exclusion on
            # these pending logits: the next sample must exclude the
            # rejected draft (exact speculative-sampling residual).  One
            # un-pipelined step consumes it; the next call starts the
            # run-ahead pipeline.
            self._flush_lookahead()
            self._maybe_shift(st, 1)
            if st.n_past + 1 > self.llm_cfg.n_ctx:
                raise ValueError(
                    f"context overflow: n_past {st.n_past} + 1 > "
                    f"{self.llm_cfg.n_ctx}"
                )
            st.rng_key, sub = jax.random.split(st.rng_key)
            tid_dev = self._fns.sample_res(
                st.logits_dev[None],
                jnp.asarray([st.spec_ban], jnp.int32),
                jax.random.split(sub, 1),
                lane_rows([params], n_vocab=self.llm_cfg.n_vocab),
            )[0]
            st.spec_ban = -1
            logits, st.cache = self._fns.decode_step(
                self.llm_params, st.cache, tid_dev.reshape(1, 1),
                jnp.int32(st.n_past), self._fns.attn_bucket(st.n_past + 1),
            )
            st.n_past += 1
            st.logits_dev = logits[0]
            st.logits_host = None
            tid = int(np.asarray(tid_dev))
            st.tokens.append(tid)
            return self.id_to_token(tid)

        la = self._la
        if la is not None and la.params != params:
            self._flush_lookahead()  # knobs changed: redispatch from committed
            la = None
        if la is None:
            la = self._la = _Lookahead(st, params)
        # top up the pipeline: depth+1 in flight so each call consumes one
        # and dispatches one (depth 0 = dispatch-then-fetch, round-2 shape)
        while len(la.queue) <= self.step_lookahead:
            if not self._dispatch_ahead(la, params):
                break
        if not la.queue:
            # shadow frontier hit n_ctx with nothing consumable: shift (if
            # enabled) against the COMMITTED cursor, then rebuild
            self._flush_lookahead()
            self._maybe_shift(st, 1)
            if st.n_past + 1 > self.llm_cfg.n_ctx:
                raise ValueError(
                    f"context overflow: n_past {st.n_past} + 1 > "
                    f"{self.llm_cfg.n_ctx}"
                )
            la = self._la = _Lookahead(st, params)
            self._dispatch_ahead(la, params)
        tid_dev, logits, rng = la.queue.popleft()
        # commit: the entry's post-step state becomes the observable state
        tid = int(np.asarray(tid_dev))
        st.n_past += 1
        st.tokens.append(tid)
        st.logits_dev = logits
        st.logits_host = None
        st.rng_key = rng
        return self.id_to_token(tid)

    def reset_chat(self) -> None:
        self.reset()

    def save_state(self, path) -> None:
        """Persist the live chat (KV cache + cursor) — resume with
        :meth:`restore_state` in a new process; see DecodeState.save."""
        self._st.save(path)

    def restore_state(self, path) -> None:
        self._flush_lookahead()
        self._st.restore(path)

    @staticmethod
    def contains_eos_token(s: str) -> bool:
        return s == EOS_TOKEN_SUFFIX

    @staticmethod
    def is_eos(s: str) -> bool:
        return s.endswith(EOS_SUFFIX)

    def generate(
        self,
        limit: int = 1024,
        params: SamplingParams | None = None,
        decode_chunk: int = 16,
        speculative_k: int | None = None,
    ):
        """Streaming generator over decode steps with the reference's EOS
        logic (MiniGPT4ChatBot.generate, minigpt4_library.py:609-657).

        When the sampling mode is device-expressible (no mirostat), tokens
        are generated in fused on-device chunks of ``decode_chunk`` — one
        dispatch + one small download per chunk instead of a full logits
        round-trip per token — and still yielded one at a time.  On EOS the
        decode cursor rolls back over the overshot tokens (stale cache
        positions >= n_past are unreachable by construction).  Stochastic
        sampling uses the device PRNG stream in this mode; greedy output is
        identical in both modes.  Set ``decode_chunk=1`` (or use mirostat)
        for the strict per-token host path.
        """
        params = params or SamplingParams()
        k = self.speculative_k if speculative_k is None else speculative_k
        if k > llama_mod.FLASH_DECODE_MAX_S:
            # same guard as __init__: wider verify blocks silently route to
            # the prefill attention path, which OOMs 13B mid-generation
            raise ValueError(
                f"speculative_k={k} exceeds the flash-decode "
                f"verify-block limit ({llama_mod.FLASH_DECODE_MAX_S})"
            )
        if params.mirostat != 0 or decode_chunk <= 1:
            yield from self._generate_stepwise(limit, params)
            return
        self._flush_lookahead()  # generate_stream drives the state directly
        dfns = self.draft_fns_for(self._fns.cfg)
        yield from generate_stream(
            self._fns, self.llm_params, self._st, self.tokenizer,
            limit, params, decode_chunk,
            speculative_k=k,
            draft=(dfns, self.draft_params, self.draft_k) if dfns else None,
            ctx_shift=self.ctx_shift if self.context_shift else None,
        )

    def _generate_stepwise(self, limit: int, params: SamplingParams):
        chat = ""
        for _ in range(limit):
            token = self.end_chat(params)
            chat += token
            if self.contains_eos_token(token):
                continue
            if self.is_eos(chat):
                break
            yield token

    def close(self) -> None:
        self._container.close()
        self._llm_file.close()
        if getattr(self, "_draft_file", None) is not None:
            self._draft_file.close()

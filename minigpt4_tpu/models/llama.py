"""LLaMA/Vicuna decoder, TPU-native (the reference's llama.cpp replacement).

The reference delegates the whole LLM to llama.cpp (`llama_eval` /
`llama_eval_embd`, /root/reference/minigpt4.cpp:2365-2422).  Here the decoder
is a pair of jitted functions over a functional, pre-allocated HBM KV cache:

  * ``forward(params, cache, embeds, pos0, cfg)`` — runs S positions (prefill
    of tokens *or* injected image embeddings — the mixed-modality prefill the
    MiniGPT-4 flow requires), updating the cache via dynamic_update_slice and
    returning logits for the **last** position only (llama.cpp computes
    exactly that for its sampler);
  * decode is the same function with S=1.

Design notes:
  * layers run under ``lax.scan`` over stacked params (quantized weights
    stay packed: QTensor leaves stack on their leading axis) — one compiled
    block, L iterations;
  * RoPE is the *interleaved-pair* variant (ggml_rope mode 0): llama.cpp
    model files store wq/wk un-permuted back to Meta layout, unlike HF;
  * causal masking is position-arithmetic over the static cache length, so
    one compilation serves every (pos0, S) with the same S;
  * cache layout [L, B, H, C, Dh], matching the decode attention kernel's
    preferred DMA pattern.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.dtypes import is_quantized
from .layers import rms_norm
from .params import QTensor, linear

NEG_INF = float(np.finfo(np.float32).min)  # torch finfo min, minigpt4.cpp:144
RMS_EPS = 1e-6  # ggml_rms_norm eps at llama.cpp master-31cfbb1


@dataclass(frozen=True)
class LlamaConfig:
    n_vocab: int
    n_embd: int
    n_head: int
    n_layer: int
    n_rot: int
    n_ff: int
    n_ctx: int = 2048
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @classmethod
    def from_hparams(cls, hp, n_ctx: int = 2048) -> "LlamaConfig":
        return cls(
            n_vocab=hp.n_vocab,
            n_embd=hp.n_embd,
            n_head=hp.n_head,
            n_layer=hp.n_layer,
            n_rot=hp.n_rot,
            n_ff=hp.n_ff,
            n_ctx=n_ctx,
        )


def init_cache(cfg: LlamaConfig, batch: int = 1, dtype=jnp.float32) -> dict:
    """Pre-allocated HBM KV cache (the llama.cpp kv_self analogue)."""
    shape = (cfg.n_layer, batch, cfg.n_head, cfg.n_ctx, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def rope_interleaved(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotate consecutive pairs (ggml_rope mode 0). x [B,H,S,Dh]; positions
    [S] or per-batch [B, S] (batched serving decode)."""
    b, h, s, dh = x.shape
    half = dh // 2
    freqs = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)  # [Dh/2]
    ang = positions.astype(jnp.float32)[..., None] * freqs  # [S, half] | [B, S, half]
    if ang.ndim == 2:
        cos = jnp.cos(ang)[None, None]
        sin = jnp.sin(ang)[None, None]
    else:
        cos = jnp.cos(ang)[:, None]  # [B, 1, S, half]
        sin = jnp.sin(ang)[:, None]
    xp = x.reshape(b, h, s, half, 2)
    even = xp[..., 0].astype(jnp.float32)
    odd = xp[..., 1].astype(jnp.float32)
    out = jnp.stack([even * cos - odd * sin, even * sin + odd * cos], axis=-1)
    return out.reshape(b, h, s, dh).astype(x.dtype)


def shift_kv_cache(cache: dict, keep, drop, n_past, cfg: LlamaConfig) -> dict:
    """llama.cpp-style context shift (the kv_cache_seq_rm + seq_add/K-shift
    pattern): drop cache positions [keep, keep+drop), slide
    [keep+drop, n_past) down to [keep, n_past-drop), and re-rotate the moved
    K rows by -drop so their stored RoPE matches their new absolute
    positions.  V rows are position-independent and just move.

    The rotation is exact algebra: RoPE angles are linear in position, so a
    K row rotated at position p then by -drop equals RoPE at p-drop to fp
    rounding — after the shift, attention treats every surviving token
    exactly at its new position.  The (shared-with-llama.cpp) approximation
    is historical: surviving K/V *values* were computed while the dropped
    tokens were still attendable.  For a 1-layer model even that vanishes
    (layer-0 K/V depend only on the own token), which the tests exploit.

    ``keep``/``drop``/``n_past`` are traced scalars — ONE compilation serves
    every shift.  Cost: one full-cache gather + rewrite (~4 ms at 13B/bf16,
    and shifts are rare).  On sub-f32 cache dtypes the moved K rows pass
    through one extra quantize (f32 rotate -> cast back); e4m3's ~6%
    mantissa noise dominates that.  Dense caches only — paged lanes evict
    whole pages instead (engine/paged.py)."""
    k, v = cache["k"], cache["v"]  # [L, B, H, C, Dh]
    C = k.shape[3]
    idx = jnp.arange(C, dtype=jnp.int32)
    src = jnp.where(idx < keep, idx, jnp.minimum(idx + drop, C - 1))
    k = jnp.take(k, src, axis=3)
    v = jnp.take(v, src, axis=3)
    L, B, H, _, Dh = k.shape
    kr = rope_interleaved(
        k.reshape(L * B, H, C, Dh),
        jnp.broadcast_to(-jnp.asarray(drop, jnp.int32), (C,)),
        cfg.rope_theta,
    ).reshape(k.shape)
    moved = (idx >= keep) & (idx < n_past - drop)
    k = jnp.where(moved[None, None, None, :, None], kr, k)
    return {"k": k, "v": v}


# XLA-flash prefill attention: above this span the einsum path would
# materialize [B, H, S, span] f32 scores in HBM (670 MB per layer at
# S=512, span=2048); the blockwise scan keeps per-step scores block-sized
# and is differentiable + auto-partitionable (unlike a Pallas kernel)
PREFILL_FLASH_SPAN = 512
PREFILL_KV_BLOCK = 512
# S at or below this uses the Pallas flash-decode kernel (single decode
# steps and speculative verify blocks); above it is prefill territory
FLASH_DECODE_MAX_S = 32


def _blockwise_attention(q, ks, vs, pos0, scale):
    """Online-softmax attention over KV blocks via lax.scan (pure XLA).

    q [B,H,S,Dh] f32-scaled queries; ks/vs [B,H,C,Dh]; causal from absolute
    ``pos0``.  Same math as ops/flash_decode.py, expressed as a scan so XLA
    differentiates and partitions it — used for prefill (S > 8), where the
    one-shot einsum would materialize [S, C] score planes in HBM.
    """
    b, h, s, dh = q.shape
    c = ks.shape[-2]
    blk = min(PREFILL_KV_BLOCK, c)
    nblk = -(-c // blk)
    pad = nblk * blk - c
    if pad:
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kb = ks.reshape(b, h, nblk, blk, dh).transpose(2, 0, 1, 3, 4)
    vb = vs.reshape(b, h, nblk, blk, dh).transpose(2, 0, 1, 3, 4)
    qf = q.astype(jnp.float32) * scale
    batched_pos = jnp.ndim(pos0) == 1  # per-batch cursors
    q_pos = (pos0[:, None] if batched_pos else pos0) + jnp.arange(s)

    def body(carry, blk_in):
        m, l, acc, c0 = carry
        kblk, vblk = blk_in
        sc = jnp.einsum(
            "bhsd,bhcd->bhsc", qf, kblk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        key_pos = c0 + jnp.arange(blk)
        mask = jnp.where(
            key_pos <= q_pos[..., None], 0.0, NEG_INF
        )  # [S, blk] | [B, S, blk]; padded tail keys mask out (key_pos > pos)
        sc = sc + (mask[:, None] if batched_pos else mask[None, None])
        m_new = jnp.maximum(m, sc.max(axis=-1, keepdims=True))
        pp = jnp.exp(sc - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + pp.sum(axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bhsc,bhcd->bhsd", pp, vblk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc * alpha + pv, c0 + blk), None

    m0 = jnp.full((b, h, s, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s, 1), jnp.float32)
    a0 = jnp.zeros((b, h, s, dh), jnp.float32)
    (m, l, acc, _), _ = jax.lax.scan(body, (m0, l0, a0, jnp.int32(0)), (kb, vb))
    return acc / l


def _row_linear(
    x: jnp.ndarray, p: dict, li, tp_axis: str | None, full_k: int
) -> jnp.ndarray:
    """Row-parallel linear under shard_map.  ``full_k`` is the GLOBAL
    contraction width (n_embd for wo, n_ff for w2) — it disambiguates the
    four local-shape cases: a K-sharded weight contracts its local input
    slice and psums; a replicated weight consumes the full-width input with
    NO reduce (the input is gathered first if the producer was sharded)."""
    if not tp_axis:
        return linear(x, p, li)
    from ..ops.i8_matmul import I8SBQuant
    from ..ops.repack import RepackedQuant

    w = p["w"]
    if isinstance(w, (RepackedQuant, I8SBQuant)):
        kw = w.codes.shape[-1]
    elif isinstance(w, QTensor):
        kw = w.n_in
    else:
        kw = w.shape[-2]
    if kw < full_k:  # weight K-sharded
        if x.shape[-1] == full_k:
            # producer fell back to replication: take this device's K slice
            off = jax.lax.axis_index(tp_axis) * kw
            x = jax.lax.dynamic_slice_in_dim(x, off, kw, axis=-1)
        if isinstance(w, I8SBQuant):
            # per-shard absmax grids would diverge from the single-device
            # activation quantization; the GLOBAL row absmax keeps sharded
            # output == single-device output (one tiny pmax over tp)
            from ..ops.i8_matmul import qmatmul_i8sb

            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
            sx = jax.lax.pmax(amax, tp_axis) / 127.0
            sx = jnp.where(sx == 0, 1.0, sx)
            # partials stay f32 across the reduction — rounding each
            # device's partial to a bf16 activation dtype before the psum
            # costs ~1 ulp of the PARTIAL per device
            y = qmatmul_i8sb(
                x, w, out_dtype=jnp.float32,
                layer=li if w.codes.ndim == 3 else None, x_scale=sx,
            )
            y = jax.lax.psum(y, tp_axis).astype(x.dtype)
            b = p.get("b")
            return y if b is None else y + b.astype(y.dtype)
        return jax.lax.psum(linear(x, p, li), tp_axis)
    # weight replicated: gather the column-parallel input if needed, no psum
    if x.shape[-1] < full_k:
        x = jax.lax.all_gather(x, tp_axis, axis=-1, tiled=True)
    return linear(x, p, li)


def _layer(
    x: jnp.ndarray,
    layers: dict,
    li: int,
    ck: jnp.ndarray,
    cv: jnp.ndarray,
    pos0: jnp.ndarray,
    cfg: LlamaConfig,
    attn_len: int | None = None,
    use_flash: bool = True,
    tp_axis: str | None = None,
    act_stats: dict | None = None,
    page_table: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder layer. x [B,S,D]; ck/cv [L,B,H,C,Dh] (the FULL cache —
    updated in place at layer ``li``).

    ``page_table`` [B, MAXP] i32 switches the KV cache to **paged** mode:
    ck/cv are then shared page POOLS [L, NP, H, PAGE, Dh] and lane bi's
    positions [p*PAGE, (p+1)*PAGE) live in pool page ``page_table[bi, p]``
    (engine/paged.py owns allocation).  Requires per-lane cursors (pos0
    [B]) and spans that never cross a page edge (off + S <= PAGE — always
    true for the S=1 decode steps this mode serves); attention runs the
    paged flash kernel (ops/flash_decode.paged_flash_decode_attention).

    ``act_stats``: when given (a dict of lists), per-channel absolute maxima
    of each quantizable matmul's INPUT are appended per site ("attn", "wo",
    "ffn", "w2") — the calibration capture smooth-quant scales are computed
    from (quality.py).  Traced arrays; jit-safe.

    ``tp_axis``: Megatron tensor parallelism under ``shard_map`` (see
    parallel/spmd.py) — this function then runs on PER-DEVICE shards:
    qkv/w13 are column-sharded (local head/ff slices, discovered from the
    array shapes), wo/w2 are row-sharded (k-sharded repack) and their
    outputs all-reduced over ``tp_axis``.  x and the norms stay replicated.

    ``layers`` holds the STACKED per-layer params and ``li`` a *static*
    layer index (the loop is unrolled): quantized weights stream from the
    stacked arrays inside the Pallas kernel via constant index maps — an
    XLA-side slice would materialize a full per-layer weight copy before
    every kernel call, tripling decode traffic.  (A lax.scan formulation
    needs scalar-prefetch index maps, which wedge the compile pipeline.)

    ``attn_len`` (static) restricts attention reads to cache[:attn_len] — the
    engine passes the power-of-two bucket covering n_past+S, so decode
    traffic scales with the live context, not the full n_ctx allocation.
    """
    b, s, _ = x.shape
    batched_pos = jnp.ndim(pos0) == 1  # per-batch cursors (batched decode)

    def _amax(t):
        return jnp.max(jnp.abs(t.astype(jnp.float32)), axis=tuple(range(t.ndim - 1)))

    h = rms_norm(x, layers["attention_norm"][li], RMS_EPS)
    if act_stats is not None:
        act_stats.setdefault("attn", []).append(_amax(h))
    positions = (pos0[:, None] if batched_pos else pos0) + jnp.arange(s)

    def heads(t):
        # head count from the ARRAY width (n_head/tp local heads under tp)
        return t.reshape(b, s, -1, cfg.head_dim).transpose(0, 2, 1, 3)

    if "wqkv" in layers:
        # load-time fused projection: one kernel call instead of three
        # (per-call fixed cost is material at 224 calls/token unfused)
        qkv = linear(h, layers["wqkv"], li)
        d = qkv.shape[-1] // 3  # local width under tp
        xq, xk, xv = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]
    else:
        xq = linear(h, layers["wq"], li)
        xk = linear(h, layers["wk"], li)
        xv = linear(h, layers["wv"], li)
    q = rope_interleaved(heads(xq), positions, cfg.rope_theta)
    k = rope_interleaved(heads(xk), positions, cfg.rope_theta)
    v = heads(xv)

    if page_table is not None:
        # paged writes: lane bi's span lands in pool page
        # page_table[bi, pos // PAGE] at offset pos % PAGE.  Same chained
        # single-lane DUS shape as the batched path below (in-place on the
        # donated pool).
        if not batched_pos:
            raise ValueError("paged mode needs per-lane cursors (pos0 [B])")
        page = ck.shape[3]
        if s > page:
            raise ValueError(f"paged span {s} exceeds the page size {page}")
        kb = k.astype(ck.dtype)[None]
        vb = v.astype(cv.dtype)[None]
        maxp = page_table.shape[1] - 1  # last slot is the overshoot clamp
        if s == 1:
            # single-token decode: the write can never cross a page edge
            for bi in range(b):
                pg = page_table[bi, jnp.minimum(pos0[bi] // page, maxp)]
                idx = (li, pg, 0, pos0[bi] % page, 0)
                ck = jax.lax.dynamic_update_slice(ck, kb[:, bi : bi + 1], idx)
                cv = jax.lax.dynamic_update_slice(cv, vb[:, bi : bi + 1], idx)
        else:
            # speculative verify spans (1 < s <= PAGE) may cross ONE page
            # edge.  Dynamic-length sub-writes don't exist under jit, so each
            # lane does two fixed-size [.., s, ..] read-blend-writes:
            #   W1 in page p0 at start1 = min(off, page - s) — the span
            #      tokens roll right by shift1 = off - start1; slots below
            #      shift1 are CONSUMED history (positions < pos0) and keep
            #      their read-back values;
            #   W2 in page p0+1 at offset 0 — the span rolls left by
            #      (page - off); slots past the spilled length keep old
            #      values.  When the span doesn't cross, W2 degenerates to
            #      rewriting page p0's own first s slots with their current
            #      contents (mask selects nothing new).
            # Done lanes overshooting their pages hit the table's trailing
            # trash slot(s) — both windows then land in the shared sink.
            sl = jnp.arange(s)  # window slot iota
            for bi in range(b):
                off = pos0[bi] % page
                p0 = pos0[bi] // page
                pg1 = page_table[bi, jnp.minimum(p0, maxp)]
                pg2 = page_table[bi, jnp.minimum(p0 + 1, maxp)]
                start1 = jnp.minimum(off, page - s)
                shift1 = off - start1
                spill = off + s - page  # tokens landing in page p0+1 (<=0: none)
                for cache, data in ((0, kb), (1, vb)):
                    d = data[:, bi : bi + 1]  # [1, 1, H, s, Dh]
                    tgt = ck if cache == 0 else cv
                    i1 = (li, pg1, 0, start1, 0)
                    cur1 = jax.lax.dynamic_slice(tgt, i1, d.shape)
                    w1 = jnp.where(
                        (sl >= shift1)[None, None, None, :, None],
                        jnp.roll(d, shift1, axis=3), cur1,
                    )
                    tgt = jax.lax.dynamic_update_slice(tgt, w1, i1)
                    i2 = (li, pg2, jnp.int32(0), jnp.int32(0), jnp.int32(0))
                    cur2 = jax.lax.dynamic_slice(tgt, i2, d.shape)
                    w2 = jnp.where(
                        (sl < spill)[None, None, None, :, None],
                        jnp.roll(d, -(page - off), axis=3), cur2,
                    )
                    tgt = jax.lax.dynamic_update_slice(tgt, w2, i2)
                    if cache == 0:
                        ck = tgt
                    else:
                        cv = tgt
    elif batched_pos:
        # per-batch write offsets: B chained single-lane updates (B is
        # static).  A vmapped dynamic_update_slice here lowers to
        # slice + update-slice FUSIONS that copy the [H, C, Dh] lane every
        # layer (profiled at ~5 ms/step on 13B — the whole speculative-pass
        # overhead and a large slice of the batched-serving step); chained
        # plain DUS ops stay in-place on the donated cache
        kb = k.astype(ck.dtype)[None]
        vb = v.astype(cv.dtype)[None]
        for bi in range(b):
            idx = (li, bi, 0, pos0[bi], 0)
            ck = jax.lax.dynamic_update_slice(ck, kb[:, bi : bi + 1], idx)
            cv = jax.lax.dynamic_update_slice(cv, vb[:, bi : bi + 1], idx)
    else:
        ck = jax.lax.dynamic_update_slice(
            ck, k.astype(ck.dtype)[None], (li, 0, 0, pos0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v.astype(cv.dtype)[None], (li, 0, 0, pos0, 0)
        )

    # flash needs a lane-aligned head dim when Mosaic-compiled (the real
    # models' Dh=128; tiny test geometries fall back to the einsum on TPU
    # but still exercise the kernel in interpret mode on CPU) and a cache
    # length divisible by its KV block (the block loop has no tail handling)
    from ..ops import flash_decode as _fd

    flash_blk = _fd.pick_blk(attn_len or cfg.n_ctx, cfg.n_ctx)
    flash_ok = (
        use_flash
        and cfg.n_ctx % flash_blk == 0
        and (cfg.head_dim % 128 == 0 or jax.default_backend() != "tpu")
    )
    if page_table is not None:
        # paged pools have no dense [B, C] view to fall back to
        if s > FLASH_DECODE_MAX_S:
            raise ValueError(
                f"paged attention serves decode spans only (S <= {FLASH_DECODE_MAX_S})"
            )
        if cfg.head_dim % 128 and jax.default_backend() == "tpu":
            raise ValueError("paged attention needs a lane-aligned head dim on TPU")
        ctx = _fd.paged_flash_decode_attention(
            q, ck, cv, li, pos0, page_table,
            1.0 / float(np.sqrt(cfg.head_dim)),
        ).astype(x.dtype)
    elif s <= FLASH_DECODE_MAX_S and flash_ok:
        # decode path: blockwise flash kernel over the stacked HBM cache —
        # reads only ceil((pos0+s)/BLK) live KV blocks (no attn_len bucket,
        # no per-layer cache slice copy); see ops/flash_decode.py.  The cap
        # covers speculative verify blocks too (S = k_spec <= 32): the
        # einsum/blockwise path would slice + transpose the whole stacked
        # cache per layer (OOMs 13B at S=16)
        from ..ops.flash_decode import flash_decode_attention

        ctx = flash_decode_attention(
            q, ck, cv, li, pos0, 1.0 / float(np.sqrt(cfg.head_dim)),
            blk=flash_blk,
        ).astype(x.dtype)
    else:
        span = attn_len if attn_len is not None else cfg.n_ctx
        ks = ck[li, :, :, :span]  # static slices fuse into the attention dots
        vs = cv[li, :, :, :span]

        if span > PREFILL_FLASH_SPAN:
            # long-context prefill: blockwise online softmax (scan) instead
            # of materializing the [B, H, S, span] score plane in HBM
            ctx = _blockwise_attention(
                q, ks, vs, pos0, 1.0 / float(np.sqrt(cfg.head_dim))
            ).astype(x.dtype)
        else:
            # causal mask: query i may see key_pos <= pos0+i
            key_pos = jnp.arange(span)
            mask = jnp.where(
                key_pos <= positions[..., None], 0.0, NEG_INF
            )  # [S, span] | [B, S, span]
            mask = mask[:, None] if batched_pos else mask[None, None]

            scores = jnp.einsum(
                "bhsd,bhcd->bhsc", q, ks.astype(q.dtype), preferred_element_type=jnp.float32
            )
            scores = scores / jnp.sqrt(jnp.float32(cfg.head_dim))
            scores = scores + mask
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            # PV compute dtype: the cache dtype, EXCEPT byte-wide (fp8)
            # storage — quantizing the probabilities to fp8 would be an
            # avoidable precision hit, so compute in bf16 there
            pv_dt = vs.dtype if jnp.dtype(vs.dtype).itemsize > 1 else jnp.bfloat16
            ctx = jnp.einsum(
                "bhsc,bhcd->bhsd", probs.astype(pv_dt), vs.astype(pv_dt),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, -1)
    if act_stats is not None:
        act_stats.setdefault("wo", []).append(_amax(ctx))
    x = x + _row_linear(ctx, layers["wo"], li, tp_axis, cfg.n_embd)

    h = rms_norm(x, layers["ffn_norm"][li], RMS_EPS)
    if act_stats is not None:
        act_stats.setdefault("ffn", []).append(_amax(h))
    if "w13" in layers:
        gu = linear(h, layers["w13"], li)
        ff = gu.shape[-1] // 2
        gate_in, up = gu[..., :ff], gu[..., ff:]
    else:
        gate_in = linear(h, layers["w1"], li)
        up = linear(h, layers["w3"], li)
    gate = jax.nn.silu(gate_in.astype(jnp.float32)).astype(x.dtype)
    gu_prod = gate * up
    if act_stats is not None:
        act_stats.setdefault("w2", []).append(_amax(gu_prod))
    x = x + _row_linear(gu_prod, layers["w2"], li, tp_axis, cfg.n_ff)
    return x, ck, cv


def forward(
    params: dict,
    cache: dict,
    embeds: jnp.ndarray,
    pos0: jnp.ndarray,
    cfg: LlamaConfig,
    last_idx: jnp.ndarray | None = None,
    all_logits: bool = False,
    attn_len: int | None = None,
    use_flash: bool = True,
    tp_axis: str | None = None,
    act_stats: dict | None = None,
    page_table: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """embeds [B, S, D] -> (logits [B, V] at ``last_idx``, updated cache).

    ``page_table`` [B, MAXP]: paged-KV mode — ``cache`` holds the shared
    page pools instead of dense per-lane caches (see :func:`_layer`).

    ``all_logits=True`` returns [B, S, V] (training / perplexity path).

    ``last_idx`` (default S-1) selects which position's logits to return —
    used by bucketed prefill, where S is padded up to a bucket size and only
    the first ``last_idx+1`` positions are real.  Padded positions write
    stale cache entries beyond them, but those slots are both causally
    masked (key_pos <= pos0+i) and overwritten by the next prefill chunk, so
    they can never be attended to.
    """

    x = embeds
    ck, cv = cache["k"], cache["v"]
    for li in range(cfg.n_layer):
        x, ck, cv = _layer(
            x, params["layers"], li, ck, cv, pos0, cfg, attn_len, use_flash,
            tp_axis, act_stats, page_table,
        )
    new_cache = {"k": ck, "v": cv}

    def head(h):
        logits = linear(h, params["output"])
        if tp_axis and logits.shape[-1] != cfg.n_vocab:
            # vocab-parallel head: one tiled all-gather of [., V/tp] slices
            # (skipped when the head fell back to replication, e.g. V % tp)
            logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
        return logits.astype(jnp.float32)

    if act_stats is not None:
        hn = rms_norm(x, params["norm"], RMS_EPS)
        act_stats.setdefault("head", []).append(
            jnp.max(jnp.abs(hn.astype(jnp.float32)), axis=(0, 1))
        )
    if all_logits:
        return head(rms_norm(x, params["norm"], RMS_EPS)), new_cache
    if last_idx is None:
        h = x[:, -1]
    else:
        h = jax.lax.dynamic_index_in_dim(x, last_idx, axis=1, keepdims=False)
    return head(rms_norm(h, params["norm"], RMS_EPS)), new_cache


def embed_tokens(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """[B, S] int32 -> [B, S, D] (llama.cpp get_rows)."""
    return params["tok_embeddings"][tokens]


def decode_loop(
    params: dict,
    cache: dict,
    logits0: jnp.ndarray,
    pos0: jnp.ndarray,
    n_steps: int,
    key: jnp.ndarray,
    scfg,
    cfg: LlamaConfig,
    attn_len: int | None = None,
    use_flash: bool = True,
    tp_axis: str | None = None,
    page_table: jnp.ndarray | None = None,
    ban0: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Fused multi-token decode: ONE dispatch generates ``n_steps`` tokens.

    ``ban0`` [B] (requires the dynamic ``scfg`` rows form): a residual
    exclusion for the FIRST sample only — the token id a preceding
    stochastic-speculative dispatch rejected (-1 = none).  Speculative
    sampling's exactness requires the next draw from the same pending
    logits to come from the residual distribution
    (device_sampling.sample_res_rows); later steps sample fresh logits and
    carry no ban.  ``None`` compiles the classic loop unchanged.

    ``page_table`` [B, MAXP]: paged-KV serving mode — ``cache`` holds the
    page pools and each lane's single-token writes route through the table
    (a one-position write can never cross a page edge, so the scan needs no
    boundary handling; the caller only has to provision pages covering
    pos0 + n_steps).

    Per-token host round trips dominate decode latency on remote/tunneled
    backends (each blocking logits fetch pays a full RTT); this loop keeps
    the sample -> embed -> forward chain on device via ``lax.scan`` with
    on-device sampling (engine/device_sampling.py) and downloads only
    ``n_steps`` token ids.

    Preserves the reference's sample-then-eval ordering exactly
    (minigpt4.cpp:2704-2716): ``logits0`` is the pending logits from the
    previous eval; emitted token i is sampled *before* its own eval, and the
    returned final logits correspond to the last evaluated token.

    ``scfg`` is either a static DeviceSamplingConfig (compile-time chain;
    greedy compiles to a bare argmax) or a dict of per-lane [B] parameter
    arrays (engine/device_sampling.lane_rows) — the traced form, where ONE
    executable serves every sampling configuration and each lane samples
    under its own parameters.

    Returns (tokens [B, n_steps], final_logits [B, V], cache).
    """
    from ..engine.device_sampling import (
        sample_res_rows, sample_rows, sample_token)

    b = logits0.shape[0]
    dyn = isinstance(scfg, dict)  # per-lane traced params (lane_rows)
    if ban0 is not None and not dyn:
        raise ValueError("ban0 requires the dynamic (lane_rows) config")

    # scan carries (logits, cache, position)
    def body(carry, step_key):
        logits, kc, pos = carry
        keys = jax.random.split(step_key, b)
        if dyn:
            tok = sample_rows(logits, keys, scfg)
        else:
            tok = jax.vmap(lambda l, k: sample_token(l, k, scfg))(logits, keys)
        emb = embed_tokens(params, tok[:, None])
        new_logits, kc = forward(params, kc, emb, pos, cfg, attn_len=attn_len,
                                 use_flash=use_flash, tp_axis=tp_axis,
                                 page_table=page_table)
        return (new_logits, kc, pos + 1), tok

    keys = jax.random.split(key, n_steps)
    carry = (logits0, cache, pos0)
    first = None
    if ban0 is not None:
        # peel step 0: residual-aware sample (the ban applies only to the
        # carried pending logits; every later step samples fresh ones)
        logits, kc, pos = carry
        tok = sample_res_rows(
            logits, ban0, jax.random.split(keys[0], b), scfg)
        emb = embed_tokens(params, tok[:, None])
        new_logits, kc = forward(params, kc, emb, pos, cfg, attn_len=attn_len,
                                 use_flash=use_flash, tp_axis=tp_axis,
                                 page_table=page_table)
        carry, first, keys = (new_logits, kc, pos + 1), tok, keys[1:]
    (final_logits, cache, _), tokens = jax.lax.scan(body, carry, keys)
    if first is not None:
        tokens = jnp.concatenate([first[None], tokens], axis=0)
    return tokens.T, final_logits, cache  # [B, n_steps]


def _ngram_draft(hist: jnp.ndarray, pos: jnp.ndarray, t0: jnp.ndarray,
                 k_draft: int, c: int) -> jnp.ndarray:
    """Prompt-lookup draft: the ``k_draft`` tokens that followed the most
    recent occurrence of the current bigram/trigram in the token history.

    ``hist`` [C] i32 holds the evaluated token ids (sentinel -1 for injected
    image-embedding rows, which can never match a real token id); ``pos`` is
    the number of valid entries (n_past); ``t0`` is the just-sampled, not yet
    evaluated token.  Longer context matches win (4-gram > trigram > bigram);
    among equal lengths the most recent wins.  With no match the slice is
    arbitrary — verification rejects bad drafts, so a garbage draft costs
    nothing (the verify pass is the same weight read as a 1-token step).
    """
    idx = jnp.arange(c)
    t_prev = hist[jnp.maximum(pos - 1, 0)]
    t_prev2 = hist[jnp.maximum(pos - 2, 0)]
    t_prev3 = hist[jnp.maximum(pos - 3, 0)]
    prev = jnp.roll(hist, 1)  # prev[j] = hist[j-1]
    prev2 = jnp.roll(hist, 2)
    prev3 = jnp.roll(hist, 3)
    # idx <= pos-2: a match must have at least ONE written continuation
    # token — the most recent bigram of a period-1 (repeated-token) stream
    # sits AT the cursor, whose continuation is unwritten (-1) and every
    # draft would reject
    m2 = (hist == t0) & (prev == t_prev) & (idx >= 1) & (idx <= pos - 2)
    m3 = m2 & (prev2 == t_prev2) & (idx >= 2) & (pos >= 2)
    m4 = m3 & (prev3 == t_prev3) & (idx >= 3) & (pos >= 3)
    val = jnp.where(
        m4, 2 * c + idx, jnp.where(m3, c + idx, jnp.where(m2, idx, -1))
    )
    j = jnp.max(val)
    # strip the match-length priority offset (keep -1 = no match as-is)
    j = jnp.where(j >= 2 * c, j - 2 * c, jnp.where(j >= c, j - c, j))
    start = jnp.clip(j + 1, 0, c - k_draft)
    draft = jax.lax.dynamic_slice(hist, (start,), (k_draft,)).astype(jnp.int32)
    # forward-fill any unwritten tail (-1 sentinels past the cursor) with the
    # last seen token: short-period streams then draft their repetition
    # instead of un-acceptable sentinels.  Harmless otherwise — verification
    # rejects wrong drafts at zero extra cost.
    def ffill(last, t):
        t = jnp.where(t < 0, last, t)
        return t, t

    _, draft = jax.lax.scan(ffill, t0, draft)
    return draft


def speculative_decode_loop(
    params: dict,
    cache: dict,
    logits0: jnp.ndarray,
    pos0: jnp.ndarray,
    hist: jnp.ndarray,
    n_passes: int,
    k_spec: int,
    cfg: LlamaConfig,
    attn_len: int | None = None,
    use_flash: bool = True,
    tp_axis: str | None = None,
    page_table: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict, jnp.ndarray]:
    """Greedy speculative decode: ``n_passes`` verify passes, each drafting
    ``k_spec - 1`` tokens by n-gram lookup (:func:`_ngram_draft`) and
    verifying the whole block in ONE forward pass of S=k_spec.

    ``page_table`` [B, MAXP+1]: paged-KV serving mode — ``cache`` holds the
    shared page pools and the S=k_spec verify writes route through the
    table (``_layer`` splits spans crossing a page edge into two blended
    window writes; the caller provisions pages covering
    ``pos0 + n_passes*k_spec`` for active lanes — overshooting done lanes
    write into the pool's trash sink via the table's trailing clamp slot).

    Why this wins: batch-1 decode is bound by streaming every quantized
    weight per token; an S=k forward reads the weights ONCE for all k
    positions (k <= 8 even rides the same sublane padding as S=1, i.e. the
    verify pass costs the same device time as a single-token step).  Every
    accepted draft token is therefore a free extra token.  Greedy output is
    token-for-token IDENTICAL to plain greedy decode: position i's token is
    only accepted when it equals argmax of the model's own logits at i
    (verified on device), so this preserves the reference's greedy decode
    contract (minigpt4.cpp:2449-2452) while multiplying tokens/second.

    Sample-then-eval ordering is preserved: ``logits0`` are the pending
    logits; each pass samples t0 from the carried logits before evaluating
    it, and the returned logits correspond to the last *evaluated* token.

    Rejected draft positions leave stale cache/history entries above the
    advanced cursor — unreachable by the causal mask and overwritten by the
    next pass/prefill (the same invariant as EOS rollback).

    Returns (tokens [B, n_passes, k_spec], counts [B, n_passes],
    final_logits [B, V], cache, hist).  Lane b's pass p emitted
    ``tokens[b, p, :counts[b, p]]``; counts sum is the cursor advance.
    """
    b = logits0.shape[0]
    c = hist.shape[-1]
    pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (b,))

    def body(carry, _):
        logits, kc, pos, h = carry
        t0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B] greedy sample
        draft = jax.vmap(
            lambda hh, pp, tt: _ngram_draft(hh, pp, tt, k_spec - 1, c)
        )(h, pos, t0)  # [B, k-1]
        toks = jnp.concatenate([t0[:, None], draft], axis=1)  # [B, k]
        emb = embed_tokens(params, toks)
        logits_all, kc = forward(
            params, kc, emb, pos, cfg, all_logits=True, attn_len=attn_len,
            use_flash=use_flash, tp_axis=tp_axis, page_table=page_table,
        )  # [B, k, V]
        g = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)  # model's continuations
        ok = (draft == g[:, :-1]).astype(jnp.int32)  # [B, k-1]
        acc = jnp.cumprod(ok, axis=1).sum(axis=1)  # leading accepted drafts
        count = 1 + acc  # t0 + accepted
        new_logits = jnp.take_along_axis(
            logits_all, acc[:, None, None], axis=1
        )[:, 0]  # pending logits after the last accepted token
        h = jax.vmap(
            lambda hh, tt, pp: jax.lax.dynamic_update_slice(hh, tt, (pp,))
        )(h, toks, pos)
        return (new_logits, kc, pos + count, h), (toks, count)

    (final_logits, cache, _, hist), (tokens, counts) = jax.lax.scan(
        body, (logits0, cache, pos0, hist), None, length=n_passes
    )
    # scan stacks on axis 0: -> [B, n_passes, ...]
    return (
        tokens.transpose(1, 0, 2),
        counts.T,
        final_logits,
        cache,
        hist,
    )


def stochastic_speculative_decode_loop(
    params: dict,
    cache: dict,
    logits0: jnp.ndarray,
    pos0: jnp.ndarray,
    hist: jnp.ndarray,
    ban0: jnp.ndarray,
    keys: jnp.ndarray,
    rows: dict,
    k_spec: int,
    cfg: LlamaConfig,
    attn_len: int | None = None,
    use_flash: bool = True,
    tp_axis: str | None = None,
    page_table: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict, jnp.ndarray, jnp.ndarray]:
    """SAMPLED speculative decode — speculative sampling (Leviathan et al. /
    Chen et al., the algorithm llama.cpp's stochastic speculation follows)
    specialized to a deterministic n-gram draft, so temperature/top-k/top-p
    streams speculate too, with the emitted token distribution EXACTLY equal
    to plain autoregressive sampling's.

    The proposal for each draft position is a point mass at the n-gram
    continuation d (:func:`_ngram_draft`).  Speculative sampling with a
    point-mass proposal reduces to: accept d with probability p(d) — p the
    model's post-chain sampling distribution at that position
    (device_sampling.chain_logits_dyn, the same truncation semantics the
    plain fused loop draws from) — and on rejection draw the replacement
    from norm(p with d zeroed), i.e. the standard residual
    norm(max(p - q, 0)).  The accept/residual algebra composes to exactly p
    per position, so sampled output is distributionally indistinguishable
    from :func:`decode_loop`; greedy lanes (temp <= 0) reduce to the
    argmax-verify rule of :func:`speculative_decode_loop` and are
    token-for-token identical to it.

    The residual exclusion crosses pass (and dispatch) boundaries as a
    carried BAN token: pass t0 is sampled from the pending logits with the
    previous pass's rejected draft excluded (``ban0`` in, final ban out —
    the engine threads it between dispatches and resolves it before any
    non-speculative path samples from the same pending logits).

    ``rows`` is the per-lane traced parameter pytree
    (device_sampling.lane_rows): one compiled loop serves every sampling
    configuration and batched lanes mix configs.  ``keys`` [n_passes, 2]
    carries one PRNG key per verify pass (caller splits; the pass count is
    static via the shape).

    Returns (tokens [B, n_passes, k_spec], counts [B, n_passes],
    final_logits [B, V], cache, hist, ban [B]).
    """
    from ..engine.device_sampling import (
        _greedy_pick, chain_logits_dyn, sample_res_rows)

    b = logits0.shape[0]
    c = hist.shape[-1]
    pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (b,))
    greedy_lane = rows["temp"] <= 0.0  # [B]
    bias_rows = rows.get("bias")

    def body(carry, step_key):
        logits, ban, kc, pos, h = carry
        k_t0, k_acc = jax.random.split(step_key)
        # sample-then-eval: t0 drawn from the carried pending logits, with
        # the previous pass's rejected draft excluded (the residual rule)
        t0 = sample_res_rows(logits, ban, jax.random.split(k_t0, b), rows)
        draft = jax.vmap(
            lambda hh, pp, tt: _ngram_draft(hh, pp, tt, k_spec - 1, c)
        )(h, pos, t0)  # [B, k-1]
        toks = jnp.concatenate([t0[:, None], draft], axis=1)  # [B, k]
        emb = embed_tokens(params, toks)
        logits_all, kc = forward(
            params, kc, emb, pos, cfg, all_logits=True, attn_len=attn_len,
            use_flash=use_flash, tp_axis=tp_axis, page_table=page_table,
        )  # [B, k, V]

        # target probability of each draft token under its lane's chain
        def lane_z(lg, temp, tk, tp, tz, typ, bias=None):
            return jax.vmap(
                lambda l: chain_logits_dyn(l, temp, tk, tp, tz, typ, bias)
            )(lg)  # [k-1, V]

        zargs = (logits_all[:, :-1], rows["temp"], rows["top_k"],
                 rows["top_p"], rows["tfs_z"], rows["typical_p"])
        z = (jax.vmap(lane_z)(*zargs, bias_rows) if bias_rows is not None
             else jax.vmap(lane_z)(*zargs))  # [B, k-1, V]
        p_d = jnp.take_along_axis(
            jax.nn.softmax(z, axis=-1), draft[..., None], axis=-1
        )[..., 0]  # [B, k-1]
        u = jax.random.uniform(k_acc, (b, k_spec - 1))
        g = _greedy_pick(
            logits_all, None if bias_rows is None else bias_rows[:, None, :])
        ok = jnp.where(greedy_lane[:, None], draft == g[:, :-1], u < p_d)
        acc = jnp.cumprod(ok.astype(jnp.int32), axis=1).sum(axis=1)
        count = 1 + acc  # t0 + leading accepted drafts
        new_logits = jnp.take_along_axis(
            logits_all, acc[:, None, None], axis=1)[:, 0]
        # first rejected draft (if any) is the next sample's residual ban
        rejected = acc < (k_spec - 1)
        new_ban = jnp.where(
            rejected,
            jnp.take_along_axis(
                toks, jnp.minimum(acc + 1, k_spec - 1)[:, None], axis=1
            )[:, 0],
            -1,
        ).astype(jnp.int32)
        h = jax.vmap(
            lambda hh, tt, pp: jax.lax.dynamic_update_slice(hh, tt, (pp,))
        )(h, toks, pos)
        return (new_logits, new_ban, kc, pos + count, h), (toks, count)

    ban0 = jnp.broadcast_to(jnp.asarray(ban0, jnp.int32).reshape(-1), (b,))
    (final_logits, ban, cache, _, hist), (tokens, counts) = jax.lax.scan(
        body, (logits0, ban0, cache, pos0, hist), keys
    )
    return (
        tokens.transpose(1, 0, 2),
        counts.T,
        final_logits,
        cache,
        hist,
        ban,
    )


def draft_speculative_decode_loop(
    params: dict,
    cache: dict,
    dparams: dict,
    dcache: dict,
    logits0: jnp.ndarray,
    pos0: jnp.ndarray,
    n_passes: int,
    k_spec: int,
    cfg: LlamaConfig,
    dcfg: LlamaConfig,
    attn_len: int | None = None,
    d_attn_len: int | None = None,
    use_flash: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict, dict]:
    """Greedy speculative decode drafted by a SECOND, smaller llama model
    (llama.cpp's "speculative" example pattern — the reference ecosystem's
    external drafter), verified by the main model in one S=k_spec pass.

    vs :func:`speculative_decode_loop` (prompt-lookup/n-gram drafting): a
    draft model proposes plausible continuations on NOVEL text too, where
    n-gram lookup finds nothing (the measured 1.04 tok/pass realistic
    floor).  The cost model: each pass runs k_spec sequential draft-model
    steps (cheap — the drafter is 10-100x smaller) plus ONE main-model
    verify pass (the same weight read as a single token).  Greedy output is
    token-for-token identical to plain decode regardless of drafter quality
    — bad drafts just reject.

    The draft model must share the tokenizer/vocab (asserted by the engine).
    Its cache must contain the same token history as the main cache;
    positions holding injected image embeddings are evaluated with ZERO
    embeddings on the drafter (its n_embd differs from the projection dim) —
    drafting quality around images degrades, correctness never does.

    Each pass evaluates k_spec draft-model steps: steps 0..k-2 produce the
    draft tokens d1..d{k-1}; the final step evaluates d{k-1} itself so the
    draft cache stays gap-free through pos+k (a fully accepted pass would
    otherwise leave position pos+k-1 unevaluated for the next pass).

    Returns (tokens [B, n_passes, k_spec], counts [B, n_passes],
    final_logits [B, V], cache, dcache).
    """
    b = logits0.shape[0]
    pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (b,))

    def body(carry, _):
        logits, kc, dkc, pos = carry
        t0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]

        def dstep(dc_carry, i):
            dkc, tok = dc_carry
            demb = embed_tokens(dparams, tok[:, None])
            dlog, dkc = forward(dparams, dkc, demb, pos + i, dcfg,
                                attn_len=d_attn_len, use_flash=use_flash)
            nxt = jnp.argmax(dlog, axis=-1).astype(jnp.int32)
            return (dkc, nxt), tok

        # k_spec sequential draft steps; the emitted sequence is the tokens
        # EVALUATED: [t0, d1, ..., d_{k-1}] (the last step's output is the
        # k-th draft, unused — it only fills the draft cache)
        (dkc, _), toks_t = jax.lax.scan(
            dstep, (dkc, t0), jnp.arange(k_spec))
        toks = toks_t.T  # [B, k]

        emb = embed_tokens(params, toks)
        logits_all, kc = forward(
            params, kc, emb, pos, cfg, all_logits=True, attn_len=attn_len,
            use_flash=use_flash,
        )  # [B, k, V]
        g = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)
        ok = (toks[:, 1:] == g[:, :-1]).astype(jnp.int32)  # drafts vs argmax
        acc = jnp.cumprod(ok, axis=1).sum(axis=1)
        count = 1 + acc
        new_logits = jnp.take_along_axis(
            logits_all, acc[:, None, None], axis=1
        )[:, 0]
        return (new_logits, kc, dkc, pos + count), (toks, count)

    (final_logits, cache, dcache, _), (tokens, counts) = jax.lax.scan(
        body, (logits0, cache, dcache, pos0), None, length=n_passes
    )
    return (
        tokens.transpose(1, 0, 2),
        counts.T,
        final_logits,
        cache,
        dcache,
    )


def make_step_fns(cfg: LlamaConfig):
    """(prefill_fn, decode_fn) jitted with donated caches (in-place HBM
    update, no copy)."""
    fwd = partial(forward, cfg=cfg)
    prefill = jax.jit(fwd, donate_argnums=(1,))
    return prefill, prefill  # same compiled fn; shapes differ (S vs 1)


# ---------------------------------------------------------------------------
# parameter loading
# ---------------------------------------------------------------------------


def load_params(
    reader, dtype=jnp.float32, n_ctx: int = 2048, quant_mode: str = "auto",
    smooth: dict | None = None,
) -> tuple[dict, LlamaConfig]:
    """Build decoder params from a LlamaFileReader.

    Tensor names follow llama.cpp: ``tok_embeddings.weight``, ``norm.weight``,
    ``output.weight``, ``layers.{i}.attention.{wq,wk,wv,wo}.weight``,
    ``layers.{i}.feed_forward.{w1,w2,w3}.weight``,
    ``layers.{i}.{attention_norm,ffn_norm}.weight``.

    The token embedding is dequantized to a dense row-gatherable array;
    projection weights stay packed (QTensor) when quantized.

    ``smooth`` (w8a8 mode only): smooth-quant migration scales from
    quality.compute_smooth_scales — keys "attn" [L, D], "ffn" [L, D],
    "w2" [L, F], "head" [D].  Each site folds 1/s into the producing op
    (the preceding RMSNorm weight; w3's output rows for the w2 site) and s
    into the consuming weight's columns before i8 requantization — exact in
    f32, it only moves the activation-quantization grid off the outlier
    channels (ops/i8_matmul.py documents why that matters).
    """
    cfg = LlamaConfig.from_hparams(reader.hparams, n_ctx=n_ctx)

    from .params import load_quant_weight
    from ..ops.i8_matmul import SB as _I8_SB

    sm = dict(smooth) if smooth else {}
    if sm and quant_mode != "w8a8":
        raise ValueError("smooth scales require quant_mode='w8a8'")

    def lin(name: str, col_scale=None, row_scale=None) -> dict:
        rec = reader.tensors[name]
        if is_quantized(rec.dtype):
            return {"w": load_quant_weight(
                reader.raw(name), rec.shape, rec.dtype, quant_mode,
                col_scale=col_scale, row_scale=row_scale,
            )}
        w = np.asarray(reader.tensor_f32(name), np.float32)
        if col_scale is not None:
            w = w * np.asarray(col_scale, np.float32)[None, :]
        if row_scale is not None:
            w = w * np.asarray(row_scale, np.float32)[:, None]
        return {"w": jnp.asarray(np.ascontiguousarray(w.T), dtype)}

    def absorbs(*names: str) -> bool:
        # a site's scale can only be folded where every consumer lands in a
        # representation that re-quantizes from floats (i8) or stays dense —
        # packed q-format fallbacks (K % 256) must keep exact file bytes
        for nm in names:
            rec = reader.tensors[nm]
            if is_quantized(rec.dtype) and rec.shape[1] % _I8_SB:
                return False
        return True

    def site(key: str, li, *names: str):
        if key not in sm or not absorbs(*names):
            return None
        v = np.asarray(sm[key], np.float32)
        return v[li] if li is not None else v

    s_head = site("head", None, "output.weight")
    norm_w = np.asarray(reader.tensor_f32("norm.weight"), np.float32)
    if s_head is not None:
        norm_w = norm_w / s_head
    params: dict = {
        "tok_embeddings": jnp.asarray(reader.tensor_f32("tok_embeddings.weight"), dtype),
        "norm": jnp.asarray(norm_w, dtype),
        "output": lin("output.weight", col_scale=s_head),
    }

    layers = []
    for i in range(cfg.n_layer):
        pfx = f"layers.{i}."
        qkv_names = tuple(pfx + f"attention.w{x}.weight" for x in "qkv")
        s_attn = site("attn", i, *qkv_names)
        s_ffn = site("ffn", i, pfx + "feed_forward.w1.weight",
                     pfx + "feed_forward.w3.weight")
        s_w2 = site("w2", i, pfx + "feed_forward.w2.weight",
                    pfx + "feed_forward.w3.weight")

        def norm_t(name, div):
            w = np.asarray(reader.tensor_f32(name), np.float32)
            return jnp.asarray(w / div if div is not None else w, dtype)

        lp = {
            "attention_norm": norm_t(pfx + "attention_norm.weight", s_attn),
            "wq": lin(qkv_names[0], col_scale=s_attn),
            "wk": lin(qkv_names[1], col_scale=s_attn),
            "wv": lin(qkv_names[2], col_scale=s_attn),
            "wo": lin(pfx + "attention.wo.weight"),
            "ffn_norm": norm_t(pfx + "ffn_norm.weight", s_ffn),
            "w1": lin(pfx + "feed_forward.w1.weight", col_scale=s_ffn),
            "w2": lin(pfx + "feed_forward.w2.weight", col_scale=s_w2),
            "w3": lin(pfx + "feed_forward.w3.weight", col_scale=s_ffn,
                      row_scale=None if s_w2 is None else 1.0 / s_w2),
        }
        layers.append(lp)

    # fuse qkv and gate/up along the output axis when representations match:
    # one kernel call instead of three/two (see _layer).  ALL layers must
    # fuse (same fused aux) or none do — per-layer fusion would give layers
    # different key sets and break the stacked pytree (K_M-style files mix
    # quant formats across layers: llama.cpp quantizes some wv/w2 to q6_k)
    for fused_name, part_names in (("wqkv", ("wq", "wk", "wv")),
                                   ("w13", ("w1", "w3"))):
        fused = [_fuse_linears([lp[n] for n in part_names]) for lp in layers]
        if all(f is not None for f in fused) and all(
            _same_static(f["w"], fused[0]["w"]) for f in fused
        ):
            for lp, f in zip(layers, fused):
                lp[fused_name] = f
                for n in part_names:
                    del lp[n]

    params["layers"] = _stack_layers(layers)
    return params, cfg


def _same_static(a, b) -> bool:
    """Same pytree static structure (stacking compatibility)."""
    return jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)


def _stack_layers(layers: list[dict]) -> dict:
    """Stack per-layer params into [L, ...] arrays; a name whose per-layer
    representations differ (mixed quant formats in K_M-style ggml files —
    different RepackedQuant/QTensor static aux is a different pytree
    structure) stays as a per-layer LIST, indexed statically by the unrolled
    layer loop (models/params.linear)."""
    out: dict = {}
    for name in layers[0]:
        vals = [lp[name] for lp in layers]
        if all(_same_static(v, vals[0]) for v in vals):
            out[name] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *vals)
        elif isinstance(vals[0], dict) and "w" in vals[0]:
            out[name] = {"w": [v["w"] for v in vals]}
        else:
            out[name] = vals
    return out


def _fuse_linears(ps: list[dict]):
    """Concatenate linear params along the output axis when their weight
    representations are identical (dtype/layout); None if not fusable."""
    from ..ops.repack import RepackedQuant

    ws = [p["w"] for p in ps]
    if any("b" in p for p in ps):
        return None
    if all(isinstance(w, RepackedQuant) for w in ws):
        w0 = ws[0]
        if any(
            (w.dtype, w.n_in, w.group_size, w.code_bits, w.hi_bits)
            != (w0.dtype, w0.n_in, w0.group_size, w0.code_bits, w0.hi_bits)
            for w in ws
        ):
            return None
        return {
            "w": RepackedQuant(
                jnp.concatenate([w.codes for w in ws], axis=-2),
                jnp.concatenate([w.scales for w in ws], axis=-2),
                jnp.concatenate([w.mins for w in ws], axis=-2),
                jnp.concatenate([w.hi for w in ws], axis=-2) if w0.hi is not None else None,
                w0.dtype, w0.n_in, w0.group_size, w0.code_bits, w0.hi_bits,
            )
        }
    if all(isinstance(w, QTensor) for w in ws):
        w0 = ws[0]
        if any((w.dtype, w.n_in) != (w0.dtype, w0.n_in) for w in ws):
            return None
        return {"w": QTensor(jnp.concatenate([w.packed for w in ws], axis=-2), w0.dtype, w0.n_in)}
    from ..ops.i8_matmul import I8SBQuant

    if all(isinstance(w, I8SBQuant) for w in ws):
        w0 = ws[0]
        if any(w.n_in != w0.n_in for w in ws):
            return None
        return {
            "w": I8SBQuant(
                jnp.concatenate([w.codes for w in ws], axis=-2),
                jnp.concatenate([w.scales for w in ws], axis=-2),
                w0.n_in,
            )
        }
    if all(isinstance(w, jnp.ndarray) for w in ws):
        if any(w.dtype != ws[0].dtype or w.shape[:-1] != ws[0].shape[:-1] for w in ws):
            return None
        return {"w": jnp.concatenate(ws, axis=-1)}  # dense [K, N]: concat N
    return None

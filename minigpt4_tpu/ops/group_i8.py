"""Exact group-quant matmul with i8 codes fed DIRECTLY to the MXU ("gq").

The round-2 fused kernel (ops/pallas_quant_matmul.py) expands packed codes
to bf16 on the VPU before the MXU can contract them; that per-element VPU
staging is the measured ~305 Ge/s plateau that capped exact-q5_k decode at
~22 tok/s (PERFORMANCE.md "why ~305 Ge/s").  The w8a8 path
(ops/i8_matmul.py) proved the escape — i8 operands straight to the MXU,
HBM-bound — but re-quantizes weights and activations (approximate).  This
module keeps EXACT ggml dequant semantics at w8a8-class speed:

  * **codes**: the raw ggml group code q stored as i8 [N, K] — every
    REPACKABLE format's q fits i8 (q5_k 0..31, q6_k 0..63, q8_0 signed).
    The logical weight is ``w[n,k] = A[n,g]*q[n,k] + B[n,g]`` with
    per-group scale A and offset B = -min, exactly ggml's decode
    (formats at ops/repack._decode_codes_scales; ggml reference
    /root/reference/minigpt4.cpp:2932 vendored codecs).
  * **planes**: for q4_k/q5_k the integer sub-scales are stored raw
    (sc6/mn6 u8 [G, N] + superblock d/dmin f32 [S, N]) so A and B are
    reconstructed BIT-EXACTLY in-kernel (f16 x 6-bit-int products are
    exact in f32).  Other formats store A/B as bf16 planes [G, N] — the
    same 2^-9 scale rounding the round-2 repack default already accepted.
  * **activations**: a DUAL i8 split ``x ~= s1*x1 + s2*x2`` (s2 = s1/128)
    — representation error <= absmax/2^15, i.e. strictly finer than the
    bf16 rounding of x that the round-2 kernel applied.  Outliers get
    15-bit precision, which is what per-token single-i8 absmax (the
    LLM.int8 failure mode that kept w8a8 opt-in) cannot give.
  * **the group structure rides the MXU's idle M rows**: the activation
    block carries 16 rows per token (8 groups-per-chunk x 2 splits), each
    masked to one group, so ONE [16M, 8*gs] x [8*gs, TN] i8 dot yields
    per-group i32 partials; scales apply to [8, TN] partials (1/gs of the
    per-element cost).  No per-element VPU op ever touches the weight
    stream — the codes go HBM -> VMEM -> MXU untouched.

Measured (tools/qmm_group_i8.py, 13B decode shapes, same-session): within
3% of the w8a8 kernel at every shape, 5-10% faster than the bf16-staging
q5_k kernel even in an HBM-slow chip state; in w8a8-favorable states the
gap to the old kernel is the full 305-vs-544 Ge/s ratio.

The kernel path serves M <= 8 (decode steps and k<=8 speculative verify
spans); larger M (prefill) dequantizes to bf16 in XLA and runs a dense
MXU matmul — at prefill M the dequant cost amortizes over the batch and
the matmul is compute-bound anyway.

Reference behavior replaced: ggml_mul_mat over quantized tensors
(/root/reference/minigpt4.cpp:2349-2350; kernels vendored via
CMakeLists.txt:318) — exact file semantics, TPU-native execution.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.dtypes import DataType

J = 8  # groups per contraction chunk; chunk = J * group_size

# formats with raw-integer sub-scale planes (bit-exact A/B reconstruction)
EXACT_PLANE = frozenset({DataType.Q4_K, DataType.Q5_K})


@jax.tree_util.register_pytree_node_class
@dataclass
class GroupQuant:
    """Group-quantized 2-D weight for the direct-MXU exact kernel.

    codes i8 [(L,) N, K].  Planes are pre-transposed to [(L,) G, N] /
    [(L,) S, N] so in-kernel slices align with the group-partial rows:

      * exact mode (q4_k/q5_k): sc6/mn6 u8 [G, N], d/dmin f32 [S, N];
        ``A = d[s]*sc6[g]``, ``B = -dmin[s]*mn6[g]`` (bit-exact).
      * generic mode: a/b bf16-or-f32 [G, N]; ``A = a``, ``B = b``.
    """

    codes: jnp.ndarray
    sc6: jnp.ndarray | None
    mn6: jnp.ndarray | None
    d: jnp.ndarray | None
    dmin: jnp.ndarray | None
    a: jnp.ndarray | None
    b: jnp.ndarray | None
    dtype: DataType  # static: source format
    n_in: int  # static logical K
    group_size: int  # static
    k_shards: int = 1  # static: >1 only as with_k_shards output
    # sub-byte code storage (pack_codes): "p4" nibble-packs two 4-bit codes
    # per byte ([N, K/2]); "p5" additionally carries the 5th bit as a
    # per-chunk bit plane ``hb`` ([N, K/8]); "p6" carries bits 5:4 as a
    # 2-bit plane ([N, K/4]).  Layout is CHUNK-LOCAL (chunk = J*gs) so
    # K-sharding and the kernels' per-chunk slices stay aligned.
    hb: jnp.ndarray | None = None
    packing: str = "none"  # static: none | p4 | p5 | p6
    # trailing zero-valued groups appended by pad_k_chunks (logical columns;
    # k_pad/group_size whole groups with codes 0, A 0, B 0 — they contribute
    # exactly 0 to every output, so bit-exactness is preserved)
    k_pad: int = 0  # static

    def tree_flatten(self):
        return (
            (self.codes, self.sc6, self.mn6, self.d, self.dmin, self.a,
             self.b, self.hb),
            (self.dtype, self.n_in, self.group_size, self.k_shards,
             self.packing, self.k_pad),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, sc6, mn6, d, dmin, a, b, hb = children
        dtype, n_in, gs, k_shards, packing, k_pad = aux
        return cls(codes, sc6, mn6, d, dmin, a, b, dtype, n_in, gs,
                   k_shards, hb=hb, packing=packing, k_pad=k_pad)

    @property
    def exact(self) -> bool:
        return self.sc6 is not None

    @property
    def n_out(self) -> int:
        return self.codes.shape[-2]

    @property
    def k_stored(self) -> int:
        """K columns covered by this (possibly shard-local) codes array,
        INCLUDING any pad_k_chunks zero groups."""
        return self.codes.shape[-1] * (2 if self.packing != "none" else 1)

    @property
    def k_logical(self) -> int:
        """Real (file) K columns of this shard — what x rows carry."""
        return self.k_stored - self.k_pad

    def planes_ab(self, out_dtype=jnp.float32):
        """Expanded (A, B) per-group planes [..., G, N] (XLA; jit-safe)."""
        if self.exact:
            a = jnp.repeat(self.d, J, axis=-2) * self.sc6.astype(jnp.float32)
            b = -jnp.repeat(self.dmin, J, axis=-2) * self.mn6.astype(jnp.float32)
        else:
            a = self.a.astype(jnp.float32)
            b = self.b.astype(jnp.float32)
        return a.astype(out_dtype), b.astype(out_dtype)

    def codes_logical(self) -> jnp.ndarray:
        """[..., N, K] i8 codes regardless of packing, pad trimmed (XLA
        ops; jit-safe)."""
        if self.packing == "none":
            return self.codes
        chunk = J * self.group_size
        half = chunk // 2
        pk = jax.lax.bitcast_convert_type(self.codes, jnp.uint8)
        lead = pk.shape[:-1]
        kp = pk.shape[-1]
        nch = (kp * 2) // chunk
        pkc = pk.reshape(*lead, nch, half)
        cc = jnp.concatenate([pkc & 0xF, pkc >> 4], axis=-1)  # [.., nch, chunk]
        if self.packing == "p5":
            hbb = jax.lax.bitcast_convert_type(self.hb, jnp.uint8)
            hbb = hbb.reshape(*lead, nch, chunk // 8)
            # byte j, bit t  <->  chunk column 32t + j
            bits = jnp.stack([(hbb >> t) & 1 for t in range(8)], axis=-2)
            cc = cc + (bits.reshape(*lead, nch, chunk) << 4)
        elif self.packing == "p6":
            hbb = jax.lax.bitcast_convert_type(self.hb, jnp.uint8)
            hbb = hbb.reshape(*lead, nch, chunk // 4)
            # byte j, 2-bit field t  <->  chunk column 32t + j
            f2 = jnp.stack([(hbb >> (2 * t)) & 3 for t in range(4)], axis=-2)
            cc = cc + (f2.reshape(*lead, nch, chunk) << 4)
        return cc.reshape(*lead, kp * 2).astype(jnp.int8)[..., :self.k_logical]

    def dequantize(self, out_dtype=jnp.float32) -> jnp.ndarray:
        """[..., N, K_logical] floats — the fallback/test reference and the
        M>8 prefill path's expansion."""
        a, b = self.planes_ab()
        gs = self.group_size
        # planes are [..., G, N]: move N forward, expand G -> K (padded
        # groups are zeros; trim them with the codes)
        a = jnp.repeat(jnp.swapaxes(a, -1, -2), gs, axis=-1)[..., :self.k_logical]
        b = jnp.repeat(jnp.swapaxes(b, -1, -2), gs, axis=-1)[..., :self.k_logical]
        return (self.codes_logical().astype(jnp.float32) * a + b).astype(out_dtype)


def from_ggml(raw: np.ndarray, shape: tuple[int, int], dtype: DataType) -> GroupQuant:
    """ggml packed bytes -> GroupQuant (host-side, one-time at load)."""
    from .repack import _decode_codes_scales, _f16

    dtype = DataType(dtype)
    n, k = shape
    raw = np.ascontiguousarray(raw, np.uint8)
    if dtype in EXACT_PLANE:
        from ..formats import quants as nq

        bbytes = 144 if dtype == DataType.Q4_K else 176
        blk = raw.reshape(n, -1, bbytes)
        nb = blk.shape[1]
        d = _f16(blk[:, :, 0:2]).reshape(n, nb).astype(np.float32)
        dmin = _f16(blk[:, :, 2:4]).reshape(n, nb).astype(np.float32)
        sc8, mn8 = nq._k4_unpack_scales(
            np.ascontiguousarray(blk[:, :, 4:16]).reshape(-1, 12)
        )
        q, _, _, gs = _decode_codes_scales(raw, shape, dtype)
        return GroupQuant(
            codes=jnp.asarray(q.astype(np.int8)),
            sc6=jnp.asarray(sc8.reshape(n, nb * J).T.copy()),
            mn6=jnp.asarray(mn8.reshape(n, nb * J).T.copy()),
            d=jnp.asarray(d.T.copy()),
            dmin=jnp.asarray(dmin.T.copy()),
            a=None, b=None, dtype=dtype, n_in=k, group_size=gs,
        )
    q, scales, mins, gs = _decode_codes_scales(raw, shape, dtype)
    # q6_k/q3_k codes carry a zero offset folded into mins via the identity
    # w = sc*(q - z) = sc*q - sc*z; _decode_codes_scales already returns
    # mins = sc*z, so B = -mins and signed i8 storage of q is exact
    return GroupQuant(
        codes=jnp.asarray(q.astype(np.int8)),
        sc6=None, mn6=None, d=None, dmin=None,
        a=jnp.asarray(scales.astype(np.float32).T.copy(), jnp.bfloat16),
        b=jnp.asarray((-mins).astype(np.float32).T.copy(), jnp.bfloat16),
        dtype=dtype, n_in=k, group_size=gs,
    )


# formats whose raw codes fit 4 / 5 / 6 bits.  The 4/5-bit formats have
# group_size 32 (chunk 256: half-chunk = 128 lanes, vreg-aligned); q6_k
# has group_size 16 (chunk 128) — its slices are 64-lane, still legal,
# and pad_k_chunks aligns the K tiles either way.
PACK4 = frozenset({DataType.Q4_0, DataType.Q4_1, DataType.Q4_K})
PACK5 = frozenset({DataType.Q5_0, DataType.Q5_1, DataType.Q5_K})
PACK6 = frozenset({DataType.Q6_K})

# stored hb-plane bytes per logical K column: 1 bit/code (p5) packs 8
# codes/byte, 2 bits/code (p6) packs 4
HB_DIV = {"p5": 8, "p6": 4}


def packable(dtype: DataType) -> bool:
    d = DataType(dtype)
    return d in PACK4 or d in PACK5 or d in PACK6


# Engine-set residency override (engine.resolve_llm_quant_mode): None =
# packed by default (standalone loader use keeps the densest storage);
# False when the UNPACKED codes fit the configuration — unpacked decodes
# measurably faster (round-5 same-session A/B: 41.5 vs 38.8 tok/s at 13B;
# the in-kernel unpack + extra bit-plane dot cost more than the 28% byte
# saving returns) — True when packing is what makes exact gq fit.  The
# env var always wins over this.
PACK_OVERRIDE: bool | None = None


def pack_enabled() -> bool:
    """Single source of truth for the sub-byte packing decision, read at
    CALL time: loader (models/params), gate, auto-resolver and benchmark
    must all see the same value when a test monkeypatches the env mid-
    process (ADVICE r4 #3: benchmark.py cached it at import).
    Precedence: MINIGPT4_TPU_GQ_PACK env var > PACK_OVERRIDE > packed."""
    import os

    v = os.environ.get("MINIGPT4_TPU_GQ_PACK")
    if v is not None:
        return v != "0"
    if PACK_OVERRIDE is not None:
        return PACK_OVERRIDE
    return True


def pack_codes(w: GroupQuant) -> GroupQuant:
    """Sub-byte code storage: i8 codes [N, K] -> nibble-packed [N, K/2]
    (+ a hi-bit plane [N, K/8] for 5-bit formats, [N, K/4] for 6-bit).

    Decode stays EXACT — the kernel reassembles the identical integer codes
    — but the weight stream shrinks from 1 B to 0.5 B (p4) / 0.625 B (p5) /
    0.75 B (p6) per element, which is the whole decode-time story on an
    HBM-bound chip.  Layout is chunk-local so every kernel/TP slice
    boundary stays aligned (chunk = J*gs; 256 for gs-32, 128 for q6_k):

      * nibbles: byte ``s*h + j`` = lo4(code[s*chunk+j]) | lo4(code[s*chunk+h+j]) << 4
        (h = chunk/2)
      * p5 hi bits: byte ``s*32 + j`` bit ``t``      = bit4(code[s*256 + 32t + j])
      * p6 hi bits: byte ``s*32 + j`` bits ``2t+1:2t`` = bits5:4(code[s*128 + 32t + j])

    In-kernel unpack is i32-granularity shift/mask via width-changing
    ``pltpu.bitcast`` — Mosaic cannot legalize sub-i32 vector shifts (same
    trick as ops/flash_decode.py's f8 rebias), so the VPU cost is ~2 ops
    per 4 weights, far below the per-element bf16 staging this module
    exists to avoid.  Host-side numpy; one-time at load.  No-op for
    non-packable formats.
    """
    if w.packing != "none" or not packable(w.dtype):
        return w
    if w.k_shards != 1:
        raise ValueError("pack_codes must run before with_k_shards")
    chunk = J * w.group_size
    c = np.asarray(w.codes).astype(np.uint8)  # codes are 0..63: lossless
    k = c.shape[-1]
    if k % chunk:
        return w
    lead = c.shape[:-1]
    cc = c.reshape(*lead, k // chunk, chunk)
    half = chunk // 2
    lo4 = cc & 0xF
    nib = (lo4[..., :half] | (lo4[..., half:] << 4)).astype(np.int8)
    mode = ("p4" if w.dtype in PACK4 else
            "p5" if w.dtype in PACK5 else "p6")
    hb = None
    if mode == "p5":
        bits = ((cc >> 4) & 1).reshape(*lead, k // chunk, 8, chunk // 8)
        weights = (1 << np.arange(8, dtype=np.uint8)).reshape(8, 1)
        hbb = (bits * weights).sum(axis=-2).astype(np.int8)
        hb = jnp.asarray(hbb.reshape(*lead, k // 8))
    elif mode == "p6":
        # 2-bit fields: 4 per byte, field t of byte s*32+j holds bits 5:4
        # of chunk-local column 32t + j (chunk = 128 for gs 16)
        f2 = ((cc >> 4) & 0x3).reshape(*lead, k // chunk, 4, chunk // 4)
        weights = (1 << (2 * np.arange(4, dtype=np.uint8))).reshape(4, 1)
        hbb = (f2 * weights).sum(axis=-2).astype(np.int8)
        hb = jnp.asarray(hbb.reshape(*lead, k // 4))
    return pad_k_chunks(GroupQuant(
        jnp.asarray(nib.reshape(*lead, k // 2)), w.sc6, w.mn6, w.d, w.dmin,
        w.a, w.b, w.dtype, w.n_in, w.group_size, w.k_shards,
        hb=hb, packing=mode,
    ))


def pad_k_chunks(w: GroupQuant) -> GroupQuant:
    """Append zero-valued groups so the stored chunk count is a multiple of
    1024/chunk (i.e. stored K a multiple of 1024 columns).

    Why: the p5/p6 prefill kernels tile K on the grid, and Mosaic requires
    the hi-bit plane block's lane width (tk//8 or tk//4 bytes) to be a
    multiple of 128 — so tk must be a multiple of 1024 (p5; 512 suffices
    for p6 but 1024 keeps one rule).  Without padding NO such tile divides
    the 13B Ks (5120 -> 160-col blocks, 13824 -> 192; the round-4 bench
    crash) or 7B's 11008.  A zero chunk (codes 0, A 0, B 0) contributes
    exactly 0 to every output, so ggml bit-exactness is preserved; cost is
    <= 3.7% extra weight bytes at K=13824 (w2), 0 at K∈{4096, 5120}.
    """
    if w.packing not in HB_DIV:
        return w
    chunk = J * w.group_size
    mult = max(1, 1024 // chunk)
    nch = w.k_stored // chunk
    pad_ch = -nch % mult
    if pad_ch == 0:
        return w
    pk = pad_ch * chunk

    def pad_cols(p, cols):  # codes-like [..., N, C]
        if p is None:
            return None
        return jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, cols)])

    def pad_rows(p, rows):  # plane-like [..., R, N]
        if p is None:
            return None
        return jnp.pad(p, [(0, 0)] * (p.ndim - 2) + [(0, rows), (0, 0)])

    return GroupQuant(
        codes=pad_cols(w.codes, pk // 2),
        sc6=pad_rows(w.sc6, pad_ch * J), mn6=pad_rows(w.mn6, pad_ch * J),
        d=pad_rows(w.d, pad_ch), dmin=pad_rows(w.dmin, pad_ch),
        a=pad_rows(w.a, pad_ch * J), b=pad_rows(w.b, pad_ch * J),
        dtype=w.dtype, n_in=w.n_in, group_size=w.group_size,
        k_shards=w.k_shards, hb=pad_cols(w.hb, pk // HB_DIV[w.packing]),
        packing=w.packing, k_pad=w.k_pad + pk,
    )


def _strip_k_pad(w: GroupQuant) -> GroupQuant:
    """Drop the trailing pad_k_chunks zero groups (pad sits at the stored
    END, so slicing restores the exact pre-pad arrays)."""
    if w.k_pad == 0:
        return w
    kl = w.k_logical
    gl = kl // w.group_size
    sbl = kl // (J * w.group_size)

    def cols(p, c):
        return None if p is None else p[..., :c]

    def rows(p, r):
        return None if p is None else p[..., :r, :]

    return GroupQuant(
        codes=cols(w.codes, kl // 2), sc6=rows(w.sc6, gl),
        mn6=rows(w.mn6, gl), d=rows(w.d, sbl), dmin=rows(w.dmin, sbl),
        a=rows(w.a, gl), b=rows(w.b, gl), dtype=w.dtype, n_in=w.n_in,
        group_size=w.group_size, k_shards=w.k_shards,
        hb=(None if w.hb is None else w.hb[..., :kl // HB_DIV[w.packing]]),
        packing=w.packing, k_pad=0,
    )


def supported(dtype: DataType, k: int) -> bool:
    from .repack import REPACKABLE

    dtype = DataType(dtype)
    if dtype not in REPACKABLE:
        return False
    gs = 16 if dtype in (DataType.Q2_K, DataType.Q3_K, DataType.Q6_K) else 32
    return k % (J * gs) == 0


def split_activations(x, s1=None):
    """[M, K] f32 -> (x1 i8, x2 i8, s1 [M,1], s2 [M,1]); x ~= s1*x1 + s2*x2.

    ``s1``: externally computed first-level scales (the K-sharded TP path
    passes the GLOBAL row absmax so every shard splits on the same grid)."""
    if s1 is None:
        ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s1 = jnp.where(ax == 0, 1.0, ax / 127.0)
    x1 = jnp.clip(jnp.round(x / s1), -127, 127).astype(jnp.int8)
    r = x - s1 * x1.astype(jnp.float32)
    s2 = s1 / 128.0
    x2 = jnp.clip(jnp.round(r / s2), -127, 127).astype(jnp.int8)
    return x1, x2, s1, s2


def build_xg(x1, x2, gs: int):
    """Group-masked activation rows [16*M, K] i8: row 16m+j carries x1[m]
    masked to chunk-local group j (j < 8), row 16m+8+j carries x2[m]."""
    m, k = x1.shape
    gj = ((jnp.arange(k) // gs) % J)[None, :]           # [1, K]
    rows = jnp.arange(2 * J)[:, None]                    # [16, 1]
    sel = rows % J == gj                                 # [16, K]
    lo = jnp.where(sel[:J], x1[:, None, :], 0)
    hi = jnp.where(sel[J:], x2[:, None, :], 0)
    return jnp.concatenate([lo, hi], axis=1).reshape(m * 2 * J, k).astype(jnp.int8)


def _combine(c, sct, bt, sgt_blk, s12_ref, m, o_acc):
    """Shared per-chunk combine: c [16M, TN] i32 partials, sct/bt [8, TN]
    f32 scale/offset rows, sgt_blk [8, M] true-x group sums."""
    for mm in range(m):
        c1 = c[mm * 16:mm * 16 + J].astype(jnp.float32)
        c2 = c[mm * 16 + J:mm * 16 + 2 * J].astype(jnp.float32)
        t = c1 * s12_ref[mm, 0] + c2 * s12_ref[mm, 1]
        o_acc[mm] += jnp.sum(t * sct + sgt_blk[:, mm:mm + 1] * bt,
                             axis=0, keepdims=True)


def _unpack_nibbles(pk):
    """Nibble-packed [TN, H] i8 -> (lo, hi) [TN, H] i8, codes 0..15 each.

    Bit ops run at i32 granularity (4 bytes per op) via width-changing
    ``pltpu.bitcast`` — Mosaic cannot legalize sub-i32 vector shifts, and
    the word layout packs 4 consecutive lanes little-endian, so masking
    0x0F0F0F0F touches exactly the per-byte low nibbles."""
    from jax.experimental.pallas import tpu as pltpu

    v = pltpu.bitcast(pk, jnp.int32)
    lo = pltpu.bitcast(v & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast((v >> 4) & 0x0F0F0F0F, jnp.int8)
    return lo, hi


def _unpack_hibits(hb):
    """p5 bit plane [TN, K/8] i8 -> 8 streams [TN, K/8] i8 of 0/1.

    Stream t, byte b holds bit4 of the code at chunk-local column
    ``32t + (b % 32)`` of chunk ``b // 32`` (the pack_codes layout)."""
    from jax.experimental.pallas import tpu as pltpu

    v = pltpu.bitcast(hb, jnp.int32)
    return [pltpu.bitcast((v >> t) & 0x01010101, jnp.int8) for t in range(8)]


def _unpack_hi2bits(hb):
    """p6 2-bit plane [TN, K/4] i8 -> 4 streams [TN, K/4] i8 of 0..3.

    Stream t, byte b holds bits 5:4 of the code at chunk-local column
    ``32t + (b % 32)`` of chunk ``b // 32``."""
    from jax.experimental.pallas import tpu as pltpu

    v = pltpu.bitcast(hb, jnp.int32)
    return [pltpu.bitcast((v >> (2 * t)) & 0x03030303, jnp.int8)
            for t in range(4)]


def _prep_codes(c_ref, hb_ref, packing, rd):
    """Hoist the whole-block unpack out of the chunk loop; returns the
    tuple _chunk_partial slices from."""
    if packing == "none":
        return (rd(c_ref),)
    lo, hi = _unpack_nibbles(rd(c_ref))
    if packing == "p4":
        return (lo, hi)
    if packing == "p5":
        return (lo, hi, _unpack_hibits(rd(hb_ref)))
    return (lo, hi, _unpack_hi2bits(rd(hb_ref)))


def _chunk_partial(xg_ref, cs, s, chunk, packing):
    """[16M, TN] i32 group partials for chunk ``s`` — the exact integer dot
    of the chunk's codes against the group-masked activation rows."""
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    a0 = s * chunk
    if packing == "none":
        return dot(xg_ref[:, a0:a0 + chunk], cs[0][:, a0:a0 + chunk])
    half = chunk // 2
    h0 = s * half
    # nibble halves are chunk columns [0, half) and [half, chunk)
    c = dot(xg_ref[:, a0:a0 + half], cs[0][:, h0:h0 + half])
    c += dot(xg_ref[:, a0 + half:a0 + chunk], cs[1][:, h0:h0 + half])
    if packing in HB_DIV:
        sb = chunk // HB_DIV[packing]
        b0 = s * sb
        hi_codes = jnp.concatenate([st[:, b0:b0 + sb] for st in cs[2]],
                                   axis=1)  # [TN, chunk], col 32t+j
        c += 16 * dot(xg_ref[:, a0:a0 + chunk], hi_codes)
    return c


def _kernel_exact(xg_ref, c_ref, *refs, k, m, gs, packing):
    if packing in HB_DIV:
        hb_ref, sc6_ref, mn6_ref, d_ref, dm_ref, sgt_ref, s12_ref, o_ref = refs
    else:
        hb_ref = None
        sc6_ref, mn6_ref, d_ref, dm_ref, sgt_ref, s12_ref, o_ref = refs
    chunk = J * gs
    tn = c_ref.shape[-2]

    def rd(ref):  # drop the stacked layer dim if present
        return ref[0] if len(ref.shape) == 3 else ref[...]

    cs = _prep_codes(c_ref, hb_ref, packing, rd)
    acc = [jnp.zeros((1, tn), jnp.float32) for _ in range(m)]
    for s in range(k // chunk):
        c = _chunk_partial(xg_ref, cs, s, chunk, packing)  # [16M, TN] i32
        d = rd(d_ref)[s:s + 1, :]        # [1, TN] f32
        dm = rd(dm_ref)[s:s + 1, :]
        # Mosaic cannot lower u8 -> f32 directly; widen through i32 (exact)
        sc6 = rd(sc6_ref)[s * J:(s + 1) * J, :].astype(jnp.int32)
        mn6 = rd(mn6_ref)[s * J:(s + 1) * J, :].astype(jnp.int32)
        sct = sc6.astype(jnp.float32) * d
        bt = mn6.astype(jnp.float32) * (-dm)
        _combine(c, sct, bt, sgt_ref[s * J:(s + 1) * J, :], s12_ref, m, acc)
    for mm in range(m):
        o_ref[mm, :] = acc[mm][0]


def _kernel_generic(xg_ref, c_ref, *refs, k, m, gs, packing):
    if packing in HB_DIV:
        hb_ref, a_ref, b_ref, sgt_ref, s12_ref, o_ref = refs
    else:
        hb_ref = None
        a_ref, b_ref, sgt_ref, s12_ref, o_ref = refs
    chunk = J * gs
    tn = c_ref.shape[-2]

    def rd(ref):
        return ref[0] if len(ref.shape) == 3 else ref[...]

    cs = _prep_codes(c_ref, hb_ref, packing, rd)
    acc = [jnp.zeros((1, tn), jnp.float32) for _ in range(m)]
    for s in range(k // chunk):
        c = _chunk_partial(xg_ref, cs, s, chunk, packing)
        sct = rd(a_ref)[s * J:(s + 1) * J, :].astype(jnp.float32)
        bt = rd(b_ref)[s * J:(s + 1) * J, :].astype(jnp.float32)
        _combine(c, sct, bt, sgt_ref[s * J:(s + 1) * J, :], s12_ref, m, acc)
    for mm in range(m):
        o_ref[mm, :] = acc[mm][0]


import os as _os

TN = int(_os.environ.get("MINIGPT4_TPU_GQ_TN", "256"))
# prefill (M > GQ_MAX_M) output-tile width.  The (m, n, k-innermost) grid
# re-fetches the [TM, TK] x block on every n step, so activation traffic
# scales with N/TN — at the default TN=256 it is 2-4x the codes bytes at
# 13B (w13: 566 MB of x re-streaming vs 141 MB of codes).  TN=1024 was
# measured uniformly ~25% faster than 256 at every 13B shape, M=512
# (87-88 -> 116-119 TF/s, same session, tools/sweep_prefill_tn.py);
# prefill_plan still shrinks it in 128-lane steps when VMEM requires.
PREFILL_TN = int(_os.environ.get("MINIGPT4_TPU_GQ_PREFILL_TN", "1024"))


def _interpret() -> bool:
    """interpret=True off-TPU (semantics tests) — except when
    MINIGPT4_TPU_FORCE_MOSAIC=1, which forces the real Mosaic TPU lowering
    so the CPU-runnable BlockSpec-legality suite
    (tests/test_blockspec_legality.py) can catch illegal blocks without a
    TPU: the round-4 bench crash (every 13B K illegal for the packed
    prefill bit-plane) was invisible to 351 green CPU tests because
    interpret mode bypasses Mosaic's checks entirely."""
    if _os.environ.get("MINIGPT4_TPU_FORCE_MOSAIC") == "1":
        return False
    return jax.default_backend() != "tpu"


def decode_plan(k: int, m: int, gs: int, exact: bool, packing: str,
                tn: int) -> int:
    """tn for the decode kernel, shrunk until the per-grid-step VMEM
    footprint fits the ~16 MB scoped limit.  Exposed (like prefill_plan)
    so the legality/VMEM tests can reason about the actual tiles.

    Footprint: double-buffered codes/hb/plane blocks + the grid-constant
    xg block + the hoisted unpack temporaries (_prep_codes: lo+hi ~tn*k,
    hb streams ~tn*k for p5/p6).  Calibrated against measured fits: q5_k
    K=14336 M=8 at tn=256 is 14.5 MB (compiles), q6_k same shape is
    16.6 MB (overflowed scoped vmem by 72 KB before this shrink)."""
    g = k // gs
    sbk = k // (J * gs)

    def est(tn_):
        kc = k // (2 if packing != "none" else 1)
        hb = tn_ * (k // HB_DIV[packing]) if packing in HB_DIV else 0
        planes = (2 * g * tn_ + 2 * sbk * tn_ * 4 if exact
                  else 2 * g * tn_ * 2)
        temps = (tn_ * k if packing != "none" else 0) + \
            (tn_ * k if packing in HB_DIV else 0)
        return (2 * (tn_ * kc + hb + planes) + 16 * m * k + temps
                + 2 * m * tn_ * 4 + g * m * 4)
    # shrink in 128-lane steps: halving a legal non-power-of-two TN (384)
    # would yield a Mosaic-illegal lane width (192), and 64-wide blocks are
    # illegal whenever N > 64 — 128 is the floor AND the step
    while est(tn) > 15_500_000 and tn > 128:
        tn = max(128, (tn - 128) // 128 * 128)
    return tn


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "tn"))
def _run(xg, sgt, s12, planes, layer, *, meta, interpret=False, tn=None):
    """``layer``: [1] i32 array selecting the stacked-L slice, or None for
    flat planes.  The layer index rides in as a SCALAR-PREFETCH operand
    (pltpu.PrefetchScalarGridSpec) consumed only by the BlockSpec index
    maps, so all 40 decode layers share ONE Mosaic program per shape —
    the previous static-layer BlockSpecs specialized the kernel per layer
    and made a cold 13B engine build pay 4 shapes x n_layer Mosaic
    compiles (the round-3 multi-minute cold-start pathology)."""
    k, n_out, m, gs, exact, packing = meta
    tn = decode_plan(k, m, gs, exact, packing, tn or TN)
    g = k // gs
    sbk = k // (J * gs)  # superblock rows in d/dmin planes
    n_pad = -(-n_out // tn) * tn
    codes = planes[0]
    stacked = codes.ndim == 3
    grid = (n_pad // tn,)
    kc = codes.shape[-1]  # stored code columns (K/2 when nibble-packed)

    def nk_spec(cols):  # codes/bit-plane [(L,) N, cols]
        if stacked:
            return pl.BlockSpec((1, tn, cols), lambda ni, li: (li[0], ni, 0))
        return pl.BlockSpec((tn, cols), lambda ni: (ni, 0))

    def gn_spec(rows):  # planes [(L,) rows, N]
        if stacked:
            return pl.BlockSpec((1, rows, tn), lambda ni, li: (li[0], 0, ni))
        return pl.BlockSpec((rows, tn), lambda ni: (0, ni))

    def fix(im):  # broadcast specs: index map arity grows with prefetch
        return (lambda ni, li: im(ni)) if stacked else im

    code_specs = [nk_spec(kc)]
    code_bytes = n_pad * kc
    if packing in HB_DIV:
        code_specs.append(nk_spec(k // HB_DIV[packing]))
        code_bytes += n_pad * (k // HB_DIV[packing])
    plane_specs = ([gn_spec(g), gn_spec(g), gn_spec(sbk), gn_spec(sbk)]
                   if exact else [gn_spec(g), gn_spec(g)])
    kern = _kernel_exact if exact else _kernel_generic
    kern_fn = functools.partial(kern, k=k, m=m, gs=gs, packing=packing)
    in_specs = [
        pl.BlockSpec((16 * m, k), fix(lambda ni: (0, 0))),
        *code_specs,
        *plane_specs,
        pl.BlockSpec((g, m), fix(lambda ni: (0, 0))),
        pl.BlockSpec((m, 2), fix(lambda ni: (0, 0))),
    ]
    out_specs = pl.BlockSpec((m, tn), fix(lambda ni: (0, ni)))
    out_shape = jax.ShapeDtypeStruct((m, n_pad), jnp.float32)
    cost = pl.CostEstimate(
        flops=2 * 16 * m * k * n_pad,
        bytes_accessed=code_bytes + 16 * m * k + 3 * n_pad * g,
        transcendentals=0,
    )
    if stacked:
        out = pl.pallas_call(
            lambda li_ref, *refs: kern_fn(*refs),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=in_specs, out_specs=out_specs,
            ),
            out_shape=out_shape, cost_estimate=cost, interpret=interpret,
        )(layer, xg, *planes, sgt, s12)
    else:
        out = pl.pallas_call(
            kern_fn, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, cost_estimate=cost, interpret=interpret,
        )(xg, *planes, sgt, s12)
    return out[:, :n_out]


# M <= GQ_MAX_M rides the group-i8 kernel (16M rows <= 128 keeps the dot a
# single MXU pass); larger M dequantizes and runs dense (prefill-bound work)
GQ_MAX_M = 8


def _expand_ab(plane_blk, e8):
    """[8, TN] per-chunk plane rows -> [TN, chunk] per-element values via a
    tiny MXU contraction against the constant 0/1 group-expansion matrix
    (dodges Mosaic transposes, which the transposed plane layout would
    otherwise need here)."""
    return jax.lax.dot_general(
        plane_blk, e8, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, chunk]


def _prefill_chunk_codes(cs, s, chunk, packing):
    """[TN, chunk] i8 logical codes for chunk ``s`` of the current K tile
    (prefill dequantizes per element, so packed codes are reassembled)."""
    if packing == "none":
        return cs[0][:, s * chunk:(s + 1) * chunk]
    half = chunk // 2
    h0 = s * half
    codes = jnp.concatenate(
        [cs[0][:, h0:h0 + half], cs[1][:, h0:h0 + half]], axis=1)
    if packing in HB_DIV:
        sb = chunk // HB_DIV[packing]
        b0 = s * sb
        hi = jnp.concatenate([st[:, b0:b0 + sb] for st in cs[2]], axis=1)
        # Mosaic has no vector<i8> arith — widen to i32 (caller casts to f32)
        codes = codes.astype(jnp.int32) + hi.astype(jnp.int32) * 16
    return codes


def _kernel_prefill(x_ref, c_ref, *refs, tk, gs, exact, packing):
    """M > 8 path: per-tile dequantize (VPU) + dense bf16 MXU dot.
    (hb_ref present for the hi-bit-plane packings p5/p6.)

    Grid is (m, n, k) with k INNERMOST and the [TM, TN] f32 output block
    resident across the k sweep (init at ki == 0, accumulate after), so
    each weight element is dequantized exactly once per M tile — and the
    engine's prefill buckets cap at 512 rows, which one M tile covers.
    The previous single-K-block layout re-ran the whole VPU dequant for
    every M tile (4x at M=512: measured 462 ms vs w8a8's 180 ms for a
    512-token 13B prefill).  x_ref [TM, TK] bf16; codes [(1,)TN, TK];
    plane blocks are the K-tile's rows."""
    chunk = J * gs
    hb_ref = None
    if packing in HB_DIV:
        hb_ref, *refs = refs
    if exact:
        sc6_ref, mn6_ref, d_ref, dm_ref, o_ref = refs
    else:
        a_ref, b_ref, o_ref = refs
    ki = pl.program_id(2)

    def rd(ref):
        return ref[0] if len(ref.shape) == 3 else ref[...]

    def rd2(ref):
        # plane blocks arrive as [(1,) 1, rows, TN] (host-side reshape to
        # [(L,) KT, rows, N] keeps Mosaic's sublane-divisibility rule: the
        # rows dim is taken whole) -> [rows, TN]
        v = ref[...]
        return v.reshape(v.shape[-2], v.shape[-1])

    code_planes = _prep_codes(c_ref, hb_ref, packing, rd)
    tn = c_ref.shape[-2]
    tm = x_ref.shape[0]
    # constant group-expansion matrix E8[j, l] = (l // gs == j)
    e8 = (jax.lax.broadcasted_iota(jnp.int32, (J, chunk), 1) // gs
          == jax.lax.broadcasted_iota(jnp.int32, (J, chunk), 0)
          ).astype(jnp.float32)
    acc = jnp.zeros((tm, tn), jnp.float32)
    for s in range(tk // chunk):
        cs = slice(s * chunk, (s + 1) * chunk)
        if exact:
            d = rd2(d_ref)[s:s + 1, :]
            dm = rd2(dm_ref)[s:s + 1, :]
            sct = rd2(sc6_ref)[s * J:(s + 1) * J, :].astype(jnp.int32
                                                            ).astype(jnp.float32) * d
            bt = rd2(mn6_ref)[s * J:(s + 1) * J, :].astype(jnp.int32
                                                           ).astype(jnp.float32) * (-dm)
        else:
            sct = rd2(a_ref)[s * J:(s + 1) * J, :].astype(jnp.float32)
            bt = rd2(b_ref)[s * J:(s + 1) * J, :].astype(jnp.float32)
        a_e = _expand_ab(sct, e8)  # [TN, chunk]
        b_e = _expand_ab(bt, e8)
        ch_codes = _prefill_chunk_codes(code_planes, s, chunk, packing)
        dense = (ch_codes.astype(jnp.float32) * a_e + b_e
                 ).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            x_ref[:, cs], dense, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(ki > 0)
    def _acc():
        o_ref[...] += acc


def prefill_plan(k: int, m: int, gs: int, packing: str, tn: int
                 ) -> tuple[int, int, int]:
    """(tm, tn, tk) tile plan for the prefill kernel — pure arithmetic,
    exposed so tests/test_blockspec_legality.py and the engine's VMEM
    estimators can reason about the ACTUAL tiles.

    K tile: the largest chunk-multiple divisor of K within ~2 KB/row — k
    becomes a grid dimension (innermost) so one M tile can cover the whole
    prefill bucket within VMEM and the dequant runs once.  p5 ties the
    bit-plane block's lane width to tk//8, which Mosaic requires be a
    128-multiple -> tk must be a 1024-multiple (pad_k_chunks guarantees
    such a divisor exists; every 13B K violated this in round 4).  The
    full-K fallback is always block-legal (width equal to the array dim)
    but forces small tm — padding exists so it never triggers on engine
    shapes."""
    chunk = J * gs
    n_chunks = k // chunk
    cand = [c for c in range(1, n_chunks + 1)
            if n_chunks % c == 0 and c * chunk <= 2048
            and (packing not in HB_DIV or (c * chunk) % 1024 == 0)]
    tk = (max(cand) if cand else n_chunks) * chunk
    tm = min(512, -(-m // 8) * 8)

    # VMEM budget: Mosaic double-buffers the x / codes / bit-plane blocks;
    # shrink TM then TN until blocks + acc/out + the hoisted unpack
    # temporaries (_prep_codes: lo+hi nibbles ~tn*tk, 8 hb streams ~tn*tk
    # for p5) + chunk temps fit scoped VMEM
    cb = tk // (2 if packing != "none" else 1)  # codes block cols
    hb_cols = tk // HB_DIV[packing] if packing in HB_DIV else 0
    unpack_tmp = {"none": 0, "p4": tk, "p5": 2 * tk, "p6": 2 * tk}[packing]

    def est(tm_, tn_):
        return (2 * (tm_ * tk * 2 + tn_ * (cb + hb_cols))
                + tn_ * unpack_tmp + 2 * tm_ * tn_ * 4
                + tn_ * chunk * (6 if packing in HB_DIV else 2)
                + 3 * tn_ * tk // gs)
    # shrink TN before TM (128-lane steps, not halving — see decode_plan:
    # 384//2 = 192 would be a Mosaic-illegal lane width): halving tm re-runs
    # the whole per-element dequant once per extra M tile (the measured
    # 462 ms pathology), while narrower tn only adds x-block re-fetches.
    # TN floors at 256 first so a large PREFILL_TN start (p5 at tk=2048
    # would need ~17 MB at tn=1024) degrades toward the measured-good
    # (tm=512, tn=256) plans instead of collapsing tm to 64.
    while est(tm, tn) > 11_500_000 and tn > 256:
        tn = max(256, (tn - 128) // 128 * 128)
    while est(tm, tn) > 11_500_000 and tm > 64:
        tm //= 2
    while est(tm, tn) > 11_500_000 and tn > 128:
        tn = max(128, (tn - 128) // 128 * 128)
    return tm, tn, tk


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "tn"))
def _run_prefill(x, planes, layer, *, meta, interpret=False, tn=None):
    """Pallas prefill matmul for M > 8.

    Why a kernel and not XLA dequant+dot: a whole-tensor dequantize inside
    an unrolled 40-layer prefill lets XLA keep every layer's dense
    expansion alive at once (measured 26 GB of HBM temps), and both the
    per-layer dynamic_index_in_dim and a lax.scan-over-row-blocks rewrite
    forced a LAYOUT-CONVERSION COPY of the full 12.9 GB stacked codes
    (XLA assigns the dot's preferred parameter layout).  The kernel reads
    the codes in their storage layout, once."""
    k, n_out, m, gs, exact, packing = meta
    tm, tn, tk = prefill_plan(k, m, gs, packing, tn or PREFILL_TN)
    chunk = J * gs
    m_pad = -(-m // tm) * tm
    n_pad = -(-n_out // tn) * tn
    g_t = tk // gs
    sbk_t = tk // chunk
    codes = planes[0]
    stacked = codes.ndim == 3
    xp = jnp.zeros((m_pad, k), jnp.bfloat16).at[:m].set(x.astype(jnp.bfloat16))
    # grid (m, n, k): k innermost (output block accumulates in place); for
    # the engine's <= 512-row prefill buckets m is a single tile, so every
    # weight element is fetched AND dequantized exactly once
    grid = (m_pad // tm, n_pad // tn, k // tk)

    def nk_spec(cols):  # codes/bit-plane [(L,) N, cols-per-K-tile * KT]
        if stacked:
            # layer rides in as a scalar-prefetch operand (see _run): one
            # Mosaic program serves every stacked layer
            return pl.BlockSpec((1, tn, cols),
                                lambda mi, ni, ki, li: (li[0], ni, ki))
        return pl.BlockSpec((tn, cols), lambda mi, ni, ki: (ni, ki))

    # Planes reshape (free — contiguous) to [(L,) KT, rows, N] so each
    # block takes the rows dim WHOLE: Mosaic requires the block's
    # second-to-last dim be 8-divisible or full, and per-K-tile row counts
    # (e.g. 5 superblocks at TK=1280) are neither when sliced from [SB, N]
    kt = k // tk

    def gn_reshape(p, rows):
        if stacked:
            return p.reshape(p.shape[0], kt, rows, p.shape[-1])
        return p.reshape(kt, rows, p.shape[-1])

    def gn_spec(rows):
        if stacked:
            return pl.BlockSpec((1, 1, rows, tn),
                                lambda mi, ni, ki, li: (li[0], ki, 0, ni))
        return pl.BlockSpec((1, rows, tn), lambda mi, ni, ki: (ki, 0, ni))

    if exact:
        plane_rows = [g_t, g_t, sbk_t, sbk_t]
    else:
        plane_rows = [g_t, g_t]
    n_code = 2 if packing in HB_DIV else 1  # codes (+ hi-bit plane)
    plane_args = [gn_reshape(p, r)
                  for p, r in zip(planes[n_code:], plane_rows)]
    plane_specs = [gn_spec(r) for r in plane_rows]
    code_specs = [nk_spec(tk // (2 if packing != "none" else 1))]
    code_bytes = n_pad * (k // (2 if packing != "none" else 1))
    if packing in HB_DIV:
        code_specs.append(nk_spec(tk // HB_DIV[packing]))
        code_bytes += n_pad * (k // HB_DIV[packing])
    kern_fn = functools.partial(_kernel_prefill, tk=tk, gs=gs, exact=exact,
                                packing=packing)

    def fix(im):
        return (lambda mi, ni, ki, li: im(mi, ni, ki)) if stacked else im

    in_specs = [
        pl.BlockSpec((tm, tk), fix(lambda mi, ni, ki: (mi, ki))),
        *code_specs,
        *plane_specs,
    ]
    out_specs = pl.BlockSpec((tm, tn), fix(lambda mi, ni, ki: (mi, ni)))
    out_shape = jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32)
    cost = pl.CostEstimate(
        flops=2 * m_pad * k * n_pad,
        bytes_accessed=code_bytes + m_pad * k * 2 + 3 * n_pad * (k // gs),
        transcendentals=0,
    )
    if stacked:
        out = pl.pallas_call(
            lambda li_ref, *refs: kern_fn(*refs),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=in_specs, out_specs=out_specs,
            ),
            out_shape=out_shape, cost_estimate=cost, interpret=interpret,
        )(layer, xp, *planes[:n_code], *plane_args)
    else:
        out = pl.pallas_call(
            kern_fn, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, cost_estimate=cost, interpret=interpret,
        )(xp, *planes[:n_code], *plane_args)
    return out[:m, :n_out]


def qmatmul_group(
    x: jnp.ndarray, w: GroupQuant, out_dtype=None, layer=None, x_scale=None,
    tn: int | None = None,
) -> jnp.ndarray:
    """x [..., K] @ w.T -> [..., N] with exact group-quant semantics.

    ``layer`` selects the stacked [L, ...] slice; int or traced i32 scalar
    — it feeds the kernels' scalar-prefetch operand, so the (unrolled)
    decode layer loop reuses one Mosaic program per shape.
    ``x_scale`` [..., 1] overrides the split's first-level scales (K-sharded
    TP passes the global row absmax)."""
    k = w.k_stored
    gs = w.group_size
    stacked = w.codes.ndim == 3
    if stacked and layer is None:
        raise ValueError("stacked GroupQuant requires a layer index")
    li_arr = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked else None)
    if w.k_shards != 1 and w.k_logical == w.n_in:
        raise ValueError(
            "k-sharded GroupQuant must be consumed shard-locally "
            "(row-parallel shard_map path); global use would mis-map scales"
        )
    code_planes = ((w.codes, w.hb) if w.packing in HB_DIV else (w.codes,))
    lead = x.shape[:-1]
    x2 = x.reshape(-1, w.k_logical)
    if w.k_pad:
        # zero x columns against the pad_k_chunks zero groups: both sides
        # of every padded product are 0, so the result is bit-identical
        x2 = jnp.pad(x2, ((0, 0), (0, w.k_pad)))
    m = x2.shape[0]
    if m > GQ_MAX_M:
        planes = (code_planes + ((w.sc6, w.mn6, w.d, w.dmin) if w.exact
                                 else (w.a, w.b)))
        y = _run_prefill(
            x2, planes, li_arr, meta=(k, w.n_out, m, gs, w.exact, w.packing),
            interpret=_interpret(), tn=tn,
        )
        return y.reshape(*lead, w.n_out).astype(out_dtype or x.dtype)

    xf = x2.astype(jnp.float32)
    x1, x2i, s1, s2 = split_activations(
        xf, None if x_scale is None else x_scale.reshape(-1, 1)
    )
    xg = build_xg(x1, x2i, gs)
    sgt = xf.reshape(m, k // gs, gs).sum(axis=2).T  # [G, M] true-x group sums
    s12 = jnp.concatenate([s1, s2], axis=1)
    planes = (code_planes + ((w.sc6, w.mn6, w.d, w.dmin) if w.exact
                             else (w.a, w.b)))
    interpret = _interpret()
    y = _run(
        xg, sgt, s12, planes, li_arr,
        meta=(k, w.n_out, m, gs, w.exact, w.packing), interpret=interpret,
        tn=tn,
    )
    return y.reshape(*lead, w.n_out).astype(out_dtype or x.dtype)


def with_k_shards(w: GroupQuant, k_shards: int) -> GroupQuant:
    """Re-layout for row-parallel TP: K splits into ``k_shards`` contiguous
    slices, each a self-consistent GroupQuant (codes [N, K/S], planes
    [G/S, N] / [SB/S, N]) stacked on a NEW leading axis the shard_map path
    consumes shard-locally (parallel/spmd.py)."""
    if w.codes.ndim != 2:
        raise ValueError("with_k_shards expects flat [N, K] planes")
    # split on the LOGICAL columns (pad is appended at the global end and
    # would land mid-shard); re-pad each shard after the split
    w = _strip_k_pad(w)
    k = w.k_stored
    chunk = J * w.group_size
    if k % (k_shards * chunk) != 0:
        raise ValueError(f"K={k} not splittable into {k_shards} chunk-aligned shards")
    ks = k // k_shards

    def split_nk(p, cols):  # [N, cols] -> [S, N, cols/S]; the chunk-local
        # pack layout keeps packed columns contiguous per K slice
        c = cols // k_shards
        return jnp.stack([p[:, i * c:(i + 1) * c] for i in range(k_shards)])

    def split_gn(p, rows):  # [rows, N] -> [S, rows/S, N]
        r = rows // k_shards
        return jnp.stack([p[i * r:(i + 1) * r] for i in range(k_shards)])

    g = k // w.group_size
    sbk = k // chunk
    return pad_k_chunks(GroupQuant(
        codes=split_nk(w.codes, w.codes.shape[-1]),
        sc6=None if w.sc6 is None else split_gn(w.sc6, g),
        mn6=None if w.mn6 is None else split_gn(w.mn6, g),
        d=None if w.d is None else split_gn(w.d, sbk),
        dmin=None if w.dmin is None else split_gn(w.dmin, sbk),
        a=None if w.a is None else split_gn(w.a, g),
        b=None if w.b is None else split_gn(w.b, g),
        dtype=w.dtype, n_in=w.n_in, group_size=w.group_size,
        k_shards=k_shards,
        hb=None if w.hb is None else split_nk(w.hb, w.hb.shape[-1]),
        packing=w.packing,
    ))


def shard_local(w: GroupQuant, idx: int | None = None) -> GroupQuant:
    """Inside shard_map each leaf arrives as [1, ...] (sharded on the lead
    axis); strip it back to a flat per-shard GroupQuant."""

    def pick(p):
        if p is None:
            return None
        return p[0] if idx is None else p[idx]

    return GroupQuant(
        pick(w.codes), pick(w.sc6), pick(w.mn6), pick(w.d), pick(w.dmin),
        pick(w.a), pick(w.b), w.dtype, w.n_in, w.group_size, 1,
        hb=pick(w.hb), packing=w.packing, k_pad=w.k_pad,
    )

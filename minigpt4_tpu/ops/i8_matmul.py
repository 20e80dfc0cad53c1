"""W8A8-style fused matmul: i8 codes fed DIRECTLY to the MXU.

EXPERIMENTAL opt-in (``quant_mode="w8a8"``).  The production fused kernel
(pallas_quant_matmul) expands packed codes to bf16 on the VPU before the MXU
can contract them — that VPU staging is the measured ~305 Ge/s plateau
(PERFORMANCE.md).  This path removes the VPU from the operand stream
entirely:

  * weights re-quantize ONCE at load to symmetric i8 codes with one f32
    scale per 256-wide superblock (``requantize_i8sb``) — reconstruction
    error is comparable to q5_k's (8-bit codes vs 5-bit codes + 32-group
    scales);
  * activations quantize per row to i8 (absmax / 127) in XLA;
  * the kernel contracts i8 x i8 -> i32 per 256-lane chunk on the MXU and
    applies the per-row superblock scale to each chunk's [TM, TN] partial
    (1/256th of the per-element cost);
  * the per-row activation scale applies once outside the kernel.

Measured (13B w2 shape, M=8, same session): 1.37x over the q5_k kernel in a
slow chip state where i8 saturated HBM — the gap widens with chip state.

CAVEAT (why this is opt-in, not the default): per-token absmax activation
quantization is vulnerable to LLaMA's activation outliers (the LLM.int8
problem) and cannot be quality-validated without real checkpoints.  Memory:
1 B/weight (~12.7 GB codes at 13B) vs q5_k's 0.75 — pair with
``cache_dtype="f8"`` on 16 GB parts.

Reference behavior replaced: ggml_mul_mat over quantized tensors
(/root/reference/minigpt4.cpp:2349-2350 drives it; kernels vendored via
CMakeLists.txt:318).
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

SB = 256  # superblock width (the MXU contraction chunk)


@jax.tree_util.register_pytree_node_class
@dataclass
class I8SBQuant:
    """Symmetric i8 weight with per-256-superblock f32 scales.

    codes [(L,) N, K] int8, scales [(L,) N, K/SB] float32; logically
    ``w[n, k] = codes[n, k] * scales[n, k // SB]``.
    """

    codes: jnp.ndarray
    scales: jnp.ndarray
    n_in: int  # static logical K

    def tree_flatten(self):
        return (self.codes, self.scales), (self.n_in,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def n_out(self) -> int:
        return self.codes.shape[-2]

    def dequantize(self, out_dtype=jnp.float32) -> jnp.ndarray:
        """[..., N, K] floats (XLA; jit-safe) — the fallback/test reference."""
        c = self.codes.astype(jnp.float32)
        s = jnp.repeat(self.scales, SB, axis=-1)
        return (c * s).astype(out_dtype)


def requantize_i8sb(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """f32 [N, K] -> (codes i8 [N, K], scales f32 [N, K/SB]); K % SB == 0."""
    n, k = values.shape
    v = values.reshape(n, k // SB, SB)
    s = np.abs(v).max(axis=2).astype(np.float32) / 127.0
    s = np.where(s == 0, np.float32(1.0), s)
    q = np.clip(np.rint(v / s[:, :, None]), -127, 127).astype(np.int8)
    return q.reshape(n, k), s


def from_ggml(
    raw: np.ndarray, shape: tuple[int, int], dtype: DataType, row_block: int = 1024,
    col_scale: np.ndarray | None = None, row_scale: np.ndarray | None = None,
) -> I8SBQuant:
    """Packed ggml bytes -> I8SBQuant, streaming ``row_block`` rows at a time
    (a 13B full-f32 intermediate would be ~50 GB; row blocks keep the host
    transient at ~K * row_block floats).

    ``col_scale`` [K] / ``row_scale`` [N]: smooth-quant migration factors
    folded into the weight before requantization — ``w'[n, k] =
    w[n, k] * col_scale[k] * row_scale[n]`` (quality.py computes them; the
    matching reciprocal lives in the producing norm / w3 rows)."""
    from ..formats.quants import dequantize_rows
    from ..formats.dtypes import row_bytes

    n_out, n_in = shape
    if n_in % SB:
        raise ValueError(f"K={n_in} not a multiple of the {SB} superblock")
    rb = row_bytes(dtype, n_in)
    raw = np.asarray(raw, np.uint8).reshape(n_out, rb)
    codes = np.empty((n_out, n_in), np.int8)
    scales = np.empty((n_out, n_in // SB), np.float32)
    cs = None if col_scale is None else np.asarray(col_scale, np.float32).reshape(1, n_in)
    rs = None if row_scale is None else np.asarray(row_scale, np.float32).reshape(n_out, 1)
    for r0 in range(0, n_out, row_block):
        r1 = min(r0 + row_block, n_out)
        vals = np.asarray(
            dequantize_rows(raw[r0:r1].reshape(-1), dtype, (r1 - r0, n_in)),
            np.float32,
        )
        if cs is not None:
            vals = vals * cs
        if rs is not None:
            vals = vals * rs[r0:r1]
        codes[r0:r1], scales[r0:r1] = requantize_i8sb(vals)
    return I8SBQuant(jnp.asarray(codes), jnp.asarray(scales), n_in)


def _rd(ref):
    v = ref[...]
    return v[0] if v.ndim == 3 else v


def _kernel(x_ref, c_ref, s_ref, o_ref, *, k):
    """One (n_tile, m_tile) program: chunked i8 MXU dots + per-chunk scale."""
    x = x_ref[...]  # [TM, K] i8
    sc = _rd(s_ref)  # [TN, G] f32
    tm = x.shape[0]
    tn = sc.shape[0]
    acc = jnp.zeros((tm, tn), jnp.float32)
    for g, c0 in enumerate(range(0, k, SB)):
        p = jax.lax.dot_general(
            x[:, c0 : c0 + SB], _sl(c_ref, c0, c0 + SB),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        )  # [TM, TN] i32, exact
        acc += p.astype(jnp.float32) * sc[:, g][None, :]
    o_ref[:] = acc


def _sl(ref, i0, i1):
    if len(ref.shape) == 3:
        return ref[0, :, i0:i1]
    return ref[:, i0:i1]


import os as _os

# output-tile width: 256 measured best at decode (M<=8) in round 1; env
# override for deployments, and a static kernel arg for in-session sweeps
# (tools/sweep_i8_tn.py — the shared chip's bandwidth drifts between
# sessions, so only same-process A/B comparisons are trustworthy)
TN = int(_os.environ.get("MINIGPT4_TPU_I8_TN", "256"))


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "tn"))
def _run(x_i8, codes, scales, layer, *, meta, interpret=False, tn=None):
    """``layer``: [1] i32 array (stacked) or None — a scalar-prefetch
    operand read only by the index maps, so every stacked layer shares one
    Mosaic program per shape (see group_i8._run)."""
    k, n_out = meta
    m = x_i8.shape[0]
    tm = 8 if m <= 8 else min(128, -(-m // 8) * 8)
    tn = tn or TN
    m_pad = -(-m // tm) * tm
    n_pad = -(-n_out // tn) * tn
    xp = jnp.zeros((m_pad, k), jnp.int8).at[:m].set(x_i8)
    g = k // SB

    stacked = codes.ndim == 3
    grid = (n_pad // tn, m_pad // tm)
    out_shape = jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32)
    cost = pl.CostEstimate(
        flops=2 * m_pad * k * n_pad,
        bytes_accessed=n_pad * k + n_pad * g * 4 + m_pad * k,
        transcendentals=0,
    )
    kern = functools.partial(_kernel, k=k)
    if stacked:
        in_specs = [
            pl.BlockSpec((tm, k), lambda ni, mi, li: (mi, 0)),
            pl.BlockSpec((1, tn, k), lambda ni, mi, li: (li[0], ni, 0)),
            pl.BlockSpec((1, tn, g), lambda ni, mi, li: (li[0], ni, 0)),
        ]
        out = pl.pallas_call(
            lambda li_ref, *refs: kern(*refs),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=pl.BlockSpec((tm, tn),
                                       lambda ni, mi, li: (mi, ni)),
            ),
            out_shape=out_shape, cost_estimate=cost, interpret=interpret,
        )(layer, xp, codes, scales)
    else:
        in_specs = [
            pl.BlockSpec((tm, k), lambda ni, mi: (mi, 0)),
            pl.BlockSpec((tn, k), lambda ni, mi: (ni, 0)),
            pl.BlockSpec((tn, g), lambda ni, mi: (ni, 0)),
        ]
        out = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda ni, mi: (mi, ni)),
            out_shape=out_shape, cost_estimate=cost, interpret=interpret,
        )(xp, codes, scales)
    return out[:m, :n_out]


def quantize_activations(
    x2: jnp.ndarray, sx: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[M, K] floats -> (i8 codes, [M, 1] f32 row scales), absmax symmetric.

    ``sx``: externally computed row scales (the K-sharded TP path passes the
    GLOBAL row absmax so every shard quantizes on the same grid and sharded
    output equals single-device output)."""
    xf = x2.astype(jnp.float32)
    if sx is None:
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        sx = jnp.where(sx == 0, 1.0, sx)
    x_i8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return x_i8, sx


def qmatmul_i8sb(
    x: jnp.ndarray, w: I8SBQuant, out_dtype=None, layer=None, x_scale=None,
    tn: int | None = None,
) -> jnp.ndarray:
    """x [..., K] @ w.T -> [..., N]: per-row i8 activation quant, chunked i8
    MXU contraction, scales applied per chunk (weights) and per row
    (activations).  ``layer`` (int or traced i32 scalar) selects the
    stacked [L, ...] slice via scalar prefetch.  ``x_scale`` [..., 1]
    overrides the row quantization scales (K-sharded TP passes the global
    absmax)."""
    k = w.codes.shape[-1]
    stacked = w.codes.ndim == 3
    if stacked and layer is None:
        raise ValueError("stacked I8SBQuant requires a layer index")
    if k % SB:
        # every shipped constructor guarantees K % SB == 0 (from_ggml and
        # requantize_i8sb raise/throw, load_quant_weight routes such weights
        # to the auto path, spmd row shards keep whole superblocks)
        raise ValueError(f"I8SBQuant K={k} is not a multiple of {SB}")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    x_i8, sx = quantize_activations(
        x2, None if x_scale is None else x_scale.reshape(-1, 1)
    )
    interpret = jax.default_backend() != "tpu"
    li_arr = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked else None)
    y = _run(
        x_i8, w.codes, w.scales, li_arr, meta=(k, w.n_out),
        interpret=interpret, tn=tn,
    )
    y = y * sx
    return y.reshape(*lead, w.n_out).astype(out_dtype or x.dtype)

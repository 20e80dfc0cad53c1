"""Parameter containers: dense or packed-quantized weights as pytrees.

The reference keeps weights as ggml tensors that may be any
``MiniGPT4DataType`` (f16/f32 or quantized blocks) and multiplies them
directly (ggml dequantizes inside ``mul_mat``).  The TPU-native analogue: a
:class:`QTensor` pytree node holds the *packed* blocks in HBM as ``uint8``
plus static layout metadata, and :func:`linear` dispatches to either a plain
MXU matmul (dense weights) or a fused dequantize-matmul (Pallas kernel, with
an XLA dequant fallback).

Weight convention:
  * dense weights are stored **[in_features, out_features]** ("kn") so the
    forward pass is ``x @ w`` with no transpose;
  * quantized weights keep ggml's row-major packing **[out_features,
    packed_row_bytes]** ("nk"), since ggml quantizes along the input (K)
    dimension per output row — the kernel contracts over K directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.dtypes import DataType, row_bytes, is_quantized
from ..ops import dequant as jdequant


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Packed ggml-quantized 2-D weight: logically [n_out, n_in]."""

    packed: jnp.ndarray  # uint8 [..., n_out, row_packed_bytes]
    dtype: DataType  # static
    n_in: int  # static logical K

    def tree_flatten(self):
        return (self.packed,), (self.dtype, self.n_in)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def n_out(self) -> int:
        return self.packed.shape[-2]

    @property
    def logical_shape(self) -> tuple[int, ...]:
        return (*self.packed.shape[:-1], self.n_in)

    def dequantize(self, out_dtype=jnp.float32) -> jnp.ndarray:
        """[..., n_out, n_in] floats (XLA path; jit-safe)."""
        return jdequant.dequantize(self.packed, self.dtype, out_dtype)

    @staticmethod
    def from_raw(raw: np.ndarray, shape: tuple[int, int], dtype: DataType) -> "QTensor":
        n_out, n_in = shape
        rb = row_bytes(dtype, n_in)
        packed = jnp.asarray(np.ascontiguousarray(raw, np.uint8).reshape(n_out, rb))
        return QTensor(packed, DataType(dtype), n_in)


def matmul_qtensor(x: jnp.ndarray, qt: QTensor, prefer_pallas: bool = True) -> jnp.ndarray:
    """x [..., K] @ qt.T -> [..., N] with on-the-fly dequantization."""
    from ..ops import quant_matmul

    return quant_matmul.qmatmul(x, qt, prefer_pallas=prefer_pallas)


def linear(x: jnp.ndarray, p: dict, layer=None) -> jnp.ndarray:
    """Apply a linear layer parameter dict.

    ``p['w']``: dense [K, N] array, :class:`QTensor` (raw ggml bytes, XLA
    dequant), or ``RepackedQuant`` (TPU planes, Pallas fused kernel);
    ``p.get('b')``: optional [N] bias.

    ``layer``: traced index selecting one layer from *stacked* [L, ...]
    params.  Dense/QTensor weights are sliced in XLA (the dot fuses the
    slice); RepackedQuant streams the layer's blocks straight from the
    stacked HBM array inside the Pallas kernel (scalar-prefetch index maps)
    — an XLA slice there would materialize a full per-layer weight copy
    before every kernel call.
    """
    from ..ops.group_i8 import GroupQuant
    from ..ops.i8_matmul import I8SBQuant
    from ..ops.repack import RepackedQuant

    w = p["w"]
    if isinstance(w, list):
        # heterogeneous per-layer representations (mixed-quant K_M files):
        # statically indexed by the unrolled layer loop
        if not isinstance(layer, int):
            raise TypeError("per-layer weight list requires a static layer index")
        w = w[layer]
        layer = None
    if isinstance(w, RepackedQuant):
        from ..ops.pallas_quant_matmul import qmatmul_repacked

        if w.codes.ndim == 3 and layer is None:
            raise ValueError("stacked RepackedQuant requires a layer index")
        if w.codes.ndim == 2 and layer is not None:
            layer = None  # already per-layer (e.g. vision blocks via scan xs)
        y = qmatmul_repacked(x, w, layer=layer)
    elif isinstance(w, I8SBQuant):
        from ..ops.i8_matmul import qmatmul_i8sb

        if w.codes.ndim == 2 and layer is not None:
            layer = None
        y = qmatmul_i8sb(x, w, layer=layer)
    elif isinstance(w, GroupQuant):
        from ..ops.group_i8 import qmatmul_group

        if w.codes.ndim == 3 and layer is None:
            raise ValueError("stacked GroupQuant requires a layer index")
        if w.codes.ndim == 2 and layer is not None:
            layer = None
        y = qmatmul_group(x, w, layer=layer)
    elif isinstance(w, QTensor):
        if layer is not None and w.packed.ndim == 3:
            w = QTensor(w.packed[layer], w.dtype, w.n_in)
        y = matmul_qtensor(x, w)
    else:
        if layer is not None and w.ndim == 3:
            w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    b = p.get("b")
    if b is not None:
        if layer is not None and b.ndim == 2:
            b = jax.lax.dynamic_index_in_dim(b, layer, 0, keepdims=False)
        y = y + b.astype(y.dtype)
    return y


def load_quant_weight(raw: np.ndarray, shape: tuple[int, int], dtype: DataType, mode: str = "auto",
                      col_scale=None, row_scale=None):
    """Choose the device representation for a quantized weight.

    mode: 'auto' (repack for the Pallas kernel on TPU, raw QTensor
    elsewhere), 'repack', 'qtensor', or 'w8a8' (re-quantize to
    symmetric i8 + 256-superblock scales for the direct-MXU i8 kernel —
    ops/i8_matmul.py documents the speed/quality trade; weights whose K is
    not a multiple of 256 fall back to the auto path).

    ``col_scale``/``row_scale``: smooth-quant migration factors, honored by
    the w8a8 representation only (callers pass them only in that mode —
    folding them into packed q-formats would silently change the "exact
    q5_k" paths).
    """
    from ..ops import repack as rp

    if mode not in ("auto", "repack", "qtensor", "w8a8", "gq"):
        raise ValueError(
            f"unknown quant_mode {mode!r}: expected auto | repack | qtensor "
            "| w8a8 | gq (a typo here would silently load the slowest path)"
        )
    if (col_scale is not None or row_scale is not None) and mode != "w8a8":
        raise ValueError("smooth scales are only valid with quant_mode='w8a8'")
    if mode == "gq":
        from ..ops import group_i8 as gq

        if gq.supported(dtype, shape[1]):
            w = gq.from_ggml(np.asarray(raw), shape, dtype)
            if gq.pack_enabled():
                # sub-byte code storage for 4/5-bit formats: halves the
                # decode-time weight stream, bit-exact (group_i8.pack_codes)
                w = gq.pack_codes(w)
            return w
        mode = "auto"  # e.g. f16 rows or chunk-misaligned K: packed fallback
    if mode == "w8a8":
        from ..ops import i8_matmul as i8

        if shape[1] % i8.SB == 0:
            return i8.from_ggml(np.asarray(raw), shape, dtype,
                                col_scale=col_scale, row_scale=row_scale)
        if col_scale is not None or row_scale is not None:
            # the packed-format fallback keeps exact file bytes; silently
            # dropping the fold would desync producer/consumer scaling
            raise ValueError(
                f"cannot fold smooth scales into K={shape[1]} (not a "
                f"multiple of {i8.SB}); caller must skip this site"
            )
        mode = "auto"
    if mode == "auto":
        import jax as _jax

        mode = "repack" if (_jax.default_backend() == "tpu" and DataType(dtype) in rp.REPACKABLE) else "qtensor"
    if mode == "repack" and DataType(dtype) in rp.REPACKABLE:
        return rp.repack(np.asarray(raw), shape, dtype)
    return QTensor.from_raw(np.asarray(raw), shape, dtype)


def dense_from_numpy(
    w_out_in: np.ndarray, b: np.ndarray | None = None, dtype=jnp.float32
) -> dict:
    """torch-layout [out, in] numpy weight -> our [in, out] dense params."""
    p = {"w": jnp.asarray(np.ascontiguousarray(w_out_in.T), dtype)}
    if b is not None:
        p["b"] = jnp.asarray(b, dtype)
    return p

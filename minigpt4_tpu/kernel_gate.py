"""TPU compile-mode kernel gate.

Round 1 shipped a kernel whose CPU tests all ran in interpret mode, so a
scoped-VMEM overflow at the real 13B geometry surfaced only inside the
40-layer benchmark (VERDICT.md weak #1/#4).  This gate Mosaic-compiles (NOT
interprets) `qmatmul_repacked` at every real weight shape of the 7B and 13B
models x {q4_k, q5_k, q6_k, q4_0, q8_0} x {flat, stacked} x {decode M=1,
prefill M=512}, runs one matmul on the chip, and checks the result against
the XLA dequant fallback.  Any VMEM or lowering regression fails fast with a
named shape.  Run it before the benchmark:

    python -m minigpt4_tpu.kernel_gate            # full sweep (~a minute)
    python -m minigpt4_tpu.kernel_gate --fast     # worst-case shapes only

On a non-TPU backend it exits 0 with a notice (the gate only means anything
where Mosaic actually lowers).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


# (K, N) weight shapes; w2 ([n_embd, n_ff] -> K=n_ff) is the VMEM worst case
SHAPES_13B = {
    "attn(5120x5120)": (5120, 5120),
    "w1/w3(5120x13824)": (5120, 13824),
    "w2(13824x5120)": (13824, 5120),
    "output(5120x32000)": (5120, 32000),
}
SHAPES_7B = {
    "attn(4096x4096)": (4096, 4096),
    "w1/w3(4096x11008)": (4096, 11008),
    "w2(11008x4096)": (11008, 4096),
}
FAST_SHAPES = {
    "13B w2(13824x5120)": (13824, 5120),
    "13B w1(5120x13824)": (5120, 13824),
}


def _check_one(name: str, k: int, n: int, qtype, m: int, stacked: bool) -> float:
    import jax
    import jax.numpy as jnp

    from .benchmark import random_packed
    from .ops.pallas_quant_matmul import qmatmul_repacked
    from .ops.repack import dequantize_repacked

    rng = np.random.default_rng(0)
    rq = random_packed(rng, (n, k), qtype, mode="repack")
    layer = None
    if stacked:
        rq = jax.tree_util.tree_map(lambda a: a[None], rq)
        layer = 0
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32), jnp.bfloat16)

    t0 = time.perf_counter()
    y = qmatmul_repacked(x, rq, out_dtype=jnp.float32, layer=layer)
    y = np.asarray(y)  # forces compile + one real execution
    dt = time.perf_counter() - t0

    flat = jax.tree_util.tree_map(lambda a: a[0], rq) if stacked else rq
    w = dequantize_repacked(flat, jnp.float32)
    ref = np.asarray(x.astype(jnp.float32) @ w.T)
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(y - ref).max()) / scale
    if err > 2e-2:
        raise AssertionError(f"{name}: rel err {err:.2e} vs dequant fallback")
    return dt


def _check_i8(name: str, k: int, n: int, m: int, stacked: bool) -> float:
    """Compile + run + verify the EXPERIMENTAL direct-MXU i8 kernel
    (ops/i8_matmul.py) against its dequantized-dense reference."""
    import jax
    import jax.numpy as jnp

    from .ops.i8_matmul import (
        I8SBQuant, qmatmul_i8sb, quantize_activations, requantize_i8sb,
    )

    rng = np.random.default_rng(0)
    codes, scales = requantize_i8sb(rng.normal(0, 0.02, (n, k)).astype(np.float32))
    w = I8SBQuant(jnp.asarray(codes), jnp.asarray(scales), k)
    layer = None
    if stacked:
        w = jax.tree_util.tree_map(lambda a: a[None], w)
        layer = 0
    x = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32), jnp.bfloat16)

    t0 = time.perf_counter()
    y = np.asarray(qmatmul_i8sb(x, w, out_dtype=jnp.float32, layer=layer))
    dt = time.perf_counter() - t0

    flat = jax.tree_util.tree_map(lambda a: a[0], w) if stacked else w
    wd = np.asarray(flat.dequantize())
    # the kernel's OWN activation quantizer is the reference input (one
    # source of truth for the rounding/zero-guard semantics)
    x_i8, sx = quantize_activations(jnp.asarray(x).reshape(-1, k))
    x_deq = np.asarray(x_i8, np.float32) * np.asarray(sx)
    ref = x_deq @ wd.T
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(y - ref).max()) / scale
    if err > 1e-3:  # i8 dot is exact; only f32 accumulation order differs
        raise AssertionError(f"{name}: rel err {err:.2e} vs dense reference")
    return dt


def run_gate(fast: bool = False, verbose: bool = True, qtypes: list | None = None) -> bool:
    import jax

    from .formats.dtypes import DataType

    if jax.default_backend() != "tpu":
        print("[kernel-gate] non-TPU backend: compile gate skipped", file=sys.stderr)
        return True

    if fast:
        cases = [
            (nm, k, n, qt, m, st)
            for nm, (k, n) in FAST_SHAPES.items()
            for qt in (DataType.Q5_K,)
            for m in (1, 512)
            for st in (True,)
        ]
    else:
        shapes = {f"13B {nm}": kn for nm, kn in SHAPES_13B.items()}
        shapes.update({f"7B {nm}": kn for nm, kn in SHAPES_7B.items()})
        if qtypes is None:
            qtypes = (DataType.Q4_K, DataType.Q5_K, DataType.Q6_K, DataType.Q4_0,
                      DataType.Q8_0)
        cases = []
        for nm, (k, n) in shapes.items():
            for qt in qtypes:
                # full M/stacked cross only on the worst-case K; others decode-only
                ms = (1, 512) if k >= 11008 else (1,)
                for m in ms:
                    for st in (True, False) if k >= 11008 else (True,):
                        cases.append((nm, k, n, qt, m, st))

    ok = True
    for nm, k, n, qt, m, st in cases:
        tag = f"{nm} {qt.name.lower()} M={m} {'stacked' if st else 'flat'}"
        try:
            dt = _check_one(tag, k, n, qt, m, st)
            if verbose:
                print(f"[kernel-gate] PASS {tag} ({dt:.1f}s)", file=sys.stderr)
        except Exception as e:
            ok = False
            print(f"[kernel-gate] FAIL {tag}: {e}", file=sys.stderr)
    # the experimental i8 kernel: worst-case K + the stacked decode shape.
    # Skipped when a --qtypes split filter is active (these cases are
    # qtype-independent; re-running them per split process would repeat the
    # compiles the flag exists to spread out)
    i8_cases = [] if qtypes is not None else [("13B w2 i8", 13824, 5120, 1, True)]
    if not fast and qtypes is None:
        i8_cases += [("13B w1 i8", 5120, 13824, 512, True),
                     ("13B attn i8", 5120, 5120, 1, False)]
    for nm, k, n, m, st in i8_cases:
        tag = f"{nm} M={m} {'stacked' if st else 'flat'}"
        try:
            dt = _check_i8(tag, k, n, m, st)
            if verbose:
                print(f"[kernel-gate] PASS {tag} ({dt:.1f}s)", file=sys.stderr)
        except Exception as e:
            ok = False
            print(f"[kernel-gate] FAIL {tag}: {e}", file=sys.stderr)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="worst-case shapes only")
    ap.add_argument("--qtypes", default=None,
                    help="comma list (e.g. q4_k,q5_k) to split long sweeps")
    args = ap.parse_args()
    qtypes = None
    if args.qtypes:
        from .formats.dtypes import DataType

        by_name = {t.name.lower(): t for t in DataType}
        qtypes = [by_name[q.strip()] for q in args.qtypes.split(",")]
    sys.exit(0 if run_gate(fast=args.fast, qtypes=qtypes) else 1)


if __name__ == "__main__":
    main()

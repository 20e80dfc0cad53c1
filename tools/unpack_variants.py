"""Dev micro-bench: nibble-unpack strategy variants for the dequant matmul.

Times a stripped kernel (codes -> bf16 weights -> dot) at the w2 13B shape
for several unpack strategies on the real TPU.  Findings that shaped the
production kernel (ops/pallas_quant_matmul.py):

  * q8 (byte codes, 1 cast + mul) runs near the chip's sustained DMA rate;
  * every nibble strategy (u4 bitcast, i32 mask/shift row-band, two half
    dots) costs roughly the SAME WALL TIME as q8 despite half the bytes —
    the pipeline is bound by per-chunk dependent compute/layout latency,
    not by unpack ALU choice;
  * chunk-size/alignment and TN variations move results < 10%.

Env knobs: TN (tile rows), CL (chunk lanes), M (batch rows).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 5120, 13824
TN, CL = int(os.environ.get("TN", 256)), int(os.environ.get("CL", 1728))
M = int(os.environ.get("M", 8))
G = K // 32


def mk_kernel(variant):
    def kernel(x_ref, codes_ref, sc_ref, o_ref):
        xf = x_ref[...]
        sc = sc_ref[...].astype(jnp.bfloat16)  # [TN, G]
        acc = jnp.zeros((xf.shape[0], TN), jnp.float32)
        for l0 in range(0, K, CL):
            if variant == "q8":
                q = codes_ref[:, l0 : l0 + CL].astype(jnp.bfloat16)  # i8 [TN, CL]
            elif variant == "bitcast":
                c8 = codes_ref[:, l0 : l0 + CL]  # [TN//2, CL] u8
                q = pltpu.bitcast(c8, jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
            elif variant == "i32pair":
                # row-band split: lo nibble -> tile rows 0:128, hi -> 128:256
                c8 = codes_ref[:, l0 : l0 + CL].astype(jnp.int32)  # [TN//2, CL]
                lo = (c8 & 0xF).astype(jnp.bfloat16)
                hi = (c8 >> 4).astype(jnp.bfloat16)
                q = jnp.concatenate([lo, hi], axis=0)  # [TN, CL]
            elif variant == "twodot":
                # no concat: two half-tile dots into separate acc halves
                c8 = codes_ref[:, l0 : l0 + CL].astype(jnp.int32)
                lo = (c8 & 0xF).astype(jnp.bfloat16)
                hi = (c8 >> 4).astype(jnp.bfloat16)
                sc_c = pltpu.repeat(sc, CL // G, 1)
                xs = xf[:, l0 : l0 + CL]
                a = jax.lax.dot_general(xs, (lo * sc_c[: TN // 2]).astype(xf.dtype),
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                bpart = jax.lax.dot_general(xs, (hi * sc_c[TN // 2 :]).astype(xf.dtype),
                                            (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                acc += jnp.concatenate([a, bpart], axis=1)
                continue
            sc_c = pltpu.repeat(sc, CL // G, 1)
            acc += jax.lax.dot_general(
                xf[:, l0 : l0 + CL], (q * sc_c).astype(xf.dtype),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[...] = acc
    return kernel


def run(variant, iters=50, reps=5):
    rows = N if variant == "q8" else N // 2
    cdtype = jnp.int8 if variant == "q8" else jnp.uint8
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 127, (rows, K)), cdtype)
    sc = jnp.full((N, G), 0.01, jnp.bfloat16)
    x = jnp.ones((M, K), jnp.bfloat16)

    trows = TN if variant == "q8" else TN // 2
    f = pl.pallas_call(
        mk_kernel(variant),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda ni: (0, 0)),
            pl.BlockSpec((trows, K), lambda ni: (ni, 0)),
            pl.BlockSpec((TN, G), lambda ni: (ni, 0)),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda ni: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )

    def chain(x, codes, sc):
        def body(i, x):
            y = f(x, codes, sc)
            return x + y[0, 0].astype(x.dtype) * 1e-9
        return jax.lax.fori_loop(0, iters, body, x)

    cj = jax.jit(chain)
    np.asarray(cj(x, codes, sc))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = cj(x, codes, sc)
    np.asarray(r)
    per_call_ms = (time.perf_counter() - t0) / (reps * iters) * 1e3
    gb = codes.nbytes / 1e9
    print(f"{variant:10s}: {per_call_ms:.3f} ms  ({gb*1e3:.0f} MB codes, "
          f"~{gb/(per_call_ms/1e3):.0f} GB/s)", flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["q8", "bitcast", "i32pair", "twodot"]:
        try:
            run(v)
        except Exception as e:
            print(f"{v}: FAIL {str(e).splitlines()[0][:160]}", flush=True)

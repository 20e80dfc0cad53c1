"""Round-3 same-session shootout at the 13B w2 shape (N=5120, K=13824):
production q5_k/q4_k kernels vs the candidate unpack chains from qmm_v3.

Usage: python tools/qmm_r3.py [--only a,b,c] [--m 1]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigpt4_tpu.formats.dtypes import DataType
from minigpt4_tpu.formats import quants as nq
from minigpt4_tpu.ops import repack as rp
from minigpt4_tpu.ops.pallas_quant_matmul import qmatmul_repacked


def timed(fn, args, iters=50, reps=5, label=""):
    def chain(*a):
        def body(i, x):
            y = fn(x, *a[1:])
            return x + y[0, 0].astype(x.dtype) * 1e-9
        return jax.lax.fori_loop(0, iters, body, a[0])

    cj = jax.jit(chain)
    try:
        t0 = time.perf_counter()
        np.asarray(cj(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            r = cj(*args)
        np.asarray(r)
        per = (time.perf_counter() - t0) / (reps * iters)
        return per, compile_s
    except Exception as e:
        print(f"{label}: FAIL {str(e).splitlines()[0][:200]}")
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=13824)
    ap.add_argument("--n", type=int, default=5120)
    ap.add_argument("--tn", type=int, default=256)
    ap.add_argument("--tm", type=int, default=8)
    ap.add_argument("--cl", type=int, default=1728)
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    K, N, TN, TM, CL = args.k, args.n, args.tn, args.tm, args.cl
    G = K // 32
    n_elems = N * K
    grid = (N // TN,)
    rng = np.random.default_rng(0)
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    x = jnp.asarray(rng.normal(0, 1, (TM, K)).astype(np.float32), jnp.bfloat16)
    x1 = jnp.asarray(rng.normal(0, 1, (args.m, K)).astype(np.float32), jnp.bfloat16)
    codes_u8 = jnp.asarray(rng.integers(0, 256, (N // 2, K), np.uint8))
    sc = jnp.full((N, G), 0.002, jnp.bfloat16)
    hi = jnp.asarray(rng.integers(0, 256, (N, K // 8), np.uint8))
    hi2 = jnp.asarray(rng.integers(0, 256, (N, K // 4), np.uint8))

    x_spec = pl.BlockSpec((TM, K), lambda ni: (0, 0))
    cu8_spec = pl.BlockSpec((TN // 2, K), lambda ni: (ni, 0))
    sc_spec = pl.BlockSpec((TN, G), lambda ni: (ni, 0))
    hi_spec = pl.BlockSpec((TN, K // 8), lambda ni: (ni, 0))
    hi2_spec = pl.BlockSpec((TN, K // 4), lambda ni: (ni, 0))

    def dot(xf, w, acc):
        d = jax.lax.dot_general(xf, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return d if acc is None else acc + d

    def run(name, body, inputs, specs):
        out_spec = pl.BlockSpec((TM, TN), lambda ni: (0, ni))

        def call(*a):
            return pl.pallas_call(
                body, grid=grid, in_specs=specs, out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((TM, TN * grid[0]), jnp.float32),
            )(*a)

        per, comp = timed(call, inputs, label=name)
        if per is not None:
            print(f"{name:40s}: {per*1e3:7.3f} ms  {n_elems/per/1e9:7.0f} Ge/s  (compile {comp:.1f}s)", flush=True)

    def chunks(cl):
        return [(l0, cl) for l0 in range(0, K, cl)]

    # --- production kernels on real repacked weights ---
    def prod(name, dt):
        nb = N * K // 256
        if dt == DataType.Q5_K:
            raw = rng.integers(0, 256, (nb, 176), np.uint8)
            raw[:, 0:2] = np.frombuffer(
                np.full(nb, 0.01, np.float16).tobytes(), np.uint8
            ).reshape(nb, 2)
            raw[:, 2:4] = raw[:, 0:2]
        else:
            raw = rng.integers(0, 256, (nb, 144), np.uint8)
            raw[:, 0:2] = np.frombuffer(
                np.full(nb, 0.01, np.float16).tobytes(), np.uint8
            ).reshape(nb, 2)
            raw[:, 2:4] = raw[:, 0:2]
        rq = rp.repack(raw.reshape(-1), (N, K), dt)
        rq = jax.tree.map(lambda a: jax.device_put(a), rq)

        def call(xx):
            return qmatmul_repacked(xx, rq, out_dtype=jnp.float32)

        per, comp = timed(call, (x1,), label=name)
        if per is not None:
            print(f"{name:40s}: {per*1e3:7.3f} ms  {n_elems/per/1e9:7.0f} Ge/s  (compile {comp:.1f}s)", flush=True)

    if want("prodq5"):
        prod("PROD q5_k kernel (M=%d)" % args.m, DataType.Q5_K)
    if want("prodq4"):
        prod("PROD q4_k kernel (M=%d)" % args.m, DataType.Q4_K)

    # --- dense bf16 N-major (session ceiling reference) ---
    if want("densenm"):
        wd = jnp.asarray(rng.normal(0, 1, (N, K)).astype(np.float32), jnp.bfloat16)
        def kd(x_ref, w_ref, o_ref):
            acc = None
            for l0, cle in chunks(CL):
                acc = dot(x_ref[:, l0:l0+cle], w_ref[:, l0:l0+cle], acc)
            o_ref[:] = acc
        run("dense bf16 N-major", kd, (x, wd),
            [x_spec, pl.BlockSpec((TN, K), lambda ni: (ni, 0))])

    # --- XLA dense matvec (chip-state calibration) ---
    if want("xladense"):
        wd = jnp.asarray(rng.normal(0, 1, (N, K)).astype(np.float32), jnp.bfloat16)
        def call(xx, ww):
            return jax.lax.dot_general(
                xx, ww, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        per, comp = timed(call, (x1, wd), label="xla dense")
        if per is not None:
            print(f"{'XLA dense bf16 matvec':40s}: {per*1e3:7.3f} ms  {n_elems/per/1e9:7.0f} Ge/s  (compile {comp:.1f}s)", flush=True)

    # --- nibble: direct int4 -> bf16 (ONE cast) ---
    if want("nibi4"):
        def k(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(CL):
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.int4).astype(jnp.bfloat16)
                w = q * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run("nib int4->bf16 direct", k, (x, codes_u8, sc), [x_spec, cu8_spec, sc_spec])

    # --- q5: i4 nibble + i32 hi fma (production minus one cast) ---
    if want("q5i4"):
        nb = K // 8
        cl_eff = min(CL, nb)
        def k(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            hbw = h_ref[...].astype(jnp.int32)
            acc = None
            for l0, cle in chunks(cl_eff):
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.int4).astype(jnp.bfloat16)
                p = l0 // nb
                i0 = l0 - p * nb
                masked = (hbw[:, i0:i0+cle] & (1 << p)).astype(jnp.bfloat16)
                w = (q + masked * jnp.bfloat16(2.0 ** (4 - p))) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run("q5 i4-nib + i32 hi fma", k, (x, codes_u8, sc, hi),
            [x_spec, cu8_spec, sc_spec, hi_spec])

    # --- q5: u8-domain or-merge, single u8->bf16 cast ---
    if want("q5u8or"):
        nb = K // 8
        cl_eff = min(CL, nb)
        def k(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(cl_eff):
                q4 = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.uint8)
                p = l0 // nb
                i0 = l0 - p * nb
                hb = h_ref[:, i0:i0+cle]
                t = (hb & jnp.uint8(1 << p))
                t = (t >> (p - 4)) if p > 4 else (t << (4 - p)) if p < 4 else t
                q5 = (q4 | t).astype(jnp.bfloat16)
                w = q5 * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run("q5 u8 or-merge single cast", k, (x, codes_u8, sc, hi),
            [x_spec, cu8_spec, sc_spec, hi_spec])

    # --- q5 merge fully in i8 domain, dual positioned half-planes ---
    if want("q5i8dom"):
        nb = K // 8
        def k(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for p in range(8):
                l0 = p * nb
                h0 = (p // 4) * nb
                b = (p % 4) + 1
                q4 = pltpu.bitcast(c_ref[:, l0:l0+nb], jnp.int4).astype(jnp.int8)
                t = (h_ref[:, h0:h0+nb] & jnp.uint8(1 << b)).astype(jnp.int8)
                q5 = (q4 + t * jnp.int8(2 ** (4 - b))).astype(jnp.bfloat16)
                w = q5 * pltpu.repeat(s, nb // G, 1)
                acc = dot(x_ref[:, l0:l0+nb], w, acc)
            o_ref[:] = acc
        run("q5 i8-domain merge dual-plane", k, (x, codes_u8, sc, hi2),
            [x_spec, cu8_spec, sc_spec, hi2_spec])

    # --- i8 one cast, chunk=G (q8-style ceiling) ---
    if want("i8g"):
        codes_i8 = jnp.asarray(rng.integers(-127, 127, (N, K), np.int8))
        def k(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(G):
                q = c_ref[:, l0:l0+cle].astype(jnp.bfloat16)
                acc = dot(x_ref[:, l0:l0+cle], q * s, acc)
            o_ref[:] = acc
        run("i8 cast+mul chunk=G", k, (x, codes_i8, sc),
            [x_spec, pl.BlockSpec((TN, K), lambda ni: (ni, 0)), sc_spec])


if __name__ == "__main__":
    main()

"""Dev experiments: isolate the fused dequant-matmul's per-element cost.

Variants of the unpack chain are timed as standalone chained kernels at the
13B w2 shape (the slowest real shape) so changes to the hot path can be
evaluated in minutes without rebuilding the model.  Not a library component.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
        print(f"{label}: FAIL {str(e).splitlines()[0][:160]}")
        return None, None


def run_variant(name, kernel_body, inputs, specs, out_tm, out_tn, grid, n_elems):
    out_spec = pl.BlockSpec((out_tm, out_tn), lambda ni: (0, ni))

    def call(*args):
        return pl.pallas_call(
            kernel_body,
            grid=grid,
            in_specs=specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((out_tm, out_tn * grid[0]), jnp.float32),
        )(*args)

    per, comp = timed(call, inputs, label=name)
    if per is not None:
        print(f"{name:42s}: {per*1e3:7.3f} ms  {n_elems/per/1e9:7.0f} Ge/s  (compile {comp:.1f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=13824)
    ap.add_argument("--n", type=int, default=5120)
    ap.add_argument("--tn", type=int, default=256)
    ap.add_argument("--tm", type=int, default=8)
    ap.add_argument("--cl", type=int, default=1728)
    ap.add_argument("--only", default=None, help="comma list of variant names")
    args = ap.parse_args()

    K, N, TN, TM, CL = args.k, args.n, args.tn, args.tm, args.cl
    G = K // 32
    n_elems = N * K
    grid = (N // TN,)
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(0, 1, (TM, K)).astype(np.float32), jnp.bfloat16)
    codes_u8 = jnp.asarray(rng.integers(0, 256, (N // 2, K), np.uint8))  # row-pair nibbles
    codes_i8 = jnp.asarray(rng.integers(-127, 127, (N, K), np.int8))
    sc = jnp.full((N, G), 0.002, jnp.bfloat16)
    hi = jnp.asarray(rng.integers(0, 256, (N, K // 8), np.uint8))

    x_spec = pl.BlockSpec((TM, K), lambda ni: (0, 0))
    cu8_spec = pl.BlockSpec((TN // 2, K), lambda ni: (ni, 0))
    ci8_spec = pl.BlockSpec((TN, K), lambda ni: (ni, 0))
    sc_spec = pl.BlockSpec((TN, G), lambda ni: (ni, 0))
    hi_spec = pl.BlockSpec((TN, K // 8), lambda ni: (ni, 0))

    def dot(xf, w, acc):
        d = jax.lax.dot_general(xf, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return d if acc is None else acc + d

    def chunks():
        return [(l0, CL) for l0 in range(0, K, CL)]

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    # --- dense bf16 matvec in pallas (ceiling reference) ---
    if want("dense"):
        wd = jnp.asarray(rng.normal(0, 1, (N, K)).astype(np.float32), jnp.bfloat16)
        def k_dense(x_ref, w_ref, o_ref):
            acc = None
            for l0, cle in chunks():
                acc = dot(x_ref[:, l0:l0+cle], w_ref[:, l0:l0+cle], acc)
            o_ref[:] = acc
        run_variant("dense bf16 (pallas)", k_dense, (x, wd),
                    [x_spec, pl.BlockSpec((TN, K), lambda ni: (ni, 0))],
                    TM, TN, grid, n_elems)

    # --- i8 codes: cast + scale-mul (q8_0 path) ---
    if want("i8"):
        def k_i8(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks():
                q = c_ref[:, l0:l0+cle].astype(jnp.bfloat16)
                w = q * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("i8 cast+mul (q8_0 path)", k_i8, (x, codes_i8, sc),
                    [x_spec, ci8_spec, sc_spec], TM, TN, grid, n_elems)

    # --- i8 codes: cast only, no scale (isolates the mul) ---
    if want("i8nomul"):
        def k_i8n(x_ref, c_ref, o_ref):
            acc = None
            for l0, cle in chunks():
                w = c_ref[:, l0:l0+cle].astype(jnp.bfloat16)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("i8 cast only (no scale mul)", k_i8n, (x, codes_i8),
                    [x_spec, ci8_spec], TM, TN, grid, n_elems)

    # --- nibble bitcast: uint4 -> i8 -> bf16 + mul (q4_k path) ---
    if want("nib"):
        def k_nib(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks():
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4)
                w = q.astype(jnp.int8).astype(jnp.bfloat16) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("nibble bitcast->i8->bf16 (q4_k path)", k_nib, (x, codes_u8, sc),
                    [x_spec, cu8_spec, sc_spec], TM, TN, grid, n_elems)

    # --- nibble direct uint4 -> bf16 cast ---
    if want("nibdirect"):
        def k_nibd(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks():
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4)
                w = q.astype(jnp.bfloat16) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("nibble uint4->bf16 direct", k_nibd, (x, codes_u8, sc),
                    [x_spec, cu8_spec, sc_spec], TM, TN, grid, n_elems)

    # --- q5_k current: nibble + i32 hi extraction ---
    if want("q5cur"):
        nb = K // 8
        def k_q5(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks():
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                p = l0 // nb
                i0 = l0 - p * nb
                hb = h_ref[:, i0:i0+min(cle, nb)].astype(jnp.int32)
                bit = ((hb >> p) & 1).astype(jnp.bfloat16)
                w = (q + bit * jnp.bfloat16(16.0)) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        cl_eff = min(CL, K // 8)
        def chunks_q5():
            return [(l0, cl_eff) for l0 in range(0, K, cl_eff)]
        saved = chunks
        def k_q5b(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in [(l, cl_eff) for l in range(0, K, cl_eff)]:
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                p = l0 // nb
                i0 = l0 - p * nb
                hb = h_ref[:, i0:i0+cle].astype(jnp.int32)
                bit = ((hb >> p) & 1).astype(jnp.bfloat16)
                w = (q + bit * jnp.bfloat16(16.0)) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("q5_k current (i32 shift+and)", k_q5b, (x, codes_u8, sc, hi),
                    [x_spec, cu8_spec, sc_spec, hi_spec], TM, TN, grid, n_elems)

    # --- q5 hi via u8 AND + comparison (no i32, no shift) ---
    if want("q5cmp"):
        nb = K // 8
        cl_eff = min(CL, nb)
        def k_q5c(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in [(l, cl_eff) for l in range(0, K, cl_eff)]:
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                p = l0 // nb
                i0 = l0 - p * nb
                hb = h_ref[:, i0:i0+cle]
                bitset = (hb & jnp.uint8(1 << p)) > 0
                w = (q + jnp.where(bitset, jnp.bfloat16(16.0), jnp.bfloat16(0.0))) \
                    * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("q5 hi via u8 and+cmp+select", k_q5c, (x, codes_u8, sc, hi),
                    [x_spec, cu8_spec, sc_spec, hi_spec], TM, TN, grid, n_elems)

    # --- q5 hi folded into second dot: w = q*s ; acc += (bit*16s) @ x ---
    if want("q5two"):
        nb = K // 8
        cl_eff = min(CL, nb)
        def k_q5t(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in [(l, cl_eff) for l in range(0, K, cl_eff)]:
                sc_c = pltpu.repeat(s, cle // G, 1)
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                p = l0 // nb
                i0 = l0 - p * nb
                hb = h_ref[:, i0:i0+cle]
                bitset = (hb & jnp.uint8(1 << p)) > 0
                w = jnp.where(bitset, q + jnp.bfloat16(16.0), q) * sc_c
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("q5 hi select(q+16, q)*s", k_q5t, (x, codes_u8, sc, hi),
                    [x_spec, cu8_spec, sc_spec, hi_spec], TM, TN, grid, n_elems)

    # --- pure int8 x int8 -> int32 MXU dot (no unpack, no scales) ---
    if want("i8dot"):
        def k_i8d(x_ref, c_ref, o_ref):
            xi = (x_ref[...] * 0).astype(jnp.int8) + 1  # int8 x side, cheap
            acc = None
            for l0, cle in chunks():
                d = jax.lax.dot_general(
                    xi[:, l0:l0+cle], c_ref[:, l0:l0+cle],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            o_ref[:] = acc.astype(jnp.float32)
        run_variant("int8 x int8 MXU dot (no unpack)", k_i8d, (x, codes_i8),
                    [x_spec, ci8_spec], TM, TN, grid, n_elems)

    # --- i8 dot with bf16 x side (mixed) ---
    if want("i8mixed"):
        def k_i8m(x_ref, c_ref, o_ref):
            acc = None
            for l0, cle in chunks():
                d = jax.lax.dot_general(
                    x_ref[:, l0:l0+cle], c_ref[:, l0:l0+cle],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_ref[:] = acc
        run_variant("bf16 x int8 mixed dot", k_i8m, (x, codes_i8),
                    [x_spec, ci8_spec], TM, TN, grid, n_elems)

    # --- i8: weights as LHS of the dot (different MXU operand roles) ---
    if want("i8swap"):
        def k_i8w(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks():
                w = c_ref[:, l0:l0+cle].astype(jnp.bfloat16) * pltpu.repeat(s, cle // G, 1)
                d = jax.lax.dot_general(
                    w, x_ref[:, l0:l0+cle], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [TN, TM]
                acc = d if acc is None else acc + d
            o_ref[:] = acc.T
        out_spec_sw = pl.BlockSpec((TM, TN), lambda ni: (0, ni))
        run_variant("i8 weights-as-lhs", k_i8w, (x, codes_i8, sc),
                    [x_spec, ci8_spec, sc_spec], TM, TN, grid, n_elems)

    # --- i8: two interleaved accumulators (MXU ILP) ---
    if want("i8acc2"):
        def k_i8a(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            cs = chunks()
            acc0 = acc1 = None
            for i, (l0, cle) in enumerate(cs):
                q = c_ref[:, l0:l0+cle].astype(jnp.bfloat16)
                w = q * pltpu.repeat(s, cle // G, 1)
                d = jax.lax.dot_general(x_ref[:, l0:l0+cle], w, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                if i % 2 == 0:
                    acc0 = d if acc0 is None else acc0 + d
                else:
                    acc1 = d if acc1 is None else acc1 + d
            o_ref[:] = acc0 + acc1 if acc1 is not None else acc0
        run_variant("i8 two accumulators", k_i8a, (x, codes_i8, sc),
                    [x_spec, ci8_spec, sc_spec], TM, TN, grid, n_elems)

    # --- i8, ONE whole-K dot (no chunk loop at all) ---
    if want("i8whole"):
        def k_i8wh(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            q = c_ref[...].astype(jnp.bfloat16)
            w = q * pltpu.repeat(s, K // G, 1)
            o_ref[:] = jax.lax.dot_general(x_ref[...], w, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        run_variant("i8 whole-K single dot", k_i8wh, (x, codes_i8, sc),
                    [x_spec, ci8_spec, sc_spec], TM, TN, grid, n_elems)

    # --- q5 hi via i32 and + const-mul (no shift): (hb & 2^p) * 2^(4-p) ---
    if want("q5and"):
        nb = K // 8
        cl_eff = min(CL, nb)
        def k_q5a(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in [(l, cl_eff) for l in range(0, K, cl_eff)]:
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                p = l0 // nb
                i0 = l0 - p * nb
                hb = h_ref[:, i0:i0+cle].astype(jnp.int32)
                masked = (hb & (1 << p)).astype(jnp.bfloat16)  # 0 or 2^p exact
                bit16 = masked * jnp.bfloat16(2.0 ** (4 - p))  # 0 or 16
                w = (q + bit16) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("q5 hi and+constmul (no shift)", k_q5a, (x, codes_u8, sc, hi),
                    [x_spec, cu8_spec, sc_spec, hi_spec], TM, TN, grid, n_elems)

    # --- q5 hi: hoist the i32 widen out of the field loop (1 widen / 8 fields) ---
    if want("q5hoist"):
        nb = K // 8
        cl_eff = min(CL, nb)
        def k_q5h(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            hbw = h_ref[...].astype(jnp.int32)  # [TN, nb] once
            acc = None
            for l0, cle in [(l, cl_eff) for l in range(0, K, cl_eff)]:
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                p = l0 // nb
                i0 = l0 - p * nb
                masked = (hbw[:, i0:i0+cle] & (1 << p)).astype(jnp.bfloat16)
                bit16 = masked * jnp.bfloat16(2.0 ** (4 - p))
                w = (q + bit16) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("q5 hi hoisted widen + and+constmul", k_q5h, (x, codes_u8, sc, hi),
                    [x_spec, cu8_spec, sc_spec, hi_spec], TM, TN, grid, n_elems)

    # --- q5 hi via i16 shift (if Mosaic legalizes) ---
    if want("q5i16"):
        nb = K // 8
        cl_eff = min(CL, nb)
        def k_q5s(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in [(l, cl_eff) for l in range(0, K, cl_eff)]:
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                p = l0 // nb
                i0 = l0 - p * nb
                hb = h_ref[:, i0:i0+cle].astype(jnp.int16)
                bit = ((hb >> p) & 1).astype(jnp.bfloat16)
                w = (q + bit * jnp.bfloat16(16.0)) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("q5 hi i16 shift", k_q5s, (x, codes_u8, sc, hi),
                    [x_spec, cu8_spec, sc_spec, hi_spec], TM, TN, grid, n_elems)

    # --- q5 hi: uint4-bitcast the hi plane (2 fields/nibble at repack) ---
    # storage layout: hi plane row-pair packed like the codes, so one u8
    # bitcast yields a [TN, cle] uint4 tile whose value's bit p' in [0, 4)
    # is the element's hi bit -> only 4 fields, shift stays i32 but the
    # widened vector is half as long?  (probe: same math, different source)
    if want("q5nib"):
        hi4 = jnp.asarray(rng.integers(0, 256, (TN * (N // TN) // 2, K // 4), np.uint8))
        hi4_spec = pl.BlockSpec((TN // 2, K // 4), lambda ni: (ni, 0))
        nb4 = K // 4
        cl_eff = min(CL, nb4)
        def k_q5n(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in [(l, cl_eff) for l in range(0, K, cl_eff)]:
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                p = l0 // nb4
                i0 = l0 - p * nb4
                hn = pltpu.bitcast(h_ref[:, i0:i0+cle], jnp.uint4).astype(jnp.int32)
                bit = ((hn >> p) & 1).astype(jnp.bfloat16)
                w = (q + bit * jnp.bfloat16(16.0)) * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run_variant("q5 hi via uint4 bitcast (4 fields)", k_q5n, (x, codes_u8, sc, hi4),
                    [x_spec, cu8_spec, sc_spec, hi4_spec], TM, TN, grid, n_elems)


if __name__ == "__main__":
    main()

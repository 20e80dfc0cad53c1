"""Dev experiments round 3: cut the dequant-matmul's VPU op count.

Round-2 findings (tools/qmm_variants.py): the kernel is VPU-op-count bound
(~0.07 ms per full-width op at the 13B w2 shape); q4/i8 ~4 ops, q5_k ~7.
Candidates here target fewer full-width ops:

  nibi4    bitcast(u8, int4) -> bf16 direct (ONE cast; codes stored ^0x8 so
           the signed i4 value is q-8, with 8*sc folded into mins)
  nibi4i8  bitcast int4 -> i8 -> bf16 (fallback if direct unsupported)
  q5u8or   u8-domain or-merge of the hi bit, ONE u8->bf16 cast
  q5i4     i4 nibble cast + hi fma (saves one cast vs production)
  i8mixed  bf16 x i8 MXU dot with OUT-OF-DOT scale... (scale on x? invalid —
           kept as raw-dot cost probe)
  *_g      chunk = G lanes (repeat elided)
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
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    K, N, TN, TM, CL = args.k, args.n, args.tn, args.tm, args.cl
    G = K // 32
    n_elems = N * K
    grid = (N // TN,)
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(0, 1, (TM, K)).astype(np.float32), jnp.bfloat16)
    codes_u8 = jnp.asarray(rng.integers(0, 256, (N // 2, K), np.uint8))
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

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    def run(name, body, inputs, specs):
        out_spec = pl.BlockSpec((TM, TN), lambda ni: (0, ni))

        def call(*a):
            return pl.pallas_call(
                body, grid=grid, in_specs=specs, out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((TM, TN * grid[0]), jnp.float32),
            )(*a)

        per, comp = timed(call, inputs, label=name)
        if per is not None:
            print(f"{name:40s}: {per*1e3:7.3f} ms  {n_elems/per/1e9:7.0f} Ge/s  (compile {comp:.1f}s)")

    def chunks(cl):
        return [(l0, cl) for l0 in range(0, K, cl)]

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

    # --- nibble: int4 -> i8 -> bf16 ---
    if want("nibi4i8"):
        def k(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(CL):
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.int4).astype(jnp.int8).astype(jnp.bfloat16)
                w = q * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run("nib int4->i8->bf16", k, (x, codes_u8, sc), [x_spec, cu8_spec, sc_spec])

    # --- nibble int4 direct, chunk=G (repeat elided) ---
    if want("nibi4g"):
        def k(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(G):
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.int4).astype(jnp.bfloat16)
                acc = dot(x_ref[:, l0:l0+cle], q * s, acc)
            o_ref[:] = acc
        run("nib int4 direct chunk=G", k, (x, codes_u8, sc), [x_spec, cu8_spec, sc_spec])

    # --- current-style q4 with chunk=G ---
    if want("nibg"):
        def k(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(G):
                q = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8).astype(jnp.bfloat16)
                acc = dot(x_ref[:, l0:l0+cle], q * s, acc)
            o_ref[:] = acc
        run("nib u4->i8->bf16 chunk=G", k, (x, codes_u8, sc), [x_spec, cu8_spec, sc_spec])

    # --- q5: i4 nibble + hi fma (production minus one cast) ---
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

    # --- q5: u8 or-merge via i4 trick: (q4^8)|(h<<4) as int8-ish ---
    if want("q5u8i"):
        nb = K // 8
        cl_eff = min(CL, nb)
        def k(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(cl_eff):
                q4 = pltpu.bitcast(c_ref[:, l0:l0+cle], jnp.uint4).astype(jnp.int8)
                p = l0 // nb
                i0 = l0 - p * nb
                hb = h_ref[:, i0:i0+cle]
                t = (hb & jnp.uint8(1 << p)).astype(jnp.int8)
                t = (t >> (p - 4)) if p > 4 else (t << (4 - p)) if p < 4 else t
                q5 = (q4 | t).astype(jnp.bfloat16)
                w = q5 * pltpu.repeat(s, cle // G, 1)
                acc = dot(x_ref[:, l0:l0+cle], w, acc)
            o_ref[:] = acc
        run("q5 i8 or-merge single cast", k, (x, codes_u8, sc, hi),
            [x_spec, cu8_spec, sc_spec, hi_spec])

    # --- bf16 x i8 mixed MXU dot (cast inside the dot?) ---
    if want("i8mix2"):
        def k(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(CL):
                d = jax.lax.dot_general(
                    x_ref[:, l0:l0+cle], c_ref[:, l0:l0+cle],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            # fake scale use so planes DMA
            o_ref[:] = acc + s[0:1, 0:1].astype(jnp.float32)
        run("bf16 x i8 mixed dot", k, (x, codes_i8, sc), [x_spec, ci8_spec, sc_spec])

    # --- i8 one cast, chunk=G ---
    if want("i8g"):
        def k(x_ref, c_ref, s_ref, o_ref):
            s = s_ref[...]
            acc = None
            for l0, cle in chunks(G):
                q = c_ref[:, l0:l0+cle].astype(jnp.bfloat16)
                acc = dot(x_ref[:, l0:l0+cle], q * s, acc)
            o_ref[:] = acc
        run("i8 cast+mul chunk=G", k, (x, codes_i8, sc), [x_spec, ci8_spec, sc_spec])




def main2():
    """K-major layout probes: does contracting the weight's LANE dim insert a
    hidden per-chunk transpose?  Compare w [N, K] contract dim1 (status quo)
    vs w [K, N] contract dim0 (MXU-natural rhs)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=13824)
    ap.add_argument("--n", type=int, default=5120)
    ap.add_argument("--tn", type=int, default=256)
    ap.add_argument("--tm", type=int, default=8)
    ap.add_argument("--cl", type=int, default=1728)
    ap.add_argument("--only", default=None)
    ap.add_argument("--kmajor", action="store_true")
    args = ap.parse_args(sys.argv[2:])

    K, N, TN, TM, CL = args.k, args.n, args.tn, args.tm, args.cl
    G = K // 32
    n_elems = N * K
    grid = (N // TN,)
    rng = np.random.default_rng(0)
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    x = jnp.asarray(rng.normal(0, 1, (TM, K)).astype(np.float32), jnp.bfloat16)

    def run(name, body, inputs, specs):
        out_spec = pl.BlockSpec((TM, TN), lambda ni: (0, ni))

        def call(*a):
            return pl.pallas_call(
                body, grid=grid, in_specs=specs, out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((TM, TN * grid[0]), jnp.float32),
            )(*a)

        per, comp = timed(call, inputs, label=name)
        if per is not None:
            print(f"{name:40s}: {per*1e3:7.3f} ms  {n_elems/per/1e9:7.0f} Ge/s  (compile {comp:.1f}s)")

    def chunks(cl):
        return [(l0, cl) for l0 in range(0, K, cl)]

    # dense, K-major rhs: w [K, N] contract (1,0) — MXU-natural
    if want("densekm"):
        wd = jnp.asarray(rng.normal(0, 1, (K, N)).astype(np.float32), jnp.bfloat16)
        def k(x_ref, w_ref, o_ref):
            acc = None
            for l0, cle in chunks(CL):
                d = jax.lax.dot_general(
                    x_ref[:, l0:l0+cle], w_ref[l0:l0+cle, :],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_ref[:] = acc
        run("dense bf16 K-major rhs", k, (x, wd),
            [pl.BlockSpec((TM, K), lambda ni: (0, 0)),
             pl.BlockSpec((K, TN), lambda ni: (0, ni))])

    # dense, N-major rhs (status quo): w [N, K] contract (1,1)
    if want("densenm"):
        wd = jnp.asarray(rng.normal(0, 1, (N, K)).astype(np.float32), jnp.bfloat16)
        def k(x_ref, w_ref, o_ref):
            acc = None
            for l0, cle in chunks(CL):
                d = jax.lax.dot_general(
                    x_ref[:, l0:l0+cle], w_ref[:, l0:l0+cle],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_ref[:] = acc
        run("dense bf16 N-major rhs (status quo)", k, (x, wd),
            [pl.BlockSpec((TM, K), lambda ni: (0, 0)),
             pl.BlockSpec((TN, K), lambda ni: (ni, 0))])

    # i8 K-major: codes [K, N] i8, scales pre-expanded... use per-sublane-group
    # scale via repeat on sublane axis: sc_km [G, N] -> repeat gs on axis 0
    if want("i8km"):
        codes = jnp.asarray(rng.integers(-127, 127, (K, N), np.int8))
        sckm = jnp.full((G, N), 0.002, jnp.bfloat16)
        def k(x_ref, c_ref, s_ref, o_ref):
            acc = None
            for l0, cle in chunks(CL):
                q = c_ref[l0:l0+cle, :].astype(jnp.bfloat16)
                s = s_ref[l0 // 32 : (l0 + cle) // 32, :]
                w = q * pltpu.repeat(s, 32, 0)
                d = jax.lax.dot_general(
                    x_ref[:, l0:l0+cle], w,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_ref[:] = acc
        run("i8 K-major cast+mul", k, (x, codes, sckm),
            [pl.BlockSpec((TM, K), lambda ni: (0, 0)),
             pl.BlockSpec((K, TN), lambda ni: (0, ni)),
             pl.BlockSpec((G, TN), lambda ni: (0, ni))])

    # i8 K-major without scale (isolate)
    if want("i8kmns"):
        codes = jnp.asarray(rng.integers(-127, 127, (K, N), np.int8))
        def k(x_ref, c_ref, o_ref):
            acc = None
            for l0, cle in chunks(CL):
                q = c_ref[l0:l0+cle, :].astype(jnp.bfloat16)
                d = jax.lax.dot_general(
                    x_ref[:, l0:l0+cle], q,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_ref[:] = acc
        run("i8 K-major cast only", k, (x, codes),
            [pl.BlockSpec((TM, K), lambda ni: (0, 0)),
             pl.BlockSpec((K, TN), lambda ni: (0, ni))])

    # nibble K-major: codes [K/2, N] u8, bitcast -> [K, N] u4 (sublane doubling
    # interleaves k-pairs — absorbed by x permutation in a real kernel)
    if want("nibkm"):
        codes = jnp.asarray(rng.integers(0, 256, (K // 2, N), np.uint8))
        sckm = jnp.full((G, N), 0.002, jnp.bfloat16)
        def k(x_ref, c_ref, s_ref, o_ref):
            acc = None
            for l0, cle in chunks(CL):
                c8 = c_ref[l0 // 2 : (l0 + cle) // 2, :]
                q = pltpu.bitcast(c8, jnp.int4).astype(jnp.int8).astype(jnp.bfloat16)
                s = s_ref[l0 // 32 : (l0 + cle) // 32, :]
                w = q * pltpu.repeat(s, 32, 0)
                d = jax.lax.dot_general(
                    x_ref[:, l0:l0+cle], w,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_ref[:] = acc
        run("nib K-major i4->i8->bf16", k, (x, codes, sckm),
            [pl.BlockSpec((TM, K), lambda ni: (0, 0)),
             pl.BlockSpec((K // 2, TN), lambda ni: (0, ni)),
             pl.BlockSpec((G, TN), lambda ni: (0, ni))])


def main3():
    """i8/i16-domain op-cost probes: (a) are sub-i32 elementwise ops packed
    (4x/2x per lane) or full-width?  (b) q5 merge done entirely in i8 domain
    with repack-positioned hi bits (all fields' bits pre-placed so the
    position fix is an integer multiply <= 16, never a shift)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=13824)
    ap.add_argument("--n", type=int, default=5120)
    ap.add_argument("--tn", type=int, default=256)
    ap.add_argument("--tm", type=int, default=8)
    ap.add_argument("--only", default=None)
    args = ap.parse_args(sys.argv[2:])
    K, N, TN, TM = args.k, args.n, args.tn, args.tm
    G = K // 32
    n_elems = N * K
    grid = (N // TN,)
    rng = np.random.default_rng(0)
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    x = jnp.asarray(rng.normal(0, 1, (TM, K)).astype(np.float32), jnp.bfloat16)
    codes_u8 = jnp.asarray(rng.integers(0, 256, (N // 2, K), np.uint8))
    sc = jnp.full((N, G), 0.002, jnp.bfloat16)
    # dual hi half-planes: [N, K/4] u8; field p in 0..7 -> plane p//4 (cols
    # interleaved as one array), bit position p%4+1 (so multiply by
    # 2**(4-(p%4+1)) in {8,4,2,1} — integer, i8-safe)
    hi2 = jnp.asarray(rng.integers(0, 256, (N, K // 4), np.uint8))

    x_spec = pl.BlockSpec((TM, K), lambda ni: (0, 0))
    cu8_spec = pl.BlockSpec((TN // 2, K), lambda ni: (ni, 0))
    sc_spec = pl.BlockSpec((TN, G), lambda ni: (ni, 0))
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
            print(f"{name:40s}: {per*1e3:7.3f} ms  {n_elems/per/1e9:7.0f} Ge/s  (compile {comp:.1f}s)")

    nb = K // 8

    # q5 merge fully in i8 domain, dual positioned half-planes
    if want("q5i8dom"):
        def k(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for p in range(8):
                l0 = p * nb
                # field p reads half-plane p//4 at byte cols [0, K/8)
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

    # same but hi AND stays u8 then ONE bitcast->i8 (tests u8 and cost)
    if want("q5i8dom2"):
        def k(x_ref, c_ref, s_ref, h_ref, o_ref):
            s = s_ref[...]
            acc = None
            for p in range(8):
                l0 = p * nb
                h0 = (p // 4) * nb
                b = (p % 4) + 1
                q4 = pltpu.bitcast(c_ref[:, l0:l0+nb], jnp.int4).astype(jnp.int8)
                t8 = pltpu.bitcast(h_ref[:, h0:h0+nb] & jnp.uint8(1 << b), jnp.int8)
                q5 = (q4 + t8 * jnp.int8(2 ** (4 - b))).astype(jnp.bfloat16)
                w = q5 * pltpu.repeat(s, nb // G, 1)
                acc = dot(x_ref[:, l0:l0+nb], w, acc)
            o_ref[:] = acc
        run("q5 i8-dom, u8 and + bitcast", k, (x, codes_u8, sc, hi2),
            [x_spec, cu8_spec, sc_spec, hi2_spec])

    # op-packing probes: chain of ANDs at i8 vs i32 width over [TN, K]
    if want("opsi8"):
        ii8 = jnp.asarray(rng.integers(-100, 100, (N, K), np.int8))
        def k(c_ref, o_ref):
            v = c_ref[...]
            for _ in range(8):
                v = (v & jnp.int8(0x55)) + jnp.int8(1)
            o_ref[:] = jnp.sum(v.astype(jnp.float32), axis=1, keepdims=True) * jnp.ones((1, TN), jnp.float32)
        run("8x (and+add) i8 domain", k, (ii8,),
            [pl.BlockSpec((TN, K), lambda ni: (ni, 0))])

    if want("opsi32"):
        ii32 = jnp.asarray(rng.integers(-100, 100, (N // 4, K), np.int32))
        def k(c_ref, o_ref):
            v = c_ref[...]
            for _ in range(8):
                v = (v & jnp.int32(0x55)) + jnp.int32(1)
            o_ref[:] = jnp.sum(v.astype(jnp.float32), axis=1, keepdims=True) * jnp.ones((1, TN), jnp.float32)
        run("8x (and+add) i32 domain (N/4 rows)", k, (ii32,),
            [pl.BlockSpec((TN // 4, K), lambda ni: (ni, 0))])


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "km":
        main2()
    elif len(sys.argv) > 1 and sys.argv[1] == "i8":
        main3()
    else:
        main()

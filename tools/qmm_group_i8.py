"""Prototype: exact-q5_k matmul with i8 codes fed DIRECTLY to the MXU.

The shipped q5_k kernel expands 5-bit codes to bf16 on the VPU before the
MXU can contract them; that staging is the measured ~305 Ge/s plateau
(PERFORMANCE.md "why ~305 Ge/s").  The w8a8 path proved the escape route
(i8 operands straight to the MXU, ~544 GB/s) but re-quantizes weights AND
activations.  This prototype keeps EXACT q5_k weight semantics:

  * codes: the raw 5-bit q (0..31) stored as i8 [N, K] — exact;
  * per-32-group scale/min planes exactly as ggml decodes them
    (w = scale*q - min), pre-transposed to [G, N];
  * activations: DUAL i8 split x ~= s1*x1 + s2*x2 with s2 = s1/128 —
    representation error <= absmax/2^15, i.e. finer than the bf16
    rounding the shipped kernel applies to x;
  * the group structure rides the MXU's wasted M rows: the activation
    block has 16 rows per token (8 groups-of-32 per 256 superblock x 2
    splits), each masked to one group, so ONE [16M,256]x[256,TN] i8 dot
    yields per-32-group i32 partials and the 6-bit sub-scales apply to
    [8, TN] partials (1/32 of the per-element cost).  No per-element VPU
    op ever touches the weight stream.

Usage (timing, on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      PALLAS_AXON_REMOTE_COMPILE=1 python tools/qmm_group_i8.py
Correctness only (CPU interpret): add --check-only
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

SB = 256      # MXU contraction chunk
GS = 32       # q5_k group size
J = SB // GS  # groups per chunk = 8

SHAPES = {  # 13B decode matmuls (fused, as models/llama.py issues them)
    "w2": (5120, 13824),
    "w13": (27648, 5120),
    "wqkv": (15360, 5120),
    "wo": (5120, 5120),
}


def split_activations(x):
    """[M, K] f32 -> (x1 i8, x2 i8, s1 [M,1], s2 [M,1]); x ~= s1*x1 + s2*x2."""
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s1 = jnp.where(ax == 0, 1.0, ax / 127.0)
    x1 = jnp.clip(jnp.round(x / s1), -127, 127).astype(jnp.int8)
    r = x - s1 * x1.astype(jnp.float32)
    s2 = s1 / 128.0
    x2 = jnp.clip(jnp.round(r / s2), -127, 127).astype(jnp.int8)
    return x1, x2, s1, s2


def build_xg(x1, x2, k):
    """Group-masked activation rows: [16*M, K] i8.

    Row layout per token m: rows 16m+j   = x1 masked to group-in-chunk j,
                            rows 16m+8+j = x2 masked to group-in-chunk j.
    """
    m = x1.shape[0]
    gj = ((jnp.arange(k) // GS) % J)[None, :]          # [1, K]
    rows = jnp.arange(2 * J)[:, None]                   # [16, 1]
    sel = rows % J == gj                                # [16, K]
    lo = jnp.where(sel[:J], x1[:, None, :], 0)          # [M, 8, K]
    hi = jnp.where(sel[J:], x2[:, None, :], 0)
    return jnp.concatenate([lo, hi], axis=1).reshape(m * 2 * J, k).astype(jnp.int8)


def _kernel(xg_ref, c_ref, sct_ref, bt_ref, sgt_ref, s12_ref, o_ref, *, k, m):
    nchunks = k // SB
    tn = c_ref.shape[-2]
    acc = [jnp.zeros((1, tn), jnp.float32) for _ in range(m)]
    codes = c_ref[0] if len(c_ref.shape) == 3 else c_ref[...]
    for s in range(nchunks):
        cs = slice(s * SB, (s + 1) * SB)
        c = jax.lax.dot_general(
            xg_ref[:, cs], codes[:, cs],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        )  # [16M, TN] i32, exact
        sc = sct_ref[s * J:(s + 1) * J, :].astype(jnp.float32)  # [8, TN]
        bias = bt_ref[s * J:(s + 1) * J, :].astype(jnp.float32)
        for mm in range(m):
            c1 = c[mm * 16:mm * 16 + 8].astype(jnp.float32)
            c2 = c[mm * 16 + 8:mm * 16 + 16].astype(jnp.float32)
            t = c1 * s12_ref[mm, 0] + c2 * s12_ref[mm, 1]
            sg = sgt_ref[s * J:(s + 1) * J, mm:mm + 1]  # [8, 1] f32
            acc[mm] += jnp.sum(t * sc + sg * bias, axis=0, keepdims=True)
    for mm in range(m):
        o_ref[mm, :] = acc[mm][0]


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "tn", "static_layer"))
def _run(xg, sgt, s12, codes, sct, bt, *, meta, interpret=False, tn=256,
         static_layer=None):
    k, n_out, m = meta
    g = k // GS
    n_pad = -(-n_out // tn) * tn
    stacked = codes.ndim == 3
    grid = (n_pad // tn,)
    li = static_layer or 0
    cspec = (pl.BlockSpec((1, tn, k), lambda ni: (li, ni, 0)) if stacked
             else pl.BlockSpec((tn, k), lambda ni: (ni, 0)))
    pspec = (pl.BlockSpec((1, g, tn), lambda ni: (li, 0, ni)) if stacked
             else pl.BlockSpec((g, tn), lambda ni: (0, ni)))
    if stacked:  # planes [L, G, N]
        sct_b, bt_b = sct, bt
    else:
        sct_b, bt_b = sct, bt
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16 * m, k), lambda ni: (0, 0)),
            cspec,
            pspec if not stacked else pl.BlockSpec((1, g, tn), lambda ni: (li, 0, ni)),
            pspec if not stacked else pl.BlockSpec((1, g, tn), lambda ni: (li, 0, ni)),
            pl.BlockSpec((g, m), lambda ni: (0, 0)),
            pl.BlockSpec((m, 2), lambda ni: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda ni: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * m * k * n_pad,
            bytes_accessed=n_pad * k + 2 * n_pad * g * 2 + 16 * m * k,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xg, codes, sct_b, bt_b, sgt, s12)
    return out[:, :n_out]


def _fix_stacked_kernel(ref):
    pass


def qmatmul_group_i8(x, codes, sct, bt, *, tn=256, layer=None):
    """x [M, K] float -> [M, N] f32; codes i8 [(L,) N, K], sct/bt [(L,) G, N]."""
    k = codes.shape[-1]
    m = x.shape[0]
    xf = x.astype(jnp.float32)
    x1, x2, s1, s2 = split_activations(xf)
    xg = build_xg(x1, x2, k)
    sgt = xf.reshape(m, k // GS, GS).sum(axis=2).T  # [G, M]
    s12 = jnp.concatenate([s1, s2], axis=1)          # [M, 2]
    interpret = jax.default_backend() != "tpu"
    return _run(xg, sgt, s12, codes, sct, bt,
                meta=(k, codes.shape[-2], m), interpret=interpret, tn=tn,
                static_layer=layer)


def make_planes(key, n, k, stacked_l=None):
    """Random exact-q5_k-style planes: q in [0,31], scales, mins."""
    kq, ks, km = jax.random.split(key, 3)
    shape = (n, k) if stacked_l is None else (stacked_l, n, k)
    g = k // GS
    pshape = (g, n) if stacked_l is None else (stacked_l, g, n)
    codes = jax.random.randint(kq, shape, 0, 32, jnp.int8)
    sct = (jax.random.uniform(ks, pshape, jnp.float32) * 0.02 + 0.001).astype(jnp.bfloat16)
    mnt = (jax.random.uniform(km, pshape, jnp.float32) * 0.1).astype(jnp.bfloat16)
    return codes, sct, -mnt  # bias = -min


def check():
    """Correctness vs the f32 dequant reference (runs anywhere)."""
    key = jax.random.PRNGKey(0)
    for (n, k, m) in [(256, 512, 1), (512, 1024, 3), (384, 768, 8)]:
        codes, sct, bt = make_planes(key, n, k)
        x = jax.random.normal(jax.random.fold_in(key, n), (m, k), jnp.float32)
        # f64 host reference (TPU matmuls round; the claim under test is the
        # kernel's own arithmetic)
        cn = np.asarray(codes, np.float64)
        scn = np.asarray(sct.astype(jnp.float32), np.float64).T.repeat(GS, 1)
        btn = np.asarray(bt.astype(jnp.float32), np.float64).T.repeat(GS, 1)
        w = scn * cn + btn
        y_ref = np.asarray(x, np.float64) @ w.T
        y = np.asarray(qmatmul_group_i8(x, codes, sct, bt), np.float64)
        err = float(np.max(np.abs(y - y_ref)) / (np.max(np.abs(y_ref)) + 1e-9))
        print(f"[check] n={n} k={k} m={m}: rel_err={err:.2e}")
        assert err < 3e-4, err
    print("[check] PASS")


def bench():
    from minigpt4_tpu.ops.i8_matmul import I8SBQuant, qmatmul_i8sb
    from minigpt4_tpu.ops.repack import repack
    from minigpt4_tpu.ops.pallas_quant_matmul import qmatmul_repacked
    from minigpt4_tpu.formats.dtypes import DataType, row_bytes

    key = jax.random.PRNGKey(0)
    ITERS, REPS = 24, 3
    work, args = {}, {}
    for name, (n, k) in SHAPES.items():
        # group-i8 exact arm
        codes, sct, bt = make_planes(key, n, k)
        x = jax.random.normal(key, (1, k), jnp.bfloat16)

        def body_g(xc, _, codes=codes, sct=sct, bt=bt):
            y = qmatmul_group_i8(xc, codes, sct, bt)
            return xc + (y.sum() * 0).astype(xc.dtype), None

        # shipped q5_k kernel arm (random bytes reinterpreted as q5_k blocks)
        rb = row_bytes(DataType.Q5_K, k)
        raw = np.random.default_rng(0).integers(0, 255, (n * rb,), np.uint8)
        rq = repack(raw, (n, k), DataType.Q5_K)

        def body_q(xc, _, rq=rq):
            y = qmatmul_repacked(xc, rq)
            return xc + (y.sum() * 0).astype(xc.dtype), None

        # w8a8 arm
        ci = jax.random.randint(key, (n, k), -127, 127, jnp.int8)
        w8 = I8SBQuant(ci, jnp.full((n, k // 256), 2e-4, jnp.float32), k)

        def body_i(xc, _, w8=w8):
            y = qmatmul_i8sb(xc, w8)
            return xc + (y.sum() * 0).astype(xc.dtype), None

        for arm, body in [("gi8", body_g), ("q5k", body_q), ("w8a8", body_i)]:
            f = jax.jit(lambda x0, body=body: jax.lax.scan(body, x0, None, length=ITERS)[0])
            try:
                np.asarray(f(x))
            except Exception as e:
                print(f"# skip {name} {arm}: {type(e).__name__}: {e}", file=sys.stderr)
                continue
            work[name, arm] = f
            args[name, arm] = x

    acc = {kk: [] for kk in work}
    for _ in range(REPS):
        for kk, f in work.items():
            t0 = time.perf_counter()
            np.asarray(f(args[kk]))
            acc[kk].append((time.perf_counter() - t0) / ITERS * 1e3)

    for name, (n, k) in SHAPES.items():
        res = {}
        for arm in ("gi8", "q5k", "w8a8"):
            if (name, arm) not in acc:
                continue
            ms = min(acc[name, arm])
            res[arm] = {"ms": round(ms, 4), "ge_s": round(n * k / ms / 1e6, 1)}
        print(json.dumps({"shape": name, "res": res}))


if __name__ == "__main__":
    check()
    if "--check-only" not in sys.argv:
        bench()

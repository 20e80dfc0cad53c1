"""Dev tool: sweep (tm, tn, cl) for the fused dequant-matmul at a given shape,
reporting compile time, in-graph run time (the kernel chained inside one jit,
matching the engine's fused decode loop), and VMEM failures.  Not a library
component.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=13824)
    ap.add_argument("--n", type=int, default=5120)
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--qtype", default="q5_k")
    ap.add_argument("--tms", default=None, help="comma list")
    ap.add_argument("--tns", default="256,128")
    ap.add_argument("--cls", default=None, help="comma list of chunk lanes")
    ap.add_argument("--iters", type=int, default=50, help="in-graph chain length")
    ap.add_argument("--reps", type=int, default=5, help="timed dispatches")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from minigpt4_tpu.benchmark import random_packed
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.ops import pallas_quant_matmul as pqm

    qtype = {t.name.lower(): t for t in DataType}[args.qtype]
    rng = np.random.default_rng(0)
    rq = random_packed(rng, (args.n, args.k), qtype, mode="repack")
    rq = jax.tree_util.tree_map(lambda a: a[None], rq)
    x0 = jnp.asarray(rng.normal(0, 1, (args.m, args.k)).astype(np.float32), jnp.bfloat16)

    g = args.k // rq.group_size
    tms = [int(t) for t in args.tms.split(",")] if args.tms else ([8] if args.m <= 8 else [128, 64, 32])
    tns = [int(t) for t in args.tns.split(",")]
    cls = [int(c) for c in args.cls.split(",")] if args.cls else [g, 2 * g, 4 * g]

    plane_bytes = (rq.codes.nbytes + rq.scales.nbytes + rq.mins.nbytes
                   + (rq.hi.nbytes if rq.hi is not None else 0))

    def chain(x, w):
        def body(i, x):
            y = pqm.qmatmul_repacked(x, w, out_dtype=jnp.float32, layer=0)
            # feed a scalar of y back into x so iterations can't be elided
            return x + y[0, 0].astype(x.dtype) * 1e-9
        return jax.lax.fori_loop(0, args.iters, body, x)

    cj = jax.jit(chain)

    for tn in tns:
        for tm in tms:
            for cl in cls:
                pqm._tile_policy_override = (tm, tn, cl)
                jax.clear_caches()
                try:
                    t0 = time.perf_counter()
                    np.asarray(cj(x0, rq))
                    compile_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    for _ in range(args.reps):
                        r = cj(x0, rq)
                    np.asarray(r)
                    per_call_ms = (time.perf_counter() - t0) / (args.reps * args.iters) * 1e3
                    bw = plane_bytes / 1e9 / (per_call_ms / 1e3)
                    print(f"tm={tm} tn={tn} cl={cl}: compile {compile_s:.1f}s  "
                          f"run {per_call_ms:.3f} ms  ~{bw:.0f} GB/s", flush=True)
                except Exception as e:
                    msg = str(e).split("\n")[0][:140]
                    print(f"tm={tm} tn={tn} cl={cl}: FAIL {msg}", flush=True)
    pqm._tile_policy_override = None


if __name__ == "__main__":
    main()

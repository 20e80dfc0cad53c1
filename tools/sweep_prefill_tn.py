"""Sweep the prefill kernel's TN tile at M=512 over the 13B shapes.

Why: with the default TN=256 the (m, n, k-innermost) grid re-fetches the
[TM, TK] x block on every n step — at 13B that is 2-4x the codes bytes
(w13: 566 MB of x re-streaming vs 141 MB of codes), so the prefill kernel
is HBM-bound on ACTIVATION traffic, not weights.  x traffic scales with
n_steps = N/TN, so doubling TN halves it; the VMEM estimator
(ops/group_i8.prefill_plan) admits TN up to 1024 at the engine's tiles.

Usage (on the chip):
  PYTHONPATH=/root/repo python tools/sweep_prefill_tn.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from minigpt4_tpu.ops.group_i8 import prefill_plan, qmatmul_group
from tools.profile_prefill import SHAPES, M, make_gq

TNS = (256, 512, 1024)
# marginal timing: wall(L_LONG) - wall(L_SHORT) cancels the ~25 ms
# tunnel fetch AND any loop-invariant hoisting artifacts
L_SHORT, L_LONG = 16, 80


def main():
    key = jax.random.PRNGKey(0)
    print(json.dumps({"backend": jax.default_backend()}))
    for name, (n, k) in SHAPES.items():
        kk = jax.random.fold_in(key, hash(name) % 2**31)
        x = jax.random.normal(kk, (M, k), jnp.bfloat16)
        gq = make_gq(kk, n, k)
        flop = 2 * M * n * k
        res = {}
        for tn in TNS:
            if n % tn:
                continue
            plan = prefill_plan(k, M, 32, "none", tn)
            if plan[1] != tn:  # estimator shrank it: skip (not the config asked)
                res[str(tn)] = {"skipped": f"plan shrank to {plan}"}
                continue

            def loop(xs, wt, tn=tn):
                # scan over stacked inputs with a SCALAR accumulator:
                # iteration i+1's kernel does not depend on i's reduce, so
                # kernels queue back-to-back; per-iteration inputs defeat
                # loop-invariant hoisting
                def body(acc, xi):
                    y = qmatmul_group(xi, wt, tn=tn)
                    return acc + y.ravel()[0].astype(jnp.float32), None
                return jax.lax.scan(body, jnp.float32(0), xs)[0]

            f = jax.jit(loop)
            xs = jnp.asarray(jnp.broadcast_to(x, (L_LONG, *x.shape)))
            xs_s = jnp.asarray(xs[:L_SHORT])
            try:
                np.asarray(f(xs_s, gq))  # compile both lengths
                np.asarray(f(xs, gq))
            except Exception as e:  # Mosaic rejection / VMEM overflow
                res[str(tn)] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(xs_s, gq))
                t1 = time.perf_counter()
                np.asarray(f(xs, gq))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / (L_LONG - L_SHORT))
            ms = best * 1e3
            res[str(tn)] = {"ms": round(ms, 3),
                            "tflops": round(flop / ms / 1e9, 1)}

        # dense bf16 ceiling, same marginal harness
        wd = jax.random.normal(kk, (n, k), jnp.bfloat16) * 0.01

        def dloop(xs, wt):
            def body(acc, xi):
                y = jax.lax.dot_general(xi, wt, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return acc + y.ravel()[0], None
            return jax.lax.scan(body, jnp.float32(0), xs)[0]

        fd = jax.jit(dloop)
        xs = jnp.asarray(jnp.broadcast_to(x, (L_LONG, *x.shape)))
        xs_s = jnp.asarray(xs[:L_SHORT])
        np.asarray(fd(xs_s, wd)); np.asarray(fd(xs, wd))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fd(xs_s, wd))
            t1 = time.perf_counter()
            np.asarray(fd(xs, wd))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (L_LONG - L_SHORT))
        ms = best * 1e3
        res["dense"] = {"ms": round(ms, 3), "tflops": round(flop / ms / 1e9, 1)}
        print(json.dumps({"shape": name, "n": n, "k": k, **res}), flush=True)


if __name__ == "__main__":
    main()

"""Measure the sub-byte-packing decode delta per 13B matmul shape.

One session, same chip state: for each decode-dominant weight shape and
format, time M=1 qmatmul_group with packed vs unpacked codes and report
effective weight-stream GB/s and the packed/unpacked speedup.  This is the
driver-verifiable source for README's packed-vs-unpacked claims
(VERDICT r4 #4: the 41.8 tok/s README number was measured on UNPACKED gq,
which is no longer the default).

Run on TPU:  python tools/pack_decode_delta.py [q5_k|q6_k ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from minigpt4_tpu.formats.dtypes import DataType
from minigpt4_tpu.kernel_gate import _gq_weight
from minigpt4_tpu.ops import group_i8 as gq

SHAPES_13B = [("attn", 5120, 5120), ("w1/w3", 13824, 5120),
              ("w2", 5120, 13824), ("head", 32000, 5120)]
ITERS = 50  # chained inside ONE jit: a per-dispatch loop would measure the
#             tunnel RTT (~35 ms), not the kernel (benchmark.py's lesson)
REPS = 3


def bench_one(w, k_logical, m=1):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (m, k_logical)).astype(np.float32))

    @jax.jit
    def loop(x):
        def body(i, carry):
            x, acc = carry
            y = gq.qmatmul_group(x, w, out_dtype=jnp.float32)
            # data-dependent chain (adds ~nothing) so XLA cannot elide reps
            return x + 0.0 * y[:, :1], acc + y[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))[1]

    np.asarray(loop(x))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def stored_bytes(w):
    tot = 0
    for p in (w.codes, w.sc6, w.mn6, w.d, w.dmin, w.a, w.b, w.hb):
        if p is not None:
            tot += p.size * p.dtype.itemsize
    return tot


def main():
    qtypes = [q.lower() for q in (sys.argv[1:] or ["q5_k", "q6_k"])]
    by_name = {t.name.lower(): t for t in DataType}
    assert jax.default_backend() == "tpu", "needs the real chip"
    for qn in qtypes:
        qt = by_name[qn]
        tot_p = tot_u = 0.0
        for name, n, k in SHAPES_13B:
            rng = np.random.default_rng(0)
            import os

            os.environ["MINIGPT4_TPU_GQ_PACK"] = "0"
            wu = _gq_weight(rng, n, k, qt)
            wp = gq.pack_codes(wu)
            os.environ.pop("MINIGPT4_TPU_GQ_PACK", None)
            tu = bench_one(wu, k)
            tp = bench_one(wp, k)
            tot_p += tp
            tot_u += tu
            bp, bu = stored_bytes(wp), stored_bytes(wu)
            print(f"{qn} {name:6s} [{n}x{k}]  unpacked {tu*1e6:7.0f} us "
                  f"({bu/tu/1e9:6.1f} GB/s)  packed {tp*1e6:7.0f} us "
                  f"({bp/tp/1e9:6.1f} GB/s)  speedup x{tu/tp:0.3f}")
        print(f"{qn} ALL-SHAPES decode-weight time: packed/unpacked = "
              f"{tot_p/tot_u:0.3f} (speedup x{tot_u/tot_p:0.3f})")


if __name__ == "__main__":
    main()

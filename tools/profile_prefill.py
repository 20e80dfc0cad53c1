"""Profile the M=512 prefill matmul path per 13B shape on the real chip.

Question under test (round-5 follow-up): the engine's 512-token 13B
prefill runs at ~2370 tok/s = ~62 TFLOP/s, ~31% of the v5e bf16 MXU peak.
Is the gap in the gq prefill kernel (in-kernel dequant + bf16 dot), or in
the step around it?  This times, per fused 13B shape at M=512:

  * the gq exact prefill kernel (ops/group_i8._run_prefill via
    qmatmul_group), unpacked codes — the engine default;
  * a plain dense bf16 dot of the same shape (the MXU ceiling XLA
    actually achieves on this chip state);
  * the w8a8 i8 kernel at M=512 (the approximate arm).

Prints one JSON line per shape with ms and TFLOP/s for each arm.

Usage (on the chip):
  PYTHONPATH=/root/repo python tools/profile_prefill.py [--iters 8]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from minigpt4_tpu.ops.group_i8 import GroupQuant, pad_k_chunks, qmatmul_group
from minigpt4_tpu.ops.i8_matmul import SB as I8_SB
from minigpt4_tpu.ops.i8_matmul import I8SBQuant, qmatmul_i8sb
from minigpt4_tpu.formats.dtypes import DataType

SHAPES = {  # fused 13B matmuls, as models/llama.py issues them
    "wqkv": (15360, 5120),
    "wo": (5120, 5120),
    "w13": (27648, 5120),
    "w2": (5120, 13824),
}
M = 512
GS = 32


def make_gq(key, n, k):
    k_c, k_sc, k_mn = jax.random.split(key, 3)
    codes = jax.lax.bitwise_and(
        jax.random.randint(k_c, (n, k), 0, 256, jnp.int32).astype(jnp.int8),
        jnp.int8(0x1F))
    g, sb = k // GS, k // 256
    sc6 = jax.random.randint(k_sc, (g, n), 20, 61).astype(jnp.uint8)
    mn6 = jax.random.randint(k_mn, (g, n), 20, 61).astype(jnp.uint8)
    d = jnp.full((sb, n), 1.6e-4, jnp.float32)
    dmin = jnp.full((sb, n), 1.6e-4 * 15.5, jnp.float32)
    return pad_k_chunks(GroupQuant(
        codes, sc6, mn6, d, dmin, None, None, DataType.Q5_K, k, GS))


def timed(f, x, w, iters, reps=3):
    # fetch a SCALAR only (pulling the [M, K] carry through the tunnel
    # costs ~25 ms and would swamp the kernel), and thread the weights as
    # jit ARGUMENTS (closed-over arrays bake into the HLO as literals and
    # blow the remote-compile request size limit at 13B widths)
    def loop(x0, wt):
        def body(c, _):
            y = f(c, wt)
            return c + (y.sum() * 0).astype(c.dtype), None
        return jax.lax.scan(body, x0, None, length=iters)[0].astype(
            jnp.float32).sum()
    f_loop = jax.jit(loop)
    np.asarray(f_loop(x, w))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f_loop(x, w))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    for name, (n, k) in SHAPES.items():
        kk = jax.random.fold_in(key, hash(name) % 2**31)
        x = jax.random.normal(kk, (M, k), jnp.bfloat16)
        flop = 2 * M * n * k
        res = {}

        gq = make_gq(kk, n, k)
        ms = timed(lambda xc, wt: qmatmul_group(xc, wt), x, gq, args.iters)
        res["gq"] = {"ms": round(ms, 3), "tflops": round(flop / ms / 1e9, 1)}

        wd = (jax.random.normal(kk, (n, k), jnp.bfloat16) * 0.01)
        ms = timed(lambda xc, wt: jax.lax.dot_general(
            xc, wt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), x, wd, args.iters)
        res["dense_bf16"] = {"ms": round(ms, 3),
                             "tflops": round(flop / ms / 1e9, 1)}

        ci = jax.random.randint(kk, (n, k), -127, 127, jnp.int8)
        w8 = I8SBQuant(ci, jnp.full((n, k // I8_SB), 2e-4, jnp.float32), k)
        ms = timed(lambda xc, wt: qmatmul_i8sb(xc, wt), x, w8, args.iters)
        res["w8a8"] = {"ms": round(ms, 3),
                       "tflops": round(flop / ms / 1e9, 1)}

        print(json.dumps({"shape": name, "n": n, "k": k, "m": M, **res}))


if __name__ == "__main__":
    main()

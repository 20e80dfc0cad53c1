"""Which sub-i32 elementwise ops does Mosaic lower, and at what cost?

Times a chain of REPS identical ops over [TN, K] tiles inside one pallas
kernel (grid over N tiles, each writing its own [8, 128] out block — no
cross-lane reductions, no shared out blocks).  Cost per op per element
tells us whether i8 ops are lane-packed (cheaper than i32) or widened.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N, K, TN = 5120, 13824, 256
REPS = 8
rng = np.random.default_rng(0)


def timed(call, args, iters=30, reps=3, label=""):
    def chain(*a):
        def body(i, x):
            y = call(x, *a[1:])
            return x + (y[0, 0] * 1e-9).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, a[0])

    cj = jax.jit(chain)
    try:
        t0 = time.perf_counter()
        np.asarray(cj(*args))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            r = cj(*args)
        np.asarray(r)
        per = (time.perf_counter() - t0) / (reps * iters)
        return per, comp
    except Exception as e:
        print(f"{label:34s}: FAIL {str(e).splitlines()[0][:160]}")
        return None, None


def probe(name, body, arr):
    spec = pl.BlockSpec((TN, K), lambda ni: (ni, 0))
    out_spec = pl.BlockSpec((8, 128), lambda ni: (0, ni))

    def call(a):
        return pl.pallas_call(
            body, grid=(N // TN,), in_specs=[spec], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128 * (N // TN)), jnp.float32),
        )(a)

    per, comp = timed(call, (arr,), label=name)
    if per is not None:
        ops = N * K * REPS
        print(f"{name:34s}: {per*1e3:7.3f} ms  {ops/per/1e9:7.0f} Gop/s  (compile {comp:.1f}s)")


def mk(dtype):
    if dtype == jnp.int8:
        return jnp.asarray(rng.integers(-100, 100, (N, K), np.int8))
    if dtype == jnp.uint8:
        return jnp.asarray(rng.integers(0, 200, (N, K), np.uint8))
    if dtype == jnp.int32:
        return jnp.asarray(rng.integers(-100, 100, (N, K), np.int32))
    if dtype == jnp.bfloat16:
        return jnp.asarray(rng.normal(0, 1, (N, K)).astype(np.float32), jnp.bfloat16)
    raise ValueError


def main():
    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None

    def want(n):
        return only is None or n in only

    def chain_case(key, name, dtype, fn, out_conv=None):
        if not want(key):
            return
        def body(in_ref, o_ref):
            v = in_ref[...]
            for _ in range(REPS):
                v = fn(v)
            w = out_conv(v) if out_conv else v
            o_ref[:] = w[:8, :128].astype(jnp.float32)
        probe(name, body, mk(dtype))

    chain_case("i8aa", "i8 and+add chain", jnp.int8,
               lambda v: (v & jnp.int8(0x55)) + jnp.int8(1))
    chain_case("u8and", "u8 and chain", jnp.uint8,
               lambda v: v & jnp.uint8(0x55),
               out_conv=lambda v: v.astype(jnp.int8))
    chain_case("i8mul", "i8 mul chain", jnp.int8,
               lambda v: v * jnp.int8(3))
    chain_case("i8add", "i8 add chain", jnp.int8,
               lambda v: v + jnp.int8(1))
    chain_case("i32aa", "i32 and+add chain", jnp.int32,
               lambda v: (v & jnp.int32(0x55)) + jnp.int32(1))
    chain_case("bf16add", "bf16 add chain", jnp.bfloat16,
               lambda v: v + jnp.bfloat16(1.0))
    chain_case("bf16mul", "bf16 mul chain", jnp.bfloat16,
               lambda v: v * jnp.bfloat16(1.0009765625))

    def cast_case(key, name, dtype, conv):
        if not want(key):
            return
        def body(in_ref, o_ref):
            v = in_ref[...]
            acc = None
            for i in range(REPS):
                w = conv(v + dtype(i))
                acc = w if acc is None else acc + w
            o_ref[:] = acc[:8, :128].astype(jnp.float32)
        probe(name, body, mk(dtype))

    cast_case("c8", "i8->bf16 cast x8", jnp.int8, lambda v: v.astype(jnp.bfloat16))
    cast_case("c32", "i32->bf16 cast x8", jnp.int32, lambda v: v.astype(jnp.bfloat16))


if __name__ == "__main__":
    main()

"""Probe: can this TPU consume int4 weight codes natively (s4 matmul)?

The w8a8 path (ops/i8_matmul.py) is HBM-bound at short positions: 13 GB of
i8 codes per token is the whole cost.  If XLA lowers an s4 x s8 -> s32
contraction to the MXU natively (no per-element VPU expansion — the
~305 Ge/s VPU plateau would otherwise cap us below w8a8), int4 codes halve
decode bytes again: ~6.6 GB/token -> potentially ~2x single-stream.

Measures, interleaved in one process (shared-chip variance):
  A. i8 x i8 -> i32 XLA dot (the w8a8 traffic reference)
  B. s4 x s8 -> i32 XLA dot (same logical shape, half the weight bytes)
  C. s4 superblock einsum: reshape [N, C, SB] x [C, SB] -> [N, C] partials,
     scale, sum — the shape a real w4a8 path needs (per-superblock scales)
  D. (compile-only) Pallas kernel with an int4 operand ref, to see whether
     Mosaic accepts s4 refs at all.

Run:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      PALLAS_AXON_REMOTE_COMPILE=1 python tools/probe_int4.py
"""
import json
import sys
import time

ITERS = 24
REPS = 3
SB = 256


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    n, k = 13824, 5120  # 13B w2, the worst decode shape
    key = jax.random.PRNGKey(0)
    w8 = jax.random.randint(key, (n, k), -127, 127, jnp.int8)
    w4 = jax.random.randint(key, (n, k), -8, 8, jnp.int8).astype(jnp.int4)
    x8 = jax.random.randint(key, (1, k), -127, 127, jnp.int8)
    scales = jnp.full((n, k // SB), 2e-4, jnp.float32)

    dn = (((1,), (1,)), ((), ()))

    def dot_i8(x, w):
        return jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.int32)

    def dot_s4(x, w):
        return jax.lax.dot_general(x.astype(jnp.int4), w, dn,
                                   preferred_element_type=jnp.int32)

    def sb_s4(x, w, sc):
        # per-superblock partials then scale: what a real w4a8 needs
        xr = x.reshape(1, k // SB, SB).astype(jnp.int4)
        wr = w.reshape(n, k // SB, SB)
        part = jnp.einsum("mcs,ncs->mnc", xr, wr,
                          preferred_element_type=jnp.int32)
        return (part.astype(jnp.float32) * sc[None]).sum(-1)

    work = {}
    for name, fn, args in [
        ("i8xi8", dot_i8, (x8, w8)),
        ("s4xs4", dot_s4, (x8, w4)),
        ("s4_sb", sb_s4, (x8, w4, scales)),
    ]:
        def chained(x0, *rest, fn=fn):
            def body(c, _):
                y = fn(c, *rest)
                return c + (y.sum() % 3).astype(c.dtype), None
            return jax.lax.scan(body, x0, None, length=ITERS)[0]

        f = jax.jit(chained)
        try:
            np.asarray(f(*args))
        except Exception as e:
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            continue
        work[name] = (f, args)

    acc = {kk: [] for kk in work}
    for _ in range(REPS):
        for kk, (f, args) in work.items():
            t0 = time.perf_counter()
            np.asarray(f(*args))
            acc[kk].append((time.perf_counter() - t0) / ITERS * 1e3)

    out = {}
    for kk, times in acc.items():
        ms = min(times)
        wbytes = n * k * (1 if kk == "i8xi8" else 0.5)
        out[kk] = {"ms": round(ms, 4),
                   "eff_gbps": round(wbytes / ms / 1e6, 1)}
    print(json.dumps(out))

    # D: Mosaic s4 ref acceptance (compile-only)
    try:
        from jax.experimental import pallas as pl

        def kern(x_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                x_ref[...].astype(jnp.int8), w_ref[...].astype(jnp.int8),
                dn, preferred_element_type=jnp.int32)

        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 256), jnp.int32),
            in_specs=[pl.BlockSpec((1, 512), lambda: (0, 0)),
                      pl.BlockSpec((256, 512), lambda: (0, 0))],
            out_specs=pl.BlockSpec((1, 256), lambda: (0, 0)),
        )
        np.asarray(jax.jit(f)(x8[:, :512], w4[:256, :512]))
        print(json.dumps({"mosaic_s4_ref": "ok"}))
    except Exception as e:
        print(json.dumps({"mosaic_s4_ref": f"{type(e).__name__}: {e}"[:200]}))


if __name__ == "__main__":
    main()

"""Sweep the i8 kernel's output-tile width (TN) at the 13B decode shapes.

All widths run in ONE process with interleaved repetitions (round-robin
A/B/C x reps): the shared dev chip's sustained bandwidth drifts 3-4x
between sessions, so only same-process relative comparisons are
trustworthy.  TN reaches the kernel as a static jit arg (qmatmul_i8sb(...,
tn=...)).

  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      PALLAS_AXON_REMOTE_COMPILE=1 python tools/sweep_i8_tn.py 128,256,512
"""
import json, sys, time

SHAPES = {  # 13B decode matmuls
    "w2": (5120, 13824),
    "w13": (27648, 5120),
    "wqkv": (15360, 5120),
    "wo": (5120, 5120),
}
ITERS = 24  # chained inside one jit: eager per-call timing on the tunneled
REPS = 3    # backend measures the ~1.3 ms dispatch, not the kernel


def main() -> None:
    tns = [int(t) for t in (sys.argv[1].split(",") if len(sys.argv) > 1
                            else ("128", "256", "512"))]
    import jax, jax.numpy as jnp, numpy as np
    from minigpt4_tpu.ops.i8_matmul import I8SBQuant, qmatmul_i8sb, SB

    key = jax.random.PRNGKey(0)
    work = {}  # (name, tn) -> compiled chained fn
    args = {}
    for name, (n, k) in SHAPES.items():
        codes = jax.random.randint(key, (n, k), -127, 127, jnp.int8)
        scales = jnp.full((n, k // SB), 2e-4, jnp.float32)
        w = I8SBQuant(codes, scales, k)
        x = jax.random.normal(key, (1, k), jnp.bfloat16)
        for tn in tns:
            def body(xc, _, w=w, tn=tn):
                y = qmatmul_i8sb(xc, w, tn=tn)
                return xc + (y.sum() * 0).astype(xc.dtype), None

            f = jax.jit(lambda x0, body=body: jax.lax.scan(
                body, x0, None, length=ITERS)[0])
            try:
                np.asarray(f(x))  # compile + first-run
            except Exception as e:  # e.g. VMEM stack OOM at TN x K extremes
                print(f"# skip {name} tn={tn}: {type(e).__name__}",
                      file=sys.stderr)
                continue
            work[name, tn] = f
            args[name, tn] = x

    acc = {kk: [] for kk in work}
    for _ in range(REPS):  # interleave: every TN sees the same chip state
        for kk, f in work.items():
            t0 = time.perf_counter()
            np.asarray(f(args[kk]))
            acc[kk].append((time.perf_counter() - t0) / ITERS * 1e3)

    for tn in tns:
        res = {}
        for name, (n, k) in SHAPES.items():
            if (name, tn) not in acc:
                continue
            ms = min(acc[name, tn])  # min over reps: least chip interference
            res[name] = {"ms": round(ms, 4), "gbps": round(n * k / ms / 1e6, 1)}
        print(json.dumps({"tn": tn, "res": res}))


if __name__ == "__main__":
    main()

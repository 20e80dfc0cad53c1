"""Sweep the i8 kernel's output-tile width (TN) at the 13B decode shapes.

One subprocess per TN (baked at import):
  PYTHONPATH=... JAX_PLATFORMS=axon python tools/sweep_i8_tn.py 128,256,512
"""
import json, os, subprocess, sys, time

SHAPES = {  # 13B decode matmuls
    "w2": (5120, 13824),
    "w13": (27648, 5120),
    "wqkv": (15360, 5120),
    "wo": (5120, 5120),
}


def single(tn: int) -> None:
    os.environ["MINIGPT4_TPU_I8_TN"] = str(tn)
    import jax, jax.numpy as jnp, numpy as np
    from minigpt4_tpu.ops.i8_matmul import I8SBQuant, qmatmul_i8sb, SB

    res = {}
    for name, (n, k) in SHAPES.items():
        key = jax.random.PRNGKey(0)
        codes = jax.random.randint(key, (n, k), -127, 127, jnp.int8)
        scales = jnp.full((n, k // SB), 2e-4, jnp.float32)
        w = I8SBQuant(codes, scales, k)
        x = jax.random.normal(key, (1, k), jnp.bfloat16)
        iters = 24

        # chain iterations INSIDE one jit: on the tunneled backend each
        # dispatch pays ~1.3 ms, so eager per-call timing measures the
        # tunnel, not the kernel
        def body(xc, _):
            y = qmatmul_i8sb(xc, w)
            return xc + (y.sum() * 0).astype(xc.dtype), None

        f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
        np.asarray(f(x))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            y = f(x)
        np.asarray(y)
        ms = (time.perf_counter() - t0) / (iters * reps) * 1e3
        res[name] = {"ms": round(ms, 4), "gbps": round(n * k / ms / 1e6, 1)}
    print(json.dumps({"tn": tn, "res": res}))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        single(int(sys.argv[2]))
        return
    tns = [int(t) for t in (sys.argv[1].split(",") if len(sys.argv) > 1
                            else ("128", "256", "512"))]
    for tn in tns:
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--single", str(tn)], env=os.environ)


if __name__ == "__main__":
    main()

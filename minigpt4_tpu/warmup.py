"""Cold-start warmup CLI: populate the persistent XLA compile cache.

A fresh pod's first interaction with a 13B model pays multi-minute XLA
compiles (remote-compile backends) — round-2 measured 47.9 s first-token /
38.7 s build.  The engine already precompiles every hot computation
(`MiniGPT4Engine.warmup`) and the package pins a persistent compile cache
(minigpt4_tpu/__init__._enable_compilation_cache); this CLI is the missing
deployment step: run it ONCE at install/deploy time (or from a container
build), and every later process reloads compiled artifacts in seconds.

    minigpt4-tpu-warmup -m minigpt4-13B.bin -l vicuna-13b-q5_k.bin \
        [--n-ctx 2048] [--batch 1] [--speculative-k 8] [--cache-dtype auto]

Flags mirror the engine knobs that change compiled shapes; warm the exact
configuration you serve.  Prints phase timings and the cache directory so
deploy scripts can assert it was populated.

Reference tie-in: the reference has no cold-start story (CPU ggml runs
immediately but slowly); on TPU the compile cache IS the install-time
artifact, so this CLI plays the role the reference's prebuilt release
binaries play (/root/reference/.github/workflows/run.yml:85-94).
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-m", "--model", required=True, help="minigpt4 container")
    ap.add_argument("-l", "--llm_model", required=True, help="vicuna ggml file")
    ap.add_argument("--n-ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--speculative-k", type=int, default=0)
    ap.add_argument("--quant-mode", default="auto",
                    choices=["auto", "repack", "qtensor", "w8a8", "gq"])
    ap.add_argument("--cache-dtype", default="auto",
                    choices=["auto", "bf16", "f32", "f8"])
    ap.add_argument("--tp", type=int, default=1)
    args = ap.parse_args(argv)

    from .engine.engine import CACHE_DTYPES, MiniGPT4Engine

    t0 = time.perf_counter()
    eng = MiniGPT4Engine(
        args.model, args.llm_model, n_ctx=args.n_ctx, batch=args.batch,
        speculative_k=args.speculative_k, quant_mode=args.quant_mode,
        cache_dtype=CACHE_DTYPES.get(args.cache_dtype), tp=args.tp,
    )
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.warmup()
    t_warm = time.perf_counter() - t0
    eng.close()

    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    n = len(os.listdir(cache_dir)) if cache_dir and os.path.isdir(cache_dir) else 0
    print(f"[warmup] build {t_build:.1f}s, warmup {t_warm:.1f}s; "
          f"compile cache {cache_dir} ({n} artifacts)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

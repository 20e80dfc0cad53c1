"""Sweep the flash-decode KV block size at long decode positions.

Times the attention-only cost (all 40 layers of the 13B geometry, S=1)
against the cursor position for each MINIGPT4_TPU_FLASH_BLK value, in a
fresh subprocess per value (the block size is baked at import).

  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python tools/sweep_flash_blk.py            # orchestrates subprocesses
  ... --single 256                               # one measurement (internal)

Motivation (VERDICT r1 weak #6 / next #9): marginal attention cost is
~5.25 us/pos/token with 128-blocks (~312 GB/s effective on the KV stream)
while the weight stream measures ~550 GB/s — bigger contiguous blocks
should close that gap at long positions.
"""

import json
import os
import subprocess
import sys
import time

L, H, DH, C = 40, 40, 128, 2048  # 13B decoder geometry


def single(blk: int) -> None:
    os.environ["MINIGPT4_TPU_FLASH_BLK"] = str(blk)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minigpt4_tpu.ops.flash_decode import flash_decode_attention

    key = jax.random.PRNGKey(0)
    ck = jax.random.normal(key, (L, 1, H, C, DH), jnp.bfloat16)
    cv = jax.random.normal(key, (L, 1, H, C, DH), jnp.bfloat16)
    q = jax.random.normal(key, (1, H, 1, DH), jnp.bfloat16)

    @jax.jit
    def attn_all_layers(q, ck, cv, pos):
        outs = [
            flash_decode_attention(q, ck, cv, li, pos, 1.0 / 11.3)
            for li in range(L)
        ]
        return jnp.stack(outs).sum(axis=0)

    res = {}
    for pos in (80, 512, 1024, 2000):
        p = jnp.int32(pos)
        np.asarray(attn_all_layers(q, ck, cv, p))  # compile + warm
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            out = attn_all_layers(q, ck, cv, p)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        bytes_read = L * 2 * H * min(pos + 1, C) * DH * 2
        res[pos] = {"ms": round(ms, 3), "gbps": round(bytes_read / ms / 1e6, 1)}
    marg = (res[2000]["ms"] - res[80]["ms"]) / (2000 - 80) * 1e3
    print(json.dumps({"blk": blk, "res": res, "marginal_us_per_pos": round(marg, 3)}))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        single(int(sys.argv[2]))
        return
    blks = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1
                             else ("128", "256", "512"))]
    for blk in blks:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(blk)],
            env=os.environ,
        )
        if r.returncode != 0:
            print(f"[sweep] blk={blk} failed rc={r.returncode}", file=sys.stderr)


if __name__ == "__main__":
    main()

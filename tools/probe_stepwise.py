"""Measure the strict per-token decode path (the C ABI loop) at run-ahead
depths 0..4 on the real chip, 13B w8a8 default config.

The depth-D pipeline (engine._Lookahead) dispatches D sample+eval steps
beyond what the host has consumed; each consumed 4-byte id was dispatched
D calls earlier and copied host-side async, so per-call wall should fall
from device-step + tunnel-RTT (~56 ms round 2) toward the fused loop's
device-step cost (~24 ms).

Usage: python tools/probe_stepwise.py [--model 13B] [--n 64]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import collections
import time

import numpy as np
import jax
import jax.numpy as jnp

from minigpt4_tpu import benchmark as B
from minigpt4_tpu.formats.dtypes import DataType
from minigpt4_tpu.models import llama as llama_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="13B")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--depths", default="0,1,2,3,4")
    args = ap.parse_args()

    cfg = B.GEOMETRIES[args.model]
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    params = jax.device_put(
        B.synth_llama_params(cfg, DataType.Q5_K, rng, quant_mode="w8a8"))
    jax.block_until_ready(jax.tree_util.tree_leaves(params["layers"]))
    print(f"build {time.perf_counter()-t0:.1f}s", flush=True)

    cache_dt = jnp.float8_e4m3fn if args.model == "13B" else jnp.bfloat16
    cache = llama_mod.init_cache(cfg, batch=1, dtype=cache_dt)
    prefill_len = 64
    fwd = jax.jit(
        lambda p, c, e, pos0: llama_mod.forward(p, c, e, pos0, cfg),
        donate_argnums=(1,))
    embed = jax.jit(llama_mod.embed_tokens)
    sample1 = jax.jit(lambda l: jnp.argmax(l[0]).astype(jnp.int32))
    step1 = jax.jit(
        lambda p, c, t, pos0: llama_mod.forward(
            p, c, llama_mod.embed_tokens(p, t), pos0, cfg),
        donate_argnums=(1,))

    tokens = jnp.asarray(
        rng.integers(0, cfg.n_vocab, (1, prefill_len), dtype=np.int64))
    logits, cache = fwd(params, cache, embed(params, tokens), jnp.int32(0))
    np.asarray(logits)
    # warm the decode compile
    tid = sample1(logits)
    logits, cache = step1(params, cache, tid.reshape(1, 1), jnp.int32(prefill_len))
    int(np.asarray(tid))
    np.asarray(logits)

    pos = prefill_len + 1
    n = args.n
    for depth in [int(d) for d in args.depths.split(",")]:
        queue = collections.deque()
        dispatched = 0

        def dispatch_one():
            nonlocal logits, cache, dispatched
            t = sample1(logits)
            logits, cache = step1(
                params, cache, t.reshape(1, 1), jnp.int32(pos + dispatched))
            if hasattr(t, "copy_to_host_async"):
                t.copy_to_host_async()
            queue.append(t)
            dispatched += 1

        t0 = time.perf_counter()
        for _ in range(n):
            while len(queue) <= depth and dispatched < n:
                dispatch_one()
            int(np.asarray(queue.popleft()))
        np.asarray(logits)
        dt = time.perf_counter() - t0
        pos += n
        print(f"depth {depth}: {dt/n*1e3:6.2f} ms/token  {n/dt:6.2f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()

"""Decompose the 13B 512-token prefill step: matmul tiles vs attention span.

Round-5 finding this probes: the gq prefill kernel is ~25% faster at
TN=1024 than TN=256 (tools/sweep_prefill_tn.py), but bench prefill512_ms
did not move.  Two suspects:

  * the bench's ``fwd`` passes no ``attn_len``, so prefill attention runs
    the full n_ctx=2048 einsum span with materialized f32 scores
    ([1, 40, 512, 2048] per layer) — the ENGINE's real prefill uses the
    512 bucket (engine.py passes the covering bucket);
  * chip-state HBM congestion hiding the x-refetch reduction.

Times forward() at M=512 for tn in {256, 1024} x attn_len in {None, 512},
marginal between 4- and 12-call chains (cancels the ~25 ms tunnel fetch).

Usage: PYTHONPATH=/root/repo python tools/profile_prefill_engine.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from minigpt4_tpu import benchmark as bm
from minigpt4_tpu.formats.dtypes import DataType
from minigpt4_tpu.models import llama as llama_mod
from minigpt4_tpu.ops import group_i8 as gi


def chain(fwd, params, cache, e, n):
    logits = None
    for _ in range(n):
        logits, cache = fwd(params, cache, e, jnp.int32(0))
    np.asarray(logits)
    return cache


def main():
    cfg = bm.GEOMETRIES["13B"]
    rng = np.random.default_rng(0)
    bm.bench_pack_policy(cfg)
    params = jax.device_put(bm.synth_llama_params(
        cfg, DataType.Q5_K, rng, jnp.bfloat16, quant_mode="gq"))
    jax.block_until_ready(jax.tree_util.tree_leaves(params["layers"]))
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 512), np.int64))
    e = jax.jit(llama_mod.embed_tokens)(params, tokens)
    print(json.dumps({"built": True, "backend": jax.default_backend()}),
          flush=True)

    for tn in (256, 1024):
        gi.PREFILL_TN = tn  # read at trace time by _run_prefill
        for attn_len in (None, 512):
            fwd = jax.jit(
                lambda p, c, e_, pos0, al=attn_len: llama_mod.forward(
                    p, c, e_, pos0, cfg, attn_len=al),
                donate_argnums=(1,),
            )
            cache = llama_mod.init_cache(cfg, batch=1, dtype=jnp.float8_e4m3fn)
            cache = chain(fwd, params, cache, e, 1)  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                cache = chain(fwd, params, cache, e, 4)
                t1 = time.perf_counter()
                cache = chain(fwd, params, cache, e, 12)
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / 8)
            print(json.dumps({
                "tn": tn, "attn_len": attn_len,
                "prefill512_ms": round(best * 1e3, 1),
                "prefill_tok_s": round(512 / best, 0),
            }), flush=True)


if __name__ == "__main__":
    main()

"""Decompose the paged speculative verify-pass cost (same session, B lanes).

Measured round-2: paged spec pass (k=8) = 60.9 ms vs 38.8 ms plain paged
step at 8 lanes — +57%, where DENSE spec passes measured +2% over dense
plain steps.  This probe times, interleaved in ONE process:

  A. dense plain chunk step        (decode_loop, stacked cache)
  B. dense spec pass k=8           (speculative_decode_loop)
  C. paged plain chunk step        (decode_loop, page pool)
  D. paged spec pass k=8           (spans cross page edges: blended writes)
  E. paged spec pass k=8, aligned  (cursors at a page start: spans never
                                    cross, the crossing-write branch still
                                    traced but W2 degenerates)

D-E isolates what crossing itself costs at runtime; D-C vs B-A isolates
the paged-spec overhead; if E ~ D the cost is the traced two-window write
path (every span pays it), not the crossing per se.

  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      PALLAS_AXON_REMOTE_COMPILE=1 python tools/probe_paged_spec_cost.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 8
K = 8
PASSES = 2
CHUNK = 16
REPS = 3


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from minigpt4_tpu import benchmark as B
    from minigpt4_tpu.engine.device_sampling import DeviceSamplingConfig
    from minigpt4_tpu.engine.paged import PAGE, PagedKVPool
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.models import llama as llama_mod

    cfg = B.GEOMETRIES["13B"]
    bcfg = dataclasses.replace(cfg, n_ctx=512)
    cache_dtype = jnp.float8_e4m3fn
    rng = np.random.default_rng(0)
    params = jax.device_put(
        B.synth_llama_params(cfg, DataType.Q5_K, rng, jnp.bfloat16,
                             quant_mode="w8a8"))
    jax.block_until_ready(jax.tree_util.tree_leaves(params["layers"]))
    scfg = DeviceSamplingConfig(temp=0.0)
    key = jax.random.PRNGKey(1)
    logits0 = jnp.zeros((LANES, bcfg.n_vocab), jnp.float32)
    hist0 = np.full((LANES, bcfg.n_ctx), -1, np.int32)
    hist0[:, :256] = np.tile(np.arange(8, dtype=np.int32), (LANES, 32))
    hist0 = jnp.asarray(hist0)

    pos_cross = jnp.full((LANES,), PAGE - K, jnp.int32)  # spans straddle
    pos_align = jnp.full((LANES,), PAGE, jnp.int32)      # spans inside page 1
    out = {}

    def measure(work):
        """compile + time each closure, interleaved (min over reps)."""
        live = {}
        for name, fn in work:
            try:
                fn()
                live[name] = fn
            except Exception as e:
                print(f"# {name}: {type(e).__name__}: {e}"[:300],
                      file=sys.stderr)
        acc = {k: [] for k in live}
        for _ in range(REPS):
            for name, fn in live.items():
                t0 = time.perf_counter()
                fn()
                acc[name].append(time.perf_counter() - t0)
        for name, ts in acc.items():
            per = (8 if name.endswith("8")
                   else PASSES if "spec" in name else CHUNK)
            out[name + "_ms"] = round(min(ts) / per * 1e3, 2)

    # --- phase 1: dense group (freed before the pool allocates — both
    # beside the 13 GB i8 codes would OOM a 16 GB part)
    dcache = llama_mod.init_cache(bcfg, batch=LANES, dtype=cache_dtype)
    ddl = jax.jit(lambda p, c, l0, pos0, k: llama_mod.decode_loop(
        p, c, l0, pos0, CHUNK, k, scfg, bcfg), donate_argnums=(1,))
    dsp = jax.jit(lambda p, c, l0, pos0, h: llama_mod.speculative_decode_loop(
        p, c, l0, pos0, h, PASSES, K, bcfg, attn_len=bcfg.n_ctx),
        donate_argnums=(1,))
    # 8-pass dispatch: isolates how much of the per-pass cost is the
    # per-dispatch overhead (host RTT) amortized over only 2 passes
    dsp8 = jax.jit(lambda p, c, l0, pos0, h: llama_mod.speculative_decode_loop(
        p, c, l0, pos0, h, 8, K, bcfg, attn_len=bcfg.n_ctx),
        donate_argnums=(1,))
    state = {"dc": dcache}

    def a_dense_plain():
        t, l, state["dc"] = ddl(params, state["dc"], logits0, pos_cross, key)
        np.asarray(t)

    def b_dense_spec():
        t, c, l, state["dc"], h = dsp(params, state["dc"], logits0,
                                      pos_cross, hist0)
        np.asarray(t)

    def b8_dense_spec8():
        t, c, l, state["dc"], h = dsp8(params, state["dc"], logits0,
                                       pos_cross, hist0)
        np.asarray(t)

    measure([("dense_plain", a_dense_plain), ("dense_spec", b_dense_spec),
             ("dense_spec8", b8_dense_spec8)])
    del dcache
    state.clear()

    # --- phase 2: page pool (3 pages/lane: room for crossing spans)
    pool = PagedKVPool(bcfg, LANES * 3, bcfg.n_ctx, dtype=cache_dtype)
    lane_pages = [pool.alloc(3) for _ in range(LANES)]
    pt = jnp.asarray(np.stack([pool.table_row(p) for p in lane_pages]))
    pdl = jax.jit(lambda p, kv, t, l0, pos0, k: llama_mod.decode_loop(
        p, kv, l0, pos0, CHUNK, k, scfg, bcfg, page_table=t),
        donate_argnums=(1,))
    psp = jax.jit(lambda p, kv, t, l0, pos0, h: (
        llama_mod.speculative_decode_loop(
            p, kv, l0, pos0, h, PASSES, K, bcfg, page_table=t)),
        donate_argnums=(1,))

    def c_paged_plain():
        t, l, kv = pdl(params, {"k": pool.k, "v": pool.v}, pt, logits0,
                       pos_cross, key)
        pool.k, pool.v = kv["k"], kv["v"]
        np.asarray(t)

    def d_paged_spec_cross():
        t, c, l, kv, h = psp(params, {"k": pool.k, "v": pool.v}, pt, logits0,
                             pos_cross, hist0)
        pool.k, pool.v = kv["k"], kv["v"]
        np.asarray(t)

    def e_paged_spec_aligned():
        t, c, l, kv, h = psp(params, {"k": pool.k, "v": pool.v}, pt, logits0,
                             pos_align, hist0)
        pool.k, pool.v = kv["k"], kv["v"]
        np.asarray(t)

    measure([("paged_plain", c_paged_plain),
             ("paged_spec_cross", d_paged_spec_cross),
             ("paged_spec_aligned", e_paged_spec_aligned)])
    print(json.dumps(out))


if __name__ == "__main__":
    main()

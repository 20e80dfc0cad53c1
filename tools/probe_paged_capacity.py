"""Paged-serving capacity probe: how many 13B lanes decode past the dense
8-lane boundary, and at what aggregate rate.

The dense batched path reserves session_ctx positions per lane, capping a
16 GB v5e at 8 lanes beside the 13B i8 codes (PERFORMANCE.md "Serving
capacity boundary").  The page pool charges lanes for USED pages only;
this probe builds pools at growing lane counts (pages sized for a
short-conversation working set) with RANDOM pool contents — timing only;
decode cost does not depend on KV values — and times the paged decode
loop the serving paths dispatch (engine.StepFns.paged_decode_loop's
underlying llama.decode_loop(page_table=...)).

  python tools/probe_paged_capacity.py --model 13B --lanes 8,12,16 \
      --pages-per-lane 2 [--chunk 16]

One JSON line per lane count: aggregate tok/s, pool MB, and the dense
reservation MB the same lanes would have needed.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="13B")
    ap.add_argument("--lanes", default="8,12,16")
    ap.add_argument("--pages-per-lane", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--quant-mode", default="w8a8")
    ap.add_argument("--cache-dtype", choices=["bf16", "f8"], default="f8")
    ap.add_argument("--spec-k", type=int, default=0, metavar="K",
                    help="measure paged SPECULATIVE serving instead: greedy "
                         "verify passes of width K over the pool, with "
                         "cyclic per-lane histories (drafts saturate, so the "
                         "aggregate is the mechanism's upper bound; the "
                         "pass cost is the hardware truth).  Cursors start "
                         "K positions before a page edge so verify spans "
                         "CROSS pages every step.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from minigpt4_tpu import benchmark as B
    from minigpt4_tpu.engine.device_sampling import DeviceSamplingConfig
    from minigpt4_tpu.engine.paged import PAGE, PagedKVPool
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.models import llama as llama_mod

    cfg = B.GEOMETRIES[args.model]
    import dataclasses

    bcfg = dataclasses.replace(cfg, n_ctx=512)
    cache_dtype = {"bf16": jnp.bfloat16, "f8": jnp.float8_e4m3fn}[args.cache_dtype]
    rng = np.random.default_rng(0)
    params = jax.device_put(
        B.synth_llama_params(cfg, DataType.Q5_K, rng, jnp.bfloat16,
                             quant_mode=args.quant_mode))
    jax.block_until_ready(jax.tree_util.tree_leaves(params["layers"]))

    ppl = args.pages_per_lane
    spec_k, passes, runin = args.spec_k, 2, 32
    if spec_k:
        # greedy run-in first (the model's own continuation seeds the n-gram
        # history — an arbitrary seed would reject every draft), landing the
        # cursors K before a page edge so verify spans straddle pages
        start_pos = ppl * PAGE - spec_k - runin
        ppl_alloc = ppl + -(-(passes * spec_k + runin) // PAGE)
    else:
        start_pos = (ppl - 1) * PAGE  # cursors mid-way into the last held page
        ppl_alloc = ppl
    for lanes in [int(x) for x in args.lanes.split(",")]:
        try:
            # zero pool contents (the constructor's default): decode cost
            # does not depend on KV values, and k/v must stay DISTINCT
            # buffers (both are donated per dispatch)
            pool = PagedKVPool(bcfg, lanes * ppl_alloc, bcfg.n_ctx,
                               dtype=cache_dtype)
            lane_pages = [pool.alloc(ppl_alloc) for _ in range(lanes)]
            pt = jnp.asarray(np.stack([pool.table_row(p) for p in lane_pages]))
            logits = jnp.zeros((lanes, bcfg.n_vocab), jnp.float32)
            pos = jnp.full((lanes,), start_pos, jnp.int32)
            k2 = jax.random.PRNGKey(1)
            dense_mb = (2 * lanes * bcfg.n_layer * bcfg.n_head * bcfg.n_ctx
                        * bcfg.head_dim * jnp.dtype(cache_dtype).itemsize / 1e6)
            line = {
                "lanes": lanes,
                "pool_mb": round(2 * pool.k.nbytes / 1e6, 1),
                "dense_reservation_mb": round(dense_mb, 1),
            }
            if spec_k:
                # greedy run-in through the paged decode loop: the model's
                # own continuation fills the n-gram history, so acceptance
                # reflects the stream's draftability (synthetic greedy
                # streams go cyclic and draft well — treat the aggregate as
                # this workload's optimistic end; spec_pass_ms is the
                # workload-independent hardware cost)
                hist_np = np.full((lanes, bcfg.n_ctx), -1, np.int32)
                rdl = jax.jit(
                    lambda p, pool_kv, t, l0, pos0, k: llama_mod.decode_loop(
                        p, pool_kv, l0, pos0, runin, k,
                        DeviceSamplingConfig(temp=0.0), bcfg, page_table=t,
                    ),
                    donate_argnums=(1,),
                )
                toks, _lg, poolkv = rdl(params, {"k": pool.k, "v": pool.v},
                                        pt, logits, pos, k2)
                pool.k, pool.v = poolkv["k"], poolkv["v"]
                np.asarray(toks)  # compile + sync
                # same-session plain baseline (timing only; its writes are
                # overwritten by the real run-in below) so the spec-pass cost
                # has an in-session per-token comparison point
                t0 = time.perf_counter()
                toksb, _lg, poolkv = rdl(params, {"k": pool.k, "v": pool.v},
                                         pt, logits, pos, k2)
                pool.k, pool.v = poolkv["k"], poolkv["v"]
                np.asarray(toksb)
                line["plain_step_ms"] = round(
                    (time.perf_counter() - t0) / runin * 1e3, 2)
                # the real run-in: seeds the n-gram history AND the KV state
                toks, logits, poolkv = rdl(params, {"k": pool.k, "v": pool.v},
                                           pt, logits, pos, k2)
                pool.k, pool.v = poolkv["k"], poolkv["v"]
                hist_np[:, start_pos : start_pos + runin] = np.asarray(toks)
                pos = pos + runin
                hist = jnp.asarray(hist_np)
                psl = jax.jit(
                    lambda p, pool_kv, t, l0, pos0, h: (
                        llama_mod.speculative_decode_loop(
                            p, pool_kv, l0, pos0, h, passes, spec_k, bcfg,
                            page_table=t)
                    ),
                    donate_argnums=(1,),
                )
                toks, cnt, logits, poolkv, hist = psl(
                    params, {"k": pool.k, "v": pool.v}, pt, logits, pos, hist)
                pool.k, pool.v = poolkv["k"], poolkv["v"]
                np.asarray(toks)  # compile + sync
                t0 = time.perf_counter()
                n_tok = n_pass = 0
                for _ in range(args.steps):
                    # fixed cursors (state reuse): timing only
                    toks, cnt, logits, poolkv, hist = psl(
                        params, {"k": pool.k, "v": pool.v}, pt, logits, pos,
                        hist)
                    pool.k, pool.v = poolkv["k"], poolkv["v"]
                    n_tok += int(np.asarray(cnt).sum())
                    n_pass += passes * lanes
                dt = time.perf_counter() - t0
                line.update({
                    "spec_k": spec_k,
                    "aggregate_tok_s_measured": round(n_tok / dt, 2),
                    "accept_per_pass": round(n_tok / n_pass, 2),
                    "spec_pass_ms": round(dt / (args.steps * passes) * 1e3, 2),
                })
                del cnt, hist
            else:
                pdl = jax.jit(
                    lambda p, pool_kv, t, l0, pos0, k: llama_mod.decode_loop(
                        p, pool_kv, l0, pos0, args.chunk, k,
                        DeviceSamplingConfig(temp=0.0), bcfg, page_table=t,
                    ),
                    donate_argnums=(1,),
                )
                toks, logits, poolkv = pdl(params, {"k": pool.k, "v": pool.v},
                                           pt, logits, pos, k2)
                pool.k, pool.v = poolkv["k"], poolkv["v"]
                np.asarray(toks)  # compile + sync
                t0 = time.perf_counter()
                n = 0
                for _ in range(args.steps):
                    toks, logits, poolkv = pdl(params, {"k": pool.k, "v": pool.v},
                                               pt, logits, pos, k2)
                    pool.k, pool.v = poolkv["k"], poolkv["v"]
                    np.asarray(toks)
                    n += args.chunk
                dt = time.perf_counter() - t0
                line.update({
                    "aggregate_tok_s": round(lanes * n / dt, 2),
                    "per_lane_tok_s": round(n / dt, 2),
                })
            print(json.dumps(line), flush=True)
            del pool, poolkv, logits, toks, pt
        except Exception as e:
            print(json.dumps({"lanes": lanes,
                              "error": f"{type(e).__name__}: {e}"}), flush=True)


if __name__ == "__main__":
    main()

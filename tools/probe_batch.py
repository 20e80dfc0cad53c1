"""Probe the batched-serving HBM capacity boundary at 13B w8a8 + f8 cache.

Standalone version of benchmark.py's batched section (chunked prefill +
fused decode loop) at a given lane count, so capacity experiments don't pay
for the full bench run:

  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      PALLAS_AXON_REMOTE_COMPILE=1 python tools/probe_batch.py 12

One lane count per process: a failed HBM compile leaves the tunneled
allocator unrecoverable in-process.
"""
import dataclasses, json, sys, time

import jax, jax.numpy as jnp, numpy as np


def main() -> None:
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    session_ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from minigpt4_tpu import benchmark as B
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.models import llama as llama_mod
    from minigpt4_tpu.engine.device_sampling import DeviceSamplingConfig

    cfg = B.GEOMETRIES["13B"]
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    params = jax.device_put(
        B.synth_llama_params(cfg, DataType.Q5_K, rng, jnp.bfloat16,
                             quant_mode="w8a8")
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(params["layers"]))
    print(f"# params resident in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    bcfg = dataclasses.replace(cfg, n_ctx=session_ctx)
    cache = llama_mod.init_cache(bcfg, batch=bsz, dtype=jnp.float8_e4m3fn)
    fwd = jax.jit(
        lambda p, c, e, pos0: llama_mod.forward(p, c, e, pos0, bcfg),
        donate_argnums=(1,),
    )
    embed = jax.jit(llama_mod.embed_tokens)
    bprefill = 64
    tokens = jnp.asarray(
        rng.integers(0, cfg.n_vocab, (bsz, bprefill), dtype=np.int64))
    logits, cache = fwd(params, cache, embed(params, tokens), jnp.int32(0))
    np.asarray(logits)
    print("# prefill ok", file=sys.stderr)

    chunk = 16
    dl = jax.jit(
        lambda p, c, l0, pos0, key: llama_mod.decode_loop(
            p, c, l0, pos0, chunk, key, DeviceSamplingConfig(temp=0.0), bcfg
        ),
        donate_argnums=(1,),
    )
    key = jax.random.PRNGKey(0)
    pos = jnp.full((bsz,), bprefill, jnp.int32)
    toks, logits, cache = dl(params, cache, logits, pos, key)
    np.asarray(toks)  # compile + warm
    n_dec = ((session_ctx - bprefill - 2 * chunk) // chunk) * chunk
    n_dec = min(n_dec, 128)
    t0 = time.perf_counter()
    done = 0
    while done < n_dec:
        toks, logits, cache = dl(params, cache, logits, pos + chunk + done, key)
        np.asarray(toks)
        done += chunk
    dt = time.perf_counter() - t0
    print(json.dumps({
        "batch": bsz, "session_ctx": session_ctx,
        "ms_per_chunk_step": round(dt / (n_dec / chunk) * 1e3, 2),
        "aggregate_tok_s": round(bsz * n_dec / dt, 1),
        "per_lane_tok_s": round(n_dec / dt, 2),
    }))


if __name__ == "__main__":
    main()

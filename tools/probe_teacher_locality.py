"""Probe: how learnable is the bench teacher's next-token function?

Before training a draft head against the SYNTHETIC 13B (VERDICT r2 next
#3), measure whether its teacher-forced greedy prediction on prose
contexts is dominated by the recent tokens.  Random-weight transformers
are residual-stream-dominated — greedy streams from this model are known
to cycle (PERFORMANCE.md round-4 #7), suggesting a near-Markov effective
map — but the draft's achievable agreement is exactly the locality of the
map, so measure it:

  for each position p in a word-tokenized prose stream, compare
  argmax logits(full context[:p]) vs argmax logits(context[p-w:p])
  for windows w in {1, 2, 4, 8, 16}.

High agreement at small w => a tiny trained head can reach the >=2
accepted-drafts/pass bar.  Run on the real chip:

  PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
      python tools/probe_teacher_locality.py --model 13B
"""
import argparse
import json

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="13B")
    ap.add_argument("--quant-mode", default="gq")
    ap.add_argument("--windows", default="1,2,4,8,16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from minigpt4_tpu import benchmark as B
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.models import llama as llama_mod

    cfg = B.GEOMETRIES[args.model]
    rng = np.random.default_rng(0)  # bench seeding (bench_decode line 1)
    params = B.synth_llama_params(cfg, DataType.Q5_K, rng,
                                  quant_mode=args.quant_mode)
    params = jax.device_put(params)

    stream = B.word_tokenize(B.REALISTIC_TEXT)
    warm = 32
    positions = np.arange(warm, len(stream) - 1, 3)  # every 3rd: cheap

    cache_dt = jnp.float8_e4m3fn if args.model == "13B" else jnp.bfloat16

    def teacher_argmax(ctx_tokens: np.ndarray) -> int:
        cache = llama_mod.init_cache(cfg, batch=1, dtype=cache_dt)
        emb = llama_mod.embed_tokens(params, jnp.asarray(ctx_tokens[None]))
        logits, _ = llama_mod.forward(params, cache, emb, jnp.int32(0), cfg)
        return int(jnp.argmax(logits[0]))

    # bucket contexts by length so each bucket compiles once
    fwd = jax.jit(
        lambda p, c, e: llama_mod.forward(p, c, e, jnp.int32(0), cfg)[0],
        donate_argnums=(1,),
    )

    def batch_argmax(ctxs: list[np.ndarray]) -> list[int]:
        out = []
        lens = sorted({len(c) for c in ctxs})
        by_len = {L: [c for c in ctxs if len(c) == L] for L in lens}
        for L, group in by_len.items():
            toks = np.stack(group)
            cache = llama_mod.init_cache(cfg, batch=len(group), dtype=cache_dt)
            emb = llama_mod.embed_tokens(params, jnp.asarray(toks))
            logits = fwd(params, cache, emb)
            out += [int(t) for t in np.asarray(jnp.argmax(logits, -1))]
        return out

    windows = [int(w) for w in args.windows.split(",")]
    # full-context predictions: pad contexts to a common length bucket by
    # running each position's prefix; batch positions of equal length is
    # impossible (all differ), so run the full stream ONCE with all_logits
    cache = llama_mod.init_cache(cfg, batch=1, dtype=cache_dt)
    emb = llama_mod.embed_tokens(params, jnp.asarray(stream[None]))
    logits_all, _ = llama_mod.forward(params, cache, emb, jnp.int32(0), cfg,
                                      all_logits=True)
    full_pred = np.asarray(jnp.argmax(logits_all[0], -1))  # [T] pred for next

    res = {}
    for w in windows:
        ctxs = [stream[p - w:p] for p in positions]
        preds = []
        toks = np.stack(ctxs)
        cache = llama_mod.init_cache(cfg, batch=len(ctxs), dtype=cache_dt)
        embw = llama_mod.embed_tokens(params, jnp.asarray(toks))
        lw = fwd(params, llama_mod.init_cache(cfg, batch=len(ctxs), dtype=cache_dt), embw)
        preds = np.asarray(jnp.argmax(lw, -1))
        agree = float(np.mean(preds == full_pred[positions - 1]))
        res[f"w{w}"] = round(agree, 4)
        print(f"[locality] window {w}: agreement {agree:.3f}")
    print(json.dumps({"model": args.model, "positions": len(positions), **res}))


if __name__ == "__main__":
    main()

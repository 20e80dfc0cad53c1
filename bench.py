#!/usr/bin/env python
"""Driver benchmark: ONE JSON line with the headline metric.

Headline: decode tok/s/chip on Vicuna-13B-geometry q5_k (BASELINE.md target:
>= 30 tok/s on one v5e chip -> vs_baseline = value / 30).  Falls back to the
7B geometry on hosts with little memory (CPU smoke runs use a tiny decode
count).
"""

import json
import sys


def main():
    import jax

    on_tpu = jax.default_backend() != "cpu"
    from minigpt4_tpu.benchmark import GEOMETRIES, bench_decode, bench_encode
    from minigpt4_tpu.formats.dtypes import DataType

    if on_tpu:
        model = "13B"
        try:
            dec = bench_decode(model, DataType.Q5_K, n_decode=64, prefill_len=64)
        except Exception as e:
            print(f"[bench] 13B failed ({e}); falling back to 7B", file=sys.stderr)
            model = "7B"
            dec = bench_decode(model, DataType.Q5_K, n_decode=64, prefill_len=64)
        try:
            enc = bench_encode(GEOMETRIES[model].n_embd)
        except Exception as e:  # encode is secondary; never lose the headline
            print(f"[bench] encode failed: {e}", file=sys.stderr)
            enc = {}
    else:
        # CPU smoke: tiny geometry so CI completes; value not meaningful
        import jax.numpy as jnp
        from minigpt4_tpu.models.llama import LlamaConfig
        from minigpt4_tpu import benchmark as B

        B.GEOMETRIES["smoke"] = LlamaConfig(
            n_vocab=512, n_embd=256, n_head=4, n_layer=2, n_rot=64, n_ff=512, n_ctx=128
        )
        dec = bench_decode("smoke", DataType.Q5_K, n_decode=8, prefill_len=8,
                           dtype=jnp.float32, cache_dtype=jnp.float32)
        enc = {}

    value = round(dec["decode_tok_s"], 2)
    extras = {k: round(v, 2) for k, v in {**dec, **enc}.items()}
    print(f"[bench] details: {json.dumps(extras)}", file=sys.stderr)
    print(json.dumps({
        "metric": f"decode tok/s/chip ({model} q5_k)" if on_tpu else "decode tok/s (cpu smoke)",
        "value": value,
        "unit": "tok/s",
        "vs_baseline": round(value / 30.0, 3),
    }))


if __name__ == "__main__":
    main()

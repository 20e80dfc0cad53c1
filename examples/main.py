#!/usr/bin/env python
"""CLI chat demo — the examples/main.cpp equivalent (reference:
/root/reference/examples/main.cpp:24-302): load models -> load + preprocess
image -> encode -> system prompt -> multi-prompt streamed Q&A, with every
sampling knob exposed as a flag.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from minigpt4_tpu.engine import MiniGPT4Engine, SamplingParams
from minigpt4_tpu import image as image_mod
from minigpt4_tpu.utils import Verbosity


def parse_args():
    p = argparse.ArgumentParser(description="minigpt4_tpu chat CLI")
    p.add_argument("-m", "--model", required=True, help="minigpt4 container path")
    p.add_argument("-l", "--llm_model", required=True, help="vicuna ggml path")
    p.add_argument("-i", "--image", required=True, help="image path")
    p.add_argument(
        "-p", "--prompts", nargs="+",
        default=["what is the text in the picture?", "what is the color of it?"],
    )
    p.add_argument("--verbosity", type=int, default=int(Verbosity.INFO))
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--n_ctx", type=int, default=2048)
    p.add_argument("--n_batch", type=int, default=512)
    p.add_argument("--limit", type=int, default=256)
    # the 14 sampling knobs (examples/main.cpp:31-147)
    p.add_argument("--temp", type=float, default=0.8)
    p.add_argument("--top_k", type=int, default=40)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--tfs_z", type=float, default=1.0)
    p.add_argument("--typical_p", type=float, default=1.0)
    p.add_argument("--repeat_last_n", type=int, default=64)
    p.add_argument("--repeat_penalty", type=float, default=1.1)
    p.add_argument("--alpha_presence", type=float, default=1.0)
    p.add_argument("--alpha_frequency", type=float, default=1.0)
    p.add_argument("--mirostat", type=int, default=0)
    p.add_argument("--mirostat_tau", type=float, default=5.0)
    p.add_argument("--mirostat_eta", type=float, default=1.0)
    p.add_argument("--penalize_nl", type=int, default=1)
    p.add_argument(
        "--speculative-k", type=int, default=0,
        help="speculative decoding verify width (0 = off): greedy output "
        "is token-identical; sampled output runs speculative sampling "
        "(distribution-identical) — both just faster",
    )
    p.add_argument(
        "--draft-llm", default=None, metavar="PATH",
        help="smaller ggml llama sharing the tokenizer: draft-model "
        "speculative decoding for greedy generation (token-identical)",
    )
    p.add_argument(
        "--draft-head", default=None, metavar="PATH",
        help="distilled draft-head artifact (train/draft.py): tiny drafter "
        "over the model's own embedding, no second ggml file",
    )
    p.add_argument(
        "--cache-dtype", choices=["auto", "bf16", "f32", "f8"], default="auto",
        help="KV-cache storage dtype; f8 (e4m3) halves cache memory at a "
        "small attention-precision cost",
    )
    p.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel devices for the decoder (greedy-identical)",
    )
    p.add_argument(
        "--smooth-scales", default=None,
        help="w8a8 calibration npz (python -m minigpt4_tpu.quality "
        "--save-scales); exact-fold activation-grid steering",
    )
    p.add_argument(
        "--ctx-shift", action="store_true",
        help="llama.cpp-style context shift: when the chat fills n_ctx, "
        "drop the oldest turns after the system-prompt/image prefix and "
        "slide the KV cache instead of erroring (unbounded chat length)",
    )
    p.add_argument(
        "--tokens-out", default=None, metavar="PATH",
        help="also write the generated pieces one-per-line here (stable "
        "stream for A/B diffs against the reference binary — "
        "tools/day_one_validation.sh)",
    )
    p.add_argument(
        "--warmup", action="store_true",
        help="precompile the common prefill buckets / decode chunks / image "
        "encoder before the session (multi-minute first compiles on "
        "remote-compile backends are paid up front, not at first token)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    t_start = time.perf_counter()

    from minigpt4_tpu.engine.engine import CACHE_DTYPES

    eng = MiniGPT4Engine(
        args.model, args.llm_model, verbosity=args.verbosity,
        seed=args.seed, n_ctx=args.n_ctx, n_batch=args.n_batch,
        speculative_k=args.speculative_k,
        draft_llm_path=args.draft_llm,
        draft_head_path=args.draft_head,
        cache_dtype=CACHE_DTYPES.get(args.cache_dtype),
        smooth_scales=args.smooth_scales,
        context_shift=args.ctx_shift,
        tp=args.tp,
    )
    if args.warmup:
        eng.warmup()
    sp = SamplingParams(
        temp=args.temp, top_k=args.top_k, top_p=args.top_p, tfs_z=args.tfs_z,
        typical_p=args.typical_p, repeat_last_n=args.repeat_last_n,
        repeat_penalty=args.repeat_penalty, alpha_presence=args.alpha_presence,
        alpha_frequency=args.alpha_frequency, mirostat=args.mirostat,
        mirostat_tau=args.mirostat_tau, mirostat_eta=args.mirostat_eta,
        penalize_nl=bool(args.penalize_nl),
    )

    img = image_mod.load_image(args.image)
    pre = image_mod.preprocess(img, size=eng.vision_cfg.vit.image_size)
    emb = eng.encode_image(pre)

    eng.system_prompt()
    first = True
    tok_f = open(args.tokens_out, "w") if args.tokens_out else None
    for prompt in args.prompts:
        print(f"\n> {prompt}")
        if first:
            eng.begin_chat_image(emb, prompt)
            first = False
        else:
            eng.begin_chat(prompt)
        for tok in eng.generate(limit=args.limit, params=sp):
            print(tok, end="", flush=True)
            if tok_f:
                tok_f.write(tok.replace("\n", "\\n") + "\n")
        print()
        if tok_f:
            tok_f.write("### end of turn\n")
    if tok_f:
        tok_f.close()

    print(f"\n[session: {(time.perf_counter() - t_start) * 1e3:.0f} ms]", file=sys.stderr)
    eng.close()


if __name__ == "__main__":
    main()

"""Prepare the reference-binary A/B artifacts (docs/REFERENCE_PARITY.md).

Writes, into --out (default /tmp/ref_ab):
  * minigpt4-tiny.bin / vicuna-tiny.bin — fixture model pair whose geometry
    satisfies the reference's hardcoded shape checks (head_dim 88, 257
    positions, 64-dim Q-Former heads; /root/reference/minigpt4.cpp:1271-1279)
  * image.png — deterministic test image
  * pixels.npy — OUR preprocessed [3, 224, 224] f32 tensor (bit-exact input
    for `minigpt4_encode_image`, bypassing preprocessing differences)
  * prompts.txt — the greedy chat script both binaries should run

In a networked environment, build /root/reference, run both CLIs greedy on
these artifacts, and diff the token streams.  This script itself runs
offline (it only uses this repo's writers).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

PROMPTS = ["what is the text in the picture?", "what is the color of it?"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ref_ab")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from fixtures import build_tiny_models

    model, llm = build_tiny_models(out, seed=args.seed)

    rng = np.random.default_rng(args.seed)
    img = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    try:
        from PIL import Image

        Image.fromarray(img).save(out / "image.png")
    except ImportError:
        np.save(out / "image_rgb.npy", img)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from minigpt4_tpu.image import preprocess

    np.save(out / "pixels.npy", preprocess(img))
    (out / "prompts.txt").write_text("\n".join(PROMPTS) + "\n")
    print(f"[ref-ab] artifacts at {out}: {sorted(p.name for p in out.iterdir())}")


if __name__ == "__main__":
    main()

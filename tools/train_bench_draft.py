"""Train the benchmark drafter against the bench's synthetic 13B teacher.

VERDICT r2 next #3: draft-model speculation shipped with no drafter to
run.  This tool trains the train/draft.py head ON THE CHIP against the
EXACT teacher the benchmark measures (synthetic 13B, quant_mode w8a8 +
f8 cache, rng seed 0 — the headline config), then evaluates the number
the bench will report:

  teacher-forced draft acceptance on non-cyclic prose = at every position
  of a word-tokenized prose stream the teacher has never generated, does
  the draft's next-token prediction AGREE with the teacher's?  Verify
  accepts exactly on that agreement, so the pass-walk over the agreement
  sequence is deployment acceptance for those contexts.  (This is the
  draft-model analogue of benchmark.spec_acceptance_on_stream's n-gram
  convention; the n-gram floor on the same stream is 1.04/pass.)

Training data deliberately excludes benchmark.REALISTIC_TEXT (the eval
stream): held-out prose in the same register, uniform-random id streams,
and zipf-ish repetitive streams — all over the small id range word-level
tokenization produces.

  PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
      python tools/train_bench_draft.py --steps 1200 \
      --out minigpt4_tpu/assets/bench_draft_13b.npz
"""
import argparse
import time
from pathlib import Path

import numpy as np

# Held-out prose (same assistant-describes-an-image register as the eval
# stream, different content/words).  PUBLIC-DOMAIN-free original text.
TRAIN_TEXT_A = """
The photograph shows a narrow market street in the early morning, before
the stalls have opened. Wooden crates are stacked against the shutters of
a bakery, and a bicycle with a wicker basket leans on a lamp post near the
curb. The pavement is wet, which suggests it rained during the night, and
the reflections of the shop signs run in long streaks of red and green
across the stones. A cat sits on the lowest step of the bakery entrance,
looking toward the far end of the street where a delivery van is parked
with its rear doors open. There are no customers yet, though a single
figure in an apron is visible inside the bakery window, arranging loaves
on a tray. The light is low and warm, coming from the east, and the upper
floors of the buildings remain in shadow. The sign above the bakery reads
"Fournier et Fils" in gold letters on a dark blue board, and a smaller
card in the window lists the day's bread in handwritten script. If you
mean the awning, the awning is striped in cream and faded rose, and one
of its corners has come loose from the frame. To summarize, the scene is
a quiet street at dawn, centered on the bakery, with the wet pavement
carrying most of the color and the gold lettering of the sign providing
the strongest contrast.
"""
TRAIN_TEXT_B = """
This image is a diagram of a small sailing dinghy viewed from the side,
with each part labeled by a thin line and a number. The hull is drawn in
simple outline and shaded light grey below the waterline. The mast rises
from the center of the boat and carries a single triangular sail, which
is labeled with the number three. The rudder and tiller are at the stern,
labeled five and six, and the centerboard is shown as a dashed shape
beneath the hull, labeled four. The numbers correspond to a legend in the
lower right corner of the diagram, printed in a small sans serif face.
The legend reads: one, hull; two, mast; three, mainsail; four,
centerboard; five, rudder; six, tiller; seven, bow; eight, stern. The
only color in the drawing is a red arrow indicating the direction of the
wind, which points from the upper left toward the sail. The background is
plain white, and a scale bar in the lower left indicates one meter. The
title of it is printed along the top edge and reads "Parts of a Sailing
Dinghy", followed by a small registration mark ending in the letters QS.
"""


def make_streams(rng, n_tokens: int, vmax: int, word_streams):
    """Mixed training batch material: prose ids, uniform ids, zipf ids."""
    out = []
    for ws in word_streams:
        out.append(ws)
    out.append(rng.integers(0, vmax, n_tokens).astype(np.int32))
    z = rng.zipf(1.5, n_tokens)
    out.append(np.clip(z, 0, vmax - 1).astype(np.int32))
    return out


def pass_walk(agree: np.ndarray, k_spec: int) -> float:
    """tokens/pass from a per-position agreement sequence (the verify
    rule: 1 emitted + consecutive agreements, advance past them)."""
    k_draft = k_spec - 1
    pos, passes, emitted = 0, 0, 0
    n = len(agree)
    while pos < n - k_draft:
        acc = 0
        while acc < k_draft and agree[pos + acc]:
            acc += 1
        emitted += 1 + acc
        passes += 1
        pos += 1 + acc
    return emitted / max(passes, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--model", default="13B")
    # the teacher's numerics MUST match the bench arm that scores the
    # artifact (argmax agreement is numerics-sensitive on synthetic
    # weights); "gq" is the engine's default 13B single-stream resolution
    ap.add_argument("--quant-mode", default="gq")
    ap.add_argument("--d-draft", type=int, default=512)
    ap.add_argument("--n-layer", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="minigpt4_tpu/assets/bench_draft_13b.npz")
    ap.add_argument("--teacher-batches", type=int, default=24)
    ap.add_argument("--llm-file", default=None,
                    help="REAL ggml llama checkpoint: distill against it "
                    "(with its own BPE tokenizer) instead of the synthetic "
                    "bench teacher — the day-one draft stage "
                    "(tools/day_one_validation.sh).  The printed EVAL "
                    "acceptance is then a real-weights number.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from minigpt4_tpu import benchmark as B
    from minigpt4_tpu.formats.dtypes import DataType
    from minigpt4_tpu.models import llama as llama_mod
    from minigpt4_tpu.train import draft as D

    rng_model = np.random.default_rng(0)  # MUST match bench_decode's seeding
    t0 = time.perf_counter()
    if args.llm_file:
        from minigpt4_tpu.formats.ggml_llama import LlamaFileReader
        from minigpt4_tpu.tokenizer import LlamaTokenizer

        with LlamaFileReader(args.llm_file) as r:
            params, cfg = llama_mod.load_params(
                r, jnp.bfloat16, n_ctx=512, quant_mode=args.quant_mode)
            bpe = LlamaTokenizer(r.vocab.tokens, r.vocab.scores)
        params = jax.device_put(params)

        def tok_fn(text):
            return np.asarray(bpe.tokenize(text, add_bos=False), np.int32)
    else:
        cfg = B.GEOMETRIES[args.model]
        if args.quant_mode == "gq":
            # the bench applies the engine's residency-driven packing
            # policy to its teacher (benchmark.bench_pack_policy); the
            # trainer MUST mirror it or the teacher weight stream and the
            # provenance tag both diverge and the bench silently drops
            # every draft_head_* metric (tag mismatch at scoring time)
            B.bench_pack_policy(cfg)
        params = B.synth_llama_params(cfg, DataType.Q5_K, rng_model,
                                      quant_mode=args.quant_mode)
        params = jax.device_put(params)
        tok_fn = B.word_tokenize
    jax.block_until_ready(params["tok_embeddings"])
    print(f"[draft-train] teacher built in {time.perf_counter()-t0:.1f}s")
    cache_dt = jnp.float8_e4m3fn if cfg.n_embd >= 5120 else jnp.bfloat16

    # ---- training corpus + teacher targets --------------------------------
    rng = np.random.default_rng(42)
    # synthetic mode keeps the word-level 320-id range (clamped for tiny
    # geometries); real mode uses the checkpoint's whole BPE vocab
    vmax = cfg.n_vocab if args.llm_file else min(320, cfg.n_vocab)
    streams = make_streams(
        rng, 4096, vmax,
        [tok_fn(TRAIN_TEXT_A) % vmax, tok_fn(TRAIN_TEXT_B) % vmax],
    )
    flat = np.concatenate(streams)

    def sample_batch():
        rows = []
        for _ in range(args.batch):
            if rng.random() < 0.5:
                i = rng.integers(0, len(flat) - args.seq)
                rows.append(flat[i:i + args.seq])
            else:
                rows.append(rng.integers(0, vmax, args.seq).astype(np.int32))
        return np.stack(rows)

    tgt_fn = jax.jit(lambda p, t: D.teacher_targets(p, cfg, t,
                                                    cache_dtype=cache_dt))
    data = []
    t0 = time.perf_counter()
    for i in range(args.teacher_batches):
        toks = sample_batch()
        tgts = np.asarray(tgt_fn(params, jnp.asarray(toks)))
        data.append((toks, tgts))
        if i == 0:
            print(f"[draft-train] first teacher batch {time.perf_counter()-t0:.1f}s")
    print(f"[draft-train] {args.teacher_batches} teacher batches "
          f"({args.teacher_batches*args.batch*args.seq} positions) in "
          f"{time.perf_counter()-t0:.1f}s")

    # eval-stream teacher targets NOW, then free the 13-14 GB teacher: only
    # its embedding matrix is needed for distillation and eval.  The stream
    # pads to a 512 bucket: causal attention makes trailing padding inert
    # for positions < len, and irregular M (e.g. 378) would force a fresh
    # multi-minute Pallas prefill compile for one throwaway shape.
    stream = tok_fn(B.REALISTIC_TEXT) % vmax
    # real BPE streams run longer than word-level ones: keep the eval
    # inside the 512 prefill bucket (positions past it add little signal)
    stream = stream[:511]
    n_ev = len(stream)
    ev_pad = 512
    toks_eval = jnp.asarray(np.pad(stream, (0, ev_pad - n_ev))[None])
    teacher_pred = np.asarray(tgt_fn(params, toks_eval))[0][:n_ev]
    emb32 = jnp.asarray(params["tok_embeddings"], jnp.float32)
    jax.block_until_ready(emb32)
    del params, tgt_fn

    # ---- distill -----------------------------------------------------------
    dhc = D.DraftHeadConfig(d_draft=args.d_draft, n_layer=args.n_layer,
                            n_head=args.d_draft // 64, n_ff=args.d_draft * 11 // 4)
    dcfg = dhc.llama_cfg(cfg.n_vocab, args.seq)
    art = D.init_draft_head(jax.random.PRNGKey(1), cfg.n_embd, dhc)
    warmup = min(50, max(1, args.steps // 4))  # short dry-runs need < 50
    sched = optax.warmup_cosine_decay_schedule(0.0, args.lr, warmup, args.steps)
    opt = optax.adamw(sched, weight_decay=1e-4)
    step = D.make_distill_step(dcfg, opt)
    st = opt.init(art)
    t0 = time.perf_counter()
    for i in range(args.steps):
        toks, tgts = data[i % len(data)]
        art, st, loss, acc = step(art, st, emb32, jnp.asarray(toks),
                                  jnp.asarray(tgts), 8)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"[draft-train] step {i}: loss {float(loss):.3f} "
                  f"agree {float(acc):.3f} ({time.perf_counter()-t0:.0f}s)")

    # ---- eval: the bench metric (held-out REALISTIC_TEXT) ------------------
    dcfg_eval = dhc.llama_cfg(cfg.n_vocab, ev_pad)
    dparams = D.assemble_draft(emb32, art, jnp.float32)
    dcache = llama_mod.init_cache(dcfg_eval, batch=1, dtype=jnp.float32)
    demb = llama_mod.embed_tokens(dparams, toks_eval)
    dlogits, _ = llama_mod.forward(dparams, dcache, demb, jnp.int32(0),
                                   dcfg_eval, all_logits=True, use_flash=False)
    draft_pred = np.asarray(jnp.argmax(dlogits[0], -1))[:n_ev]
    warm = 48
    agree = (draft_pred == teacher_pred)[warm:-1]
    acc_pp = pass_walk(agree, k_spec=8)
    print(f"[draft-train] EVAL on REALISTIC_TEXT: per-position agreement "
          f"{agree.mean():.3f}, teacher-forced acceptance {acc_pp:.2f}/pass "
          f"(k=8; n-gram floor is ~1.04)")

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    if args.llm_file:
        # a real-checkpoint drafter must never be scored against the
        # synthetic bench teacher (and vice versa): tag with provenance
        tag = f"real:{Path(args.llm_file).name}@{args.quant_mode}"
    else:
        tag = B.synth_teacher_tag(args.quant_mode)
    D.save_artifact(args.out, art, dhc, teacher_mode=tag)
    print(f"[draft-train] saved {args.out} (teacher {tag})")


if __name__ == "__main__":
    main()

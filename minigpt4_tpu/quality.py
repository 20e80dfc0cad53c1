"""Quantization-quality harness: logit KL / top-1 / perplexity across the
engine's weight representations, plus smooth-quant calibration.

VERDICT r1 blocked the 42-tok/s W8A8 path on a missing quality story: per
-token absmax activation quantization is vulnerable to LLaMA's emergent
channel outliers (the LLM.int8 problem), and no instrumentation existed to
measure it.  This module is that instrumentation:

  * a synthetic LLaMA generator that *injects* persistent residual-stream
    channel outliers (scaled embedding columns + wo/w2 output rows — the
    mechanism by which real LLaMAs grow them), so the failure mode W8A8 must
    survive is actually present without real checkpoints;
  * teacher-forced full-sequence logit evaluation for every weight path the
    engine ships (dense reference, exact-q5_k, w8a8, w8a8+smooth), through
    the REAL file->load_params pipeline (a ggml file is written and re-read,
    so repack/from_ggml/smooth folding are all exercised);
  * metrics: mean/p95 KL(ref || path), top-1 agreement, teacher-forced
    perplexity delta;
  * smooth-quant calibration (Xiao et al. 2022): per-channel activation
    absmax captured by llama.forward's ``act_stats`` hooks, combined with
    per-channel weight absmax into migration scales
    ``s_j = act_max_j**alpha / w_max_j**(1-alpha)`` that load_params folds
    into (norm, weight) pairs exactly (models/llama.load_params docstring).

Run ``python -m minigpt4_tpu.quality`` for the table; the same entry points
run unchanged on real checkpoints (pass --model-f32/--model-quant paths).

Reference tie-in: the reference has no quality tooling at all (its parity
workflow was manual tensor dumps, /root/reference/minigpt4.cpp:537-549);
this is the subsystem that gates which decode path may be the default.
"""

from __future__ import annotations

import argparse
import json
from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .formats.dtypes import DataType
from .formats.ggml_llama import (
    LlamaFileReader,
    LlamaFileWriter,
    LlamaHParams,
    LlamaVocab,
)
from .formats import quants
from .models import llama as llama_mod


# ---------------------------------------------------------------------------
# synthetic outlier-bearing model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Geometry:
    n_vocab: int
    n_embd: int
    n_head: int
    n_layer: int
    n_ff: int


GEOMETRIES = {
    # tiny: CPU test geometry (q5_k/i8 need K % 256 == 0)
    "tiny": Geometry(n_vocab=512, n_embd=256, n_head=4, n_layer=2, n_ff=512),
    "small": Geometry(n_vocab=2048, n_embd=512, n_head=8, n_layer=4, n_ff=1280),
    # medium: ~1.4B-shaped; the TPU decision geometry (bf16 ref fits HBM)
    "medium": Geometry(n_vocab=32000, n_embd=2048, n_head=16, n_layer=16, n_ff=5632),
}


def write_synth_llama(
    path_f32: Path,
    path_quant: Path,
    geom: Geometry,
    quant: DataType = DataType.Q5_K,
    seed: int = 0,
    outlier_frac: float = 0.01,
    outlier_amp: float = 30.0,
    residual_init: bool = False,
) -> np.ndarray:
    """Write the SAME synthetic weights as an f32 ggml file and a quantized
    one, with persistent channel outliers injected into the residual stream
    (scaled embedding columns and wo/w2 output rows — every layer's RMSNorm
    output then carries hot channels, which is exactly what defeats naive
    per-token absmax activation quantization).  Returns the outlier dims."""
    rng = np.random.default_rng(seed)
    d, ff, v = geom.n_embd, geom.n_ff, geom.n_vocab
    # residual_init: GPT-2-style 1/sqrt(2L) scaling on the residual-writing
    # projections (wo, w2).  Deep PLAIN-init random nets are chaotic — every
    # quantization's error grows exponentially with depth, which swamps
    # absolute KL at 16+ layers; trained nets sit in the residual-scaled
    # regime, so this init is the more deployment-representative condition.
    res_scale = 1.0 / np.sqrt(2 * geom.n_layer) if residual_init else 1.0
    n_out = max(1, int(round(d * outlier_frac)))
    out_dims = rng.choice(d, n_out, replace=False)

    hp = LlamaHParams(
        n_vocab=v, n_embd=d, n_mult=ff, n_head=geom.n_head,
        n_layer=geom.n_layer, n_rot=d // geom.n_head, ftype=0,
    )
    toks = [b"<unk>", b"<s>", b"</s>"] + [b"tok%d" % i for i in range(v - 3)]
    vocab = LlamaVocab(tokens=toks, scores=[0.0] * v)
    w32 = LlamaFileWriter(path_f32, hp, vocab)
    wq = LlamaFileWriter(path_quant, hp, vocab)

    def n(*shape, scale=0.05):
        return rng.normal(0, scale, shape).astype(np.float32)

    def add(name, arr, q=False):
        a = np.ascontiguousarray(arr, np.float32).astype("<f4")
        w32.add_tensor(name, a.shape, DataType.F32, a.view(np.uint8).reshape(-1))
        if q and arr.size % 256 == 0:
            wq.add_tensor(name, arr.shape, quant,
                          quants.quantize(arr.reshape(-1), quant))
        else:
            wq.add_tensor(name, a.shape, DataType.F32,
                          a.view(np.uint8).reshape(-1))

    emb = n(v, d, scale=0.2)
    emb[:, out_dims] *= outlier_amp
    add("tok_embeddings.weight", emb)
    add("norm.weight", 1 + n(d))
    add("output.weight", n(v, d, scale=0.2), q=True)
    for i in range(geom.n_layer):
        p = f"layers.{i}."
        add(p + "attention_norm.weight", 1 + n(d))
        add(p + "attention.wq.weight", n(d, d), q=True)
        add(p + "attention.wk.weight", n(d, d), q=True)
        add(p + "attention.wv.weight", n(d, d), q=True)
        wo = n(d, d) * res_scale
        wo[out_dims, :] *= outlier_amp  # output rows feed the residual
        add(p + "attention.wo.weight", wo, q=True)
        add(p + "ffn_norm.weight", 1 + n(d))
        add(p + "feed_forward.w1.weight", n(ff, d), q=True)
        w2 = n(d, ff) * res_scale
        w2[out_dims, :] *= outlier_amp
        add(p + "feed_forward.w2.weight", w2, q=True)
        add(p + "feed_forward.w3.weight", n(ff, d), q=True)
    w32.write()
    wq.write()
    return out_dims


# ---------------------------------------------------------------------------
# teacher-forced evaluation
# ---------------------------------------------------------------------------


def teacher_forced_logits(
    params, cfg, tokens: np.ndarray, cache_dtype=jnp.float32
) -> np.ndarray:
    """[S] token ids -> [S, V] f32 logits (full-sequence forced forward)."""
    tokens = jnp.asarray(np.asarray(tokens, np.int32))[None]
    cache = llama_mod.init_cache(cfg, 1, cache_dtype)

    @jax.jit
    def run(p, c, t):
        e = llama_mod.embed_tokens(p, t)
        logits, _ = llama_mod.forward(
            p, c, e, jnp.int32(0), cfg, all_logits=True
        )
        return logits

    return np.asarray(run(params, cache, tokens)[0], np.float32)


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def logit_metrics(ref: np.ndarray, other: np.ndarray, tokens: np.ndarray) -> dict:
    """Per-position KL(ref || other), top-1 agreement, forced-NLL delta."""
    lp_ref = _log_softmax(ref)
    lp_oth = _log_softmax(other)
    p_ref = np.exp(lp_ref)
    kl = (p_ref * (lp_ref - lp_oth)).sum(axis=-1)
    top1 = float((ref.argmax(-1) == other.argmax(-1)).mean())
    nxt = np.asarray(tokens[1:], np.int64)
    idx = np.arange(len(nxt))
    nll_ref = float(-lp_ref[:-1][idx, nxt].mean())
    nll_oth = float(-lp_oth[:-1][idx, nxt].mean())
    return {
        "kl_mean": float(kl.mean()),
        "kl_p95": float(np.percentile(kl, 95)),
        "top1": top1,
        "nll_ref": nll_ref,
        "nll": nll_oth,
        "d_ppl_pct": float((np.exp(nll_oth - nll_ref) - 1.0) * 100.0),
    }


# ---------------------------------------------------------------------------
# smooth-quant calibration
# ---------------------------------------------------------------------------


def collect_activation_stats(params, cfg, token_seqs: list[np.ndarray]) -> dict:
    """Per-channel activation absmax at each quantizable-matmul input site
    ("attn"/"ffn"/"w2" [L, K]; "wo" [L, K]; "head" [K]), maxed over the
    calibration sequences (llama.forward's act_stats hooks)."""

    @jax.jit
    def run(p, c, t):
        st: dict = {}
        e = llama_mod.embed_tokens(p, t)
        llama_mod.forward(p, c, e, jnp.int32(0), cfg, act_stats=st)
        return st

    agg: dict[str, np.ndarray] = {}
    for seq in token_seqs:
        cache = llama_mod.init_cache(cfg, 1, jnp.float32)
        t = jnp.asarray(np.asarray(seq, np.int32))[None]
        st = jax.tree_util.tree_map(np.asarray, run(params, cache, t))
        for site, per_layer in st.items():
            arr = np.stack(per_layer) if isinstance(per_layer, list) else np.asarray(per_layer)
            if site == "head":
                arr = arr[0] if arr.ndim == 2 else arr
            prev = agg.get(site)
            agg[site] = arr if prev is None else np.maximum(prev, arr)
    return agg


def weight_col_absmax(reader: LlamaFileReader, cfg) -> dict:
    """Per-input-channel weight absmax for each smoothable site, maxed over
    the site's consumers (attn: wq/wk/wv; ffn: w1/w3; w2: w2; head: output)."""

    def colmax(*names):
        m = None
        for nm in names:
            w = np.abs(np.asarray(reader.tensor_f32(nm), np.float32)).max(axis=0)
            m = w if m is None else np.maximum(m, w)
        return m

    out = {"head": colmax("output.weight")}
    attn, ffn, w2 = [], [], []
    for i in range(cfg.n_layer):
        p = f"layers.{i}."
        attn.append(colmax(*(p + f"attention.w{x}.weight" for x in "qkv")))
        ffn.append(colmax(p + "feed_forward.w1.weight",
                          p + "feed_forward.w3.weight"))
        w2.append(colmax(p + "feed_forward.w2.weight"))
    out["attn"] = np.stack(attn)
    out["ffn"] = np.stack(ffn)
    out["w2"] = np.stack(w2)
    return out


def smooth_scales(act_stats: dict, w_stats: dict, alpha: float = 0.5) -> dict:
    """SmoothQuant migration scales per site: s = act^alpha / w^(1-alpha),
    guarded to stay strictly positive and bounded.  Sites: attn/ffn/w2/head
    (wo has no affine producer to fold the reciprocal into — it keeps
    dynamic per-token quantization)."""
    out = {}
    for site in ("attn", "ffn", "w2", "head"):
        if site not in act_stats or site not in w_stats:
            continue
        a = np.asarray(act_stats[site], np.float32)
        w = np.asarray(w_stats[site], np.float32)
        s = np.power(np.maximum(a, 1e-8), alpha) / np.power(
            np.maximum(w, 1e-8), 1.0 - alpha
        )
        s = np.where((a <= 1e-8) | (w <= 1e-8), 1.0, s)
        out[site] = np.clip(s, 1e-3, 1e5).astype(np.float32)
    return out


def compute_smooth_scales(
    llm_path: str | Path,
    calib_seqs: list[np.ndarray],
    alpha: float = 0.5,
    n_ctx: int | None = None,
) -> dict:
    """One-call calibration: load the (quantized) file with the portable
    XLA-dequant representation, capture activation stats on the calibration
    sequences, combine with weight column maxima."""
    with LlamaFileReader(llm_path) as reader:
        ctx = n_ctx or max(len(s) for s in calib_seqs)
        params, cfg = llama_mod.load_params(
            reader, jnp.float32, n_ctx=ctx, quant_mode="qtensor"
        )
        act = collect_activation_stats(params, cfg, calib_seqs)
        wmax = weight_col_absmax(reader, cfg)
    return smooth_scales(act, wmax, alpha)


def save_smooth_scales(path: str | Path, scales: dict) -> None:
    np.savez(path, **scales)


def load_smooth_scales(path: str | Path) -> dict:
    z = np.load(path)
    return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# the comparison harness
# ---------------------------------------------------------------------------


def evaluate_paths(
    f32_path: Path,
    quant_path: Path,
    seq_len: int = 128,
    calib_len: int = 64,
    n_calib: int = 2,
    alpha: float = 0.5,
    seed: int = 7,
    paths: tuple[str, ...] = ("q5k", "gq", "w8a8", "w8a8_smooth", "f8_cache"),
    quant_mode_exact: str = "auto",
    artifacts: dict | None = None,
) -> dict:
    """Returns {path_name: metrics} vs the f32 dense reference, all through
    the real file -> load_params pipeline."""
    rng = np.random.default_rng(seed)

    with LlamaFileReader(f32_path) as r32:
        ref_params, cfg = llama_mod.load_params(r32, jnp.float32, n_ctx=max(seq_len, 8))
    v = cfg.n_vocab
    tokens = rng.integers(3, v, seq_len).astype(np.int32)
    calib = [rng.integers(3, v, calib_len).astype(np.int32) for _ in range(n_calib)]

    ref_logits = teacher_forced_logits(ref_params, cfg, tokens)
    del ref_params

    results: dict[str, dict] = {}

    def run(mode, smooth=None, cache_dtype=jnp.float32, src=quant_path):
        with LlamaFileReader(src) as r:
            p, c = llama_mod.load_params(
                r, jnp.float32, n_ctx=max(seq_len, 8), quant_mode=mode,
                smooth=smooth,
            )
        lg = teacher_forced_logits(p, c, tokens, cache_dtype=cache_dtype)
        return logit_metrics(ref_logits, lg, tokens)

    if "q5k" in paths:
        results["q5k"] = run(quant_mode_exact)
    if "gq" in paths:
        # the engine's single-stream TPU default (resolve_llm_quant_mode):
        # bit-exact ggml WEIGHT dequant, but activations quantize to i8 for
        # the MXU contraction (ops/group_i8.py) — this row is the honest
        # measure of that activation-side error on THESE weights (VERDICT
        # r3 next #8: the day-one gate must cover the gq default, not just
        # w8a8 vs q5_k)
        results["gq"] = run("gq")
        # record which code storage the row measured: pack_enabled() is the
        # loader default, so day-one/quality stay in lockstep with the
        # sub-byte packed path users actually serve (VERDICT r4 #8)
        from .ops.group_i8 import pack_enabled

        results["gq"]["packed"] = pack_enabled()
    if "w8a8" in paths:
        results["w8a8"] = run("w8a8")
    if "w8a8_smooth" in paths:
        sm = compute_smooth_scales(quant_path, calib, alpha=alpha,
                                   n_ctx=max(calib_len, 8))
        if artifacts is not None:
            artifacts["smooth_scales"] = sm
        results["w8a8_smooth"] = run("w8a8", smooth=sm)
    if "f8_cache" in paths:
        results["f8_cache"] = run(quant_mode_exact,
                                  cache_dtype=jnp.float8_e4m3fn)
    return results


def _fmt_table(results: dict) -> str:
    cols = ["path", "kl_mean", "kl_p95", "top1", "d_ppl_pct"]
    lines = ["  ".join(f"{c:>12}" for c in cols)]
    for name, m in results.items():
        lines.append("  ".join(
            [f"{name:>12}"] + [f"{m[c]:12.5f}" for c in cols[1:]]
        ))
    return "\n".join(lines)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--geometry", default="small", choices=sorted(GEOMETRIES))
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--calib-len", type=int, default=64)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--outlier-amp", type=float, default=30.0)
    ap.add_argument("--outlier-frac", type=float, default=0.01)
    ap.add_argument("--residual-init", action="store_true",
                    help="GPT-style 1/sqrt(2L) residual-projection scaling "
                         "(well-conditioned depth; see write_synth_llama)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--workdir", default=None,
                    help="where to write the synthetic model pair")
    ap.add_argument("--model-f32", default=None,
                    help="existing f32/f16 ggml llama file (real-checkpoint mode)")
    ap.add_argument("--model-quant", default=None,
                    help="existing quantized ggml llama file (real-checkpoint mode)")
    ap.add_argument("--save-scales", default=None,
                    help="also write the calibrated smooth scales npz here")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"),
                    help="force a JAX backend (the dev sitecustomize ignores "
                         "JAX_PLATFORMS=cpu; this uses jax.config, which wins)")
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms",
                          "axon" if args.platform == "tpu" else args.platform)

    if args.model_f32 and args.model_quant:
        f32_p, q_p = Path(args.model_f32), Path(args.model_quant)
    else:
        import tempfile

        work = Path(args.workdir) if args.workdir else Path(tempfile.mkdtemp(
            prefix="minigpt4_quality_"))
        work.mkdir(parents=True, exist_ok=True)
        geom = GEOMETRIES[args.geometry]
        f32_p, q_p = work / "synth_f32.bin", work / "synth_q5k.bin"
        if not (f32_p.exists() and q_p.exists()):
            # deterministic in (geometry, seed, outlier params): an existing
            # pair in an explicit --workdir is reused (medium writes ~4.7 GB)
            write_synth_llama(
                f32_p, q_p, geom, seed=args.seed,
                outlier_frac=args.outlier_frac, outlier_amp=args.outlier_amp,
                residual_init=args.residual_init,
            )
        print(f"[quality] synthetic pair at {work} (outlier amp "
              f"{args.outlier_amp}, frac {args.outlier_frac})")

    artifacts: dict = {}
    results = evaluate_paths(
        f32_p, q_p, seq_len=args.seq_len, calib_len=args.calib_len,
        alpha=args.alpha, seed=args.seed, artifacts=artifacts,
    )
    if args.save_scales:
        # the exact scales the printed gate just validated — not a re-run
        save_smooth_scales(args.save_scales, artifacts["smooth_scales"])
        print(f"[quality] smooth scales -> {args.save_scales}")

    print(_fmt_table(results))
    # the gate VERDICT r1 asked for: w8a8(+smooth) may be the default decode
    # path only when its divergence from the f32 reference is comparable to
    # what the exact-q5_k path already accepts
    gate = None
    if "q5k" in results and "w8a8_smooth" in results:
        gate = bool(
            results["w8a8_smooth"]["kl_mean"] <= 1.5 * results["q5k"]["kl_mean"]
            and results["w8a8_smooth"]["top1"] >= results["q5k"]["top1"] - 0.02
        )
        print(f"[quality] w8a8_smooth default-eligible vs q5_k budget: {gate}")
    # the engine's single-stream TPU default (gq): exact weight dequant, i8
    # activations — held to the same budget vs the pure exact path
    gq_ok = None
    if "q5k" in results and "gq" in results:
        gq_ok = bool(
            results["gq"]["kl_mean"] <= 1.5 * results["q5k"]["kl_mean"]
            and results["gq"]["top1"] >= results["q5k"]["top1"] - 0.02
        )
        print(f"[quality] gq default-eligible vs q5_k budget: {gq_ok}")
    print(json.dumps({"quality": {k: {m: v[m] for m in ("kl_mean", "top1", "d_ppl_pct")}
                                  for k, v in results.items()},
                      "w8a8_smooth_ok": gate, "gq_ok": gq_ok}))
    return results


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Driver benchmark: ONE JSON line with the headline metric.

Headline: decode tok/s/chip for a Vicuna-13B-geometry q5_k file in the
engine's DEFAULT TPU configuration — quant_mode auto resolves single-stream
13B to "gq" (EXACT ggml q5_k dequant semantics, i8 codes contracted on the
MXU — ops/group_i8.py) with the fp8 KV cache at 13B residency
(engine.resolve_llm_quant_mode; decision in docs/QUALITY.md).  The dense
batched-serving arm (where auto resolves to w8a8: B lane caches do not fit
beside the gq scale planes) rides along as w8a8_tok_s + the batched/paged
aggregates.  BASELINE.md target: >= 30 tok/s on one v5e chip ->
vs_baseline = value/30.  Falls back to the 7B geometry if 13B fails.

Each model attempt runs in its OWN subprocess: the tunneled TPU backend's
allocator state (over-commit + fragmentation after a failed 10 GB build) is
not reliably recoverable in-process, so a pristine process per attempt is
the only robust fallback (round-1 lesson: the 7B retry died on the 13B
attempt's leftovers).
"""

import json
import os
import subprocess
import sys


def run_single(model: str) -> int:
    import jax

    from minigpt4_tpu.benchmark import GEOMETRIES, bench_decode, bench_encode
    from minigpt4_tpu.formats.dtypes import DataType

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        if model == "13B":
            # compile gate first: kernel VMEM/Mosaic regressions fail fast
            # with a named shape (and warm the compile cache) instead of
            # dying inside the 40-layer model
            from minigpt4_tpu.kernel_gate import run_gate

            if not run_gate(fast=True):
                print("[bench] kernel gate FAILED (see stderr above)", file=sys.stderr)
        # HEADLINE = the engine's DEFAULT configuration for a q5_k file on
        # TPU: quant_mode auto -> "gq" single-stream (EXACT ggml dequant
        # semantics at byte-code speed, ops/group_i8.py) with the fp8 KV
        # cache the engine picks at 13B residency
        # (engine.resolve_llm_quant_mode / pick_cache_dtype)
        import jax.numpy as jnp

        # cache dtype per the engine's own residency policy: fp8 at 13B
        # (byte codes + bf16 cache would not fit 16 GB), bf16 at 7B
        cache_dt = jnp.float8_e4m3fn if model == "13B" else jnp.bfloat16
        # chip-state calibration FIRST (before the 13 GB build): the shared
        # dev chip's sustained bandwidth swings 3-4x between sessions, and
        # decode tok/s is bytes/rate — this rider lets the headline be read
        # against what the chip offered at measurement time
        chip_bw = None
        try:
            from minigpt4_tpu.benchmark import chip_state_probe

            chip_bw = round(chip_state_probe(), 1)
        except Exception as e:
            print(f"[bench] chip-state probe failed: {e}", file=sys.stderr)
        # 13B: single-stream groups on the gq default; the serving arm runs
        # separately below on w8a8 (auto's dense-serving resolution — B lane
        # caches beside gq codes+planes exceed HBM).  7B: everything fits in
        # one gq arm.
        dec = bench_decode(model, DataType.Q5_K, n_decode=64, prefill_len=64,
                           cache_dtype=cache_dt, quant_mode="gq",
                           sections="single" if model == "13B" else "all")
        if chip_bw is not None:
            dec["chip_bw_gbps"] = chip_bw
        try:
            enc = bench_encode(GEOMETRIES[model].n_embd)
        except Exception as e:  # encode is secondary; never lose the headline
            print(f"[bench] encode failed: {e}", file=sys.stderr)
            enc = {}
        metric = (f"decode tok/s/chip ({model} q5_k file, default engine "
                  f"config: exact gq)")
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
        metric = "decode tok/s (cpu smoke)"

    srv = {}
    q5k_old = {}
    if on_tpu and model == "13B":
        # dense-serving arm: auto resolves batch>1 13B to w8a8 (1 B/weight,
        # no scale planes -> room for the B-lane cache group).  Carries the
        # batched/paged/batched-spec aggregates plus the w8a8 fused decode
        # rate.  Measured after the headline so a failure here never costs it.
        import jax.numpy as jnp

        try:
            srv = bench_decode(model, DataType.Q5_K, n_decode=64, prefill_len=64,
                               quant_mode="w8a8", sections="serving",
                               cache_dtype=jnp.float8_e4m3fn)
        except Exception as e:
            print(f"[bench] w8a8 serving arm failed: {e}", file=sys.stderr)
        # continuity rider: the round-2 bf16-staging kernel (quant_mode=
        # "repack"), for the gq-vs-old comparison in the same chip state
        try:
            q5k_old = bench_decode(model, DataType.Q5_K, n_decode=64,
                                   prefill_len=64, quant_mode="repack",
                                   quick=True)
        except Exception as e:
            print(f"[bench] q5_k bf16-stage rider failed: {e}", file=sys.stderr)

    value = round(dec["decode_tok_s"], 2)
    extras = {k: round(v, 2) for k, v in {**dec, **enc}.items()}
    print(f"[bench] details: {json.dumps(extras)}", file=sys.stderr)
    if srv:
        srv_extras = {k: round(v, 2) for k, v in srv.items()
                      if isinstance(v, (int, float))}
        print(f"[bench] serving-arm details: {json.dumps(srv_extras)}",
              file=sys.stderr)
    line = {
        "metric": metric,
        "value": value,
        "unit": "tok/s",
        "vs_baseline": round(value / 30.0, 3),
    }
    # single-stream is the headline (the reference is single-stream); the
    # batched-serving aggregates ride along for context.  At 13B they come
    # from the w8a8 serving arm (srv); at 7B everything ran in `dec`.
    sv = srv or dec
    if "decode_tok_s" in srv:
        # the dense-serving default's fused single-stream rate (w8a8)
        line["w8a8_tok_s"] = round(srv["decode_tok_s"], 2)
    if "decode_tok_s_batched_aggregate" in sv:
        line["batched_aggregate_tok_s"] = round(sv["decode_tok_s_batched_aggregate"], 2)
        line["batch"] = sv.get("decode_batch")
    if "decode_tok_s_batched_paged_aggregate" in sv:
        # batched serving over the shared KV page pool (engine/paged.py):
        # the bandwidth-parity check for paging (lane HBM tracks used
        # context; per-lane rate should match the dense group)
        line["batched_paged_tok_s"] = round(
            sv["decode_tok_s_batched_paged_aggregate"], 2)
        line["paged_lanes"] = sv.get("paged_lanes")
    if "decode_tok_s_batched_spec" in sv:
        # batched + speculative (the SessionPool greedy serving path), at
        # whatever acceptance the synthetic stream produced
        line["batched_spec_tok_s_measured"] = round(
            sv["decode_tok_s_batched_spec"], 2)
    if "draft_spec_pass_ms" in dec:
        # draft-MODEL speculation (second small llama drafts, main verifies):
        # pass cost + the effective rate a trained drafter at 2 accepted
        # drafts/pass would deliver (acceptance itself needs real weights)
        line["draft_spec_pass_ms"] = round(dec["draft_spec_pass_ms"], 2)
        line["draft_spec_tok_s_at_accept2"] = round(
            dec["draft_spec_tok_s_at_accept2"], 2)
    if "decode_tok_s_paged_spec" in sv:
        # paged pool x speculative verify passes (spec no longer forces
        # serving groups off the paged capacity path)
        line["paged_spec_tok_s_measured"] = round(
            sv["decode_tok_s_paged_spec"], 2)
    if "decode_tok_s_spec" in dec:
        # greedy speculative decoding (n-gram drafted, verify-k=8), three
        # views: _measured = acceptance on the synthetic greedy stream
        # (workload-dependent: cyclic streams saturate it, novel streams
        # floor it); _realistic = the same pass cost at teacher-forced
        # acceptance on non-repetitive prose (spec_acceptance_on_stream);
        # _saturated = the arithmetic bound k * passes/s if every draft
        # were accepted.  Greedy output is token-identical in all cases.
        line["speculative_tok_s_measured"] = round(dec["decode_tok_s_spec"], 2)
        line["spec_accept_per_pass_measured"] = round(dec["spec_accept_per_pass"], 2)
        if "spec_pass_ms" in dec and "spec_k" in dec:
            line["speculative_tok_s_saturated"] = round(
                dec["spec_k"] * 1e3 / dec["spec_pass_ms"], 2)
        if "decode_tok_s_spec_realistic" in dec:
            line["speculative_tok_s_realistic"] = round(
                dec["decode_tok_s_spec_realistic"], 2)
            line["spec_accept_realistic"] = round(dec["spec_accept_realistic"], 2)
    if "decode_tok_s_draft_realistic" in dec:
        # the TRAINED draft head (tools/train_bench_draft.py artifact):
        # teacher-forced acceptance on held-out non-cyclic prose (agreement
        # with the teacher's own predictions — the verify rule) over the
        # REAL draft-loop pass cost.  This is the shipped engine's best
        # honest realistic speculation; the n-gram figures above stay for
        # the draftless configuration.
        line["draft_head_accept_realistic"] = round(
            dec["draft_head_accept_realistic"], 2)
        line["draft_head_tok_s_realistic"] = round(
            dec["decode_tok_s_draft_realistic"], 2)
        line["draft_head_pass_ms"] = round(dec["draft_head_pass_ms"], 2)
    if "encode_ms_p50" in enc:
        line["encode_ms_p50"] = round(enc["encode_ms_p50"], 2)
    if "encode_imgs_s" in enc:
        line["encode_imgs_s_batch8"] = round(enc["encode_imgs_s"], 2)
    if "prefill_tok_s" in dec:
        # long-prompt prefill rate at the reference's n_batch default (512)
        line["prefill_tok_s"] = round(dec["prefill_tok_s"], 1)
    if "chip_bw_gbps" in dec:
        # chip-state calibration: effective GB/s of an XLA dense bf16 matvec
        # chain at measurement time (shared dev chip swings 3-4x day-to-day;
        # decode tok/s is bytes/rate — read `value` against this)
        line["chip_bw_gbps"] = dec["chip_bw_gbps"]
    if on_tpu and model == "13B":
        # continuity key: the exact-q5_k rate IS the headline now
        # (quant_mode="gq": direct-MXU group-quant kernel, bit-exact q5_k
        # weight dequant — ops/group_i8.py)
        line["q5k_exact_tok_s"] = value
        line["q5k_exact_kernel"] = "gq-direct-mxu"
    if "decode_tok_s" in q5k_old:
        # the round-2 bf16-staging kernel, same chip state (continuity)
        line["q5k_bf16stage_tok_s"] = round(q5k_old["decode_tok_s"], 2)
    print(json.dumps(line))
    return 0


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        sys.exit(run_single(sys.argv[2]))

    here = os.path.dirname(os.path.abspath(__file__))
    # 13B twice: the remote-compile tunnel occasionally drops a connection
    # mid-compile; the retry rides the persistent compile cache
    for model in ("13B", "13B", "7B"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", model],
            cwd=here,
        )
        if r.returncode == 0:
            return
        print(f"[bench] {model} attempt failed (rc={r.returncode})", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()

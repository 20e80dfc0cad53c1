#!/usr/bin/env bash
# Day-one real-checkpoint validation (VERDICT r2 next #4).
#
# This environment cannot run two validations that matter most: the greedy
# A/B against a COMPILED reference binary (zero network egress — the
# reference FetchContent-pins 8 deps, docs/REFERENCE_PARITY.md) and the
# quality gate on REAL LLaMA-13B weights (no checkpoint can enter).  This
# script makes both exactly one command on the first machine that has
# network + the real .bin files:
#
#   tools/day_one_validation.sh \
#       --reference /path/to/minigpt4.cpp/checkout \
#       --model     minigpt4-13B-f16.bin \
#       --llm-f16   ggml-vicuna-13b-v0-f16.bin \
#       --llm-q5k   ggml-vicuna-13b-v0-q5_k.bin \
#       --image     minigpt4/images/llama.png \
#       --out       /tmp/day_one
#
# Stages (each skippable; report records which ran):
#   1 ref-build   cmake+build the reference binary (needs network)
#   2 fixture-ab  tiny-fixture greedy A/B: both binaries on the SAME tiny
#                 .bin pair written by tests/make_ref_ab.py (shape-compatible
#                 with the reference's hardcoded checks) — catches format or
#                 template divergence before touching 30 GB files
#   3 real-ab     greedy A/B on the real model pair, token-for-token diff
#   4 quality     quality.py --model-f32/--model-quant: KL / top-1 / ppl for
#                 exact-q5_k vs w8a8(+smooth) on REAL weights; prints whether
#                 the W8A8 TPU default survives (the standing open risk —
#                 docs/QUALITY.md)
#
# --dry-run: no network, no real checkpoints — runs every command path on
# fixtures/synthetic geometry (CI calls this; see ci/run_ci.sh).  The dry
# run proves the harness itself cannot be the day-one failure.
#
# Expected artifacts in --out (docs/DAY_ONE.md lists them with pass rules):
#   ref_ab/            fixture pair + pixels + prompts (make_ref_ab.py)
#   ref_tokens.txt     reference binary greedy stream   (stages 2-3)
#   tpu_tokens.txt     this repo's greedy stream
#   quality.json       per-path KL/top-1/ppl + w8a8_smooth_ok verdict
#   smooth_scales.npz  calibrated migration scales (feed to serve --smooth)
#   report.json        machine-readable roll-up of every stage
set -uo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REFERENCE="" MODEL="" LLM_F16="" LLM_Q5K="" IMAGE="" OUT="/tmp/day_one"
DRY=0
while [ $# -gt 0 ]; do
  case "$1" in
    --reference) REFERENCE="$2"; shift 2 ;;
    --model)     MODEL="$2"; shift 2 ;;
    --llm-f16)   LLM_F16="$2"; shift 2 ;;
    --llm-q5k)   LLM_Q5K="$2"; shift 2 ;;
    --image)     IMAGE="$2"; shift 2 ;;
    --out)       OUT="$2"; shift 2 ;;
    --platform)  export MINIGPT4_TPU_PLATFORM="$2"; shift 2 ;;  # cpu|tpu
    --dry-run)   DRY=1; shift ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done
mkdir -p "$OUT"
cd "$REPO"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

REPORT="$OUT/report.json"
declare -A STAGE
note() { echo "[day-one] $*"; }

# ---- stage 1: reference build -------------------------------------------
REF_BIN=""
if [ "$DRY" -eq 1 ] || [ -z "$REFERENCE" ]; then
  STAGE[ref_build]="skipped($([ "$DRY" -eq 1 ] && echo dry-run || echo no-reference))"
else
  note "building reference at $REFERENCE (FetchContent needs network)"
  if cmake -S "$REFERENCE" -B "$OUT/refbuild" -DMINIGPT4_BUILD_EXAMPLES=ON \
       > "$OUT/ref_configure.log" 2>&1 \
     && cmake --build "$OUT/refbuild" -j > "$OUT/ref_build.log" 2>&1; then
    REF_BIN="$(find "$OUT/refbuild" -name main -type f | head -1)"
    STAGE[ref_build]="ok($REF_BIN)"
  else
    STAGE[ref_build]="FAILED(see $OUT/ref_build.log)"
  fi
fi

# ---- stage 2: fixture A/B ------------------------------------------------
note "writing fixture A/B artifacts (tests/make_ref_ab.py)"
if python tests/make_ref_ab.py --out "$OUT/ref_ab" > "$OUT/fixture_ab.log" 2>&1; then
  STAGE[fixture_artifacts]=ok
else
  STAGE[fixture_artifacts]="FAILED(see $OUT/fixture_ab.log)"
fi

run_greedy() {  # run_greedy <tag> <model> <llm> <image> -> writes $OUT/<tag>_tokens.txt
  local tag="$1" model="$2" llm="$3" image="$4"
  python -m examples.main -m "$model" -l "$llm" -i "$image" \
      --temp 0.0 --seed 1337 --limit 64 --tokens-out "$OUT/${tag}_tokens.txt" \
      >> "$OUT/${tag}_run.log" 2>&1
}

FIX_MODEL="$OUT/ref_ab/minigpt4-tiny.bin" FIX_LLM="$OUT/ref_ab/vicuna-tiny.bin"
FIX_IMG="$OUT/ref_ab/image.png"
if [ -f "$FIX_MODEL" ]; then
  note "our greedy stream on the fixture pair"
  if run_greedy tpu_fixture "$FIX_MODEL" "$FIX_LLM" "$FIX_IMG"; then
    STAGE[tpu_fixture_greedy]=ok
  else
    STAGE[tpu_fixture_greedy]="FAILED(see $OUT/tpu_fixture_run.log)"
  fi
  if [ -n "$REF_BIN" ]; then
    note "reference greedy stream on the fixture pair"
    "$REF_BIN" -m "$FIX_MODEL" -l "$FIX_LLM" --image "$FIX_IMG" --temp 0 \
        > "$OUT/ref_fixture_tokens.txt" 2> "$OUT/ref_fixture_run.log" \
      && STAGE[ref_fixture_greedy]=ok || STAGE[ref_fixture_greedy]=FAILED
    if [ "${STAGE[ref_fixture_greedy]}" = ok ]; then
      diff "$OUT/ref_fixture_tokens.txt" "$OUT/tpu_fixture_tokens.txt" \
        && STAGE[fixture_ab]=MATCH || STAGE[fixture_ab]=DIVERGED
    fi
  else
    STAGE[fixture_ab]="skipped(no reference binary)"
  fi
fi

# ---- stage 3: real-checkpoint A/B ---------------------------------------
if [ -n "$MODEL" ] && [ -n "$LLM_F16" ] && [ -n "$IMAGE" ]; then
  note "our greedy stream on the REAL pair"
  run_greedy tpu "$MODEL" "$LLM_F16" "$IMAGE" \
    && STAGE[tpu_real_greedy]=ok || STAGE[tpu_real_greedy]=FAILED
  if [ -n "$REF_BIN" ]; then
    "$REF_BIN" -m "$MODEL" -l "$LLM_F16" --image "$IMAGE" --temp 0 \
        > "$OUT/ref_tokens.txt" 2> "$OUT/ref_run.log" \
      && STAGE[ref_real_greedy]=ok || STAGE[ref_real_greedy]=FAILED
    if [ "${STAGE[ref_real_greedy]:-}" = ok ] && [ "${STAGE[tpu_real_greedy]}" = ok ]; then
      diff "$OUT/ref_tokens.txt" "$OUT/tpu_tokens.txt" \
        && STAGE[real_ab]=MATCH || STAGE[real_ab]=DIVERGED
    fi
  else
    STAGE[real_ab]="skipped(no reference binary)"
  fi
else
  STAGE[real_ab]="skipped($([ "$DRY" -eq 1 ] && echo dry-run || echo no-real-checkpoints))"
fi

# ---- stage 4: quality gate ------------------------------------------------
note "quality gate (KL / top-1 / ppl; w8a8-default verdict)"
if [ -n "$LLM_F16" ] && [ -n "$LLM_Q5K" ]; then
  QARGS=(--model-f32 "$LLM_F16" --model-quant "$LLM_Q5K")
else
  # dry-run: synthetic outlier-injected geometry — same code path end to end
  QARGS=(--geometry small --workdir "$OUT/quality_work")
fi
if python -m minigpt4_tpu.quality "${QARGS[@]}" \
     --save-scales "$OUT/smooth_scales.npz" \
     > "$OUT/quality_stdout.txt" 2> "$OUT/quality.log"; then
  tail -1 "$OUT/quality_stdout.txt" > "$OUT/quality.json"
  STAGE[quality]="ok($(python - "$OUT/quality.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print("gq_ok=%s w8a8_smooth_ok=%s" % (d.get("gq_ok"), d.get("w8a8_smooth_ok")))
EOF
))"
else
  STAGE[quality]="FAILED(see $OUT/quality.log)"
fi

# ---- stage 5: draft-head distillation + acceptance -------------------------
# Distill the speculative draft head against the ACTUAL serving checkpoint
# and report its teacher-forced acceptance on held-out prose — the number
# the synthetic bench can only estimate (its drafter is distilled from a
# synthetic teacher; provenance is tagged into the artifact either way).
note "draft-head distillation + acceptance"
if [ -n "$LLM_Q5K" ]; then
  DARGS=(--llm-file "$LLM_Q5K" --steps 1200 --out "$OUT/draft_real.npz")
elif [ -f "$FIX_LLM" ]; then
  # dry-run: the SAME --llm-file command path on the tiny fixture pair
  DARGS=(--llm-file "$FIX_LLM" --quant-mode qtensor --steps 10
         --teacher-batches 2 --d-draft 128 --n-layer 1 --seq 64
         --out "$OUT/draft_dry.npz")
else
  DARGS=()
fi
if [ "${#DARGS[@]}" -gt 0 ]; then
  if python tools/train_bench_draft.py "${DARGS[@]}" \
       > "$OUT/draft_train.log" 2>&1; then
    ACC="$(grep -o 'acceptance [0-9.]*' "$OUT/draft_train.log" | tail -1)"
    STAGE[draft_head]="ok(${ACC:-no-acceptance-line})"
  else
    STAGE[draft_head]="FAILED(see $OUT/draft_train.log)"
  fi
else
  STAGE[draft_head]="skipped(no llm file)"
fi

# ---- report ---------------------------------------------------------------
python - "$REPORT" <<EOF
import json, sys
stages = { $(for k in "${!STAGE[@]}"; do printf '"%s": "%s", ' "$k" "${STAGE[$k]}"; done) }
json.dump({"stages": stages, "dry_run": bool($DRY)}, open(sys.argv[1], "w"), indent=1)
EOF
note "report:"
cat "$REPORT"
echo
# exit nonzero when anything that RAN failed or diverged
if printf '%s\n' "${STAGE[@]}" | grep -qE 'FAILED|DIVERGED'; then exit 1; fi
note "all executed stages passed"

#!/usr/bin/env bash
# Pre-snapshot gate ritual (VERDICT r4 #6) — run AFTER the last commit that
# touches minigpt4_tpu/ops/ or minigpt4_tpu/models/params.py, BEFORE the
# round snapshot.  No kernel-affecting commit may follow a green run.
#
# Why this exists: round 4 shipped a scalar-prefetch rewrite of both gq
# kernels INSIDE the snapshot commit, never executed on TPU; the driver
# bench was its first real run and crashed on a Mosaic-illegal BlockSpec,
# producing the third consecutive `parsed: null` artifact.  This script is
# the mechanical check that makes that sequence impossible:
#
#   1. fast kernel gate (now incl. the gq/i8 M=512 PREFILL shapes that the
#      round-4 bug lived in) with compile-second budgets checked;
#   2. the bench headline section only (13B gq build + 64-token decode),
#      bounded by a small budget — proves the DEFAULT engine config runs
#      end-to-end on the real chip;
#   3. stamps ci/last_gate_pass with the git HEAD + timestamp, committed as
#      the round's evidence that the ritual ran on the final kernel state.
#
# Usage:  ci/pre_snapshot.sh            # full ritual (TPU required)
#         ci/pre_snapshot.sh --gate-only  # skip the bench headline section
set -euo pipefail
cd "$(dirname "$0")/.."

GATE_ONLY=0
for a in "$@"; do
  case "$a" in
    --gate-only) GATE_ONLY=1 ;;
    *) echo "unknown arg: $a" >&2; exit 2 ;;
  esac
done

command -v python >/dev/null || { echo "python not found" >&2; exit 2; }
python - <<'EOF'
import jax, sys
if jax.default_backend() != "tpu":
    sys.exit("pre_snapshot requires the real TPU backend (got %s)"
             % jax.default_backend())
EOF

echo "== [1/2] fast kernel gate (incl. M=512 prefill shapes) =="
python -m minigpt4_tpu.kernel_gate --fast --compile-budget check

if [ "$GATE_ONLY" = 0 ]; then
  echo "== [2/2] bench headline section (13B gq default config) =="
  # single 13B attempt, no riders: budget covers build + headline only
  MINIGPT4_BENCH_BUDGET_S=900 _MINIGPT4_BENCH_ATTEMPT=0 \
    python bench.py --single 13B | tee /tmp/pre_snapshot_bench.out
  python - <<'EOF'
import json, sys
last = None
for ln in open("/tmp/pre_snapshot_bench.out"):
    ln = ln.strip()
    if ln.startswith("{") and ln.endswith("}"):
        try:
            d = json.loads(ln)
        except ValueError:
            continue
        if isinstance(d, dict) and d.get("value"):
            last = d
if last is None:
    sys.exit("no headline JSON line with value > 0 — NOT green")
print(f"headline: {last['value']} tok/s (vs_baseline {last.get('vs_baseline')})")
EOF
else
  echo "== [2/2] bench headline section skipped (--gate-only) =="
fi

STAMP="$(git rev-parse HEAD) $(date -u +%Y-%m-%dT%H:%M:%SZ)"
echo "$STAMP" > ci/last_gate_pass
echo "GREEN — stamped ci/last_gate_pass: $STAMP"
echo "Commit ci/last_gate_pass (and ci/kernel_floors.json if re-recorded);"
echo "no commit touching minigpt4_tpu/ops/ or models/params.py may follow."

#!/usr/bin/env bash
# CI gate for minigpt4_tpu — the committed, runnable equivalent of the
# reference's compile-and-package workflow (/root/reference/.github/
# workflows/run.yml:9-19,85-94), plus the test depth the reference lacks
# (SURVEY.md §4).  One command proves a fresh clone builds and passes:
#
#   ci/run_ci.sh            # tests + c_api build (+UBSan config) + package
#   ci/run_ci.sh --fast     # tests + c_api build only
#   ci/run_ci.sh --tpu      # additionally run the TPU kernel gate
#
# Exit code 0 = green.  Artifacts land in dist/.
set -euo pipefail
cd "$(dirname "$0")/.."

FAST=0
TPU=0
for a in "$@"; do
  case "$a" in
    --fast) FAST=1 ;;
    --tpu) TPU=1 ;;
    *) echo "unknown arg: $a" >&2; exit 2 ;;
  esac
done

echo "== [1/5] CPU test suite =="
NP="$(nproc 2>/dev/null || sysctl -n hw.ncpu 2>/dev/null || echo 1)"
# macOS builds a .dylib; everything else a .so (same CMake target)
LIBEXT="so"; [ "$(uname -s)" = "Darwin" ] && LIBEXT="dylib"
if [ "$NP" -ge 2 ]; then
  # shard test FILES across cores (no xdist dependency).  When recorded
  # per-file wall times exist (ci/test_times.json, re-record with
  # ci/record_test_times.sh), buckets balance by greedy longest-processing-
  # time on MEASURED seconds — file size is a poor proxy (the spec suites
  # spend their time in compiles, not lines).  Fallback: round-robin by
  # descending size.  Everything still runs — the `slow` marker is for
  # local iteration, not CI.
  SHARDS=$(( NP < 4 ? NP : 4 ))
  declare -a BUCKET
  if [ -f ci/test_times.json ]; then
    # portable mapfile (macOS ships bash 3.2): read line-per-shard output
    ASSIGN=()
    while IFS= read -r line; do ASSIGN+=("$line"); done < <(python - "$SHARDS" <<'PYEOF'
import json, sys, pathlib
shards = int(sys.argv[1])
times = json.load(open("ci/test_times.json")).get("seconds", {})
files = sorted(pathlib.Path("tests").glob("test_*.py"))
# unknown files get the median recorded time (new suites spread evenly)
known = sorted(times.values()) or [1.0]
med = known[len(known) // 2]
loads = [0.0] * shards
buckets = [[] for _ in range(shards)]
for f in sorted(files, key=lambda f: -times.get(f.name, med)):
    i = loads.index(min(loads))
    loads[i] += times.get(f.name, med)
    buckets[i].append(str(f))
for b in buckets:
    print(" ".join(b))
PYEOF
)
    for i in "${!ASSIGN[@]}"; do BUCKET[$i]="${ASSIGN[$i]}"; done
  else
    FILES=()
    while IFS= read -r f; do FILES+=("$f"); done < <(cd tests && ls -S test_*.py)
    for i in "${!FILES[@]}"; do
      BUCKET[$((i % SHARDS))]+=" tests/${FILES[$i]}"
    done
  fi
  PIDS=()
  for s in $(seq 0 $((SHARDS - 1))); do
    # shellcheck disable=SC2086
    python -m pytest ${BUCKET[$s]} -q > "/tmp/ci_shard_$s.log" 2>&1 &
    PIDS+=($!)
  done
  FAIL=0
  for s in $(seq 0 $((SHARDS - 1))); do
    if ! wait "${PIDS[$s]}"; then FAIL=1; echo "-- shard $s FAILED:"; tail -30 "/tmp/ci_shard_$s.log"; fi
    tail -1 "/tmp/ci_shard_$s.log"
  done
  [ "$FAIL" -eq 0 ] || exit 1
else
  python -m pytest tests/ -q -x
fi

echo "== [2/5] C ABI build =="
cmake -S minigpt4_tpu/c_api -B build_capi >/dev/null
cmake --build build_capi -j >/dev/null
test -f "build_capi/libminigpt4.$LIBEXT"

if [ "$FAST" -eq 0 ]; then
  echo "== [3/5] C ABI sanitizer config (ASan+UBSan) =="
  cmake -S minigpt4_tpu/c_api -B build_capi_san \
        -DMINIGPT4_SANITIZE_ADDRESS=ON \
        -DMINIGPT4_SANITIZE_UNDEFINED=ON >/dev/null
  cmake --build build_capi_san -j >/dev/null
  test -f "build_capi_san/libminigpt4.$LIBEXT"
else
  echo "== [3/5] sanitizer config skipped (--fast) =="
fi

if [ "$TPU" -eq 1 ]; then
  echo "== [4/5] TPU kernel gate (+compile budget, perf floors, TP shapes) =="
  python -m minigpt4_tpu.kernel_gate --fast --compile-budget
  python -m minigpt4_tpu.kernel_gate --floors-only --floors check --tp
else
  echo "== [4/5] TPU kernel gate skipped (no --tpu) =="
fi

if [ "$FAST" -eq 0 ]; then
  if [ "${BASH_VERSINFO[0]}" -ge 4 ]; then
    echo "== [4b] day-one validation harness dry-run =="
    # proves every command path of the real-checkpoint harness executes
    # (docs/DAY_ONE.md); real mode needs network + checkpoints
    MINIGPT4_TPU_PLATFORM="${MINIGPT4_TPU_PLATFORM:-cpu}" \
        tools/day_one_validation.sh --dry-run --out "${TMPDIR:-/tmp}/day_one_ci"
  else
    echo "== [4b] day-one dry-run skipped (bash<4: no associative arrays) =="
  fi
fi

if [ "$FAST" -eq 0 ]; then
  echo "== [5/5] release packaging =="
  rm -rf dist/minigpt4_tpu_release && mkdir -p dist/minigpt4_tpu_release
  cp "build_capi/libminigpt4.$LIBEXT" minigpt4_tpu/c_api/minigpt4.h \
     dist/minigpt4_tpu_release/
  # the python surface the reference ships in its release zips
  # (run.yml:85-94: shared lib + header + python client files)
  mkdir -p dist/minigpt4_tpu_release/minigpt4_tpu
  tar -cf - --exclude='__pycache__' minigpt4_tpu | tar -xf - -C dist/minigpt4_tpu_release/
  cp examples/main.py examples/main.c dist/minigpt4_tpu_release/ 2>/dev/null || true
  (cd dist && zip -qr minigpt4_tpu_release.zip minigpt4_tpu_release)
  ls -la dist/minigpt4_tpu_release.zip
else
  echo "== [5/5] packaging skipped (--fast) =="
fi

echo "CI GREEN"

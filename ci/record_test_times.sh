#!/usr/bin/env bash
# Record per-file test wall times into ci/test_times.json — the shard
# balancer's input (ci/run_ci.sh buckets by greedy longest-processing-time
# on these seconds; file size is a poor proxy because the spec/serving
# suites spend their time in XLA compiles, not lines).  Run serially on an
# otherwise-idle machine and commit the result deliberately.
set -euo pipefail
cd "$(dirname "$0")/.."

python - <<'EOF'
import json, pathlib, subprocess, sys, time

out = {}
files = sorted(pathlib.Path("tests").glob("test_*.py"))
for f in files:
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-m", "pytest", str(f), "-q"],
                       capture_output=True, text=True)
    dt = round(time.perf_counter() - t0, 1)
    out[f.name] = dt
    tail = (r.stdout.strip().splitlines() or [""])[-1]
    print(f"{f.name}: {dt}s  {tail}", flush=True)
    if r.returncode not in (0, 5):  # 5 = no tests collected
        print(r.stdout[-2000:], file=sys.stderr)
        sys.exit(1)

path = pathlib.Path("ci/test_times.json")
path.write_text(json.dumps(
    {"note": "serial per-file pytest wall seconds (ci/record_test_times.sh);"
             " shard balancing input for ci/run_ci.sh",
     "seconds": out}, indent=1))
print(f"-> {path} ({sum(out.values()):.0f}s total)")
EOF

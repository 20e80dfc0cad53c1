#!/usr/bin/env python
"""Aggregate a pytest --junitxml report into ci/test_times.json.

The shard balancer (ci/run_ci.sh) buckets test FILES by measured seconds;
ci/record_test_times.sh measures them with one pytest process per file,
which costs an extra jax-import (~8 s) per file.  This converter gets the
same per-file seconds from a single full-suite run's junit XML (plus a
fixed per-file startup allowance so the balance still reflects what the
per-file shard processes will actually pay).

Usage:
    python -m pytest tests/ -q --junitxml=/tmp/junit.xml
    python tools/junit_to_test_times.py /tmp/junit.xml
"""
import json
import pathlib
import sys
import xml.etree.ElementTree as ET

STARTUP_S = 8.0  # per-file pytest+jax import cost a shard process pays


def main() -> None:
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/junit.xml"
    root = ET.parse(xml_path).getroot()
    per_file: dict[str, float] = {}
    for case in root.iter("testcase"):
        # classname is dotted module path, e.g. "tests.test_engine"
        mod = (case.get("classname") or "").split(".")
        fname = next((p for p in mod if p.startswith("test_")), None)
        if fname is None:
            continue
        per_file[fname + ".py"] = (
            per_file.get(fname + ".py", 0.0) + float(case.get("time") or 0.0))
    if not per_file:
        sys.exit(f"no testcases found in {xml_path}")
    seconds = {k: round(v + STARTUP_S, 1) for k, v in sorted(per_file.items())}
    out = pathlib.Path(__file__).resolve().parents[1] / "ci/test_times.json"
    out.write_text(json.dumps(
        {"note": "per-file pytest seconds from one full-suite junit run "
                 f"(tools/junit_to_test_times.py; +{STARTUP_S:.0f}s/file "
                 "startup allowance); shard-balancing input for ci/run_ci.sh",
         "seconds": seconds}, indent=1) + "\n")
    total = sum(seconds.values())
    print(f"-> {out} ({len(seconds)} files, {total:.0f}s total incl. startup)")


if __name__ == "__main__":
    main()

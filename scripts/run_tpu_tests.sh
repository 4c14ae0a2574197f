#!/usr/bin/env bash
# Hardware-gated test matrix, with committed evidence (round-4 verdict #4).
#
# Runs the RT_TEST_TPU=1 compiled matrix (tests/test_tpu_compiled.py) and
# the full-frame reference parity suite (tests/test_reference_parity.py
# -k full_frame) on the real chip, then records per-test pass/fail and
# wall time plus the commit and date into metrics/tpu_matrix.json — the
# BENCH_r0N.json discipline applied to correctness, so the compiled gate
# is auditable in the tree instead of re-runnable-only.
#
# Usage: scripts/run_tpu_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

PY="${PY:-python}"
fail=0

RT_TEST_TPU=1 "$PY" -m pytest tests/test_tpu_compiled.py -q \
  --junitxml=/tmp/tpu_matrix_compiled.xml "$@" || fail=1
RT_TEST_TPU=1 "$PY" -m pytest tests/test_reference_parity.py -k full_frame -q \
  --junitxml=/tmp/tpu_matrix_parity.xml "$@" || fail=1

"$PY" - <<'EOF'
import json, os, subprocess, xml.etree.ElementTree as ET

def parse(path):
    rows = []
    if not os.path.exists(path):
        return rows
    for case in ET.parse(path).getroot().iter("testcase"):
        status = "passed"
        for tag in ("failure", "error"):
            if case.find(tag) is not None:
                status = tag
        if case.find("skipped") is not None:
            status = "skipped"
        rows.append({
            "test": f"{case.get('classname')}.{case.get('name')}",
            "status": status,
            "time_s": float(case.get("time", 0.0)),
        })
    return rows

tests = parse("/tmp/tpu_matrix_compiled.xml") + parse("/tmp/tpu_matrix_parity.xml")
out = {
    "commit": subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip(),
    "date": subprocess.run(
        ["date", "-u", "+%Y-%m-%dT%H:%M:%SZ"], capture_output=True, text=True
    ).stdout.strip(),
    "backend": "tpu" if os.environ.get("JAX_PLATFORMS", "") != "cpu" else "cpu",
    "passed": sum(t["status"] == "passed" for t in tests),
    "failed": sum(t["status"] in ("failure", "error") for t in tests),
    "skipped": sum(t["status"] == "skipped" for t in tests),
    "tests": tests,
}
with open("metrics/tpu_matrix.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: v for k, v in out.items() if k != "tests"}, indent=2))
print("wrote metrics/tpu_matrix.json")
EOF

if [ "$fail" -ne 0 ]; then
  echo "FAILED: hardware-gated matrix has red tests." >&2
  exit 1
fi
echo "TPU MATRIX GREEN"

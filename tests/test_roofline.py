"""The roofline accounting (scripts/roofline.py) stays runnable.

Guards the committed inputs (metrics/profile_visits_pop8.json) and the
arithmetic: the script must produce floors below the measured times and
utilizations in (0, 1]. Keeps docs/ROOFLINE.md's numbers reproducible.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_roofline_accounting_runs_and_is_sane(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "roofline.py")],
        capture_output=True, text=True, check=True,
    )
    rep = json.loads(out.stdout)

    assert rep["iter_floor_achieved_issue_ns"] > rep["iter_floor_peak_ns"]
    for name, p in rep["passes"].items():
        assert 0 < p["achieved_issue_floor_ms"] <= p["measured_ms"], name
        assert 0 < p["issue_utilization"] <= 1.0, name
        assert p["peak_issue_floor_ms"] < p["achieved_issue_floor_ms"], name

    fr = rep["frame"]
    assert 0 < fr["achieved_issue_floor_ms"] <= fr["measured_fused_ms"]
    assert 0 < fr["issue_utilization"] <= 1.0

    rays = rep["primary_rays_per_s"]
    assert rays["measured"] <= rays["achieved_issue_sol"] <= rays["peak_issue_sol"]

"""The roofline accounting (scripts/roofline.py) stays runnable.

Guards the committed inputs (metrics/profile_visits_pop8_adpt*.json,
bench_pass_..._adpt.json) and the arithmetic: the script must produce
floors ordered peak < ilp < serial, serial floors below the measured
times, and utilizations in (0, 1]. Keeps docs/ROOFLINE.md's numbers
reproducible at the SHIPPED adaptive schedule (round-3 verdict #3).
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

    rates = rep["assumptions"]["rates_vreg_ops_per_cycle"]
    assert rates["peak"] > rates["ilp_measured"] > rates["serial_measured"]

    for name, p in rep["passes"].items():
        assert 0 < p["floor_peak_ms"] < p["floor_ilp_ms"] \
            < p["floor_serial_ms"], name
        assert p["floor_serial_ms"] <= p["measured_ms"] * 1.10, name
        assert 0 < p["utilization_vs_ilp"] < p["utilization_vs_serial"], name
        assert p["utilization_vs_serial"] <= 1.10, name
        assert p["inner_slots"] > 0 and p["leaf_slots"] > 0, name

    fr = rep["frame"]
    assert 0 < fr["floor_serial_ms"] <= fr["measured_fused_ms"] * 1.10
    assert 0 < fr["utilization_vs_serial"] <= 1.10

    rays = rep["primary_rays_per_s_car_boxed"]
    assert rays["measured"] <= rays["serial_issue_sol"] * 1.10
    assert rays["serial_issue_sol"] < rays["ilp_issue_sol"]

    if "dragon_primary" in rep:
        d = rep["dragon_primary"]
        assert 0 < d["floor_ilp_ms"] < d["floor_serial_ms"]
        # the dragon pass runs at/near the serial-issue floor; the model
        # tolerance allows slight overcounting of the leaf epilogue.
        assert 0.5 < d["utilization_vs_serial"] < 1.25

    if "stream" in rep:
        for size, s in rep["stream"].items():
            assert s["overlap_floor_ms"] >= max(
                s["dma_floor_ms"], s["compute_floor_ms"]) * 0.999, size
            assert s["stream_ms"] >= s["overlap_floor_ms"] * 0.9, size
            assert 0 <= s["sync_frac_of_fills"] <= 1, size

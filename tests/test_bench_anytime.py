"""Smoke-test bench.py's anytime mode (tiny config, CPU).

The driver runs bench.py on real TPU hardware; this test keeps the
train -> calibrate -> derive-operating-points -> measure flow from
regressing between TPU runs.  Uses the same code path as the TPU run
(BENCH_TINY only shrinks the model/data).
"""

import pytest
import sys
import os

import numpy as np

pytestmark = pytest.mark.slow


def test_bench_anytime_tiny(monkeypatch):
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_ANYTIME_EPOCHS", "4")
    monkeypatch.setenv("BENCH_ANYTIME_TRAIN", "64")
    monkeypatch.setenv("BENCH_ANYTIME_EVAL", "32")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    result = bench.bench_anytime(serve_batch=16, K=2)

    assert result["metric"] == "anytime_iso_accuracy_docs_per_sec_per_chip"
    assert result["value"] > 0
    assert result["baseline"].startswith("estimated-32")
    # curves + per-point detail live under "_detail", which main() strips
    # into the BENCH_DETAIL.json sidecar (VERDICT r4 #1: compact headline)
    detail = result["_detail"]
    pts = detail["operating_points"]
    names = [p["name"] for p in pts]
    # the 2D mixture point (r5) appears when the holdout-confirmed search
    # finds a qualifying per-exit threshold vector
    assert names[:3] == ["iso", "fast", "faster"]
    assert names[3:] in ([], ["mixture"])
    # the measured curve ships with the result (>= 3 points; + mixture)
    assert len(detail["anytime_curve"]) == len(pts) >= 3
    assert "dead_exits" in result
    for p in pts:
        # iso-accuracy constraint held on validation by construction
        assert p["val_accuracy"] >= p["val_full_accuracy"] - p["accuracy_drop_budget"] - 1e-9
        assert len(p["capacities"]) == 2
        assert 0 <= p["test_average_exit"] <= 4
        assert 0 <= p["capacity_exit_rate"] <= 1
    # training actually stepped
    assert np.isfinite(detail["train"]["final_loss"])
    assert detail["train"]["final_loss"] < detail["train"]["first_loss"]
    assert len(detail["temperatures"]) == 4  # 3 exits + final
    # calibration diagnostics (VERDICT r4 #9): raw fits + clamp report
    assert len(detail["temperatures_raw"]) == 4
    assert result["temp_clamp_hits"] == len(detail["temperatures_clamped_rows"])

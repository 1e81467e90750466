"""Global-sweep implementation equivalence (pure numpy — no native gate).

The naive/opt0/opt1 trio must agree exactly; lives outside
test_native_sweep.py so environments without the C++ toolchain still run
it (the reference's intended cross-check, EE/thresh.py:309-318).
"""

import numpy as np
import pytest

from multi_modal_early_exit_tpu.evaluation.thresholds import csf_matrix


def test_global_sweep_trio_agrees():
    """naive / opt0 / opt1 must produce identical exit assignments and
    predictions on a random store (the reference's intended cross-check,
    thresh.py:309-318 — dead code there, live here). VERDICT r4 #7."""
    from multi_modal_early_exit_tpu.evaluation.thresholds import (
        incremental_global_sweep,
        naive_global_sweep,
        vectorized_global_sweep,
    )

    rng = np.random.default_rng(5)
    E, N, K = 4, 60, 5
    logits = rng.standard_normal((E, N, K)) * 2.0
    thresholds = np.linspace(0.1, 0.95, 12)
    for csf in ("msp", "entropy", "margin"):
        p_naive, e_naive = naive_global_sweep(logits, thresholds, csf)
        p_opt0, e_opt0 = vectorized_global_sweep(logits, thresholds, csf)
        p_opt1, e_opt1 = incremental_global_sweep(logits, thresholds, csf)
        np.testing.assert_array_equal(e_naive, e_opt0)
        np.testing.assert_array_equal(e_naive, e_opt1)
        np.testing.assert_allclose(p_naive, p_opt0)
        np.testing.assert_allclose(p_naive, p_opt1)


def test_global_sweep_trio_ties_and_extremes():
    """Edge semantics: exact-equal scores at a threshold (>= convention) and
    thresholds nobody/everybody passes."""
    from multi_modal_early_exit_tpu.evaluation.thresholds import (
        incremental_global_sweep,
        naive_global_sweep,
        vectorized_global_sweep,
    )

    logits = np.zeros((3, 4, 2))
    logits[0, :, 0] = 2.0   # exit 0 msp == sigmoid-ish fixed value
    logits[1, :, 1] = 5.0
    logits[2, :, 0] = 1.0
    msp0 = float(csf_matrix(logits)[0, 0])
    thresholds = [msp0, 0.0, 1.5]  # exact tie, always-pass, never-pass
    p_n, e_n = naive_global_sweep(logits, thresholds)
    p_0, e_0 = vectorized_global_sweep(logits, thresholds)
    p_1, e_1 = incremental_global_sweep(logits, thresholds)
    np.testing.assert_array_equal(e_n, e_0)
    np.testing.assert_array_equal(e_n, e_1)
    np.testing.assert_allclose(p_n, p_0)
    np.testing.assert_allclose(p_n, p_1)


def test_time_global_sweeps_artifact_shape():
    from multi_modal_early_exit_tpu.evaluation.thresholds import (
        time_global_sweeps,
    )

    rng = np.random.default_rng(6)
    logits = rng.standard_normal((3, 40, 4))
    timings = time_global_sweeps(logits, np.linspace(0.2, 0.9, 5))
    assert set(timings) == {"naive", "opt0", "opt1"}
    assert all(v >= 0 for v in timings.values())

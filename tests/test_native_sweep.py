"""C++/OpenMP sweep kernel vs numpy reference implementations."""

import numpy as np
import pytest

from multi_modal_early_exit_tpu.evaluation.thresholds import (
    assign_exits_2d,
    csf_matrix,
    mixture_pareto_sweep,
    percentile_thresholds,
    random_mixtures,
)

native = pytest.importorskip("multi_modal_early_exit_tpu.native.sweep")

if not native.available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    E, N = 5, 300
    scores = rng.random((E, N)).astype(np.float32)
    correct = (rng.random((E, N)) > 0.4).astype(np.float32)
    return scores, correct


def test_mixture_sweep_matches_numpy(data):
    scores, correct = data
    rng = np.random.default_rng(1)
    mixtures = rng.random((200, scores.shape[0])).astype(np.float32)
    acc, avg = native.mixture_sweep(scores, correct, mixtures)

    assignment = assign_exits_2d(scores, mixtures)
    acc_np = correct[assignment, np.arange(scores.shape[1])[None]].mean(-1)
    avg_np = assignment.mean(-1)
    np.testing.assert_allclose(acc, acc_np, atol=1e-5)
    np.testing.assert_allclose(avg, avg_np, atol=1e-5)


def test_global_sweep_last_exit_fallback(data):
    scores, correct = data
    # threshold above all scores -> everyone takes the last exit
    acc, avg = native.global_sweep(scores, correct, np.array([2.0], np.float32))
    assert avg[0] == pytest.approx(scores.shape[0] - 1)
    assert acc[0] == pytest.approx(correct[-1].mean(), abs=1e-5)
    # threshold 0 -> everyone exits at 0
    acc0, avg0 = native.global_sweep(scores, correct, np.zeros(1, np.float32))
    assert avg0[0] == pytest.approx(0.0)


def test_mixture_pareto_sweep_backends_agree():
    rng = np.random.default_rng(2)
    E, N, K = 4, 120, 6
    logits = rng.standard_normal((E, N, K))
    refs = rng.integers(0, K, N)
    kw = dict(num_mixtures=500, num_per_exit=5, seed=3)
    r_native = mixture_pareto_sweep(logits, refs, backend="native", **kw)
    r_numpy = mixture_pareto_sweep(logits, refs, backend="numpy", **kw)
    np.testing.assert_allclose(
        r_native["accuracy"], r_numpy["accuracy"], atol=1e-5
    )
    np.testing.assert_allclose(
        r_native["average_exit"], r_numpy["average_exit"], atol=1e-5
    )


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

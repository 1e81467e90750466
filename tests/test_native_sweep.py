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

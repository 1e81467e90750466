"""Policy + threshold-sweep tests, incl. the naive-vs-vectorized equivalence
cross-check the reference performs in EE/thresh.py:309-318."""

import numpy as np

from multi_modal_early_exit_tpu.evaluation.policy import Policy, _naive_scan, _scan
from multi_modal_early_exit_tpu.evaluation.thresholds import (
    assign_exits_2d,
    csf_matrix,
    evaluate_exit_logits,
    mixture_pareto_sweep,
    naive_global_sweep,
    percentile_thresholds,
    random_mixtures,
    vectorized_global_sweep,
)


def make_store(E=4, N=60, K=8, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(E, N, K) * 3
    references = rng.randint(0, K, N)
    return logits, references


def test_policy_scan_matches_naive():
    logits, _ = make_store()
    for threshold in [0.1, 0.5, 0.9, 0.99]:
        fast = _scan(logits, np.full(1, threshold))
        slow = _naive_scan(logits, np.full(logits.shape[0], threshold))
        np.testing.assert_array_equal(fast[0], slow[0])
        np.testing.assert_allclose(fast[1], slow[1])


def test_global_threshold_policy_contract():
    logits, _ = make_store()
    policy = Policy(logits, {"exit_threshold": 0.6})
    exits_store, predictions, dist = policy.max_confidence_global_thresholding_policy()
    E, N, K = logits.shape
    assert exits_store.shape == (N,)
    assert predictions.shape == (N, K)
    assert abs(sum(dist.values()) - 1.0) < 1e-9
    # impossible threshold → everyone at final exit
    exits_store, _, dist = Policy(
        logits, {"exit_threshold": 2.0}
    ).max_confidence_global_thresholding_policy()
    assert (exits_store == E - 1).all()
    assert dist[E - 1] == 1.0


def test_accuracy_calibration_heuristic():
    logits, _ = make_store()
    E = logits.shape[0]
    config = {
        "epsilon": 0.1,
        "calibration_metrics": {
            "accuracy": list(np.linspace(0.3, 0.9, E)),
            "ece": list(np.linspace(0.2, 0.05, E)),
        },
    }
    exits_store, predictions, dist = Policy(logits, config).accuracy_calibration_heuristic()
    assert exits_store.shape == (logits.shape[1],)
    assert abs(sum(dist.values()) - 1.0) < 1e-9


def test_sweep_naive_vs_vectorized():
    logits, _ = make_store(E=3, N=25)
    thresholds = np.linspace(0.1, 0.9, 7)
    p1, e1 = naive_global_sweep(logits, thresholds)
    p2, e2 = vectorized_global_sweep(logits, thresholds)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_allclose(p1, p2)


def test_mixture_machinery():
    logits, references = make_store(E=4, N=40)
    grid = percentile_thresholds(logits, num_per_exit=5)
    assert grid.shape == (4, 5)
    assert (grid[-1] == 0).all()  # final exit always passes
    mixtures = random_mixtures(grid, 64, seed=1)
    assert mixtures.shape == (64, 4)
    scores = csf_matrix(logits)
    assignment = assign_exits_2d(scores, mixtures)
    assert assignment.shape == (64, 40)
    acc, avg = evaluate_exit_logits(logits, references, assignment[0])
    assert 0 <= acc <= 1 and 0 <= avg <= 3


def test_mixture_pareto_sweep_backends_agree():
    logits, references = make_store(E=4, N=40)
    res_np = mixture_pareto_sweep(
        logits, references, num_mixtures=128, backend="numpy"
    )
    res_jax = mixture_pareto_sweep(
        logits, references, num_mixtures=128, backend="jax", chunk=64
    )
    np.testing.assert_allclose(res_np["accuracy"], res_jax["accuracy"], atol=1e-6)
    np.testing.assert_allclose(res_np["average_exit"], res_jax["average_exit"], atol=1e-6)

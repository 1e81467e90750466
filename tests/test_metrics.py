"""Metric suite unit tests, anchored on the reference's literature cases
(EE/metrics.py:501-554) plus sanity properties."""

import numpy as np
import pytest

from multi_modal_early_exit_tpu.evaluation.metrics import (
    AUROC_logits,
    accuracy,
    aurc_logits,
    brier_loss,
    calc_metrics,
    ece_logits,
    f1_macro,
    f1_micro,
    nll,
)


def test_aurc_literature_cases():
    """Three cases from the fd-shifts AURC paper; ordering must hold:
    unseparable_lowcorrect is best (lowest AURC)."""
    predictions = np.array([0.9, 0.1, 0.3, 1.0, 0.1])
    # correctness labels + raw confidence array -> use_as_is (the reference's
    # test_aurc relies on the same pre-softmaxed 1-D confids)
    separable = aurc_logits(np.array([1, 0, 0, 1, 0]), predictions, use_as_is=True)
    low_correct = aurc_logits(np.array([1, 1, 0, 1, 0]), predictions, use_as_is=True)
    high_incorrect = aurc_logits(np.array([0, 1, 1, 1, 0]), predictions, use_as_is=True)
    assert low_correct < high_incorrect
    assert separable < high_incorrect
    # perfect ranking of the separable case → AURC well below random
    assert separable < 0.4


def test_auroc_ood_directions():
    """Reference test_ood (EE/metrics.py:523-554)."""
    preds = [0.6648081, 0.98290163, 0.79909354, 0.9961113, 0.1472904,
             0.29210454, 0.0049987, 0.70650965, 0.97676945]
    worst = AUROC_logits([1, 0, 1, 0, 1, 1, 1, 1, 0], preds)["AUROC"]
    perfect = AUROC_logits(
        np.logical_not([1, 0, 1, 0, 1, 1, 1, 1, 0]).astype(int), preds
    )["AUROC"]
    assert worst == 0.0
    assert perfect == 1.0


def test_basic_metrics_on_known_case():
    y = np.array([0, 1, 2, 1])
    logits = np.array(
        [[5.0, 0, 0], [0, 5.0, 0], [0, 0, 5.0], [5.0, 0, 0]]  # 3 right, 1 wrong
    )
    assert accuracy(y, logits) == 0.75
    assert f1_micro(y, logits) == 0.75
    assert 0 < f1_macro(y, logits) <= 1
    assert nll(y, logits) > 0
    assert 0 < brier_loss(y, logits) < 2


def test_brier_perfect_and_worst():
    y = np.array([0, 1])
    perfect = np.array([[1.0, 0.0], [0.0, 1.0]])
    worst = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert brier_loss(y, perfect) == pytest.approx(0.0)
    assert brier_loss(y, worst) == pytest.approx(2.0)


def test_ece_calibrated_vs_overconfident():
    rng = np.random.RandomState(0)
    n = 2000
    # perfectly calibrated binary predictor at p=0.7
    p = 0.7
    probs = np.tile([p, 1 - p], (n, 1))
    y = (rng.rand(n) > p).astype(int)  # class 0 w.p. 0.7
    ece_cal = ece_logits(y, probs)
    # overconfident: predicts 0.99 but only 70% right
    probs_over = np.tile([0.99, 0.01], (n, 1))
    ece_over = ece_logits(y, probs_over)
    assert ece_cal < 0.08
    assert ece_over > 0.2
    assert ece_cal < ece_over


def test_calc_metrics_bundle_keys():
    rng = np.random.RandomState(1)
    logits = rng.randn(50, 4)
    y = rng.randint(0, 4, 50)
    out = calc_metrics(logits, y)
    assert set(out) == {"accuracy", "brier_loss", "nll", "f1_micro", "f1_macro",
                        "ece", "aurc"}


def test_multi_aurc_plot(tmp_path):
    from multi_modal_early_exit_tpu.evaluation.metrics import (
        StatsCache,
        multi_aurc_plot,
    )

    rng = np.random.RandomState(0)
    correct = rng.randint(0, 2, 100)
    caches = {
        "good": StatsCache(confids=correct + rng.rand(100) * 0.1,
                           correct=correct),
        "random": StatsCache(confids=rng.rand(100), correct=correct),
    }
    out = str(tmp_path / "rc.png")
    aurcs = multi_aurc_plot(caches, out_path=out)
    assert aurcs["good"] < aurcs["random"]
    import os
    assert os.path.getsize(out) > 0

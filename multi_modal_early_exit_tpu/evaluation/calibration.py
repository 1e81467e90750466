"""Per-exit temperature scaling and Platt scaling.

Parity: EE/generic_scaling.py — a single scalar temperature per exit, fit by
scipy L-BFGS-B minimizing NLL of softmax(logits / T) on validation logits
(generic_scaling.py:90-99). The same scipy optimizer/objective is kept so the
fitted temperatures — and therefore the accuracy_calibration_heuristic
thresholds built from post-calibration metrics — reproduce exactly.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from scipy.optimize import minimize
from scipy.special import logsumexp, softmax
from sklearn.linear_model import LogisticRegression
from sklearn.metrics import log_loss


def nll_of_logits(labels_one_hot: np.ndarray, logits: np.ndarray) -> float:
    """Mean negative log-likelihood straight from logits (stable logsumexp
    form); sanity-check companion to the optimizer's log_loss objective."""
    log_z = logsumexp(a=logits, axis=1)
    true_logit = np.sum(logits * labels_one_hot, axis=1)
    return float(-np.mean(true_logit - log_z))


class TemperatureScaler:
    """Scalar temperature calibration: T = argmin NLL(softmax(logits / T)).

    What must match the reference for threshold parity (and does): the
    objective — sklearn ``log_loss`` over softmax-scaled logits — and the
    optimizer — scipy L-BFGS-B from T0=1 with lower bound 1e-32
    (EE/generic_scaling.py:90-99 is the spec). Everything else (state,
    method surface) is this framework's own design: the temperature is a
    plain float and ``fit`` is the single entry point.
    """

    def __init__(self, temperature: float = 1.0):
        self.temperature = float(temperature)

    def fit(self, labels: np.ndarray, logits: np.ndarray) -> float:
        n_classes = np.arange(logits.shape[-1])

        def objective(t: np.ndarray) -> float:
            return log_loss(labels, softmax(logits / t, -1), labels=n_classes)

        result = minimize(
            objective,
            x0=np.asarray([self.temperature]),
            method="L-BFGS-B",
            bounds=[(1e-32, None)],
        )
        assert result.success, result.message
        self.temperature = float(result.x[0])
        return self.temperature

    def temperature_scale(self, logits: np.ndarray) -> np.ndarray:
        return logits / self.temperature

    def transform(self, logits: np.ndarray) -> np.ndarray:
        return softmax(self.temperature_scale(logits), -1)


def get_platt_scaler(model_probs: np.ndarray, labels: np.ndarray) -> Callable:
    """Logistic-regression calibration of confidences
    (parity: generic_scaling.py:9-26)."""
    clf = LogisticRegression(C=1e10, solver="lbfgs")
    eps = 1e-12
    x = np.expand_dims(model_probs.astype(np.float64), axis=-1)
    x = np.clip(x, eps, 1 - eps)
    x = np.log(x / (1 - x))
    clf.fit(x, labels)

    def calibrator(probs):
        z = np.clip(np.array(probs, dtype=np.float64), eps, 1 - eps)
        z = np.log(z / (1 - z))
        z = z * clf.coef_[0] + clf.intercept_
        return 1 / (1 + np.exp(-z))

    return calibrator


def calibrate_exit_logits(
    validation_logits: np.ndarray,
    validation_references: np.ndarray,
    test_logits: np.ndarray,
):
    """Fit per-exit temperatures on validation, apply to test
    (parity: EE/eval.py:277-346). Returns (calibrated_test_logits, metrics).
    """
    from multi_modal_early_exit_tpu.evaluation.metrics import ece_logits

    nr_exits = test_logits.shape[0]
    calibrated = np.zeros_like(test_logits)
    temperatures, ece, acc, avg_conf = [], [], [], []
    for i in range(nr_exits):
        scaler = TemperatureScaler()
        scaler.fit(validation_references, validation_logits[i])
        calibrated[i] = scaler.temperature_scale(test_logits[i])
        # metrics recorded on validation logits post-calibration, as the
        # reference does (eval.py:324-334)
        cal_val = scaler.temperature_scale(validation_logits[i])
        ece.append(float(ece_logits(validation_references, cal_val)))
        acc.append(float(np.mean(cal_val.argmax(-1) == validation_references)))
        avg_conf.append(float(softmax(cal_val, -1).max(-1).mean()))
        temperatures.append(float(scaler.temperature))
    metrics = {
        "ece": ece,
        "accuracy": acc,
        "temperature": temperatures,
        "average_confidence": avg_conf,
        # provenance: the reference computes ECE via the jordyvl/ece hub
        # metric (EE/metrics.py:479-498), unfetchable offline. Our
        # ece_logits pins the hub metric's documented scipy substrate
        # (equal-mass quantile edges, binned_statistic/digitize
        # conventions) and is asserted against an independent scipy oracle
        # + golden vectors (PARITY.md #26) — recorded here so downstream
        # consumers of accuracy_calibration_heuristic thresholds can see
        # the convention this ECE was computed under.
        "ece_convention": "equal-mass-quantile/scipy-binned_statistic "
                          "(local reimpl of jordyvl/ece; PARITY.md #26)",
    }
    return calibrated, metrics

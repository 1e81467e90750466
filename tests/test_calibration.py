"""Temperature scaling tests (parity: EE/generic_scaling.py:114-125 smoke test
plus recovery properties)."""

import numpy as np

from multi_modal_early_exit_tpu.evaluation.calibration import (
    TemperatureScaler,
    calibrate_exit_logits,
    get_platt_scaler,
)


def test_smoke_fit_transform():
    rng = np.random.RandomState(0)
    logits = rng.randn(30, 5)
    y = rng.choice(5, 30)
    scaler = TemperatureScaler()
    scaler.fit(y, logits)
    probs = scaler.transform(logits)
    assert probs.shape == (30, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-9)


def test_recovers_known_temperature():
    """Logits scaled by T=3 should fit a temperature ≈ 3 given clean data."""
    rng = np.random.RandomState(1)
    n, k = 4000, 6
    true_logits = rng.randn(n, k) * 2
    probs = np.exp(true_logits) / np.exp(true_logits).sum(-1, keepdims=True)
    y = np.array([rng.choice(k, p=p) for p in probs])
    scaler = TemperatureScaler()
    scaler.fit(y, true_logits * 3.0)
    assert 2.5 < scaler.temperature < 3.5


def test_calibrate_exit_logits_shapes():
    rng = np.random.RandomState(2)
    E, N, K = 3, 100, 4
    val_logits = rng.randn(E, N, K) * 4
    test_logits = rng.randn(E, N, K) * 4
    val_refs = rng.randint(0, K, N)
    calibrated, metrics = calibrate_exit_logits(val_logits, val_refs, test_logits)
    assert calibrated.shape == test_logits.shape
    for key in ("ece", "accuracy", "temperature", "average_confidence"):
        assert len(metrics[key]) == E
    assert all(t > 0 for t in metrics["temperature"])


def test_platt_scaler_monotone():
    rng = np.random.RandomState(3)
    probs = rng.rand(500)
    labels = (probs + rng.randn(500) * 0.2 > 0.5).astype(int)
    calibrator = get_platt_scaler(probs, labels)
    out = calibrator(np.array([0.1, 0.5, 0.9]))
    assert out.shape == (3,)
    assert (np.diff(out) > 0).all()

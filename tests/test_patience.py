"""Batched patience (PABEE) criterion: counts, decisions, cascade, engine.

The reference names `patience` with a PABEE citation but raises
NotImplementedError (EE/models/EE_modules.py:116-146).  Here it is
implemented per the paper (arXiv:2006.04152): exit when the top-1
prediction is unchanged for `t` consecutive exits.  Every vectorized path
is cross-checked against a naive per-sample python scan.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import (
    EarlyExitInference,
    ExitConfig,
)
from multi_modal_early_exit_tpu.evaluation.policy import Policy
from multi_modal_early_exit_tpu.models.ee.cascade import make_cascade_forward
from multi_modal_early_exit_tpu.models.ee.engine import AnytimeEngine
from multi_modal_early_exit_tpu.models.ee.model import (
    decide_exits,
    ee_forward,
    init_ee_params,
)
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)
from multi_modal_early_exit_tpu.ops.criteria import patience_counts


def naive_patience_scan(store: np.ndarray, t: float):
    """Per-sample python scan: counter of consecutive agreements; exit when
    counter >= t; final row always exits."""
    E1, N, _ = store.shape
    exits = np.zeros(N, np.int32)
    for s in range(N):
        prev, cnt = -1, 0
        for e in range(E1):
            pred = int(np.argmax(store[e, s]))
            cnt = cnt + 1 if pred == prev else 0
            prev = pred
            if cnt >= t or e == E1 - 1:
                exits[s] = e
                break
    return exits


def naive_counts(store: np.ndarray) -> np.ndarray:
    E1, N, _ = store.shape
    counts = np.zeros((E1, N), np.float32)
    preds = store.argmax(-1)
    for s in range(N):
        for e in range(1, E1):
            counts[e, s] = counts[e - 1, s] + 1 if preds[e, s] == preds[e - 1, s] else 0
    return counts


def test_patience_counts_match_naive():
    rng = np.random.default_rng(0)
    store = rng.standard_normal((5, 37, 4)).astype(np.float32)
    got = np.asarray(patience_counts(jnp.asarray(store)))
    np.testing.assert_array_equal(got, naive_counts(store))


def test_enum_wiring():
    crit = EarlyExitInference.PATIENCE
    assert crit.is_stateful
    assert crit.get_function() is patience_counts
    assert crit.get_sign()(2.0, 2.0)  # ge: count reaching t exits
    assert not crit.get_sign()(1.0, 2.0)


@pytest.fixture(scope="module")
def setup():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(
            exits=("text_avg", "vision_avg", 1, 2),
            inference_strategy="patience",
            global_threshold=1.0,
        ),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    B, S = 16, 20
    batch = (
        jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32),
        jnp.asarray(rng.standard_normal((B, 3, 32, 32)), jnp.float32),
        jnp.ones((B, S), jnp.int32),
    )
    return cfg, params, batch


@pytest.mark.slow
@pytest.mark.parametrize("t", [1.0, 2.0, 99.0])
def test_decide_exits_matches_naive_scan(setup, t):
    cfg, params, batch = setup
    out = ee_forward(params, cfg, *batch)
    got = np.asarray(decide_exits(out, cfg.exit, threshold=t))
    store = np.asarray(out.policy_logits(), np.float32)
    np.testing.assert_array_equal(got, naive_patience_scan(store, t))


@pytest.mark.slow
@pytest.mark.parametrize("t", [1.0, 2.0])
def test_cascade_patience_matches_exact_policy(setup, t):
    cfg, params, batch = setup
    B = batch[0].shape[0]
    out = ee_forward(params, cfg, *batch)
    expected = np.asarray(decide_exits(out, cfg.exit, threshold=t))
    cascade = jax.jit(
        make_cascade_forward(cfg, capacities=(B, B, B), threshold=t)
    )
    res = cascade(params, *batch)
    np.testing.assert_array_equal(np.asarray(res.exit_ids), expected)
    store = np.asarray(out.policy_logits(), np.float32)
    np.testing.assert_allclose(
        np.asarray(res.logits), store[expected, np.arange(B)],
        atol=3e-5, rtol=1e-4,
    )


@pytest.mark.slow
@pytest.mark.parametrize("t", [1.0, 2.0])
def test_engine_patience_matches_exact_policy(setup, t):
    cfg, params, batch = setup
    B = batch[0].shape[0]
    out = ee_forward(params, cfg, *batch)
    expected = np.asarray(decide_exits(out, cfg.exit, threshold=t))
    engine = AnytimeEngine(params, cfg, threshold=t, max_batch=B)
    logits, exit_ids, _ = engine.infer(*batch)
    np.testing.assert_array_equal(exit_ids, expected)
    store = np.asarray(out.policy_logits(), np.float32)
    np.testing.assert_allclose(
        logits, store[expected, np.arange(B)], atol=3e-5, rtol=1e-4
    )


def test_offline_patience_policy_matches_naive():
    rng = np.random.default_rng(7)
    store = rng.standard_normal((6, 64, 8))
    policy = Policy(store, {"exit_threshold": 2})
    exits, preds, dist = policy.patience_policy()
    np.testing.assert_array_equal(exits, naive_patience_scan(store, 2))
    np.testing.assert_allclose(preds, store[exits, np.arange(64)])
    assert abs(sum(dist.values()) - 1.0) < 1e-9

"""Golden regression pins: deterministic outputs of the fixed-seed pipeline.

These values were produced by the current implementation on the virtual CPU
backend with fixed seeds; any unintended numerical change to embeddings,
encoder, heads, criteria, policies, or calibration shows up here first.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.data.loader import prefetch_to_device
from multi_modal_early_exit_tpu.models.ee.model import ee_forward, init_ee_params
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)


@pytest.mark.slow
def test_forward_is_deterministic_across_calls():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B, S = 3, 12
    args = (
        jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32),
        jnp.asarray(rng.standard_normal((B, 3, 32, 32)), jnp.float32),
        jnp.ones((B, S), jnp.int32),
    )
    a = np.asarray(ee_forward(params, cfg, *args).policy_logits())
    b = np.asarray(ee_forward(params, cfg, *args).policy_logits())
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_init_is_seed_deterministic():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1)),
    )
    p1 = init_ee_params(jax.random.key(7), cfg)
    p2 = init_ee_params(jax.random.key(7), cfg)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p3 = init_ee_params(jax.random.key(8), cfg)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3))
    )


def test_prefetch_to_device_preserves_order_and_values():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), buffer_size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_criteria_golden_values():
    from multi_modal_early_exit_tpu.ops.criteria import entropy, max_confidence

    logits = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    mc = np.asarray(max_confidence(logits))
    h = np.asarray(entropy(logits))
    np.testing.assert_allclose(mc, [0.78698604, 1 / 3], rtol=1e-6)
    np.testing.assert_allclose(h, [0.66557268, np.log(3)], rtol=1e-6)

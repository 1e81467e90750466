"""AnytimeEngine (staged bucketed inference) vs the one-shot batched forward.

The engine must reproduce exactly the per-sample exit decisions and logits of
``ee_forward`` + the global-thresholding policy — it only changes *how much*
compute runs, never the numbers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
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


@pytest.fixture(scope="module")
def setup():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(
            exits=("text_avg", "vision_avg", 1),
            inference_strategy="max_confidence",
        ),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B, S = 13, 24
    batch = dict(
        input_ids=jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        bbox=jnp.asarray(
            np.sort(rng.integers(0, 500, (B, S, 4)), axis=-1), jnp.int32
        ),
        pixel_values=jnp.asarray(rng.standard_normal((B, 3, 32, 32)),
                                 jnp.float32),
        attention_mask=jnp.ones((B, S), jnp.int32),
    )
    return cfg, params, batch


@pytest.mark.slow
@pytest.mark.parametrize("threshold", [0.0, 0.3, 0.9, 1.1])
def test_engine_matches_batched_forward(setup, threshold):
    cfg, params, batch = setup
    out = ee_forward(params, cfg, batch["input_ids"], batch["bbox"],
                     batch["pixel_values"], batch["attention_mask"])
    expected_exits = np.asarray(decide_exits(out, cfg.exit, threshold))
    store = np.asarray(out.policy_logits(), np.float32)
    B = store.shape[1]
    expected_logits = store[expected_exits, np.arange(B)]

    engine = AnytimeEngine(params, cfg, threshold=threshold, max_batch=16,
                           min_bucket=4)
    got_logits, got_exits, _ = engine.infer(
        batch["input_ids"], batch["bbox"], batch["pixel_values"],
        batch["attention_mask"],
    )
    np.testing.assert_array_equal(got_exits, expected_exits)
    np.testing.assert_allclose(got_logits, expected_logits, atol=2e-5,
                               rtol=1e-4)


@pytest.mark.slow
def test_engine_store_collection(setup):
    cfg, params, batch = setup
    out = ee_forward(params, cfg, batch["input_ids"], batch["bbox"],
                     batch["pixel_values"], batch["attention_mask"])
    expected_store = np.asarray(out.policy_logits(), np.float32)

    engine = AnytimeEngine(params, cfg, threshold=0.5, max_batch=16,
                           min_bucket=4)
    _, _, store = engine.infer(
        batch["input_ids"], batch["bbox"], batch["pixel_values"],
        batch["attention_mask"], collect_store=True,
    )
    np.testing.assert_allclose(store, expected_store, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_engine_saves_compute_at_low_threshold(setup):
    """threshold 0 -> everyone exits at the first embedding exit; the deep
    stages never run on more than the store-collection path."""
    cfg, params, batch = setup
    engine = AnytimeEngine(params, cfg, threshold=0.0, max_batch=16,
                           min_bucket=4)
    _, exits, _ = engine.infer(
        batch["input_ids"], batch["bbox"], batch["pixel_values"],
        batch["attention_mask"],
    )
    assert (exits == 0).all()


@pytest.mark.slow
def test_engine_lte_matches_batched_forward():
    """LTE inference path: engine exit decisions must equal the batched
    forward's LTE criteria + threshold rule."""
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(
            exits=("text_visual_concat", 1),
            inference_strategy="lte",
            use_lte=True,
        ),
    )
    params = init_ee_params(jax.random.key(2), cfg)
    rng = np.random.default_rng(3)
    B, S = 9, 16
    batch = dict(
        input_ids=jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        bbox=jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1),
                         jnp.int32),
        pixel_values=jnp.asarray(rng.standard_normal((B, 3, 32, 32)),
                                 jnp.float32),
        attention_mask=jnp.ones((B, S), jnp.int32),
    )
    out = ee_forward(params, cfg, batch["input_ids"], batch["bbox"],
                     batch["pixel_values"], batch["attention_mask"])
    threshold = 0.5
    expected_exits = np.asarray(decide_exits(out, cfg.exit, threshold))

    engine = AnytimeEngine(params, cfg, threshold=threshold, max_batch=16,
                           min_bucket=4)
    _, got_exits, _ = engine.infer(
        batch["input_ids"], batch["bbox"], batch["pixel_values"],
        batch["attention_mask"],
    )
    np.testing.assert_array_equal(got_exits, expected_exits)


@pytest.mark.slow
def test_engine_gate_heads_match_batched_forward():
    """GATE heads: engine predictions must be the classifier on the exit
    input (gated logits), with the 2-logit gate output as criterion only."""
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1), encoder_layer_strategy="gate"),
    )
    params = init_ee_params(jax.random.key(4), cfg)
    rng = np.random.default_rng(5)
    B, S = 7, 16
    batch = dict(
        input_ids=jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        bbox=jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1),
                         jnp.int32),
        pixel_values=jnp.asarray(rng.standard_normal((B, 3, 32, 32)),
                                 jnp.float32),
        attention_mask=jnp.ones((B, S), jnp.int32),
    )
    out = ee_forward(params, cfg, batch["input_ids"], batch["bbox"],
                     batch["pixel_values"], batch["attention_mask"])
    threshold = 0.6
    expected_exits = np.asarray(decide_exits(out, cfg.exit, threshold))
    store = np.asarray(out.policy_logits(), np.float32)  # gated logits
    expected_logits = store[expected_exits, np.arange(B)]

    engine = AnytimeEngine(params, cfg, threshold=threshold, max_batch=8,
                           min_bucket=4)
    got_logits, got_exits, _ = engine.infer(
        batch["input_ids"], batch["bbox"], batch["pixel_values"],
        batch["attention_mask"],
    )
    np.testing.assert_array_equal(got_exits, expected_exits)
    assert got_logits.shape == (B, 4)  # class logits, not 2-wide gate output
    np.testing.assert_allclose(got_logits, expected_logits, atol=2e-5,
                               rtol=1e-4)

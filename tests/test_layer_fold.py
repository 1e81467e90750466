"""MMEE_LAYERS_PER_STEP (multi-layer scan fold) equivalence.

The fold halves/thirds the loop-invariant bias-cotangent accumulator
round-trips in the train backward (docs/PROFILE_TRAIN.md); it must be a
pure scheduling change — same layer order, same rngs, same taps.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.models.ee.model import ee_forward, init_ee_params
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)
from multi_modal_early_exit_tpu.training.losses import ee_loss_fn


@pytest.fixture()
def setup():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),  # 2 layers
        exit=ExitConfig(
            exits=("text_avg", 1),
            training_strategy="one_stage_subgraphs_weighted",
        ),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B, S = 4, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        "bbox": jnp.asarray(
            np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32
        ),
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, 3, 32, 32)), jnp.float32
        ),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
    }
    yield cfg, params, batch
    os.environ.pop("MMEE_LAYERS_PER_STEP", None)
    jax.clear_caches()


@pytest.mark.slow
def test_fold_matches_unfolded_forward_and_grads(setup):
    cfg, params, batch = setup

    def run():
        (loss, aux), grads = jax.value_and_grad(ee_loss_fn, has_aux=True)(
            params, cfg, batch, rng=jax.random.key(5)
        )
        store = ee_forward(
            params, cfg, batch["input_ids"], batch["bbox"],
            batch["pixel_values"], batch["attention_mask"],
        ).policy_logits()
        return loss, grads, store

    os.environ["MMEE_LAYERS_PER_STEP"] = "1"
    l1, g1, s1 = jax.jit(run)()
    jax.clear_caches()
    os.environ["MMEE_LAYERS_PER_STEP"] = "2"
    l2, g2, s2 = jax.jit(run)()

    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        # reduction-order noise only (summed bias cotangents)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_fold_invalid_divisor_falls_back(setup):
    cfg, params, batch = setup
    os.environ["MMEE_LAYERS_PER_STEP"] = "5"  # 2 % 5 != 0 -> fold 1
    store = np.asarray(
        jax.jit(
            lambda p: ee_forward(
                p, cfg, batch["input_ids"], batch["bbox"],
                batch["pixel_values"], batch["attention_mask"],
            ).policy_logits()
        )(params)
    )
    assert np.isfinite(store).all()

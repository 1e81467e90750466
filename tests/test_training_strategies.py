"""Every training strategy must run: finite loss, finite grads, and the
stage-structure side effects (two-stage freezing, entropyreg) must hold.
(reference strategy list: EE/models/EE_modules.py:71-113)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from multi_modal_early_exit_tpu.config.exit_config import (
    EarlyExitStrategy,
    ExitConfig,
)
from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)
from multi_modal_early_exit_tpu.training.losses import ee_loss_fn
from multi_modal_early_exit_tpu.training.subgraphs import (
    exit_loss_weights,
    subgraph_param_counts,
)
from multi_modal_early_exit_tpu.training.trainer import (
    TrainingArguments,
    make_optimizer,
    make_train_step,
)


def make_batch(cfg, B=4, S=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        "bbox": jnp.asarray(
            np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32
        ),
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, 3, 32, 32)), jnp.float32
        ),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
    }


@pytest.mark.slow
@pytest.mark.parametrize("strategy", [s.value for s in EarlyExitStrategy])
def test_strategy_loss_and_grads_finite(strategy):
    head = "gate" if "two_stage" in strategy else "ramp"
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(
            exits=("text_avg", 1), training_strategy=strategy, gamma=0.5,
            encoder_layer_strategy=head,
        ),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    batch = make_batch(cfg)

    counts = subgraph_param_counts(params, cfg)
    weights = exit_loss_weights(counts)
    (loss, aux), grads = jax.value_and_grad(ee_loss_fn, has_aux=True)(
        params, cfg, batch, rng=None, exit_weights=jnp.asarray(weights),
        deterministic=True,
    )
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


@pytest.mark.slow
def test_two_stage_freezes_backbone():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(
            exits=("text_avg", 1),
            training_strategy="two_stage_subgraphs_weighted",
        ),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    args = TrainingArguments(gradient_accumulation_steps=1)
    tx = make_optimizer(args, total_steps=4, freeze_backbone=True)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(cfg, tx, None, 1))
    batch = {k: v[None] for k, v in make_batch(cfg).items()}
    new_params, _, loss, _ = step(params, opt_state, batch, jax.random.key(1))
    assert np.isfinite(float(loss))

    # backbone encoder weights unchanged; exit heads + classifier updated
    def delta(a, b):
        return float(
            sum(jnp.abs(x - y).sum() for x, y in
                zip(jax.tree.leaves(a), jax.tree.leaves(b)))
        )

    assert delta(params["backbone"]["encoder"]["layers"],
                 new_params["backbone"]["encoder"]["layers"]) == 0.0
    assert delta(params["backbone"]["embeddings"],
                 new_params["backbone"]["embeddings"]) == 0.0
    assert delta(params["encoder_exits"], new_params["encoder_exits"]) > 0.0
    assert delta(params["backbone"]["classifier"],
                 new_params["backbone"]["classifier"]) > 0.0


@pytest.mark.slow
def test_entropyreg_changes_exit_branch_grads_only():
    base = dict(exits=("text_avg", 1), gamma=0.5)
    cfg_plain = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(training_strategy="one_stage_subgraphs", **base),
    )
    cfg_reg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(
            training_strategy="one_stage_subgraphs_entropyreg", **base
        ),
    )
    params = init_ee_params(jax.random.key(0), cfg_plain)
    batch = {k: v[None] for k, v in make_batch(cfg_plain).items()}
    args = TrainingArguments()
    tx = optax.sgd(1.0)

    def grads_for(cfg):
        step = make_train_step(cfg, tx, None, 1)
        new_params, _, _, _ = step(
            params, tx.init(params), batch, jax.random.key(1)
        )
        return jax.tree.map(lambda a, b: a - b, params, new_params)

    g_plain = grads_for(cfg_plain)
    g_reg = grads_for(cfg_reg)
    # exit-branch (head) grads scaled; trunk grads identical
    head_delta = float(
        sum(jnp.abs(x - y).sum() for x, y in zip(
            jax.tree.leaves(g_plain["encoder_exits"]),
            jax.tree.leaves(g_reg["encoder_exits"]),
        ))
    )
    trunk_delta = float(
        sum(jnp.abs(x - y).sum() for x, y in zip(
            jax.tree.leaves(g_plain["backbone"]["encoder"]["layers"]),
            jax.tree.leaves(g_reg["backbone"]["encoder"]["layers"]),
        ))
    )
    assert head_delta > 1e-8
    assert trunk_delta < 1e-6


@pytest.mark.slow
def test_gradient_checkpointing_same_grads():
    """Remat must not change gradients, only memory."""
    base_bb = LayoutLMv3Config.tiny(num_labels=4)
    batch = make_batch(None)
    grads = []
    for remat in (False, True):
        cfg = EEModelConfig(
            backbone=base_bb.replace(gradient_checkpointing=remat),
            exit=ExitConfig(exits=("text_avg", 1)),
        )
        params = init_ee_params(jax.random.key(0), cfg)
        (_, _), g = jax.value_and_grad(ee_loss_fn, has_aux=True)(
            params, cfg, batch, deterministic=True
        )
        grads.append(g)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        # recomputation reorders float ops; allow tiny drift
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_bf16_mixed_precision_trains():
    """bf16 forward with f32 master params: grads f32, loss finite, close to
    the f32 loss."""
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    batch = make_batch(cfg)
    (l32, _), g32 = jax.value_and_grad(ee_loss_fn, has_aux=True)(
        params, cfg, batch, deterministic=True
    )
    (l16, _), g16 = jax.value_and_grad(ee_loss_fn, has_aux=True)(
        params, cfg, batch, deterministic=True, compute_dtype=jnp.bfloat16
    )
    assert np.isfinite(float(l16))
    assert abs(float(l16) - float(l32)) < 0.05
    for g in jax.tree.leaves(g16):
        assert g.dtype == jnp.float32


@pytest.mark.slow
def test_lte_losses_match_reference_semantics_when_aligned():
    """Pinned-behavior test for the LTE loss (VERDICT round-1 weak #8).

    In the ALIGNED case — every exit is an encoder exit, so every exit has
    an LTE score and the reference's `lte_output[j]` indexing lines up —
    our cleaned-up `_lte_losses` must reproduce the reference computation
    exactly (EE/models/LayoutLMv3.py:795-857): exit j's loss is
    sum(CE of exits 0..j) + final CE + MSE(lte_j, 1 - correct_j), where
    correct_j comes from exit j's logits except the LAST exit, which the
    reference compares against the FINAL classifier (num_layers there counts
    encoder exits, LayoutLMv3.py:689-691, so `j+1 == num_layers` is the last
    exit in this configuration)."""
    import scipy.special

    from multi_modal_early_exit_tpu.models.ee.model import ee_forward
    from multi_modal_early_exit_tpu.training.losses import _lte_losses

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=(1, 2), use_lte=True,
                        training_strategy="joint_weighted_avg"),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    batch = make_batch(cfg)
    labels = batch.pop("labels")
    outputs = ee_forward(params, cfg, batch["input_ids"], batch["bbox"],
                         batch["pixel_values"], batch["attention_mask"])
    assert outputs.lte_scores is not None
    assert outputs.lte_scores.shape[0] == outputs.num_exits  # aligned

    got = np.asarray(_lte_losses(outputs, cfg, labels))

    # hand-rolled reference loop in numpy
    y = np.asarray(labels)
    exit_logits = np.asarray(outputs.exit_logits, np.float64)
    final_logits = np.asarray(outputs.logits, np.float64)
    lte = np.asarray(outputs.lte_scores, np.float64)

    def ce(lg):
        logp = lg - scipy.special.logsumexp(lg, axis=-1, keepdims=True)
        return float(-np.mean(logp[np.arange(len(y)), y]))

    E = exit_logits.shape[0]
    final_loss = ce(final_logits)
    inter, want = [], []
    for j in range(E):
        inter.append(ce(exit_logits[j]))
        layer = final_logits if j + 1 == E else exit_logits[j]
        correct = (np.argmax(layer, -1) == y).astype(np.float64)
        mse = float(np.mean((lte[j] - (1.0 - correct)) ** 2))
        want.append(sum(inter) + final_loss + mse)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-6)

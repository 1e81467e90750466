"""Gradient equivalence of the strategy translation (VERDICT round-1 #6).

The reference trains with a per-exit ``backward(retain_graph=True)`` loop
plus post-hoc ``p.grad`` surgery (EE/models/EE_modules.py:344-376). This
framework claims the single weighted loss + per-leaf gradient masks is
gradient-IDENTICAL. Here that claim is checked numerically: the explicit
per-loss-gradient sum with the reference's scalings must equal
``jax.grad(combine_losses ∘ ee_loss)`` (+ ``apply_entropyreg``) for

- ramp heads (plain per-exit CE),
- gate heads (classifier shared across every exit's gated logits — the
  subtle case VERDICT flagged),
- the entropyreg family (branch-grad scaling after accumulation).
"""

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
from multi_modal_early_exit_tpu.ops.criteria import entropy as entropy_fn
from multi_modal_early_exit_tpu.training.losses import (
    cross_entropy,
    exit_losses_from_outputs,
)
from multi_modal_early_exit_tpu.training.subgraphs import (
    apply_entropyreg,
    exit_loss_weights,
    subgraph_param_counts,
)

B, S = 2, 12


def make_setup(head_type="ramp", strategy="one_stage_subgraphs_weighted",
               gamma=0.4):
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(
            exits=("text_avg", "vision_avg", 1),
            training_strategy=strategy,
            encoder_layer_strategy=head_type,
            gamma=gamma,
        ),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        "bbox": jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1),
                            jnp.int32),
        "pixel_values": jnp.asarray(rng.standard_normal((B, 3, 32, 32)),
                                    jnp.float32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
    }
    return cfg, params, batch


def component_losses(params, cfg, batch):
    """(final_loss, exit_losses(E,)) from one deterministic forward."""
    out = ee_forward(
        params, cfg, batch["input_ids"], batch["bbox"],
        batch["pixel_values"], batch["attention_mask"], deterministic=True,
    )
    final = cross_entropy(out.logits, batch["labels"])
    exits = exit_losses_from_outputs(out, cfg, batch["labels"])
    return final, exits, out


def explicit_reference_grads(params, cfg, batch, exit_weights, gamma,
                             entropyreg=False):
    """The reference's loop, literally: one grad per loss term, scaled and
    summed; entropyreg as post-hoc scaling of each branch's ACCUMULATED grad
    (EE_modules.py:344-376)."""
    E = cfg.exit.num_exits

    def final_only(p):
        return component_losses(p, cfg, batch)[0]

    def exit_only(p, j):
        return component_losses(p, cfg, batch)[1][j]

    g_final = jax.grad(final_only)(params)
    total = jax.tree.map(lambda g: g * (1.0 - gamma), g_final)
    for j in range(E):
        gj = jax.grad(lambda p: exit_only(p, j))(params)
        scale = float(exit_weights[j]) * gamma / E
        total = jax.tree.map(lambda a, g, s=scale: a + s * g, total, gj)

    if entropyreg:
        _, _, out = component_losses(params, cfg, batch)
        crit = jnp.concatenate([
            jax.vmap(lambda lg: jnp.mean(entropy_fn(lg)))(out.exit_logits),
            jnp.mean(entropy_fn(out.logits))[None],
        ])
        norm = jax.nn.softmax(crit) * crit.shape[0]
        scales = 1.0 - jnp.minimum(norm, 1.0)
        total = apply_entropyreg(total, cfg, scales)
    return total


def framework_grads(params, cfg, batch, exit_weights, entropyreg=False):
    """One jax.grad of the combined loss — the trainer's path."""
    from multi_modal_early_exit_tpu.training.losses import ee_loss_fn

    (loss, aux), grads = jax.value_and_grad(ee_loss_fn, has_aux=True)(
        params, cfg, batch, rng=None, exit_weights=exit_weights,
        deterministic=True,
    )
    if entropyreg:
        crit = jnp.concatenate([
            jax.vmap(lambda lg: jnp.mean(entropy_fn(lg)))(aux["exit_logits"]),
            jnp.mean(entropy_fn(aux["logits"]))[None],
        ])
        norm = jax.nn.softmax(crit) * crit.shape[0]
        scales = 1.0 - jnp.minimum(norm, 1.0)
        grads = apply_entropyreg(grads, cfg, scales)
    return grads


def assert_trees_close(a, b, atol=1e-5, rtol=1e-4):
    fa, ta = jax.tree_util.tree_flatten_with_path(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for (path, x), y in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=rtol,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
@pytest.mark.parametrize("head_type", ["ramp", "gate"])
def test_subgraphs_weighted_equals_per_exit_backward_loop(head_type):
    cfg, params, batch = make_setup(head_type=head_type)
    weights = exit_loss_weights(subgraph_param_counts(params, cfg))
    gamma = cfg.exit.gamma

    want = explicit_reference_grads(params, cfg, batch, weights, gamma)
    got = framework_grads(params, cfg, batch, weights)
    assert_trees_close(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("head_type", ["ramp", "gate"])
def test_entropyreg_equals_post_hoc_grad_surgery(head_type):
    cfg, params, batch = make_setup(
        head_type=head_type,
        strategy="one_stage_subgraphs_weighted_entropyreg",
    )
    weights = exit_loss_weights(subgraph_param_counts(params, cfg))
    gamma = cfg.exit.gamma

    want = explicit_reference_grads(
        params, cfg, batch, weights, gamma, entropyreg=True
    )
    got = framework_grads(params, cfg, batch, weights, entropyreg=True)
    assert_trees_close(got, want)


@pytest.mark.slow
def test_branch_isolation_assumption_holds_for_ramps():
    """entropyreg's exactness rests on: exit-head params receive gradient
    ONLY from their own exit's loss. Verify directly: the gradient of every
    OTHER loss term wrt head j's params is identically zero (ramp mode)."""
    cfg, params, batch = make_setup()
    E = cfg.exit.num_exits

    def exit_only(p, j):
        return component_losses(p, cfg, batch)[1][j]

    g_final = jax.grad(lambda p: component_losses(p, cfg, batch)[0])(params)
    for leaf in jax.tree.leaves(g_final.get("embedding_exits", {})):
        assert np.all(np.asarray(leaf) == 0)
    # canonical order is vision-first (LayoutLMv3.py:438): exit 0 = vision
    g0 = jax.grad(lambda p: exit_only(p, 0))(params)
    # text head gets nothing from the vision exit's loss
    for leaf in jax.tree.leaves(g0["embedding_exits"]["text_avg"]):
        assert np.all(np.asarray(leaf) == 0)
    # encoder-exit heads get nothing from embedding-exit losses
    for leaf in jax.tree.leaves(g0.get("encoder_exits", {})):
        assert np.all(np.asarray(leaf) == 0)


@pytest.mark.slow
def test_gate_classifier_grads_flow_from_final_loss_only():
    """Observable-behavior parity (losses.py note): gate exit losses are BCE
    on the 2-logit heads; the shared classifier's gradient comes from the
    final CE only — so entropyreg's classifier scaling by the final factor
    matches the reference surgery exactly."""
    cfg, params, batch = make_setup(head_type="gate")

    def exit_sum(p):
        return component_losses(p, cfg, batch)[1].sum()

    g = jax.grad(exit_sum)(params)
    for leaf in jax.tree.leaves(g["backbone"]["classifier"]):
        assert np.all(np.asarray(leaf) == 0)

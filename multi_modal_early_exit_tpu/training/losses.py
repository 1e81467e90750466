"""Early-exit losses and training-strategy combination, as one differentiable
objective.

Reference semantics (EE/models/LayoutLMv3.py:750-881 and
EE/models/EE_modules.py:301-377):

- ramp: per-exit cross-entropy on exit logits
- gate: per-exit BCE-with-logits where the 2-class target is "was the final
  classifier applied to this exit's input correct?" (LayoutLMv3.py:764-792;
  the CE on gated logits computed there is discarded by the
  ``exit_losses = gate_losses`` overwrite — we match the observable behavior)
- lte: cumulative losses — exit j's loss is sum of CE losses of exits 0..j
  plus the final CE plus MSE(lte_score_j, 1 - correctness_j)
  (LayoutLMv3.py:795-857)
- strategies: ``joint_weighted_avg`` sums all losses; the
  ``one_stage_subgraphs*`` family reproduces the EETrainer's per-exit
  ``backward(retain_graph=True)`` loop (EE_modules.py:344-355) as a single
  weighted sum — gradients are identical because grad is linear:
  total = Σ_j wjγ/E · exit_loss_j + (1-γ) · final_loss.
- entropyreg (EE_modules.py:357-376) multiplies the *gradients of exit-branch
  parameters* by (1 - normalized softmax entropy of that exit); since branch
  parameters receive gradient only from their own exit's loss, this is exact
  post-hoc gradient masking — see ``apply_entropyreg`` in trainer.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import EarlyExitStrategy, ExitConfig
from multi_modal_early_exit_tpu.models.ee.model import EEOutputs, canonical_exit_order
from multi_modal_early_exit_tpu.models.layoutlmv3.config import EEModelConfig


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch (torch nn.CrossEntropyLoss default)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean element-wise binary CE with logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def exit_losses_from_outputs(
    outputs: EEOutputs, cfg: EEModelConfig, labels: jax.Array
) -> jax.Array:
    """Per-exit loss vector (E,) according to the head strategy."""
    exit_cfg = cfg.exit
    E = outputs.num_exits
    if E == 0:
        return jnp.zeros((0,))

    if exit_cfg.apply_gating:
        # BCE target: one-hot of "gated prediction correct"
        correct = (jnp.argmax(outputs.gated_logits, axis=-1) == labels[None, :])
        targets = jax.nn.one_hot(correct.astype(jnp.int32), 2)  # (E, B, 2)
        return jax.vmap(bce_with_logits)(outputs.exit_logits, targets)

    if exit_cfg.use_lte and outputs.lte_scores is not None:
        return _lte_losses(outputs, cfg, labels)

    # ramp / embexit: per-exit CE
    return jax.vmap(lambda lg: cross_entropy(lg, labels))(outputs.exit_logits)


def _lte_losses(outputs: EEOutputs, cfg: EEModelConfig, labels: jax.Array) -> jax.Array:
    """Cumulative LTE losses (LayoutLMv3.py:795-857).

    The reference indexes lte_output[j] over all exit_states, which only
    lines up when every exit has an LTE score; we compute the MSE term only
    for exits that have one (concat + encoder exits) and use plain CE for
    earlier embedding exits — the cleaned-up semantics of the same design.
    """
    E = outputs.num_exits
    inter = jax.vmap(lambda lg: cross_entropy(lg, labels))(outputs.exit_logits)
    final_loss = cross_entropy(outputs.logits, labels)

    order = canonical_exit_order(cfg.exit)
    lte_exit_ids = [
        i for i, name in enumerate(order)
        if (isinstance(name, int) or name == "text_visual_concat")
    ]
    n_lte = len(lte_exit_ids)

    losses = []
    cum = jnp.cumsum(inter)
    lte_ptr = 0
    for j in range(E):
        loss_j = cum[j] + final_loss
        if j in lte_exit_ids and outputs.lte_scores is not None:
            # label: 1 ⇒ continue (wrong), 0 ⇒ exit (right); last encoder exit
            # compares against the final classifier prediction
            is_last = j == E - 1
            layer_logits = outputs.logits if is_last else outputs.exit_logits[j]
            correct = (jnp.argmax(layer_logits, axis=-1) == labels).astype(jnp.float32)
            target = 1.0 - correct
            loss_j = loss_j + jnp.mean(
                jnp.square(outputs.lte_scores[lte_ptr] - target)
            )
            lte_ptr += 1
        losses.append(loss_j)
    del n_lte
    return jnp.stack(losses)


def combine_losses(
    final_loss: jax.Array,
    exit_losses: jax.Array,
    exit_cfg: ExitConfig,
    exit_weights: Optional[jax.Array] = None,
    gamma: Optional[float] = None,
) -> jax.Array:
    """Combine final + exit losses per the training strategy.

    For one/two_stage_subgraphs strategies this reproduces the EETrainer
    gradient exactly (EE_modules.py:344-355): each exit loss optionally scaled
    by its subgraph weight, then by γ/E; main loss by (1-γ) (scalings only
    applied when γ≠0, matching the reference's ``if gamma != 0`` guards).
    """
    strategy = exit_cfg.training_strategy
    gamma = exit_cfg.gamma if gamma is None else gamma
    E = exit_losses.shape[0]

    if strategy in (EarlyExitStrategy.JOINT_W_AVG, EarlyExitStrategy.JOINT):
        return final_loss + jnp.sum(exit_losses)

    if "subgraphs" in strategy.value:
        scaled = exit_losses
        if strategy.is_weighted and exit_weights is not None:
            scaled = scaled * exit_weights
        if gamma != 0 and E > 0:
            scaled = scaled * (gamma / E)
            final_loss = final_loss * (1.0 - gamma)
        return final_loss + jnp.sum(scaled)

    # raw / two-stage / alternating / layerwise: final CE only; the stage
    # structure is handled by the trainer's parameter freezing schedule.
    return final_loss


def ee_loss_fn(
    params: Dict[str, Any],
    cfg: EEModelConfig,
    batch: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
    exit_weights: Optional[jax.Array] = None,
    deterministic: bool = False,
    compute_dtype=None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Full EE objective. Returns (total_loss, aux) for jax.value_and_grad.

    ``compute_dtype=jnp.bfloat16`` gives mixed-precision training: the
    forward runs in bf16 (MXU-native, half the activation HBM traffic) while
    master params/grads/optimizer state stay f32 (the cast is inside the
    differentiated function, so gradients come back f32). Losses/softmax are
    computed in f32 regardless (cross_entropy upcasts).
    """
    from multi_modal_early_exit_tpu.models.ee.model import ee_forward

    fwd_params = params
    pixel_values = batch["pixel_values"]
    if compute_dtype is not None:
        fwd_params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        # float inputs must follow, or jnp promotion silently upcasts the
        # whole forward back to f32 (f32 pixels @ bf16 patch kernel -> f32
        # visual embeddings -> f32 concat -> f32 encoder + f32 bias)
        pixel_values = pixel_values.astype(compute_dtype)

    from multi_modal_early_exit_tpu.ops.flash_attention import (
        use_flash_attention,
    )

    outputs = ee_forward(
        fwd_params, cfg,
        batch["input_ids"], batch["bbox"], pixel_values,
        batch.get("attention_mask"),
        deterministic=deterministic, rng=rng,
        # lane-align the sequence once (709 -> 768 at the reference budget):
        # fwd AND bwd flash kernels stop re-padding q/k/v per layer, and the
        # LN/elementwise fusions run aligned (same win as the cascade)
        seq_pad_multiple=128 if use_flash_attention() else None,
    )
    labels = batch["labels"]
    final_loss = cross_entropy(outputs.logits, labels)
    exit_losses = exit_losses_from_outputs(outputs, cfg, labels)
    total = combine_losses(final_loss, exit_losses, cfg.exit, exit_weights)
    aux = {
        "final_loss": final_loss,
        "exit_losses": exit_losses,
        "logits": outputs.logits,
        "exit_logits": outputs.exit_logits,
        "gated_logits": outputs.gated_logits,
        "accuracy": jnp.mean((jnp.argmax(outputs.logits, -1) == labels).astype(jnp.float32)),
    }
    return total, aux

"""EE trainer: optax + pjit training loop with grad accumulation.

Replaces HF ``EETrainer`` (reference: EE/models/EE_modules.py:301-377) and the
entry-point training logic (EE/IC_only.py:144-217):

- the per-exit ``backward(retain_graph=True)`` loop becomes one
  ``jax.value_and_grad`` of the strategy-combined loss (gradient-identical,
  see losses.py);
- ``entropyreg`` grad surgery becomes ``apply_entropyreg`` on the grad pytree;
- two-stage freezing (IC_only.py:189-207: freeze everything whose name lacks
  'exit'/'classifier') becomes an optax mask;
- multi-device: params/batch sharded over a Mesh via NamedSharding; XLA emits
  psum for the DP gradient reduction — no torch DataParallel equivalent code;
- gradient accumulation: a ``lax.scan`` over microbatches inside one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multi_modal_early_exit_tpu.models.layoutlmv3.config import EEModelConfig
from multi_modal_early_exit_tpu.ops.criteria import entropy as entropy_fn
from multi_modal_early_exit_tpu.training.losses import ee_loss_fn
from multi_modal_early_exit_tpu.training.subgraphs import (
    apply_entropyreg,
    exit_loss_weights,
    subgraph_param_counts,
)

Params = Dict[str, Any]


@dataclasses.dataclass
class TrainingArguments:
    """Mirrors the knobs of EETrainingArguments (EE_modules.py:288-298) +
    the HF TrainingArguments subset the reference uses (IC_only.py:144-168)."""

    learning_rate: float = 2e-5
    num_epochs: int = 1
    train_batch_size: int = 2
    eval_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    weight_decay: float = 0.0
    warmup_ratio: float = 0.0
    max_grad_norm: float = 0.0  # 0 disables clipping
    alpha: float = 1.0
    temperature: float = 1.0
    gamma: float = 0.0
    seed: int = 42
    log_every: int = 10
    bf16: bool = False  # mixed precision: bf16 forward, f32 master params
    # bf16 first-moment (Adam m) state: halves one of the three f32
    # optimizer-state streams in the HBM-bound adamw update. OPT-IN — the
    # default keeps f32 states for reference-optimizer parity (HF AdamW)
    bf16_momentum: bool = False


def _is_trainable_two_stage(path: str) -> bool:
    """Second-stage trainables: exit heads + classifier (IC_only.py:202-207)."""
    return "exit" in path or "classifier" in path or path.startswith("lte")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def make_optimizer(
    args: TrainingArguments,
    total_steps: int,
    freeze_backbone: bool = False,
) -> optax.GradientTransformation:
    """AdamW + linear warmup/decay (the HF Trainer default schedule)."""
    warmup = int(total_steps * args.warmup_ratio)
    if warmup > 0:
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, args.learning_rate, warmup),
                optax.linear_schedule(
                    args.learning_rate, 0.0, max(total_steps - warmup, 1)
                ),
            ],
            boundaries=[warmup],
        )
    else:
        # no warmup: full lr from step 0, linear decay to 0
        schedule = optax.linear_schedule(
            args.learning_rate, 0.0, max(total_steps, 1)
        )
    chain: List[optax.GradientTransformation] = []
    if args.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(args.max_grad_norm))
    chain.append(
        optax.adamw(
            schedule, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=args.weight_decay,
            mu_dtype=jnp.bfloat16 if args.bf16_momentum else None,
        )
    )
    tx = optax.chain(*chain)
    if freeze_backbone:
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: "train" if _is_trainable_two_stage(_path_str(p)) else "freeze",
                params,
            )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, label_fn
        )
    return tx


def make_train_step(
    cfg: EEModelConfig,
    tx: optax.GradientTransformation,
    exit_weights: Optional[jax.Array],
    accum_steps: int = 1,
    compute_dtype=None,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Build the jittable train step.

    Batch layout with accumulation: each array is (accum_steps, micro_bs, ...).
    Uses lax.scan to accumulate grads, then one optimizer update.
    ``compute_dtype=jnp.bfloat16`` enables mixed-precision (f32 master
    params/grads, bf16 forward).

    ``loss_fn`` (default: the EE objective ``ee_loss_fn``) lets dense
    baselines train through the same machinery — e.g.
    ``models.layoutlmv2.sequence_classification_loss`` (the reference
    trains its dense AutoModels through the same generic HF Trainer,
    EE/IC_only.py:176-178). Must have ee_loss_fn's signature.
    """
    strategy = cfg.exit.training_strategy if hasattr(cfg, "exit") else None
    use_entropyreg = strategy.uses_entropyreg if strategy is not None else False
    loss_fn = loss_fn if loss_fn is not None else ee_loss_fn

    def loss_and_grads(params, micro_batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, micro_batch, rng=rng, exit_weights=exit_weights,
            compute_dtype=compute_dtype,
        )
        if use_entropyreg:
            # normalized softmax entropy across exits (EE_modules.py:357-370)
            crit = jnp.concatenate(
                [
                    jax.vmap(lambda lg: jnp.mean(entropy_fn(lg)))(aux["exit_logits"]),
                    jnp.mean(entropy_fn(aux["logits"]))[None],
                ]
            )
            norm = jax.nn.softmax(crit) * crit.shape[0]
            scales = 1.0 - jnp.minimum(norm, 1.0)
            grads = apply_entropyreg(grads, cfg, scales)
        return loss, aux, grads

    def train_step(params, opt_state, batch, rng):
        if accum_steps == 1:
            micro = jax.tree.map(lambda x: x[0], batch)
            loss, aux, grads = loss_and_grads(params, micro, rng)
        else:
            def body(carry, xs):
                acc_grads, acc_loss = carry
                micro, step_rng = xs
                loss, aux, grads = loss_and_grads(params, micro, step_rng)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                return (acc_grads, acc_loss + loss), aux

            zero = jax.tree.map(jnp.zeros_like, params)
            rngs = jax.random.split(rng, accum_steps)
            (grads, loss_sum), aux = jax.lax.scan(
                body, (zero, 0.0), (batch, rngs)
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss_sum / accum_steps
            aux = jax.tree.map(lambda x: x[-1], aux)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return train_step


class EETrainer:
    """Minimal-surface trainer: train/evaluate over in-memory or iterable
    datasets of numpy batches (the data layer provides batch iterators)."""

    def __init__(
        self,
        cfg: EEModelConfig,
        params: Params,
        args: TrainingArguments,
        total_steps: int,
        mesh=None,
    ):
        self.cfg = cfg
        self.args = args
        self.mesh = mesh

        # dense configs (e.g. LayoutLMv2Config) carry no .exit: train with a
        # plain CE objective through the same machinery (the reference trains
        # dense AutoModels through its generic trainer, EE/IC_only.py:176-178)
        self.is_ee = hasattr(cfg, "exit")
        loss_fn = None
        if not self.is_ee:
            from multi_modal_early_exit_tpu.models.layoutlmv2.modeling import (
                sequence_classification_loss,
            )

            loss_fn = sequence_classification_loss

        strategy = cfg.exit.training_strategy if self.is_ee else None
        weights = None
        if strategy is not None and strategy.is_weighted:
            counts = subgraph_param_counts(params, cfg)
            weights = exit_loss_weights(counts)
        self.exit_weights = weights

        freeze = strategy.is_two_stage if strategy is not None else False
        self.tx = make_optimizer(args, total_steps, freeze_backbone=freeze)
        self.opt_state = self.tx.init(params)
        self.params = params

        self._step_fn = jax.jit(
            make_train_step(
                cfg, self.tx, weights, args.gradient_accumulation_steps,
                compute_dtype=jnp.bfloat16 if args.bf16 else None,
                loss_fn=loss_fn,
            ),
            donate_argnums=(0, 1),
        )
        self.step = 0

    def train_step(self, batch: Dict[str, np.ndarray], rng) -> Tuple[float, Dict]:
        """batch arrays shaped (accum, micro_bs, ...)."""
        self.params, self.opt_state, loss, aux = self._step_fn(
            self.params, self.opt_state, batch, rng
        )
        self.step += 1
        return float(loss), aux

    def _eval_fwd(self):
        """Jitted policy-logits forward, built once (stable jit cache key)."""
        if not hasattr(self, "_eval_fwd_fn"):
            cfg = self.cfg
            if self.is_ee:
                from multi_modal_early_exit_tpu.models.ee.model import (
                    ee_forward,
                )

                self._eval_fwd_fn = jax.jit(
                    lambda p, ids, bbox, pv, m: ee_forward(
                        p, cfg, ids, bbox, pv, m
                    ).policy_logits()
                )
            else:
                # dense: a single-row (1, B, K) store keeps evaluate() generic
                from multi_modal_early_exit_tpu.models.layoutlmv2.modeling import (
                    forward_sequence_classification,
                )

                self._eval_fwd_fn = jax.jit(
                    lambda p, ids, bbox, pv, m: forward_sequence_classification(
                        p, cfg, ids, bbox, pv, m
                    ).logits[None]
                )
        return self._eval_fwd_fn

    def evaluate(self, batches: Iterable[Dict[str, np.ndarray]]) -> Dict[str, float]:
        """Accuracy + per-exit accuracy (reference compute_metrics,
        IC_only.py:91-130) + per-exit capture share under the configured
        confidence policy (first exit whose max-softmax clears the global
        threshold) — the train-time dead-exit signal (VERDICT r3 #10)."""
        fwd = self._eval_fwd()
        thr = float(self.cfg.exit.global_threshold) if self.is_ee else 1.0
        correct = 0
        total = 0
        exit_correct = None
        exit_counts = None
        for batch in batches:
            store = np.asarray(
                fwd(
                    self.params,
                    batch["input_ids"], batch["bbox"],
                    batch["pixel_values"], batch.get("attention_mask"),
                )
            )
            labels = np.asarray(batch["labels"])
            preds = store.argmax(-1)  # (E+1, B)
            if exit_correct is None:
                exit_correct = np.zeros(store.shape[0])
                exit_counts = np.zeros(store.shape[0], np.int64)
            exit_correct += (preds == labels[None]).sum(-1)
            correct += (preds[-1] == labels).sum()
            total += len(labels)
            # capture share: max-softmax per exit, final row always passes
            s = store.astype(np.float64)
            e = np.exp(s - s.max(-1, keepdims=True))
            msp = (e / e.sum(-1, keepdims=True)).max(-1)  # (E+1, B)
            passed = msp > thr
            passed[-1] = True
            exit_counts += np.bincount(
                passed.argmax(0), minlength=store.shape[0]
            )
        results = {"accuracy": correct / max(total, 1)}
        for j in range(len(exit_correct) - 1):
            results[f"exit_{j}_accuracy"] = exit_correct[j] / max(total, 1)
        for j in range(len(exit_counts)):
            results[f"exit_{j}_share"] = exit_counts[j] / max(total, 1)
        return results

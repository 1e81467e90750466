"""The early-exit LayoutLMv3 model: batched, masked, exception-free.

Reference semantics being reproduced (EE/models/LayoutLMv3.py):

- Embedding-level exits tap modality means *before* the encoder:
  ``vision_avg`` = mean of visual embeddings (LayoutLMv3.py:466),
  ``text_avg`` = mean of text embeddings (:520),
  ``text_visual_concat`` = mean of the concatenated+LayerNormed sequence (:582).
- Encoder exits tap the [CLS] state after layer i (:226).
- Exit heads are ramps (num_labels logits) or gates (2 logits); with gating the
  *final classifier* applied to the exit input produces the class prediction
  (gated logits, :741-743, :768).
- Exit criteria (entropy / max-confidence / LTE score) are computed on head
  outputs at eval time (:240-244, :473).

TPU-first re-design: the reference raises ``EarlyExitException`` through the
Python stack per-sample at batch size 1 (:251-268).  Here a single jitted
forward computes ALL exit logits batched (the encoder scan collects per-layer
[CLS] states; heads run as one vmapped matmul), and exit *decisions* are a
masked argmax over the (E+1, B) criterion matrix — the exact per-sample
decision the offline policies make, with no host round-trip.  FLOP savings
for live serving come from the staged bucketed engine in
``models/ee/engine.py`` rather than from control flow inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import (
    EarlyExitInference,
    ExitConfig,
)
from multi_modal_early_exit_tpu.models.ee.heads import (
    exit_head_apply,
    init_exit_head,
    init_lte_head,
    lte_head_apply,
)
from multi_modal_early_exit_tpu.models.layoutlmv3.config import EEModelConfig
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    RngStream,
    backbone_apply,
    classifier_apply,
    init_params as init_backbone_params,
)

Params = Dict[str, Any]

# Forward-order of embedding exits: the reference model computes vision first
# ("assumed to be cheaper", LayoutLMv3.py:438), then text, then concat;
# exit_states are collected in that order regardless of the order the user
# listed exits in.
EMBEDDING_FORWARD_ORDER = ("vision_avg", "text_avg", "text_visual_concat")


def canonical_exit_order(exit_cfg: ExitConfig) -> Tuple:
    """Exits in the order their logits appear in exit_states."""
    emb = tuple(e for e in EMBEDDING_FORWARD_ORDER if e in exit_cfg.embedding_exits)
    return emb + exit_cfg.encoder_exits


def init_ee_params(key, cfg: EEModelConfig, dtype=jnp.float32) -> Params:
    backbone, exit_cfg = cfg.backbone, cfg.exit
    keys = jax.random.split(key, 8)
    params: Params = {"backbone": init_backbone_params(keys[0], backbone, dtype)}

    emb_heads: Params = {}
    for i, name in enumerate(EMBEDDING_FORWARD_ORDER):
        if name in exit_cfg.embedding_exits:
            emb_heads[name] = init_exit_head(
                jax.random.fold_in(keys[1], i), backbone, exit_cfg, dtype=dtype
            )
    if emb_heads:
        params["embedding_exits"] = emb_heads

    n_enc = len(exit_cfg.encoder_exits)
    if n_enc:
        heads = [
            init_exit_head(jax.random.fold_in(keys[2], i), backbone, exit_cfg, dtype=dtype)
            for i in range(n_enc)
        ]
        params["encoder_exits"] = jax.tree.map(
            lambda *xs: jnp.stack(xs, axis=0), *heads
        )

    if exit_cfg.use_lte:
        params["lte"] = init_lte_head(keys[3], backbone, dtype)
    return params


def prune_ee_params(params: Params, old_cfg, new_cfg) -> Params:
    """Slice an EE param tree down to a pruned exit config.

    ``encoder_exits`` heads are stacked by POSITION in the encoder_exits
    tuple and ``embedding_exits`` are keyed by name, so dropping exits from
    the config requires dropping the matching param rows/keys — the configs
    alone are not enough (evaluation.operating_points.prune_dead_exits
    produces ``new_cfg``). Backbone/classifier/lte params pass through
    unchanged."""
    old_exit = old_cfg.exit if hasattr(old_cfg, "exit") else old_cfg
    new_exit = new_cfg.exit if hasattr(new_cfg, "exit") else new_cfg
    out = dict(params)
    if "embedding_exits" in params:
        kept = {
            name: head
            for name, head in params["embedding_exits"].items()
            if name in new_exit.embedding_exits
        }
        if kept:
            out["embedding_exits"] = kept
        else:
            out.pop("embedding_exits", None)
    if "encoder_exits" in params and old_exit.encoder_exits:
        keep_rows = [
            i for i, layer in enumerate(old_exit.encoder_exits)
            if layer in new_exit.encoder_exits
        ]
        if keep_rows:
            idx = jnp.asarray(keep_rows)
            out["encoder_exits"] = jax.tree.map(
                lambda x: x[idx], params["encoder_exits"]
            )
        else:
            out.pop("encoder_exits", None)
    return out


@dataclasses.dataclass
class EEOutputs:
    """All per-exit tensors from one batched forward.

    Mirrors the information content of the reference's EEModelOutput /
    EESequenceClassifierOutput (EE/models/EE_modules.py:198-273) in dense
    array form.  ``E`` = number of exits; final classifier is *not* part of
    exit_logits (index E in policy space).
    """

    logits: jax.Array  # (B, K) final classifier
    exit_logits: jax.Array  # (E, B, head_dim) raw head outputs (K or 2 for gates)
    exit_criteria: jax.Array  # (E + 1, B) criterion incl. final
    gate_inputs: Optional[jax.Array] = None  # (E, B, H) head inputs (gating only)
    gated_logits: Optional[jax.Array] = None  # (E, B, K) classifier(gate_input)
    lte_scores: Optional[jax.Array] = None  # (E_lte, B) sigmoid scores
    last_hidden_state: Optional[jax.Array] = None  # (B, S, H)

    @property
    def num_exits(self) -> int:
        return self.exit_logits.shape[0]

    def policy_logits(self) -> jax.Array:
        """(E+1, B, K) logit store in the dump contract of the reference
        (EE/utils.py:182-193): gated logits when gating, else ramp logits,
        with the final classifier logits appended last."""
        per_exit = self.gated_logits if self.gated_logits is not None else self.exit_logits
        return jnp.concatenate([per_exit, self.logits[None]], axis=0)


def ee_forward(
    params: Params,
    cfg: EEModelConfig,
    input_ids: jax.Array,
    bbox: jax.Array,
    pixel_values: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    collect_hidden: bool = False,
    seq_pad_multiple: Optional[int] = None,
) -> EEOutputs:
    backbone_cfg, exit_cfg = cfg.backbone, cfg.exit
    rngs = RngStream(rng)

    bb = backbone_apply(
        params["backbone"], backbone_cfg, input_ids, bbox, pixel_values,
        attention_mask, deterministic=deterministic, rng=rngs.next(),
        collect_cls=bool(exit_cfg.encoder_exits), collect_hidden=collect_hidden,
        seq_pad_multiple=seq_pad_multiple,
    )

    exit_inputs = []  # (B, H) head input per exit, in canonical order
    order = canonical_exit_order(exit_cfg)
    for name in order:
        if name == "vision_avg":
            exit_inputs.append(jnp.mean(bb.visual_embeddings, axis=1))
        elif name == "text_avg":
            exit_inputs.append(jnp.mean(bb.text_embeddings, axis=1))
        elif name == "text_visual_concat":
            exit_inputs.append(jnp.mean(bb.combined_embeddings, axis=1))
    n_emb = len(exit_inputs)

    exit_logit_list = []
    emb_heads = params.get("embedding_exits", {})
    for i, name in enumerate(order[:n_emb]):
        exit_logit_list.append(
            exit_head_apply(
                emb_heads[name], backbone_cfg, exit_inputs[i],
                deterministic=deterministic, rng=rngs.next(),
            )
        )

    if exit_cfg.encoder_exits:
        layer_idx = jnp.asarray([e - 1 for e in exit_cfg.encoder_exits])
        cls_states = bb.cls_per_layer[layer_idx]  # (E_enc, B, H), static gather
        head_rng = rngs.next()
        enc_logits = jax.vmap(
            lambda p, x, i: exit_head_apply(
                p, backbone_cfg, x, deterministic=deterministic,
                rng=jax.random.fold_in(head_rng, i) if head_rng is not None else None,
            )
        )(params["encoder_exits"], cls_states,
          jnp.arange(len(exit_cfg.encoder_exits)))
        exit_inputs.extend([cls_states[i] for i in range(cls_states.shape[0])])
        exit_logit_list.extend([enc_logits[i] for i in range(enc_logits.shape[0])])

    exit_logits = (
        jnp.stack(exit_logit_list, axis=0)
        if exit_logit_list
        else jnp.zeros((0,) + (input_ids.shape[0], backbone_cfg.num_labels))
    )

    final_logits = classifier_apply(
        params["backbone"]["classifier"], backbone_cfg,
        bb.last_hidden_state[:, 0, :],
        deterministic=deterministic, rngs=rngs,
    )

    gate_inputs = gated_logits = None
    if exit_cfg.apply_gating and exit_inputs:
        gate_inputs = jnp.stack(exit_inputs, axis=0)  # (E, B, H)
        gated_logits = jax.vmap(
            lambda x: classifier_apply(
                params["backbone"]["classifier"], backbone_cfg, x,
                deterministic=deterministic, rngs=None,
            )
        )(gate_inputs)

    lte_scores = None
    if exit_cfg.use_lte and "lte" in params:
        lte_inputs = []
        # reference computes LTE scores at the concat embedding exit
        # (LayoutLMv3.py:597-602) and at every encoder exit (:231-237)
        for i, name in enumerate(order[:n_emb]):
            if name == "text_visual_concat":
                lte_inputs.append(exit_inputs[i])
        lte_inputs.extend(exit_inputs[n_emb:])
        if lte_inputs:
            lte_scores = jax.vmap(lambda x: lte_head_apply(params["lte"], x))(
                jnp.stack(lte_inputs, axis=0)
            )

    # exit criteria on head outputs + final logits (reference computes these
    # only at eval; here they are cheap enough to always emit)
    crit_fn = exit_cfg.inference_strategy.get_function()
    if exit_cfg.inference_strategy == EarlyExitInference.PATIENCE:
        # stateful PABEE criterion: consecutive-agreement counts over the
        # prediction-logit store (gated logits under gating, else ramp
        # logits, final classifier last — the policy_logits contract)
        per_exit = gated_logits if gated_logits is not None else exit_logits
        store = (
            jnp.concatenate([per_exit, final_logits[None]], axis=0)
            if per_exit.shape[0]
            else final_logits[None]
        )
        exit_criteria = crit_fn(store)
    elif exit_cfg.inference_strategy == EarlyExitInference.LTE and lte_scores is not None:
        pad = exit_logits.shape[0] - lte_scores.shape[0]
        crit = jnp.concatenate(
            [jnp.full((pad, final_logits.shape[0]), jnp.inf), lte_scores], axis=0
        )
        exit_criteria = jnp.concatenate(
            [crit, jnp.zeros((1, final_logits.shape[0]))], axis=0
        )
    else:
        crit_exits = (
            crit_fn(exit_logits)
            if exit_logits.shape[0]
            else jnp.zeros((0, final_logits.shape[0]))
        )
        exit_criteria = jnp.concatenate(
            [crit_exits, crit_fn(final_logits)[None]], axis=0
        )

    return EEOutputs(
        logits=final_logits,
        exit_logits=exit_logits,
        exit_criteria=exit_criteria,
        gate_inputs=gate_inputs,
        gated_logits=gated_logits,
        lte_scores=lte_scores,
        last_hidden_state=bb.last_hidden_state if collect_hidden else None,
    )


def decide_exits(
    outputs: EEOutputs, exit_cfg: ExitConfig, threshold: Optional[float] = None
) -> jax.Array:
    """Per-sample exit decision: first exit whose criterion clears the
    threshold, else the final classifier (index E).

    This is the on-device, batched equivalent of the reference's
    max_confidence_global_thresholding_policy scan (EE/policy.py:28-46)
    applied to live criteria instead of dumped logits.
    """
    thr = exit_cfg.global_threshold if threshold is None else threshold
    sign = exit_cfg.inference_strategy.get_sign()
    crit = outputs.exit_criteria  # (E+1, B)
    passed = sign(crit, thr)
    # final row always exits
    passed = passed.at[-1].set(True)
    return jnp.argmax(passed, axis=0)  # (B,)

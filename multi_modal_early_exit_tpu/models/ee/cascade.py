"""Single-program capacity-constrained anytime cascade.

``AnytimeEngine`` (engine.py) reads exit criteria back to the host after
every stage to re-bucket survivors — correct, but each stage boundary costs
a host sync, which dominates when the accelerator is remote or latency
matters. This module is the fully on-device alternative: ONE jit program
runs the whole cascade with *static* per-stage capacities.

Design (TPU-first, no dynamic shapes):
- stage 0 computes embeddings + embedding-exit criteria for the full batch;
- before each encoder stage, the ``c_i`` least-confident still-running
  samples are selected with ``jax.lax.top_k`` and compacted via gather —
  static shape (c_i, ...), so XLA compiles one program and the deep layers
  process only c_i rows;
- samples that want to continue but exceed capacity exit immediately with
  their best logits so far ("capacity-constrained exiting") — with
  capacities >= true survivor counts the decisions equal the exact
  threshold policy (tested), and capacities are calibrated offline from
  validation exit rates (see ``capacities_from_distribution``).

FLOP cost is fixed per batch: stage i always costs c_i rows — deterministic
latency, the serving property batch-level early exit normally destroys.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_early_exit_tpu.config.exit_config import EarlyExitInference
from multi_modal_early_exit_tpu.models.ee.heads import (
    exit_head_apply,
    lte_head_apply,
)
from multi_modal_early_exit_tpu.models.ee.model import canonical_exit_order
from multi_modal_early_exit_tpu.models.layoutlmv3.config import EEModelConfig
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    FusedBiasContext,
    classifier_apply,
    embed_text,
    embed_vision,
    encoder_layer_apply,
    kernel_attention_bias,
    layer_norm,
    make_attention_bias,
    use_fused_bias_attention,
    visual_bbox,
)
from multi_modal_early_exit_tpu.ops.flash_attention import (
    use_flash_attention,
)


def capacities_from_distribution(
    exit_distribution: Dict[int, float],
    batch: int,
    n_emb: int,
    n_stages: int,
    margin: float = 1.25,
    multiple: int = 8,
    tail: Optional[float] = None,
) -> Tuple[int, ...]:
    """Per-stage capacities from a (validation) exit distribution.

    Two sizing rules:

    - ``margin`` (legacy): expected survivor count × a flat safety factor.
      A flat factor wastes rows at high survival rates — p=0.74 at batch
      64 gives 59.2 → rounds to the FULL batch, so the stage saves
      nothing even though overflow was never likely.
    - ``tail`` (preferred when set, e.g. 0.995): a binomial-tail quantile
      — cap = mean + z·sqrt(B·p·(1−p)) with z = Phi^{-1}(tail), i.e. the
      smallest capacity that covers the stage's survivor count in a
      ``tail`` fraction of batches (survivor counts are Binomial(B, p)
      for i.i.d. batches). p=0.74/B=64 gives 47.4 + 2.58·3.5 → 56: one
      lane-group fewer than the flat margin with a quantified overflow
      rate; overflowing samples exit with their best-so-far logits
      (capacity-constrained exiting), so the cost of the rare overflow is
      bounded and measured, not a failure.

    Rounded up to a lane-friendly ``multiple``, capped at ``batch``.
    """
    surv = 1.0
    for j in range(n_emb):
        surv -= exit_distribution.get(j, 0.0)
    caps = []
    for s in range(n_stages):
        p = min(max(surv, 0.0), 1.0)
        if tail is not None:
            from scipy.stats import norm

            z = float(norm.ppf(tail))
            want = p * batch + z * np.sqrt(batch * p * (1.0 - p))
        else:
            want = p * batch * margin
        c = min(batch, int(np.ceil(want / multiple)) * multiple)
        caps.append(max(c, multiple))
        surv -= exit_distribution.get(n_emb + s, 0.0)
    return tuple(caps)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CascadeResult:
    logits: jax.Array  # (B, K) per-sample final logits (from its exit)
    exit_ids: jax.Array  # (B,) canonical exit index; E == final classifier
    capacity_exited: jax.Array  # (B,) bool: exited due to capacity, not threshold


def _stage_layers(params, a: int, b: int):
    return jax.tree.map(
        lambda x: x[a:b], params["backbone"]["encoder"]["layers"]
    )


def make_cascade_forward(
    cfg: EEModelConfig,
    capacities: Sequence[int],
    threshold: Optional[float] = None,
    temperatures: Optional[Sequence[float]] = None,
):
    """Build the jittable single-program cascade.

    ``capacities[i]`` is the static row count of encoder stage i (stages are
    split at the encoder exits, last stage runs to the final classifier).

    ``threshold`` is either one global value or a per-exit sequence of
    length num_exits (the live counterpart of the offline 2D per-exit
    threshold policies, EE/thresh.py:188-225 / EE/large_scale.py): exit j
    compares its criterion against ``threshold[j]``; the final classifier
    always exits. Comparison keeps the criterion's ``sign`` convention
    (strict ``>`` for max-confidence, as the 1D offline policy does).

    ``temperatures`` (optional, length num_exits + 1) applies per-exit
    temperature scaling *to the exit criterion only*: criterion j is
    computed on ``head_out / T_j`` — the live counterpart of running the
    offline policy on a temperature-calibrated logit store
    (EE/generic_scaling.py + EE/eval.py:311-341).  Predictions are
    unaffected (scaling preserves argmax).  Ignored for patience/LTE, whose
    criteria are not softmax-confidence based.
    """
    exit_cfg = cfg.exit
    bb_cfg = cfg.backbone
    thr = exit_cfg.global_threshold if threshold is None else threshold
    sign = exit_cfg.inference_strategy.get_sign()
    crit_fn = exit_cfg.inference_strategy.get_function()
    use_lte = exit_cfg.inference_strategy == EarlyExitInference.LTE
    # patience (PABEE) is stateful: the criterion is a consecutive-agreement
    # counter carried across exits, not a pointwise function of one exit's
    # logits — the cascade carries (prev_pred, count) per sample instead of
    # calling crit_fn
    use_patience = exit_cfg.inference_strategy == EarlyExitInference.PATIENCE
    order_len = len(canonical_exit_order(exit_cfg))
    if temperatures is not None:
        if len(temperatures) != order_len + 1:
            raise ValueError(
                f"need {order_len + 1} temperatures (one per exit + final), "
                f"got {len(temperatures)}"
            )
        temps = tuple(float(t) for t in temperatures)
    else:
        temps = (1.0,) * (order_len + 1)
    order = canonical_exit_order(exit_cfg)
    emb_exits = [e for e in order if isinstance(e, str)]
    enc_exits = [e for e in order if isinstance(e, int)]
    n_emb, E = len(emb_exits), len(order)
    if np.ndim(thr) == 0:
        thrs = (float(thr),) * E
    else:
        if len(thr) != E:
            raise ValueError(
                f"need {E} per-exit thresholds (one per exit; the final "
                f"classifier always exits), got {len(thr)}"
            )
        thrs = tuple(float(t) for t in thr)
    L = bb_cfg.num_hidden_layers
    bounds = []
    prev = 0
    for k in enc_exits:
        bounds.append((prev, k))
        prev = k
    bounds.append((prev, L))
    assert len(capacities) == len(bounds), (
        f"need {len(bounds)} capacities (one per encoder stage), got "
        f"{len(capacities)}"
    )
    # confidence ordering: continue the least-exit-worthy samples. For
    # 'greater is exit' criteria low values continue; for 'lower is exit'
    # high values continue.
    higher_exits = sign(jnp.asarray(1.0), jnp.asarray(0.0))
    # NOTE on capacity-pressure ordering with per-exit thresholds: ranking
    # by raw criterion is EXACTLY margin-to-own-threshold ranking, because
    # at every top_k all still-running rows carry the criterion of the
    # SAME most-recent exit (the embedding loop updates every running row
    # at each exit, and stage s's running set is a subset of stage s-1's
    # sel, all scored at exit n_emb+s-1) — the per-exit threshold is a
    # constant shift within each ranking. No margin machinery is needed.

    def cascade(params, input_ids, bbox, pixel_values, attention_mask):
        B = input_ids.shape[0]
        K = bb_cfg.num_labels
        if n_emb == 0 and capacities[0] < B:
            # with no embedding exits, a sample forced out before stage 0
            # would have no prediction at all
            raise ValueError(
                "capacities[0] must cover the full batch when the config "
                "has no embedding exits"
            )

        # ---- stage 0: embeddings + embedding exits (full batch) --------
        text_emb = embed_text(
            params["backbone"]["embeddings"], bb_cfg, input_ids, bbox
        )
        vis_emb = embed_vision(
            params["backbone"]["visual"], bb_cfg, pixel_values
        )
        s_t, s_v = input_ids.shape[1], vis_emb.shape[1]
        combined = jnp.concatenate([text_emb, vis_emb], axis=1)
        combined = layer_norm(
            params["backbone"]["LayerNorm"], combined, bb_cfg.layer_norm_eps
        )
        vis_bb = jnp.broadcast_to(visual_bbox(bb_cfg)[None], (B, s_v, 4))
        full_bbox = jnp.concatenate([bbox, vis_bb], axis=1)
        pos_ids = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.arange(s_t, dtype=jnp.int32)[None], (B, s_t)),
                jnp.broadcast_to(jnp.arange(s_v, dtype=jnp.int32)[None], (B, s_v)),
            ],
            axis=1,
        )
        full_mask = jnp.concatenate(
            [attention_mask, jnp.ones((B, s_v), attention_mask.dtype)], axis=1
        )

        out_logits = jnp.zeros((B, K), jnp.float32)
        exit_ids = jnp.full((B,), E, jnp.int32)
        running = jnp.ones((B,), bool)
        last_crit = jnp.zeros((B,), jnp.float32)
        # patience carry: top-1 prediction at the previous exit (-1 = none
        # yet); the agreement count itself lives in last_crit
        prev_pred = jnp.full((B,), -1, jnp.int32)

        for j, name in enumerate(emb_exits):
            if name == "vision_avg":
                x = jnp.mean(vis_emb, axis=1)
            elif name == "text_avg":
                x = jnp.mean(text_emb, axis=1)
            else:
                x = jnp.mean(combined, axis=1)
            head_out = exit_head_apply(
                params["embedding_exits"][name], bb_cfg, x
            ).astype(jnp.float32)
            if exit_cfg.apply_gating:
                # gate heads: 2-logit criterion; prediction = classifier on
                # the exit input (LayoutLMv3.py:741-743, 768)
                logits_j = classifier_apply(
                    params["backbone"]["classifier"], bb_cfg, x
                ).astype(jnp.float32)
            else:
                logits_j = head_out
            if use_lte:
                crit_j = (
                    lte_head_apply(params["lte"], x).astype(jnp.float32)
                    if name == "text_visual_concat"
                    else jnp.full((B,), jnp.inf, jnp.float32)
                )
            elif use_patience:
                pred_j = jnp.argmax(logits_j, axis=-1).astype(jnp.int32)
                crit_j = jnp.where(pred_j == prev_pred, last_crit + 1.0, 0.0)
                prev_pred = jnp.where(running, pred_j, prev_pred)
            else:
                crit_j = crit_fn(head_out / temps[j])
            exits_now = running & sign(crit_j, thrs[j])
            out_logits = jnp.where(exits_now[:, None], logits_j, out_logits)
            exit_ids = jnp.where(exits_now, j, exit_ids)
            # remember best-so-far logits for samples forced out later
            out_logits = jnp.where(
                (running & ~exits_now)[:, None], logits_j, out_logits
            )
            last_crit = jnp.where(running, crit_j, last_crit)
            running = running & ~exits_now

        capacity_exited = jnp.zeros((B,), bool)
        # bias reuse across stages: stage n+1's rows are a SUBSET of stage
        # n's (running ⊆ selected), so later stages gather their (c, H, P,
        # P) bias rows from the previous stage's materialized bias instead
        # of re-running the builder — a ~0.3 ms HBM gather replaces a ~3 ms
        # construction-bound kernel at the reference budget (profiled: the
        # two per-stage builds were 18% of the cascade). Capacity-filler
        # rows (top_k padding when fewer than c samples are running) gather
        # an arbitrary valid row; their outputs are masked out by
        # ``sel_running`` and never read.
        prev_bias = None
        prev_sel = None

        # Pad the sequence ONCE to the lane-aligned width (709 -> 768 at the
        # reference budget): every encoder-stage op then runs aligned — the
        # flash kernel stops re-padding q/k/v per layer, and the LayerNorm /
        # elementwise fusions stop limping over a ragged sublane dimension.
        # Pad columns carry mask 0 (bias -inf keys) so they never influence
        # real tokens; pad rows are garbage but only row 0 is ever read.
        if use_flash_attention():
            s_all = combined.shape[1]
            pad = (-s_all) % 128
            if pad:
                combined = jnp.pad(combined, ((0, 0), (0, pad), (0, 0)))
                full_bbox = jnp.pad(full_bbox, ((0, 0), (0, pad), (0, 0)))
                pos_ids = jnp.pad(pos_ids, ((0, 0), (0, pad)))
                full_mask = jnp.pad(full_mask, ((0, 0), (0, pad)))
        state = (combined, full_bbox, pos_ids, full_mask)

        # desire-to-continue score: most-confident first would exit; we rank
        # so the LEAST exit-worthy keep compute
        def continue_score(crit, running_mask):
            s = -crit if higher_exits else crit
            # running samples must outrank finished ones
            return jnp.where(running_mask, s, -jnp.inf)

        for stage_idx, (a, b_layer) in enumerate(bounds):
            c = int(capacities[stage_idx])
            score = continue_score(last_crit, running)
            _, sel = jax.lax.top_k(score, c)  # (c,) rows that continue
            selected = jnp.zeros((B,), bool).at[sel].set(True)
            # capacity-forced exits: running but not selected take their
            # last evaluated exit (deepest embedding exit before stage 0,
            # else the previous encoder exit) with best-so-far logits
            forced = running & ~selected
            forced_exit = max(n_emb - 1, 0) if stage_idx == 0 \
                else n_emb + stage_idx - 1
            exit_ids = jnp.where(forced, jnp.int32(forced_exit), exit_ids)
            capacity_exited = capacity_exited | forced
            running = running & selected

            hidden_c, bbox_c, pos_c, mask_c = (
                jnp.take(t, sel, axis=0) for t in state
            )
            if prev_bias is not None:
                # gather this stage's rows out of the previous stage's bias
                pos_in_prev = (
                    jnp.zeros((B,), jnp.int32)
                    .at[prev_sel]
                    .set(jnp.arange(prev_sel.shape[0], dtype=jnp.int32))
                )
                bias_c = jnp.take(prev_bias, pos_in_prev[sel], axis=0)
            elif (
                bb_cfg.has_relative_attention_bias
                and bb_cfg.has_spatial_attention_bias
                and use_flash_attention()
            ):
                if use_fused_bias_attention():
                    # per-layer in-kernel bias (no bias tensor at all) —
                    # opt-in; recomputation per layer usually loses to the
                    # one-pass builder below
                    import math as _math

                    sc = 1.0 / _math.sqrt(bb_cfg.head_dim)
                    enc = params["backbone"]["encoder"]
                    bias_c = FusedBiasContext(
                        position_ids=pos_c.astype(jnp.int32),
                        cx=bbox_c[:, :, 0].astype(jnp.int32),
                        cy=bbox_c[:, :, 3].astype(jnp.int32),
                        mask=mask_c.astype(jnp.int32),
                        t1=enc["rel_pos_bias"].astype(jnp.float32) * sc,
                        tx=enc["rel_pos_x_bias"].astype(jnp.float32) * sc,
                        ty=enc["rel_pos_y_bias"].astype(jnp.float32) * sc,
                    )
                else:
                    # build the stage bias ONCE with the pallas builder,
                    # then the standard flash kernel reads it per layer
                    bias_c = kernel_attention_bias(
                        params["backbone"], bb_cfg, pos_c, bbox_c, mask_c,
                        dtype=hidden_c.dtype,
                    )
            else:
                bias_c = make_attention_bias(
                    params["backbone"], bb_cfg, pos_c, bbox_c, mask_c,
                    dtype=hidden_c.dtype,
                )
            if not isinstance(bias_c, FusedBiasContext):
                prev_bias, prev_sel = bias_c, sel

            def body(h, layer_p):
                return encoder_layer_apply(layer_p, bb_cfg, h, bias_c), None

            hidden_c, _ = jax.lax.scan(
                body, hidden_c, _stage_layers(params, a, b_layer)
            )

            is_final = stage_idx == len(bounds) - 1
            if is_final:
                logits_c = classifier_apply(
                    params["backbone"]["classifier"], bb_cfg, hidden_c[:, 0, :]
                ).astype(jnp.float32)
                crit_c = (
                    jnp.zeros((c,), jnp.float32) if use_patience
                    else crit_fn(logits_c / temps[order_len])
                )
            else:
                head = jax.tree.map(
                    lambda x: x[stage_idx], params["encoder_exits"]
                )
                head_out = exit_head_apply(
                    head, bb_cfg, hidden_c[:, 0, :]
                ).astype(jnp.float32)
                if exit_cfg.apply_gating:
                    logits_c = classifier_apply(
                        params["backbone"]["classifier"], bb_cfg,
                        hidden_c[:, 0, :],
                    ).astype(jnp.float32)
                else:
                    logits_c = head_out
                if use_lte:
                    crit_c = lte_head_apply(
                        params["lte"], hidden_c[:, 0, :]
                    ).astype(jnp.float32)
                elif use_patience:
                    pred_c = jnp.argmax(logits_c, axis=-1).astype(jnp.int32)
                    crit_c = jnp.where(
                        pred_c == jnp.take(prev_pred, sel),
                        jnp.take(last_crit, sel) + 1.0,
                        0.0,
                    )
                    prev_pred = prev_pred.at[sel].set(pred_c)
                else:
                    crit_c = crit_fn(head_out / temps[n_emb + stage_idx])

            # scatter stage results back to batch rows
            sel_running = jnp.take(running, sel)  # selected rows still running
            stage_thr = thrs[min(n_emb + stage_idx, E - 1)] if E else 0.0
            pass_c = sign(crit_c, stage_thr) | is_final
            exit_pos = E if is_final else n_emb + stage_idx
            exits_now_c = sel_running & pass_c

            out_logits = out_logits.at[sel].set(
                jnp.where(sel_running[:, None], logits_c, jnp.take(out_logits, sel, axis=0))
            )
            exit_ids = exit_ids.at[sel].set(
                jnp.where(
                    exits_now_c, exit_pos,
                    jnp.take(exit_ids, sel)
                ).astype(jnp.int32)
            )
            new_running_c = sel_running & ~pass_c
            running = running.at[sel].set(new_running_c)
            last_crit = last_crit.at[sel].set(crit_c)

            if not is_final:
                # scatter the compacted state back to batch rows so the next
                # stage's top_k/gather indexes one consistent frame; rows of
                # non-selected samples stay stale but `running` excludes them
                state = tuple(
                    jnp.zeros((B,) + t.shape[1:], t.dtype).at[sel].set(t)
                    for t in (hidden_c, bbox_c, pos_c, mask_c)
                )
        return CascadeResult(out_logits, exit_ids, capacity_exited)

    return cascade

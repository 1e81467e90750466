"""Staged anytime-inference engine: real compute savings from early exits.

The reference's live early exit is a Python exception at batch size 1
(EE/models/LayoutLMv3.py:251-268) — it saves FLOPs only by abandoning
batching. The batched ``ee_forward`` here computes every exit but always
runs the full depth. This engine delivers *actual* savings under batching,
TPU-style:

- The encoder is split into stages at the exit layers. Stage i runs layers
  (k_{i-1}, k_i] as one jitted program on a fixed-size bucket, computes exit
  k_i's head + criterion, and returns the carried hidden states.
- After each stage the host reads the tiny (bucket,) criterion vector,
  drops samples that exit, compacts survivors with an on-device gather, and
  pads to the next power-of-two bucket — so every program has a static
  shape and compiles exactly once per (stage, bucket).
- The attention bias is recomputed per stage from the carried bbox/position
  ids (tables are tiny; re-gathering beats carrying the (B,H,S,S) bias).

With the canonical exit config (text_avg, vision_avg, 7) and 70% of
documents exiting at the embedding/7-layer stages, the deep stage runs on
~a third of the batch — the FLOP reduction the offline policies promise
(EE/analysis.py) realized on device.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_early_exit_tpu.config.exit_config import EarlyExitInference
from multi_modal_early_exit_tpu.models.ee.heads import exit_head_apply
from multi_modal_early_exit_tpu.models.ee.model import canonical_exit_order
from multi_modal_early_exit_tpu.models.layoutlmv3.config import EEModelConfig
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    classifier_apply,
    embed_text,
    embed_vision,
    encoder_layer_apply,
    layer_norm,
    make_attention_bias,
    visual_bbox,
)

Params = Dict[str, Any]


def _bucket_sizes(max_batch: int, minimum: int = 8) -> Tuple[int, ...]:
    sizes = []
    b = minimum
    while b < max_batch:
        sizes.append(b)
        b *= 2
    sizes.append(max_batch)
    return tuple(sizes)


def _round_bucket(n: int, sizes: Tuple[int, ...]) -> int:
    for s in sizes:
        if n <= s:
            return s
    return sizes[-1]


class AnytimeEngine:
    """Bucketed staged inference over a fixed exit configuration.

    ``infer(batch)`` returns (final_logits (B,K), exit_ids (B,)) where each
    sample's logits come from the exit that claimed it — the live
    counterpart of ``Policy.max_confidence_global_thresholding_policy``.

    .. deprecated:: serving
        DEPRECATED for serving — use ``models/ee/cascade.py`` (the
        single-program capacity-constrained cascade) or ``serving.Pipeline``.
        Measured head-to-head on the TPU (benchmarks/anytime_bench.py,
        batch 32): the engine's per-stage host sync + criterion readback put
        a ~40 docs/sec floor on it REGARDLESS of exit depth (39.3 docs/sec
        even with 100% of documents exiting at the first embedding head,
        0.12 GFLOPs/doc), while the cascade does 72.6 docs/sec in the same
        harness at 240x the FLOPs and 1236 docs/sec dispatch-free. The
        engine remains the criterion-faithful host-loop implementation
        (stateful PABEE patience across stages) and an offline
        store-collection utility.
    """

    def __init__(
        self,
        params: Params,
        cfg: EEModelConfig,
        threshold: Optional[float] = None,
        max_batch: int = 64,
        min_bucket: int = 8,
    ):
        self.params = params
        self.cfg = cfg
        self.exit_cfg = cfg.exit
        self.threshold = (
            threshold if threshold is not None else cfg.exit.global_threshold
        )
        self.sign = cfg.exit.inference_strategy.get_sign()
        self.crit_fn = cfg.exit.inference_strategy.get_function()
        self._use_lte = (
            cfg.exit.inference_strategy == EarlyExitInference.LTE
        )
        # patience (PABEE) is stateful across exits: the host orchestration
        # maintains (prev_pred, count) per sample and the jitted stages skip
        # the pointwise criterion
        self._use_patience = (
            cfg.exit.inference_strategy == EarlyExitInference.PATIENCE
        )
        if self._use_lte and "lte" not in params:
            raise ValueError("LTE inference requires lte head params")
        self.buckets = _bucket_sizes(max_batch, min_bucket)
        self.order = canonical_exit_order(cfg.exit)
        self.emb_exits = [e for e in self.order if isinstance(e, str)]
        self.enc_exits = [e for e in self.order if isinstance(e, int)]

        # stage boundaries: [0, k1], (k1, k2], ..., (k_last, L]
        L = cfg.backbone.num_hidden_layers
        bounds = []
        prev = 0
        for k in self.enc_exits:
            bounds.append((prev, k))
            prev = k
        bounds.append((prev, L))
        self.stage_bounds = bounds

        self._stage0 = jax.jit(self._stage0_fn)
        self._stages = [
            jax.jit(partial(self._stage_fn, idx))
            for idx in range(len(bounds))
        ]

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _stage0_fn(self, params, input_ids, bbox, pixel_values, attention_mask):
        """Embeddings + embedding-level exits; returns the encoder input and
        the carried bbox/position/mask context."""
        cfg = self.cfg.backbone
        b, s_t = input_ids.shape
        text_emb = embed_text(params["backbone"]["embeddings"], cfg, input_ids, bbox)
        vis_emb = embed_vision(params["backbone"]["visual"], cfg, pixel_values)
        s_v = vis_emb.shape[1]

        combined = jnp.concatenate([text_emb, vis_emb], axis=1)
        combined = layer_norm(
            params["backbone"]["LayerNorm"], combined, cfg.layer_norm_eps
        )

        vis_bbox = jnp.broadcast_to(visual_bbox(cfg)[None], (b, s_v, 4))
        full_bbox = jnp.concatenate([bbox, vis_bbox], axis=1)
        text_pos = jnp.broadcast_to(
            jnp.arange(s_t, dtype=jnp.int32)[None], (b, s_t)
        )
        vis_pos = jnp.broadcast_to(
            jnp.arange(s_v, dtype=jnp.int32)[None], (b, s_v)
        )
        pos_ids = jnp.concatenate([text_pos, vis_pos], axis=1)
        full_mask = jnp.concatenate(
            [attention_mask, jnp.ones((b, s_v), attention_mask.dtype)], axis=1
        )

        emb_logits = []
        emb_crit = []
        for name in self.emb_exits:
            if name == "vision_avg":
                x = jnp.mean(vis_emb, axis=1)
            elif name == "text_avg":
                x = jnp.mean(text_emb, axis=1)
            else:
                x = jnp.mean(combined, axis=1)
            head_out = exit_head_apply(params["embedding_exits"][name], cfg, x)
            if self.exit_cfg.apply_gating:
                # gate heads emit 2 logits used only as the exit criterion;
                # the class prediction is the final classifier applied to
                # this exit's input (LayoutLMv3.py:741-743, 768)
                emb_logits.append(
                    classifier_apply(params["backbone"]["classifier"], cfg, x)
                )
            else:
                emb_logits.append(head_out)
            if self._use_lte:
                # LTE scores exist only at the concat exit (LayoutLMv3.py:597)
                if name == "text_visual_concat":
                    from multi_modal_early_exit_tpu.models.ee.heads import (
                        lte_head_apply,
                    )

                    emb_crit.append(lte_head_apply(params["lte"], x))
                else:
                    emb_crit.append(jnp.full((b,), jnp.inf))
            elif self._use_patience:
                # criterion computed host-side from the prediction logits
                emb_crit.append(jnp.zeros((b,)))
            else:
                emb_crit.append(self.crit_fn(head_out))
        if emb_logits:
            logits = jnp.stack(emb_logits, 0)  # (E_emb, B, K)
            crit = jnp.stack(emb_crit, 0)
        else:
            logits = jnp.zeros((0, b, cfg.num_labels))
            crit = jnp.zeros((0, b))
        return combined, full_bbox, pos_ids, full_mask, logits, crit

    def _stage_fn(self, stage_idx, params, hidden, full_bbox, pos_ids, full_mask):
        """Encoder layers (a, b]; exit head at b (or classifier at the end)."""
        cfg = self.cfg.backbone
        a, b_layer = self.stage_bounds[stage_idx]
        bias = make_attention_bias(
            params["backbone"], cfg, pos_ids, full_bbox, full_mask,
            dtype=hidden.dtype,
        )
        layers = jax.tree.map(
            lambda x: x[a:b_layer], params["backbone"]["encoder"]["layers"]
        )

        def body(h, layer_p):
            return encoder_layer_apply(layer_p, cfg, h, bias), None

        hidden, _ = jax.lax.scan(body, hidden, layers)

        is_final = stage_idx == len(self.stage_bounds) - 1
        if is_final:
            logits = classifier_apply(
                params["backbone"]["classifier"], cfg, hidden[:, 0, :]
            )
            crit = (
                jnp.zeros(logits.shape[:1]) if self._use_patience
                else self.crit_fn(logits)
            )
        else:
            head = jax.tree.map(
                lambda x: x[stage_idx], params["encoder_exits"]
            )
            head_out = exit_head_apply(head, cfg, hidden[:, 0, :])
            if self.exit_cfg.apply_gating:
                logits = classifier_apply(
                    params["backbone"]["classifier"], cfg, hidden[:, 0, :]
                )
            else:
                logits = head_out
            if self._use_lte:
                from multi_modal_early_exit_tpu.models.ee.heads import (
                    lte_head_apply,
                )

                crit = lte_head_apply(params["lte"], hidden[:, 0, :])
            elif self._use_patience:
                crit = jnp.zeros(logits.shape[:1])
            else:
                crit = self.crit_fn(head_out)
        return hidden, logits, crit

    # ------------------------------------------------------------------
    # host-side orchestration
    # ------------------------------------------------------------------

    def _pad_gather(self, arrays, idx: np.ndarray, bucket: int):
        """Gather rows ``idx`` from each array and pad to ``bucket`` rows."""
        pad_idx = np.zeros(bucket, np.int32)
        pad_idx[: len(idx)] = idx
        gathered = tuple(
            jnp.take(a, jnp.asarray(pad_idx), axis=0) for a in arrays
        )
        return gathered

    def infer(
        self,
        input_ids,
        bbox,
        pixel_values,
        attention_mask,
        collect_store: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Run the cascade; returns (final_logits, exit_ids, store|None).

        ``exit_ids`` are indices into the canonical exit order with the
        final classifier at index E (the offline policy contract).
        """
        B = input_ids.shape[0]
        K = self.cfg.backbone.num_labels
        E = len(self.order)
        out_logits = np.zeros((B, K), np.float32)
        out_exit = np.full(B, E, np.int32)
        store = np.zeros((E + 1, B, K), np.float32) if collect_store else None

        hidden, full_bbox, pos_ids, full_mask, emb_logits, emb_crit = (
            self._stage0(
                self.params, input_ids, bbox, pixel_values, attention_mask
            )
        )
        emb_logits_h = np.asarray(emb_logits, np.float32)
        emb_crit_h = np.asarray(emb_crit)

        alive = np.arange(B)
        # patience carry: previous top-1 prediction (-1 = none yet) and the
        # consecutive-agreement count per sample (PABEE)
        prev_pred = np.full(B, -1, np.int64)
        count = np.zeros(B, np.float64)
        # embedding exits decide in canonical order
        for j, name in enumerate(self.emb_exits):
            if store is not None:
                store[j] = emb_logits_h[j]
            if len(alive) == 0:
                continue
            if self._use_patience:
                preds = emb_logits_h[j][alive].argmax(-1)
                count[alive] = np.where(
                    preds == prev_pred[alive], count[alive] + 1, 0
                )
                prev_pred[alive] = preds
                passed = count[alive] >= self.threshold
            else:
                passed = self.sign(emb_crit_h[j][alive], self.threshold)
            exiting = alive[passed]
            out_logits[exiting] = emb_logits_h[j][exiting]
            out_exit[exiting] = j
            alive = alive[~passed]

        n_emb = len(self.emb_exits)
        carried = (hidden, full_bbox, pos_ids, full_mask)
        carried_idx = np.arange(B)  # rows of `carried` correspond to these
        for stage_idx in range(len(self.stage_bounds)):
            if len(alive) == 0 and not collect_store:
                break
            run_idx = carried_idx if collect_store else alive
            if len(run_idx) == 0:
                break
            bucket = _round_bucket(len(run_idx), self.buckets)
            # map global sample ids -> rows in the carried arrays
            row_of = {g: r for r, g in enumerate(carried_idx)}
            rows = np.asarray([row_of[g] for g in run_idx], np.int32)
            gathered = self._pad_gather(carried, rows, bucket)
            hidden_b, logits_b, crit_b = self._stages[stage_idx](
                self.params, *gathered
            )
            logits_h = np.asarray(logits_b, np.float32)[: len(run_idx)]
            crit_h = np.asarray(crit_b)[: len(run_idx)]

            is_final = stage_idx == len(self.stage_bounds) - 1
            exit_pos = n_emb + stage_idx
            if store is not None:
                store[exit_pos, run_idx] = logits_h

            alive_mask = np.isin(run_idx, alive)
            if is_final:
                final_rows = np.where(alive_mask)[0]
                out_logits[run_idx[final_rows]] = logits_h[final_rows]
                out_exit[run_idx[final_rows]] = E
                alive = np.asarray([], np.int64)
            elif self._use_patience:
                am_idx = run_idx[alive_mask]
                preds = logits_h[alive_mask].argmax(-1)
                count[am_idx] = np.where(
                    preds == prev_pred[am_idx], count[am_idx] + 1, 0
                )
                prev_pred[am_idx] = preds
                passed = np.zeros(len(run_idx), bool)
                passed[alive_mask] = count[am_idx] >= self.threshold
                exiting = run_idx[passed]
                out_logits[exiting] = logits_h[passed]
                out_exit[exiting] = exit_pos
                alive = np.setdiff1d(alive, exiting, assume_unique=True)
            else:
                passed = self.sign(crit_h, self.threshold) & alive_mask
                exiting = run_idx[passed]
                out_logits[exiting] = logits_h[passed]
                out_exit[exiting] = exit_pos
                alive = np.setdiff1d(alive, exiting, assume_unique=True)

            carried = (
                hidden_b,
                gathered[1],
                gathered[2],
                gathered[3],
            )
            carried_idx = run_idx if len(run_idx) else carried_idx
            # rows beyond len(run_idx) are padding; restrict carried to them
            carried = tuple(a[: len(run_idx)] for a in carried)

        return out_logits, out_exit, store

"""Convert HuggingFace torch LayoutLMv2 checkpoints to this framework's pytree.

Maps the transformer side of ``LayoutLMv2ForSequenceClassification``
(embeddings, encoder incl. relative-bias tables, visual_proj,
visual_LayerNorm, classifier). The detectron2 visual backbone is NOT
converted: its weights only exist inside detectron2-format checkpoints
(HF raises without the detectron2 backend installed — the reference
environment has the same constraint), so the ResNeXt-FPN tower keeps its
JAX initialization and callers fine-tune it. ``fast_qkv`` is folded into
the standard q/k/v layout: q = x@Wq + q_bias, k = x@Wk (no bias),
v = x@Wv + v_bias (HF LayoutLMv2SelfAttention.compute_qkv).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from multi_modal_early_exit_tpu.models.layoutlmv2.config import LayoutLMv2Config
from multi_modal_early_exit_tpu.models.layoutlmv3.convert import (
    _layer_norm,
    _linear,
    _t,
)

Params = Dict[str, Any]


def convert_v2_torch_state_dict(
    sd: Mapping[str, Any], cfg: LayoutLMv2Config, prefix: str = "layoutlmv2."
) -> Params:
    """HF state_dict -> partial param pytree (everything except the visual
    backbone). Merge over an ``init_params`` tree with ``dict.update``."""
    p = prefix
    h = cfg.hidden_size
    params: Params = {}

    emb = f"{p}embeddings."
    if f"{emb}word_embeddings.weight" in sd:
        params["embeddings"] = {
            "word_embeddings": _t(sd[f"{emb}word_embeddings.weight"]).copy(),
            "position_embeddings": _t(
                sd[f"{emb}position_embeddings.weight"]
            ).copy(),
            "token_type_embeddings": _t(
                sd[f"{emb}token_type_embeddings.weight"]
            ).copy(),
            "x_position_embeddings": _t(
                sd[f"{emb}x_position_embeddings.weight"]
            ).copy(),
            "y_position_embeddings": _t(
                sd[f"{emb}y_position_embeddings.weight"]
            ).copy(),
            "h_position_embeddings": _t(
                sd[f"{emb}h_position_embeddings.weight"]
            ).copy(),
            "w_position_embeddings": _t(
                sd[f"{emb}w_position_embeddings.weight"]
            ).copy(),
            "LayerNorm": _layer_norm(sd, f"{emb}LayerNorm"),
        }

    if f"{p}encoder.layer.0.attention.output.dense.weight" not in sd:
        return params

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{p}encoder.layer.{i}."
        att = f"{lp}attention.self."
        if f"{att}qkv_linear.weight" in sd:
            # fast_qkv: one (3H, H) matrix + q/v biases, chunked q|k|v
            qkv_w = _t(sd[f"{att}qkv_linear.weight"])  # (3H, H)
            wq, wk, wv = qkv_w[:h], qkv_w[h : 2 * h], qkv_w[2 * h :]
            qkv_b = (
                _t(sd[f"{att}qkv_linear.bias"])
                if f"{att}qkv_linear.bias" in sd
                else np.zeros((3 * h,), qkv_w.dtype)
            )
            q_bias = _t(sd[f"{att}q_bias"]).reshape(-1)  # stored (1, 1, H)
            v_bias = _t(sd[f"{att}v_bias"]).reshape(-1)
            attention = {
                "query": {
                    "kernel": wq.T.copy(),
                    "bias": (qkv_b[:h] + q_bias).copy(),
                },
                "key": {"kernel": wk.T.copy(), "bias": qkv_b[h : 2 * h].copy()},
                "value": {
                    "kernel": wv.T.copy(),
                    "bias": (qkv_b[2 * h :] + v_bias).copy(),
                },
            }
        else:
            attention = {
                "query": _linear(sd, f"{att}query"),
                "key": _linear(sd, f"{att}key"),
                "value": _linear(sd, f"{att}value"),
            }
        attention["output"] = _linear(sd, f"{lp}attention.output.dense")
        attention["output_LayerNorm"] = _layer_norm(
            sd, f"{lp}attention.output.LayerNorm"
        )
        layers.append(
            {
                "attention": attention,
                "intermediate": _linear(sd, f"{lp}intermediate.dense"),
                "output": _linear(sd, f"{lp}output.dense"),
                "output_LayerNorm": _layer_norm(sd, f"{lp}output.LayerNorm"),
            }
        )
    import jax

    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)
    encoder: Params = {"layers": stacked}
    if cfg.has_relative_attention_bias:
        encoder["rel_pos_bias"] = _t(sd[f"{p}encoder.rel_pos_bias.weight"]).T.copy()
    if cfg.has_spatial_attention_bias:
        encoder["rel_pos_x_bias"] = _t(sd[f"{p}encoder.rel_pos_x_bias.weight"]).T.copy()
        encoder["rel_pos_y_bias"] = _t(sd[f"{p}encoder.rel_pos_y_bias.weight"]).T.copy()

    params["encoder"] = encoder
    if f"{p}visual_proj.weight" in sd:
        params["visual_proj"] = _linear(sd, f"{p}visual_proj")
    if f"{p}visual_LayerNorm.weight" in sd:
        params["visual_LayerNorm"] = _layer_norm(sd, f"{p}visual_LayerNorm")
    if f"{p}visual_segment_embedding" in sd:
        params["visual_segment_embedding"] = _t(
            sd[f"{p}visual_segment_embedding"]
        ).copy()
    if "classifier.weight" in sd:
        params["classifier"] = _linear(sd, "classifier")
    return params

"""Early-exit heads: ramps, gates, and learning-to-exit regressors.

Parity: ``LayoutLMv3Exit`` (reference: EE/models/LayoutLMv3.py:56-93) —
optionally [dropout → dense → tanh] (when exit_head_num_layers == 2), then
dropout → out_proj.  Output dim is num_labels for RAMP/EMBEXIT heads and 2
for GATE heads (LayoutLMv3.py:83).  The LTE head is a 1-unit sigmoid
regressor (LayoutLMv3.py:142-145).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import EarlyExitHead, ExitConfig
from multi_modal_early_exit_tpu.models.layoutlmv3.config import LayoutLMv3Config
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    dropout,
    init_linear,
    linear,
)

Params = Dict[str, Any]


def head_output_dim(backbone: LayoutLMv3Config, exit_cfg: ExitConfig) -> int:
    if exit_cfg.encoder_layer_strategy == EarlyExitHead.GATE:
        return 2
    return backbone.num_labels


def init_exit_head(
    key,
    backbone: LayoutLMv3Config,
    exit_cfg: ExitConfig,
    input_dim: Optional[int] = None,
    dtype=jnp.float32,
) -> Params:
    input_dim = input_dim or backbone.hidden_size
    k1, k2 = jax.random.split(key)
    std = backbone.initializer_range
    p: Params = {}
    if exit_cfg.exit_head_num_layers == 2:
        p["dense"] = init_linear(k1, input_dim, input_dim, std, dtype)
    p["out_proj"] = init_linear(
        k2, input_dim, head_output_dim(backbone, exit_cfg), std, dtype
    )
    return p


def exit_head_apply(
    p: Params,
    backbone: LayoutLMv3Config,
    x: jax.Array,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    rate = backbone.classifier_dropout_prob
    if "dense" in p:
        r1 = jax.random.fold_in(rng, 0) if rng is not None else None
        x = dropout(x, rate, deterministic, r1)
        x = jnp.tanh(linear(p["dense"], x))
    r2 = jax.random.fold_in(rng, 1) if rng is not None else None
    x = dropout(x, rate, deterministic, r2)
    return linear(p["out_proj"], x)


def init_lte_head(key, backbone: LayoutLMv3Config, dtype=jnp.float32) -> Params:
    return init_linear(key, backbone.hidden_size, 1, backbone.initializer_range, dtype)


def lte_head_apply(p: Params, x: jax.Array) -> jax.Array:
    """Sigmoid confidence-to-continue score, squeezed to (B,)."""
    return jax.nn.sigmoid(linear(p, x))[..., 0]

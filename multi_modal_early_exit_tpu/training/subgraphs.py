"""Per-exit compute-subgraph accounting, derived from the parameter pytree.

The reference ships a static JSON map exit → named parameters
(EE/models/EELayoutLM_exit_named_parameters-wotherexits.json, consumed by
EE/models/EE_modules.py:432-492) and uses 1/param-count as per-exit loss
weights. Here the same information is derived *programmatically* by
traversing the pytree — robust to config changes, no stale JSON (this is the
improvement SURVEY.md §7 step 5 calls for).

Definitions (matching the reference's structural intent):
- vision_avg subgraph: visual embedding params + its head
- text_avg subgraph: text embedding params + its head
- text_visual_concat: both modalities + the post-concat LayerNorm + its head
- encoder exit at layer l: all embeddings + rel-pos bias tables + encoder
  layers 1..l + heads of all earlier exits + its own head
- the final classifier's branch is the classifier head (for entropyreg).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_early_exit_tpu.models.ee.model import canonical_exit_order
from multi_modal_early_exit_tpu.models.layoutlmv3.config import EEModelConfig

Params = Dict[str, Any]


def _count(tree) -> int:
    if tree is None:
        return 0
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _layer_slice_count(stacked_layers, num_layers: int) -> int:
    """Parameter count of the first ``num_layers`` stacked encoder layers."""
    total = _count(stacked_layers)
    depth = jax.tree.leaves(stacked_layers)[0].shape[0]
    return int(total * num_layers / depth)


def _head_count(params: Params, exit_id) -> int:
    if isinstance(exit_id, int):
        heads = params.get("encoder_exits")
        if heads is None:
            return 0
        n = jax.tree.leaves(heads)[0].shape[0]
        return int(_count(heads) / n)
    return _count(params.get("embedding_exits", {}).get(exit_id))


def subgraph_param_counts(params: Params, cfg: EEModelConfig) -> np.ndarray:
    """(E,) parameter count of each exit's compute subgraph, canonical order."""
    bb = params["backbone"]
    text_count = _count(bb["embeddings"])
    vision_count = _count(bb["visual"])
    concat_ln = _count(bb["LayerNorm"])
    enc = bb["encoder"]
    bias_tables = sum(
        _count(enc.get(k)) for k in ("rel_pos_bias", "rel_pos_x_bias", "rel_pos_y_bias")
    )

    order = canonical_exit_order(cfg.exit)
    counts: List[int] = []
    prior_heads = 0
    for exit_id in order:
        head = _head_count(params, exit_id)
        if exit_id == "vision_avg":
            base = vision_count
        elif exit_id == "text_avg":
            base = text_count
        elif exit_id == "text_visual_concat":
            base = vision_count + text_count + concat_ln
        else:  # encoder exit at 1-based layer exit_id
            base = (
                vision_count + text_count + concat_ln + bias_tables
                + _layer_slice_count(enc["layers"], exit_id)
                + prior_heads
            )
        counts.append(base + head)
        prior_heads += head
    return np.asarray(counts, dtype=np.int64)


def exit_loss_weights(counts: np.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Normalized 1/param-count weights (EE_modules.py:478-491)."""
    inv = beta / counts.astype(np.float64)
    return jnp.asarray(inv / inv.sum(), dtype=jnp.float32)


def apply_entropyreg(grads: Params, cfg: EEModelConfig, scales: jax.Array) -> Params:
    """Scale each exit branch's gradients by its (1 - normalized entropy)
    factor — exact reproduction of the reference's post-backward
    ``p.grad *= criterion`` over exit_branch_params (EE_modules.py:357-376).

    ``scales`` has shape (E+1,): one factor per exit in canonical order plus
    the final classifier branch.  Exit-branch parameters (the heads, and the
    classifier for the final branch) receive gradient only from their own
    loss term, so post-hoc scaling here equals the reference's grad surgery.
    """
    order = canonical_exit_order(cfg.exit)
    grads = dict(grads)
    emb = dict(grads.get("embedding_exits", {}))
    enc_ids = [i for i, e in enumerate(order) if isinstance(e, int)]
    for j, exit_id in enumerate(order):
        if isinstance(exit_id, int):
            continue
        if exit_id in emb:
            emb[exit_id] = jax.tree.map(lambda g, s=scales[j]: g * s, emb[exit_id])
    if emb:
        grads["embedding_exits"] = emb
    if "encoder_exits" in grads and enc_ids:
        enc_scales = jnp.stack([scales[j] for j in enc_ids])

        def scale_stacked(g):
            return g * enc_scales.reshape((-1,) + (1,) * (g.ndim - 1))

        grads["encoder_exits"] = jax.tree.map(scale_stacked, grads["encoder_exits"])
    bb = dict(grads["backbone"])
    bb["classifier"] = jax.tree.map(lambda g: g * scales[-1], bb["classifier"])
    grads["backbone"] = bb
    return grads


def exit_named_parameters(params: Params, cfg: EEModelConfig) -> Dict[str, List[str]]:
    """Exit → list of '/'-joined parameter names, the pytree-derived
    equivalent of the reference's static JSON artifact (for inspection and
    parity with EE/analysis.py consumers)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def name(path) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    all_names = [name(p) for p, _ in flat]
    bb = "backbone/"
    order = canonical_exit_order(cfg.exit)
    result: Dict[str, List[str]] = {}
    prior_heads: List[str] = []
    enc_counter = 0
    for exit_id in order:
        names: List[str] = []
        if exit_id == "vision_avg":
            names += [n for n in all_names if n.startswith(f"{bb}visual/")]
            head_prefix = "embedding_exits/vision_avg/"
        elif exit_id == "text_avg":
            names += [n for n in all_names if n.startswith(f"{bb}embeddings/")]
            head_prefix = "embedding_exits/text_avg/"
        elif exit_id == "text_visual_concat":
            names += [
                n for n in all_names
                if n.startswith((f"{bb}visual/", f"{bb}embeddings/", f"{bb}LayerNorm/"))
            ]
            head_prefix = "embedding_exits/text_visual_concat/"
        else:
            names += [
                n for n in all_names
                if n.startswith((f"{bb}visual/", f"{bb}embeddings/", f"{bb}LayerNorm/"))
                or n.startswith(f"{bb}encoder/rel_pos")
            ]
            names += [
                f"{n}[:{exit_id}]" for n in all_names
                if n.startswith(f"{bb}encoder/layers/")
            ]
            names += prior_heads
            head_prefix = "encoder_exits/"
            enc_counter += 1
        head_names = [n for n in all_names if n.startswith(head_prefix)]
        names += head_names
        prior_heads += head_names
        result[str(exit_id)] = sorted(set(names))
    return result

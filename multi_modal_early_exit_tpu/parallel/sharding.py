"""Partitioning rules: parameter pytree paths → PartitionSpecs.

Megatron-style tensor parallelism for the encoder:
- q/k/v and MLP-up kernels shard their *output* features on the model axis
  (column parallel); attention-output and MLP-down kernels shard their
  *input* features (row parallel) so XLA inserts a single psum per block.
- Embedding tables shard the vocab/bucket dimension.
- LayerNorms, biases of row-parallel layers, and small heads replicate.

Encoder layer leaves carry a leading stacked-layer axis (L, ...) from the
scan design, so specs lead with None.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multi_modal_early_exit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Params = Dict[str, Any]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def _spec_for(path: str, ndim: int) -> P:
    # --- encoder layers (stacked: leading L axis) ----------------------
    if "encoder/layers/attention" in path:
        if any(f"/{n}/kernel" in path for n in ("query", "key", "value")):
            return P(None, None, MODEL_AXIS)
        if any(f"/{n}/bias" in path for n in ("query", "key", "value")):
            return P(None, MODEL_AXIS)
        if "/output/kernel" in path:
            return P(None, MODEL_AXIS, None)
        return P()  # output bias, LayerNorms
    if "encoder/layers/intermediate/kernel" in path:
        return P(None, None, MODEL_AXIS)
    if "encoder/layers/intermediate/bias" in path:
        return P(None, MODEL_AXIS)
    if "encoder/layers/output/kernel" in path:
        return P(None, MODEL_AXIS, None)

    # --- embeddings ----------------------------------------------------
    if path.endswith("word_embeddings"):
        return P(MODEL_AXIS, None)
    if "position_embeddings" in path and ndim == 2:
        return P(MODEL_AXIS, None)

    # heads, LayerNorms, bias tables, classifier: replicate
    return P()


def param_partition_specs(params: Params) -> Params:
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: _spec_for(_path_str(path), x.ndim), params
    )


def shard_params(params: Params, mesh: Mesh) -> Params:
    specs = param_partition_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard their leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)

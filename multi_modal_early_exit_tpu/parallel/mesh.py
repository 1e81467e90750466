"""Device-mesh construction over ICI.

The reference has no first-class parallelism (torch DataParallel implicitly
via HF Trainer, SURVEY.md §2); the TPU-native equivalent is a
``jax.sharding.Mesh`` with ("data", "model") axes — data parallelism rides
the batch axis, tensor parallelism shards attention heads and MLP features.
All cross-chip traffic is XLA collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def default_mesh_shape(n_devices: Optional[int] = None) -> Tuple[int, int]:
    """(data, model) shape: prefer pure DP at small scale (hidden size 768
    saturates a single chip's MXU; TP pays ICI latency for little gain)."""
    n = n_devices or len(jax.devices())
    return (n, 1)


def create_mesh(
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = default_mesh_shape(len(devices))
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != #devices {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)

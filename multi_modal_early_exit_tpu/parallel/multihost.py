"""Multi-host (DCN) data parallelism scaffolding.

The reference's only distribution story is implicit torch DataParallel under
the HF Trainer (SURVEY.md §2 parallelism note). The TPU-native story at pod
scale:

- each host runs the same SPMD program; ``jax.distributed.initialize``
  wires the processes; the Mesh spans all devices across hosts;
- parameters/optimizer state are replicated (or model-sharded via the
  specs in ``parallel/sharding.py``) — gradient psum rides ICI within a
  slice and DCN across slices, inserted by XLA from the shardings;
- each host loads only its shard of the global batch
  (``host_batch_slice``) and assembles a globally-sharded array with
  ``jax.make_array_from_process_local_data``.

Single-host environments (this repo's CI and the driver's dry run) use the
same code with world_size 1 — initialize() is skipped unless coordinator
env vars are present.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def maybe_initialize_distributed() -> bool:
    """Call ``jax.distributed.initialize`` when launched as a multi-process
    job (coordinator address present); no-op single-process otherwise.

    When ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` are set (plain env-var
    launch, e.g. the 2-process DCN test), they are passed explicitly —
    jax's autodetection only covers cluster schedulers (Slurm/MPI/GKE)."""
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return False
    if os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    return True


def process_info() -> Dict[str, int]:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def host_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this host must load."""
    import jax

    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_batch_from_local(
    local_batch: Dict[str, np.ndarray], mesh, pspec=None
) -> Dict:
    """Assemble a globally-sharded batch from per-host local shards.

    Uses ``jax.make_array_from_process_local_data``: every host passes its
    local rows; the result is one logical array sharded over the mesh's
    data axis, ready for the pjit'd train step.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multi_modal_early_exit_tpu.parallel.mesh import DATA_AXIS

    spec = pspec if pspec is not None else P(DATA_AXIS)
    sharding = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_batch.items()
    }

"""Worker process for the 2-process DCN test (spawned by
tests/test_multihost_dcn.py — not collected by pytest itself).

Each worker is one "host": 2 virtual CPU devices, connected to its peer
through ``jax.distributed`` exactly as two pod slices would be over DCN.
It exercises the real multihost helpers in anger: initialize →
host_batch_slice → global_batch_from_local → a cross-process psum
reduction → one replicated EE train step on the globally-sharded batch.

Writes a JSON result file for the parent test to assert on.
"""

import json
import os
import sys


def main() -> None:
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multi_modal_early_exit_tpu.parallel.mesh import DATA_AXIS, create_mesh
    from multi_modal_early_exit_tpu.parallel.multihost import (
        global_batch_from_local,
        host_batch_slice,
        maybe_initialize_distributed,
        process_info,
    )

    assert maybe_initialize_distributed(), "coordinator env set but no init"
    info = process_info()
    assert info["process_count"] == 2, info
    assert info["global_device_count"] == 4, info

    mesh = create_mesh((4, 1))

    # ---- global batch assembly from per-host shards + cross-process sum --
    GLOBAL = 8
    rng = np.random.default_rng(0)  # same global data on both hosts
    global_x = rng.standard_normal((GLOBAL, 4)).astype(np.float32)
    sl = host_batch_slice(GLOBAL)
    gb = global_batch_from_local({"x": global_x[sl]}, mesh)
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(gb["x"])
    sum_err = abs(float(np.asarray(total)) - float(global_x.sum()))

    # ---- one replicated train step over the globally-sharded batch -------
    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )
    from multi_modal_early_exit_tpu.training.trainer import (
        TrainingArguments,
        make_optimizer,
        make_train_step,
    )

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)  # same seed: replicated
    params = jax.device_put(params, NamedSharding(mesh, P()))
    tx = make_optimizer(TrainingArguments(), total_steps=4)
    opt_state = tx.init(params)

    B, S, IMG = 4, 16, 32
    drng = np.random.default_rng(1)
    batch_global = {
        "input_ids": drng.integers(3, 500, (1, B, S)).astype(np.int32),
        "bbox": np.sort(drng.integers(0, 500, (1, B, S, 4)), -1).astype(np.int32),
        "pixel_values": drng.standard_normal((1, B, 3, IMG, IMG)).astype(
            np.float32
        ),
        "attention_mask": np.ones((1, B, S), np.int32),
        "labels": drng.integers(0, 4, (1, B)).astype(np.int32),
    }
    per_host = B // info["process_count"]
    start = info["process_index"] * per_host
    local = {
        k: v[:, start : start + per_host] for k, v in batch_global.items()
    }
    batch = global_batch_from_local(local, mesh, pspec=P(None, DATA_AXIS))

    step = jax.jit(make_train_step(cfg, tx, exit_weights=None, accum_steps=1))
    params, opt_state, loss, _ = step(params, opt_state, batch, jax.random.key(2))
    loss = float(np.asarray(loss))

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_index": info["process_index"],
                "process_count": info["process_count"],
                "global_device_count": info["global_device_count"],
                "slice": [sl.start, sl.stop],
                "sum_err": sum_err,
                "loss": loss,
            },
            f,
        )


if __name__ == "__main__":
    main()

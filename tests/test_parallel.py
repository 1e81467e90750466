"""Mesh/sharding/multihost unit tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multi_modal_early_exit_tpu.parallel.mesh import create_mesh, default_mesh_shape
from multi_modal_early_exit_tpu.parallel.multihost import (
    global_batch_from_local,
    host_batch_slice,
    maybe_initialize_distributed,
    process_info,
)
from multi_modal_early_exit_tpu.parallel.sharding import (
    param_partition_specs,
    shard_batch,
    shard_params,
)


def test_default_mesh_shape_is_pure_dp():
    assert default_mesh_shape(8) == (8, 1)


def test_create_mesh_validates_shape():
    with pytest.raises(ValueError):
        create_mesh((3, 2))


def test_param_specs_shard_attention_and_mlp():
    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    specs = param_partition_specs(params)
    enc = specs["backbone"]["encoder"]["layers"]
    assert enc["attention"]["query"]["kernel"] == P(None, None, "model")
    assert enc["attention"]["output"]["kernel"] == P(None, "model", None)
    assert enc["intermediate"]["kernel"] == P(None, None, "model")
    # heads and layernorms replicate
    assert specs["encoder_exits"]["out_proj"]["kernel"] == P()

    mesh = create_mesh((4, 2))
    sharded = shard_params(params, mesh)
    q = sharded["backbone"]["encoder"]["layers"]["attention"]["query"]["kernel"]
    assert not q.sharding.is_fully_replicated


def test_multihost_helpers_single_process():
    assert maybe_initialize_distributed() is False
    info = process_info()
    assert info["process_count"] == 1
    assert host_batch_slice(32) == slice(0, 32)

    mesh = create_mesh((8, 1))
    batch = {"x": np.arange(64, dtype=np.float32).reshape(16, 4)}
    out = global_batch_from_local(batch, mesh)
    assert out["x"].shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert len(out["x"].sharding.device_set) == 8


def test_shard_batch_splits_leading_axis():
    mesh = create_mesh((8, 1))
    batch = {"ids": np.arange(32).reshape(16, 2)}
    out = shard_batch(batch, mesh)
    assert len(out["ids"].sharding.device_set) == 8

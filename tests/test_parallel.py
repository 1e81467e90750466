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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_flash_attention_matches_unsharded():
    """The shard_map wrapper (batch on data, heads on model) must equal the
    unsharded kernel exactly in the deterministic case — the multi-chip
    serving contract for the Pallas attention (VERDICT round-1 #5)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from multi_modal_early_exit_tpu.ops import flash_attention as fa
    from multi_modal_early_exit_tpu.parallel.kernels import (
        sharded_flash_attention,
    )

    mesh = create_mesh((4, 2))
    rng = np.random.default_rng(0)
    b, h, s, d = 8, 4, 32, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(fa.flash_attention(q, k, v, bias, 16))
        got = np.asarray(
            sharded_flash_attention(mesh, q, k, v, bias, block_q=16)
        )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    with pytest.raises(ValueError):
        sharded_flash_attention(mesh, q[:, :3], k[:, :3], v[:, :3],
                                bias[:, :3])


@pytest.mark.slow
def test_sharded_ee_forward_matches_single_device():
    """Deterministic EE forward under the DP x TP mesh == single-device
    output (the dryrun_multichip inference proof, testable on CPU)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import (
        ee_forward,
        init_ee_params,
    )
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )
    from multi_modal_early_exit_tpu.parallel.mesh import DATA_AXIS
    from multi_modal_early_exit_tpu.parallel.sharding import shard_params

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", "vision_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    mesh = create_mesh((4, 2))
    sharded_params = shard_params(params, mesh)

    rng = np.random.default_rng(2)
    B, S = 8, 16
    ids = np.asarray(rng.integers(3, 1000, (B, S)), np.int32)
    bbox = np.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), np.int32)
    pv = np.asarray(rng.standard_normal((B, 3, 32, 32)), np.float32)
    mask = np.ones((B, S), np.int32)

    def fwd(p, ids, bbox, pv, mask):
        out = ee_forward(p, cfg, ids, bbox, pv, mask)
        return out.policy_logits(), out.exit_criteria

    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    sharded = jax.jit(fwd)(
        sharded_params,
        *(jax.device_put(x, data_sharding) for x in (ids, bbox, pv, mask)),
    )
    single = jax.jit(fwd)(params, ids, bbox, pv, mask)
    for a, b in zip(sharded, single):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


@pytest.mark.slow
def test_cascade_under_dp_mesh_matches_single_device():
    """The single-program cascade jitted with batch-sharded inputs over a
    pure-DP mesh must reproduce the single-device decisions and logits —
    the multi-chip serving contract (XLA inserts the collectives that the
    global top-k capacity selection needs)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.cascade import (
        make_cascade_forward,
    )
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )
    from multi_modal_early_exit_tpu.parallel.mesh import DATA_AXIS

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", "vision_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    mesh = create_mesh((8, 1))
    rng = np.random.default_rng(5)
    B, S = 16, 16
    ids = np.asarray(rng.integers(3, 1000, (B, S)), np.int32)
    bbox = np.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), np.int32)
    pv = np.asarray(rng.standard_normal((B, 3, 32, 32)), np.float32)
    mask = np.ones((B, S), np.int32)

    cascade = make_cascade_forward(cfg, capacities=(8, 8), threshold=0.5)
    fwd = jax.jit(lambda p, i, b, v, m: cascade(p, i, b, v, m))
    single = fwd(params, ids, bbox, pv, mask)

    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    sharded = fwd(
        jax.device_put(params, NamedSharding(mesh, P())),
        *(jax.device_put(x, data_sharding) for x in (ids, bbox, pv, mask)),
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.exit_ids), np.asarray(single.exit_ids)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.logits), np.asarray(single.logits),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.slow
def test_sharded_flash_attention_dropout_decorrelated_across_shards():
    """With dropout on, each shard's kernel hashes LOCAL (batch, head)
    indices — the wrapper must offset the seed per shard, or identical rows
    placed on different data shards would draw bit-identical masks."""
    from jax.experimental.pallas import tpu as pltpu

    from multi_modal_early_exit_tpu.parallel.kernels import (
        sharded_flash_attention,
    )

    mesh = create_mesh((4, 2))
    rng = np.random.default_rng(7)
    h, s, d = 2, 16, 8
    # one row, replicated to every shard: without decorrelation all four
    # outputs would be bitwise identical
    row_q = rng.standard_normal((1, h, s, d))
    row_k = rng.standard_normal((1, h, s, d))
    row_v = rng.standard_normal((1, h, s, d))
    row_b = rng.standard_normal((1, h, s, s))
    q = jnp.asarray(np.repeat(row_q, 4, axis=0), jnp.float32)
    k = jnp.asarray(np.repeat(row_k, 4, axis=0), jnp.float32)
    v = jnp.asarray(np.repeat(row_v, 4, axis=0), jnp.float32)
    bias = jnp.asarray(np.repeat(row_b, 4, axis=0), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(sharded_flash_attention(
            mesh, q, k, v, bias, block_q=16,
            dropout_rate=0.5, dropout_seed=jnp.asarray([3], jnp.int32),
        ))
    for i in range(1, 4):
        assert not np.array_equal(out[0], out[i]), f"shard {i} mask reused"

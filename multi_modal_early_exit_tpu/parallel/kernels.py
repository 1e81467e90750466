"""Pallas kernels under a device mesh.

A ``pallas_call`` inside plain ``jit`` has no GSPMD partitioning rule, so
under a sharded mesh XLA would all-gather its operands (correct but
wasteful). The flash attention kernel, however, is embarrassingly parallel
over its (batch, head) grid dimensions — exactly the axes a DP x TP mesh
shards (batch on the data axis; heads on the model axis, since Megatron
column-parallel QKV shards hidden features = heads x head_dim). Wrapping the
kernel in ``shard_map`` therefore runs one fully-local kernel per device
with ZERO communication, which is the intended multi-chip serving path.

``tests/test_parallel.py`` proves numerical equality of this wrapper vs the
unsharded kernel on the 8-device CPU mesh (interpret mode); the per-device
kernel body is identical on real TPU chips.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from multi_modal_early_exit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def sharded_flash_attention(
    mesh: Mesh,
    q: jax.Array,  # (B, H, S, D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # (B, H, S', S')
    block_q: int | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | None = None,
) -> jax.Array:
    """flash_attention with batch sharded on the data axis and heads on the
    model axis. Requires B % data_size == 0 and H % model_size == 0.

    Note: with ``dropout_rate > 0`` the position-hash mask hashes per-shard
    LOCAL (batch, head) indices, so each shard's kernel is offset to a
    distinct seed (base seed + linear shard index) — otherwise corresponding
    local rows on different data shards would draw bit-identical masks
    (correlated dropout across samples). The result is statistically
    identical but not bitwise-equal to the unsharded kernel's mask. The
    serving path always runs deterministic (rate 0), where outputs are
    exactly equal.
    """
    from multi_modal_early_exit_tpu.ops.flash_attention import (
        DEFAULT_BLOCK_Q,
        flash_attention,
    )

    block_q = block_q or DEFAULT_BLOCK_Q
    data = mesh.shape.get(DATA_AXIS, 1)
    model = mesh.shape.get(MODEL_AXIS, 1)
    if q.shape[0] % data or q.shape[1] % model:
        raise ValueError(
            f"batch {q.shape[0]} / heads {q.shape[1]} not divisible by "
            f"mesh ({data=}, {model=})"
        )
    spec = P(DATA_AXIS, MODEL_AXIS, None, None)
    seed_spec = P()

    import jax.numpy as jnp

    def local(q, k, v, bias, seed):
        if dropout_rate > 0.0:
            # decorrelate shards: the kernel hashes (seed, local b, h, i, j)
            di = (jax.lax.axis_index(DATA_AXIS) if DATA_AXIS in mesh.shape
                  else 0)
            mi = (jax.lax.axis_index(MODEL_AXIS) if MODEL_AXIS in mesh.shape
                  else 0)
            shard = jnp.asarray(di * model + mi, jnp.int32)
            seed = seed + shard * jnp.int32(1000003)  # int32 wrap is fine
        return flash_attention(
            q, k, v, bias, block_q,
            dropout_rate=dropout_rate,
            dropout_seed=seed if dropout_rate > 0.0 else None,
        )

    seed = (
        jnp.zeros((1,), jnp.int32) if dropout_seed is None
        else jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    )
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, seed_spec),
        out_specs=spec,
        # pallas_call declares no varying-mesh-axes metadata; the kernel is
        # per-shard local so the vma check adds nothing here
        check_vma=False,
    )
    return fn(q, k, v, bias, seed)

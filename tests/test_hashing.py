"""Position-hash dropout (ops/hashing.py): the counter-based RNG that the
model's dropout and the flash kernels' in-kernel masks share."""

import numpy as np

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.ops.hashing import (
    dropout_uniform,
    hash_dropout,
    lowbias32,
)


def test_uniform_is_deterministic_and_tiling_invariant():
    """The same logical (seed, plane, i, j) must give the same value no
    matter how the index space is tiled — the property that lets forward
    and backward kernels regenerate identical masks."""
    seed = jnp.int32(1234)
    rows = jnp.arange(64, dtype=jnp.int32)[:, None]
    cols = jnp.arange(128, dtype=jnp.int32)[None, :]
    full = np.asarray(dropout_uniform(seed, jnp.int32(3), rows, cols))
    # recompute in 4 quadrant tiles
    got = np.zeros_like(full)
    for r0 in (0, 32):
        for c0 in (0, 64):
            r = r0 + jnp.arange(32, dtype=jnp.int32)[:, None]
            c = c0 + jnp.arange(64, dtype=jnp.int32)[None, :]
            got[r0:r0 + 32, c0:c0 + 64] = np.asarray(
                dropout_uniform(seed, jnp.int32(3), r, c)
            )
    np.testing.assert_array_equal(got, full)


def test_uniform_distribution_and_plane_independence():
    rows = jnp.arange(256, dtype=jnp.int32)[:, None]
    cols = jnp.arange(256, dtype=jnp.int32)[None, :]
    u0 = np.asarray(dropout_uniform(jnp.int32(7), jnp.int32(0), rows, cols))
    u1 = np.asarray(dropout_uniform(jnp.int32(7), jnp.int32(1), rows, cols))
    assert 0.0 <= u0.min() and u0.max() < 1.0
    assert abs(u0.mean() - 0.5) < 0.01
    assert abs(np.corrcoef(u0.ravel(), u1.ravel())[0, 1]) < 0.01
    # different seed, same plane: decorrelated too
    u2 = np.asarray(dropout_uniform(jnp.int32(8), jnp.int32(0), rows, cols))
    assert abs(np.corrcoef(u0.ravel(), u2.ravel())[0, 1]) < 0.01


def test_lowbias32_bijective_sample():
    """The underlying hash must not collide on a dense low range (it is a
    bijection on uint32; spot-check a window)."""
    x = jnp.arange(1 << 16, dtype=jnp.uint32)
    h = np.asarray(lowbias32(x))
    assert len(np.unique(h)) == len(h)


def test_hash_dropout_semantics():
    """Bernoulli(keep) + 1/keep scaling, exact zeros elsewhere, mean
    preserved, deterministic under the same key."""
    x = jnp.ones((128, 256), jnp.float32)
    rate = 0.3
    key = jax.random.key(0)
    y = np.asarray(hash_dropout(x, rate, key))
    kept = y != 0.0
    assert abs(kept.mean() - (1 - rate)) < 0.02
    np.testing.assert_allclose(y[kept], 1.0 / (1 - rate), rtol=1e-6)
    assert abs(y.mean() - 1.0) < 0.03
    y2 = np.asarray(hash_dropout(x, rate, key))
    np.testing.assert_array_equal(y, y2)
    # different key -> different mask
    y3 = np.asarray(hash_dropout(x, rate, jax.random.key(1)))
    assert (y != y3).any()


def test_hash_dropout_rate_zero_is_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16)),
                    jnp.float32)
    y = hash_dropout(x, 0.0, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

"""Counter-based position hashing for dropout masks.

TPU-first rationale: ``jax.random.bernoulli`` runs threefry over every mask
element — profiled at ~12 ms/step at the reference training budget (three
(B,709,768) masks per layer). A position hash (lowbias32, public-domain
constants) produces a uniform [0,1) value as a pure function of
(seed, row, col) in ~8 VPU int ops per element, is identical under any
tiling (the flash kernels regenerate the same mask in forward and backward
with zero HBM traffic), and needs only ONE threefry draw per call site to
derive the scalar seed from the JAX key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def lowbias32(x: jax.Array) -> jax.Array:
    """Well-mixed 32-bit integer hash (lowbias32, public domain constants)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def dropout_uniform(
    seed: jax.Array, bh: jax.Array, rows: jax.Array, cols: jax.Array
) -> jax.Array:
    """Uniform [0,1) as a pure function of (seed, plane index, i, j).

    Counter-based (no stream state): any kernel tiling regenerates the same
    value for the same logical position. 24 mantissa-exact bits. Mosaic has
    no uint32->f32 cast, so the top-24-bit value goes through int32.
    """
    state = lowbias32(
        seed.astype(jnp.uint32) ^ (bh.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
    )
    bits = lowbias32(
        state
        + rows.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        + cols.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
    )
    top24 = (bits >> jnp.uint32(8)).astype(jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _dropout_u(seed: jax.Array, shape) -> jax.Array:
    n = 1
    for s in shape:
        n *= s
    last = shape[-1] if shape else 1
    rows = jnp.arange(n // last, dtype=jnp.int32)[:, None]
    cols = jnp.arange(last, dtype=jnp.int32)[None, :]
    return dropout_uniform(seed, jnp.int32(0), rows, cols).reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hash_dropout_core(x, seed, rate: float):
    keep = 1.0 - rate
    u = _dropout_u(seed, x.shape)
    return jnp.where(u < keep, x / keep, 0.0).astype(x.dtype)


def _hash_dropout_fwd(x, seed, rate: float):
    # residual = the scalar seed only: the mask is a pure position hash, so
    # the backward REGENERATES it instead of round-tripping a full-size
    # mask tensor through HBM (autodiff of the where() saved one per call)
    return _hash_dropout_core(x, seed, rate), seed


def _hash_dropout_bwd(rate: float, seed, g):
    keep = 1.0 - rate
    u = _dropout_u(seed, g.shape)
    return jnp.where(u < keep, g / keep, 0.0).astype(g.dtype), None


_hash_dropout_core.defvjp(_hash_dropout_fwd, _hash_dropout_bwd)


def hash_dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Dropout with the position-hash mask; drop-in for the bernoulli path.

    One scalar ``jax.random.bits`` draw derives the seed from the key; the
    per-element mask is pure VPU integer math, regenerated (not stored) in
    the backward.
    """
    seed = jax.lax.convert_element_type(
        jax.random.bits(rng, (), jnp.uint32), jnp.int32
    )
    return _hash_dropout_core(x, seed, float(rate))

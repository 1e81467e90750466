"""Hand-written VJPs (LayerNorm / exact GELU / hash-dropout) vs jax.grad of
the naive compositions they replace.

These primitives exist purely to stop autodiff from saving full-size
residual tensors (docs/PROFILE_TRAIN.md); their gradients must be
numerically identical to the autodiff of the straightforward definitions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    _layer_norm_core,
    gelu_exact,
)
from multi_modal_early_exit_tpu.ops.hashing import hash_dropout


def test_layer_norm_vjp_matches_autodiff():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 7, 16)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(16), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 7, 16)), jnp.float32)
    eps = 1e-5

    def naive(x, scale, bias):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)

    out_new = _layer_norm_core(x, scale, bias, eps)
    out_old = naive(x, scale, bias)
    np.testing.assert_allclose(
        np.asarray(out_new), np.asarray(out_old), atol=1e-6
    )

    g_new = jax.grad(
        lambda *a: (_layer_norm_core(*a, eps) * w).sum(), argnums=(0, 1, 2)
    )(x, scale, bias)
    g_old = jax.grad(
        lambda *a: (naive(*a) * w).sum(), argnums=(0, 1, 2)
    )(x, scale, bias)
    for a, b in zip(g_new, g_old):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


@pytest.mark.slow
def test_gelu_exact_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(256) * 3, jnp.float32)
    w = jnp.asarray(rng.standard_normal(256), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(gelu_exact(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
        atol=1e-7,
    )
    g_new = jax.grad(lambda x: (gelu_exact(x) * w).sum())(x)
    g_old = jax.grad(lambda x: (jax.nn.gelu(x, approximate=False) * w).sum())(x)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_old), atol=2e-6, rtol=2e-6
    )


def test_gelu_exact_vjp_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(256) * 3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(256), jnp.bfloat16)
    g_new = jax.grad(
        lambda x: (gelu_exact(x) * w).sum().astype(jnp.float32)
    )(x)
    g_old = jax.grad(
        lambda x: (jax.nn.gelu(x.astype(jnp.float32), approximate=False)
                   * w.astype(jnp.float32)).sum()
    )(x.astype(jnp.float32))
    assert g_new.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(g_new, np.float32), np.asarray(g_old), atol=0.05, rtol=0.05
    )


@pytest.mark.slow
def test_hash_dropout_vjp_regenerates_mask():
    """The backward regenerates the identical mask from the scalar seed: the
    gradient is exactly the forward's mask/scale applied to the cotangent."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 33)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 33)), jnp.float32)
    key = jax.random.key(11)
    rate = 0.3

    out = hash_dropout(x, rate, key)
    g = jax.grad(lambda x: (hash_dropout(x, rate, key) * w).sum())(x)
    mask = np.asarray(out) != 0
    # dropped positions: zero grad; kept: w / keep
    np.testing.assert_allclose(
        np.asarray(g), np.where(mask, np.asarray(w) / (1 - rate), 0.0),
        atol=1e-6,
    )
    # mask is non-trivial and matches the keep rate loosely
    assert 0.5 < mask.mean() < 0.9

"""Pallas fused attention vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """CPU has no Mosaic TPU compiler; run the kernel interpreted."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("s", [16, 100])
def test_flash_matches_reference(s):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)

    want = np.asarray(fa.reference_attention(q, k, v, bias))
    got = np.asarray(fa.flash_attention(q, k, v, bias, block_q=16))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_respects_padding_mask():
    """Masked-out keys (bias -inf) must carry zero weight even when the
    sequence is padded up to the block size internally."""
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 10, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    bias = jnp.zeros((b, h, s, s))
    # mask out the last 3 keys
    bias = bias.at[..., 7:].set(jnp.finfo(jnp.float32).min)

    got = np.asarray(fa.flash_attention(q, k, v, bias, block_q=16))
    want = np.asarray(fa.reference_attention(q, k, v, bias))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    # and equals attention computed with the masked keys removed entirely
    want_trunc = np.asarray(
        fa.reference_attention(q, k[:, :, :7], v[:, :, :7], bias[..., :7])
    )
    np.testing.assert_allclose(got, want_trunc, atol=2e-5, rtol=1e-4)


def test_flash_accepts_prepadded_bias():
    """Bias built at the aligned width P > S (model-level pre-pad) must give
    the same result as an S-width bias."""
    rng = np.random.default_rng(2)
    b, h, s, d, blk = 1, 2, 11, 8, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)
    # pre-padded: valid SxS block, -inf on extra key columns
    pre = jnp.full((b, h, blk, blk), -1e30)
    pre = pre.at[:, :, :s, :s].set(bias)

    want = np.asarray(fa.reference_attention(q, k, v, bias))
    got = np.asarray(fa.flash_attention(q, k, v, pre, block_q=blk))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_gradients_match_reference():
    """custom_vjp: grads through the flash kernel equal XLA-composition grads."""
    rng = np.random.default_rng(3)
    b, h, s, d = 1, 2, 12, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)

    def loss_flash(q, k, v, bias):
        return fa.flash_attention(q, k, v, bias, 16).sum()

    def loss_ref(q, k, v, bias):
        return fa.reference_attention(q, k, v, bias).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-4)

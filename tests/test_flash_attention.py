"""Pallas fused attention (fwd + bwd kernels) vs the jnp reference
(interpret mode on CPU)."""

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


def _rand_qkvb(rng, b, h, s, d, bias_s=None):
    bias_s = bias_s or s
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, bias_s, bias_s)), jnp.float32)
    return q, k, v, bias


@pytest.mark.parametrize(
    "s", [16, pytest.param(100, marks=pytest.mark.slow)]
)
def test_flash_matches_reference(s):
    rng = np.random.default_rng(0)
    q, k, v, bias = _rand_qkvb(rng, 2, 3, s, 8)
    want = np.asarray(fa.reference_attention(q, k, v, bias))
    got = np.asarray(fa.flash_attention(q, k, v, bias, block_q=16))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_flash_respects_padding_mask():
    """Masked-out keys (bias -inf) must carry zero weight even when the
    sequence is padded up to the block size internally."""
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 10, 8
    q, k, v, _ = _rand_qkvb(rng, b, h, s, d)
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


@pytest.mark.slow
def test_flash_accepts_prepadded_bias():
    """Bias built at the aligned width P > S (model-level pre-pad) must give
    the same result as an S-width bias."""
    rng = np.random.default_rng(2)
    b, h, s, d, blk = 1, 2, 11, 8, 16
    q, k, v, bias = _rand_qkvb(rng, b, h, s, d)
    # pre-padded: valid SxS block, -inf on extra key columns
    pre = jnp.full((b, h, blk, blk), -1e30)
    pre = pre.at[:, :, :s, :s].set(bias)

    want = np.asarray(fa.reference_attention(q, k, v, bias))
    got = np.asarray(fa.flash_attention(q, k, v, pre, block_q=blk))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("s", [16, 27])
def test_flash_gradients_match_reference(s):
    """Pallas backward kernels: grads equal XLA-composition grads, including
    for ragged lengths (padding) and non-trivial upstream cotangents."""
    rng = np.random.default_rng(3)
    b, h, d = 2, 2, 8
    q, k, v, bias = _rand_qkvb(rng, b, h, s, d)
    gw = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    def loss_flash(q, k, v, bias):
        return (fa.flash_attention(q, k, v, bias, 16) * gw).sum()

    def loss_ref(q, k, v, bias):
        return (fa.reference_attention(q, k, v, bias) * gw).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_flash_gradients_with_prepadded_bias():
    """dbias must come back at the caller's (pre-padded) bias shape, zero in
    the padded region, and match the XLA grads on the valid block."""
    rng = np.random.default_rng(4)
    b, h, s, d, blk = 1, 2, 11, 8, 16
    q, k, v, bias = _rand_qkvb(rng, b, h, s, d)
    pre = jnp.full((b, h, blk, blk), -1e30)
    pre = pre.at[:, :, :s, :s].set(bias)

    g_pre = jax.grad(
        lambda q, k, v, bb: fa.flash_attention(q, k, v, bb, blk).sum(),
        argnums=(0, 1, 2, 3),
    )(q, k, v, pre)
    g_ref = jax.grad(
        lambda q, k, v, bb: fa.reference_attention(q, k, v, bb).sum(),
        argnums=(0, 1, 2, 3),
    )(q, k, v, bias)
    assert g_pre[3].shape == pre.shape
    np.testing.assert_allclose(
        np.asarray(g_pre[3][:, :, :s, :s]), np.asarray(g_ref[3]),
        atol=3e-5, rtol=1e-4,
    )
    assert np.all(np.asarray(g_pre[3][:, :, s:, :]) == 0)
    assert np.all(np.asarray(g_pre[3][:, :, :, s:]) == 0)
    for a, b_ in zip(g_pre[:3], g_ref[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_flash_dropout_forward_matches_hash_oracle():
    """In-kernel dropout must reproduce the position-hash mask exactly —
    compared against a pure-jnp oracle that applies the same hash."""
    rng = np.random.default_rng(5)
    b, h, s, d, rate = 2, 3, 32, 8, 0.3
    q, k, v, bias = _rand_qkvb(rng, b, h, s, d)
    seed = jnp.asarray([17], jnp.int32)

    got = np.asarray(
        fa.flash_attention(q, k, v, bias, 16, dropout_rate=rate,
                           dropout_seed=seed)
    )
    want = np.asarray(
        fa.reference_attention_hash_dropout(q, k, v, bias, 17, rate)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    # and differs from the no-dropout output (mask is non-trivial)
    nodrop = np.asarray(fa.flash_attention(q, k, v, bias, 16))
    assert np.abs(got - nodrop).max() > 1e-3


@pytest.mark.slow
def test_flash_dropout_gradients_match_hash_oracle():
    """fwd and both bwd kernels regenerate the identical mask: grads equal
    jax.grad of the jnp oracle using the same hash mask."""
    rng = np.random.default_rng(6)
    b, h, s, d, rate = 1, 2, 32, 8, 0.25
    q, k, v, bias = _rand_qkvb(rng, b, h, s, d)
    seed = jnp.asarray([99], jnp.int32)
    gw = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    def loss_flash(q, k, v, bias):
        return (
            fa.flash_attention(q, k, v, bias, 16, dropout_rate=rate,
                               dropout_seed=seed) * gw
        ).sum()

    def loss_oracle(q, k, v, bias):
        return (
            fa.reference_attention_hash_dropout(q, k, v, bias, 99, rate) * gw
        ).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)


def test_dropout_uniform_statistics():
    """Position-hash uniforms: roughly uniform, decorrelated across seeds."""
    rows = jnp.arange(256)[:, None]
    cols = jnp.arange(256)[None, :]
    u1 = np.asarray(fa.dropout_uniform(jnp.int32(1), jnp.int32(0), rows, cols))
    u2 = np.asarray(fa.dropout_uniform(jnp.int32(2), jnp.int32(0), rows, cols))
    assert 0.49 < u1.mean() < 0.51
    assert abs(np.corrcoef(u1.ravel(), u2.ravel())[0, 1]) < 0.01
    # keep-fraction close to the keep prob
    assert abs((u1 < 0.9).mean() - 0.9) < 0.01
    assert abs((u1 < 0.5).mean() - 0.5) < 0.01


@pytest.mark.slow
def test_training_grads_with_flash_match_xla_path(monkeypatch):
    """Model-level wiring: jax.grad of the EE loss with the flash kernels
    forced on (interpret mode) equals the XLA composition path, and the
    dropout training path stays finite."""
    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )
    from multi_modal_early_exit_tpu.training.losses import ee_loss_fn

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(7)
    B, S = 2, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        "bbox": jnp.asarray(
            np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32
        ),
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, 3, 32, 32)), jnp.float32
        ),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
    }

    def grads(deterministic):
        (_, _), g = jax.value_and_grad(ee_loss_fn, has_aux=True)(
            params, cfg, batch, rng=jax.random.key(3),
            deterministic=deterministic,
        )
        return g

    g_xla = grads(deterministic=True)

    monkeypatch.setattr(fa, "use_flash_attention", lambda: True)
    g_flash = grads(deterministic=True)
    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    flat_f, _ = jax.tree_util.tree_flatten(g_flash)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )

    # dropout path (attention_probs_dropout_prob > 0): finite grads
    g_drop = grads(deterministic=False)
    for leaf in jax.tree.leaves(g_drop):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize(
    "s", [52, pytest.param(64, marks=pytest.mark.slow)]
)
def test_packed_forward_matches_reference(s):
    """The packed-layout kernel (q/k/v as (B, S, H*D), heads innermost in
    the grid, per-head lane slices) must equal the (B,H,S,D) reference."""
    rng = np.random.default_rng(11)
    b, h, d = 2, 4, 16
    hd = h * d
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)

    def split(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    want = fa.reference_attention(split(qp), split(kp), split(vp), bias)
    want = np.asarray(want).transpose(0, 2, 1, 3).reshape(b, s, hd)
    got = np.asarray(fa.flash_attention_packed(qp, kp, vp, bias, h, block_q=16))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_packed_forward_prepadded_bias():
    """Bias wider than S (model-level lane pre-pad) is consumed as-is; the
    -inf pad keys must not disturb real rows."""
    rng = np.random.default_rng(12)
    b, h, s, d = 1, 2, 40, 16
    hd = h * d
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)
    pad = 64 - s
    bias_wide = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, pad)),
                        constant_values=fa.NEG_INF)

    def split(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    want = fa.reference_attention(split(qp), split(kp), split(vp), bias)
    want = np.asarray(want).transpose(0, 2, 1, 3).reshape(b, s, hd)
    got = np.asarray(
        fa.flash_attention_packed(qp, kp, vp, bias_wide, h, block_q=16)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_packed_train_forward_matches_headform_kernel_with_dropout():
    """The packed train kernel must reproduce the (B,H,S,D) kernel's output
    BIT-comparably under dropout: both use the same position-hash mask
    function of (seed, b*H+h, i, j)."""
    rng = np.random.default_rng(21)
    b, h, s, d = 2, 4, 32, 16
    hd = h * d
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)
    seed = jnp.asarray([77], jnp.int32)

    def split(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    want = fa.flash_attention(
        split(qp), split(kp), split(vp), bias, 16,
        dropout_rate=0.25, dropout_seed=seed,
    )
    want = np.asarray(want).transpose(0, 2, 1, 3).reshape(b, s, hd)
    got = np.asarray(fa.flash_attention_packed_train(
        qp, kp, vp, bias, seed, h, block_q=16, rate=0.25
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("rate", [0.0, 0.25])
def test_packed_train_grads_match_headform_kernel(rate):
    """Packed fused backward == (B,H,S,D) fused backward for dq/dk/dv/dbias
    (same recompute scheme, same dropout mask)."""
    rng = np.random.default_rng(22)
    b, h, s, d = 2, 4, 24, 16
    hd = h * d
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)
    seed = jnp.asarray([5], jnp.int32)

    def split(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(b, s, hd)

    def loss_packed(q, k, v, bias):
        out = fa.flash_attention_packed_train(
            q, k, v, bias, seed, h, block_q=8, rate=rate
        )
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_headform(q, k, v, bias):
        out = fa.flash_attention(
            split(q), split(k), split(v), bias, 8,
            dropout_rate=rate, dropout_seed=seed if rate else None,
        )
        return (out.astype(jnp.float32) ** 2).sum()

    gp = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    gh = jax.grad(loss_headform, argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    for a, b_ in zip(gp, gh):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4
        )


@pytest.mark.slow
def test_flash_gradients_bias_wider_than_block_pad():
    """Regression: bias pre-padded WIDER than ceil(S/block_q)*block_q — the
    backward must return dbias at the bias's full (pre-padded) shape, not at
    the smaller q-block padding (previously a cotangent shape mismatch)."""
    rng = np.random.default_rng(31)
    b, h, s, d, blk, wide = 1, 2, 11, 8, 8, 32
    q, k, v, bias = _rand_qkvb(rng, b, h, s, d)
    pre = jnp.full((b, h, wide, wide), -1e30)
    pre = pre.at[:, :, :s, :s].set(bias)

    g_pre = jax.grad(
        lambda q, k, v, bb: fa.flash_attention(q, k, v, bb, blk).sum(),
        argnums=(0, 1, 2, 3),
    )(q, k, v, pre)
    g_ref = jax.grad(
        lambda q, k, v, bb: fa.reference_attention(q, k, v, bb).sum(),
        argnums=(0, 1, 2, 3),
    )(q, k, v, bias)
    assert g_pre[3].shape == pre.shape
    np.testing.assert_allclose(
        np.asarray(g_pre[3][:, :, :s, :s]), np.asarray(g_ref[3]),
        atol=3e-5, rtol=1e-4,
    )
    assert np.all(np.asarray(g_pre[3][:, :, s:, :]) == 0)
    for a, b_ in zip(g_pre[:3], g_ref[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_packed_train_grads_with_prepadded_bias():
    """Same regression for the packed train pair: pre-padded bias wider than
    the q-block padding must round-trip dbias at the bias shape."""
    rng = np.random.default_rng(32)
    b, h, s, d, wide = 1, 2, 11, 16, 32
    hd = h * d
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)
    seed = jnp.asarray([9], jnp.int32)
    pre = jnp.full((b, h, wide, wide), -1e30)
    pre = pre.at[:, :, :s, :s].set(bias)

    def split(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def loss_packed(q, k, v, bb):
        out = fa.flash_attention_packed_train(
            q, k, v, bb, seed, h, block_q=8, rate=0.0
        )
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v, bb):
        out = fa.reference_attention(split(q), split(k), split(v), bb)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, hd)
        return (out.astype(jnp.float32) ** 2).sum()

    gp = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(qp, kp, vp, pre)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    assert gp[3].shape == pre.shape
    np.testing.assert_allclose(
        np.asarray(gp[3][:, :, :s, :s]), np.asarray(gr[3]),
        atol=5e-4, rtol=5e-4,
    )
    assert np.all(np.asarray(gp[3][:, :, s:, :]) == 0)
    for a, b_ in zip(gp[:3], gr[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_packed_train_raises_on_untileable_bias():
    """The train pair must reject a pre-padded width no q-block >= 8 tiles
    (the deterministic twin already did; previously the train pair silently
    floor-truncated the grid, leaving garbage dbias tail rows)."""
    rng = np.random.default_rng(33)
    b, h, s, d = 1, 2, 11, 16
    hd = h * d
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    bias = jnp.full((b, h, 100, 100), 0.0, jnp.float32)  # 100 has no 2^k
    seed = jnp.asarray([1], jnp.int32)                   # divisor chain >= 8
    with pytest.raises(ValueError, match="does not tile"):
        fa.flash_attention_packed_train(
            qp, kp, vp, bias, seed, h, block_q=48, rate=0.25
        )


@pytest.mark.slow
@pytest.mark.parametrize("rate", [0.0, 0.25])
def test_packed_train_tables_grads_match_reference(rate):
    """flash_attention_packed_train_tables: dq/dk/dv AND the in-kernel
    (bins, H) table gradients must equal jax.grad of the jnp composition
    that builds the bias from the tables (the analytical relationship the
    op's caller contract requires)."""
    from multi_modal_early_exit_tpu.ops.fused_bias_attention import _bucket

    rng = np.random.default_rng(40)
    b, h, s, d = 2, 4, 24, 16
    hd = h * d
    rel_bins, max_rel, rel2d_bins, max_rel2d = 8, 16, 8, 32
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    t1 = jnp.asarray(rng.standard_normal((rel_bins, h)), jnp.float32)
    tx = jnp.asarray(rng.standard_normal((rel2d_bins, h)), jnp.float32)
    ty = jnp.asarray(rng.standard_normal((rel2d_bins, h)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 50, (b, s)), jnp.int32)
    cx = jnp.asarray(rng.integers(0, 100, (b, s)), jnp.int32)
    cy = jnp.asarray(rng.integers(0, 100, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32).at[1, -5:].set(0)
    seed = jnp.asarray([3], jnp.int32)

    def build_bias(t1, tx, ty):
        def table_bias(table, vec, bins, max_d):
            rel = vec[:, None, :] - vec[:, :, None]  # key minus query
            return table[_bucket(rel, bins, max_d)].transpose(0, 3, 1, 2)

        bias = (
            table_bias(t1, pos, rel_bins, max_rel)
            + table_bias(tx, cx, rel2d_bins, max_rel2d)
            + table_bias(ty, cy, rel2d_bins, max_rel2d)
        )
        return bias + jnp.where(mask == 0, -1e30, 0.0)[:, None, None, :]

    def split(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def loss_op(q, k, v, t1, tx, ty):
        bias = jax.lax.stop_gradient(build_bias(t1, tx, ty))
        out = fa.flash_attention_packed_train_tables(
            q, k, v, bias, t1, tx, ty, pos, cx, cy, seed, h, block_q=8,
            rate=rate, rel_bins=rel_bins, max_rel=max_rel,
            rel2d_bins=rel2d_bins, max_rel2d=max_rel2d,
        )
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v, t1, tx, ty):
        bias = build_bias(t1, tx, ty)
        if rate > 0.0:
            out = fa.reference_attention_hash_dropout(
                split(q), split(k), split(v), bias, seed, rate
            )
        else:
            out = fa.reference_attention(split(q), split(k), split(v), bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, hd)
        return (out.astype(jnp.float32) ** 2).sum()

    go = jax.grad(loss_op, argnums=(0, 1, 2, 3, 4, 5))(qp, kp, vp, t1, tx, ty)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(qp, kp, vp, t1, tx, ty)
    for a, b_ in zip(go, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3, rtol=2e-3
        )
    # the forward itself equals the plain packed-train kernel
    bias = build_bias(t1, tx, ty)
    want = fa.flash_attention_packed_train(
        qp, kp, vp, bias, seed, h, block_q=8, rate=rate
    )
    got = fa.flash_attention_packed_train_tables(
        qp, kp, vp, bias, t1, tx, ty, pos, cx, cy, seed, h, block_q=8,
        rate=rate, rel_bins=rel_bins, max_rel=max_rel,
        rel2d_bins=rel2d_bins, max_rel2d=max_rel2d,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.slow
def test_train_bias_context_wiring_matches_xla_path(monkeypatch):
    """Model-level wiring of the in-kernel-table-gradient path: with a bf16
    model and flash forced on (interpret mode), backbone_apply builds a
    TrainBiasContext for the non-deterministic pass and jax.grad of the EE
    loss — including the relative-position TABLE grads — matches the XLA
    composition. Dropout probs are zeroed so both paths are deterministic
    (the kernels' position-hash attention dropout is a different stream
    from jax.random by design)."""
    import dataclasses

    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )
    from multi_modal_early_exit_tpu.training.losses import ee_loss_fn

    bb = dataclasses.replace(
        LayoutLMv3Config.tiny(num_labels=4),
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    cfg = EEModelConfig(backbone=bb, exit=ExitConfig(exits=("text_avg", 1)))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x,
        init_ee_params(jax.random.key(0), cfg),
    )
    rng = np.random.default_rng(17)
    B, S = 2, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        "bbox": jnp.asarray(
            np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32
        ),
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, 3, 32, 32)), jnp.float32
        ),
        "attention_mask": jnp.ones((B, S), jnp.int32).at[1, -4:].set(0),
        "labels": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
    }

    def grads():
        (_, _), g = jax.value_and_grad(ee_loss_fn, has_aux=True)(
            params, cfg, batch, rng=jax.random.key(3), deterministic=False,
        )
        return g

    g_xla = grads()
    monkeypatch.setattr(fa, "use_flash_attention", lambda: True)
    monkeypatch.setenv("MMEE_TABLE_GRADS", "1")
    g_flash = grads()

    # the branch actually taken must be the TrainBiasContext one
    from multi_modal_early_exit_tpu.models.layoutlmv3 import modeling as m
    assert m.use_fused_bias_attention() is False  # sanity: not that branch

    flat_x = jax.tree_util.tree_flatten_with_path(g_xla)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_flash)[0]
    for (path, a), (_, b_) in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=str(path),
        )


@pytest.mark.slow
def test_chained_dbias_wiring_matches_xla_path(monkeypatch):
    """The chained-dbias training default (bias carried through the encoder
    scan, per-layer in-kernel cotangent accumulation): jax.grad of the EE
    loss — including the relative-position table grads via the bias
    builder's VJP — matches the XLA composition."""
    import dataclasses

    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )
    from multi_modal_early_exit_tpu.training.losses import ee_loss_fn

    bb = dataclasses.replace(
        LayoutLMv3Config.tiny(num_labels=4),
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    cfg = EEModelConfig(backbone=bb, exit=ExitConfig(exits=("text_avg", 1)))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x,
        init_ee_params(jax.random.key(0), cfg),
    )
    rng = np.random.default_rng(23)
    B, S = 2, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        "bbox": jnp.asarray(
            np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32
        ),
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, 3, 32, 32)), jnp.float32
        ),
        "attention_mask": jnp.ones((B, S), jnp.int32).at[1, -4:].set(0),
        "labels": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
    }

    def grads():
        (_, _), g = jax.value_and_grad(ee_loss_fn, has_aux=True)(
            params, cfg, batch, rng=jax.random.key(3), deterministic=False,
        )
        return g

    g_xla = grads()
    monkeypatch.setattr(fa, "use_flash_attention", lambda: True)
    # no MMEE_TABLE_GRADS: the chained-dbias branch is the default
    g_flash = grads()

    flat_x = jax.tree_util.tree_flatten_with_path(g_xla)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_flash)[0]
    for (path, a), (_, b_) in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=str(path),
        )


@pytest.mark.slow
def test_packed_train_chained_default_block_on_128_pad():
    """Regression: with the DEFAULT block_q (256) and a bias pre-padded to a
    128-multiple that is NOT 256-aligned (here S=100 -> pad 128), the
    chained op must resolve the layout from the bias width (shrinking the
    q-block) instead of raising at trace time — both the primal and the
    grad path (ADVICE r3: only 256-aligned pads happened to work)."""
    rng = np.random.default_rng(9)
    b, h, s, d = 1, 2, 100, 16
    pad = 128
    hd = h * d
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    bias = jnp.pad(
        jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32),
        ((0, 0), (0, 0), (0, pad - s), (0, pad - s)),
        constant_values=fa.NEG_INF,
    )
    seed = jnp.asarray([3], jnp.int32)

    def loss(q, k, v, bb):
        out, bb2 = fa.flash_attention_packed_train_chained(
            q, k, v, bb, seed, h  # default block_q=256
        )
        return (out.astype(jnp.float32) ** 2).sum() + (bb2**2).sum()

    out, bias_out = fa.flash_attention_packed_train_chained(
        qp, kp, vp, bias, seed, h
    )
    assert out.shape == (b, s, hd)
    np.testing.assert_allclose(np.asarray(bias_out), np.asarray(bias))
    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    # cross-check against the explicitly-tiled plain op
    def loss_plain(q, k, v, bb):
        out = fa.flash_attention_packed_train(q, k, v, bb, seed, h, block_q=128)
        return (out.astype(jnp.float32) ** 2).sum() + (bb**2).sum()

    grads_p = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    for a, b_ in zip(grads, grads_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4
        )


@pytest.mark.slow
def test_packed_train_chained_accumulates_bias_cotangent():
    """The chained op returns (out, bias) and its backward must emit
    d(bias) = upstream-bias-cotangent + ds — i.e. exactly the plain op's
    dbias plus whatever gradient flows into the passed-through bias."""
    rng = np.random.default_rng(51)
    b, h, s, d = 1, 2, 16, 16
    hd = h * d
    qp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((b, h, s, s)), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)
    rate = 0.25

    def loss_chained(q, k, v, bb):
        out, bb2 = fa.flash_attention_packed_train_chained(
            q, k, v, bb, seed, h, block_q=8, rate=rate
        )
        return (out.astype(jnp.float32) ** 2).sum() + (bb2 * w2).sum()

    def loss_plain(q, k, v, bb):
        out = fa.flash_attention_packed_train(
            q, k, v, bb, seed, h, block_q=8, rate=rate
        )
        return (out.astype(jnp.float32) ** 2).sum() + (bb * w2).sum()

    gc = jax.grad(loss_chained, argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    for a, b_ in zip(gc, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4
        )
    # forwards agree and the pass-through really is the same values
    out_c, bias_out = fa.flash_attention_packed_train_chained(
        qp, kp, vp, bias, seed, h, block_q=8, rate=rate
    )
    out_p = fa.flash_attention_packed_train(
        qp, kp, vp, bias, seed, h, block_q=8, rate=rate
    )
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_p))
    np.testing.assert_allclose(np.asarray(bias_out), np.asarray(bias))

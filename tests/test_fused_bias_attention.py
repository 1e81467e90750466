"""In-kernel-bias attention vs make_attention_bias + reference attention."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.models.layoutlmv3 import modeling as M
from multi_modal_early_exit_tpu.models.layoutlmv3.config import LayoutLMv3Config
from multi_modal_early_exit_tpu.ops import flash_attention as fa
from multi_modal_early_exit_tpu.ops.fused_bias_attention import (
    fused_bias_attention,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.slow
def test_fused_bias_attention_matches_two_step():
    cfg = LayoutLMv3Config.tiny()  # rel_pos_bins 8, rel_2d 16
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 24, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    x0 = rng.integers(0, 900, (b, s, 1))
    y0 = rng.integers(0, 900, (b, s, 1))
    bbox = jnp.asarray(
        np.concatenate([x0, y0, x0 + 50, y0 + 30], -1), jnp.int32
    )
    mask = jnp.ones((b, s), jnp.int32)
    mask = mask.at[1, -5:].set(0)

    t1 = jnp.asarray(rng.standard_normal((cfg.rel_pos_bins, h)), jnp.float32)
    tx = jnp.asarray(rng.standard_normal((cfg.rel_2d_pos_bins, h)), jnp.float32)
    ty = jnp.asarray(rng.standard_normal((cfg.rel_2d_pos_bins, h)), jnp.float32)

    # two-step reference: build the (B,H,S,S) bias, then XLA attention
    params = {"encoder": {"rel_pos_bias": t1, "rel_pos_x_bias": tx,
                          "rel_pos_y_bias": ty}}
    cfg_h = cfg.replace(num_labels=4)
    bias = M.make_attention_bias(params, cfg_h, pos, bbox, mask)
    # make_attention_bias folds the 1/sqrt(head_dim) scale of the MODEL's
    # head_dim; rebuild at this test's d by scaling tables directly
    scale = 1.0 / math.sqrt(d)
    bias = M.fused_rel_pos_bias(params["encoder"], cfg_h, pos, bbox,
                                scale=scale)
    neg = jnp.finfo(jnp.float32).min
    bias = bias + ((1.0 - mask) * neg)[:, None, None, :]
    want = np.asarray(fa.reference_attention(q, k, v, bias))

    got = np.asarray(
        fused_bias_attention(
            q, k, v, pos, bbox[:, :, 0], bbox[:, :, 3], mask,
            t1 * scale, tx * scale, ty * scale,
            block_q=8, block_k=8,
            rel_bins=cfg.rel_pos_bins, max_rel=cfg.max_rel_pos,
            rel2d_bins=cfg.rel_2d_pos_bins, max_rel2d=cfg.max_rel_2d_pos,
        )
    )
    # padded rows (mask 0) produce garbage in both paths; compare real
    # rows. Tolerance is bf16-level: the kernel stores the bias tile in
    # bf16 VMEM scratch (same precision as the dense bf16 bias path).
    np.testing.assert_allclose(got[0], want[0], atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(got[1, :, :-5], want[1, :, :-5],
                               atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_model_level_fused_bias_path(monkeypatch):
    """ee_forward with MMEE_FUSED_BIAS must equal the dense-bias forward."""
    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import (
        ee_forward,
        init_ee_params,
    )
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )
    from multi_modal_early_exit_tpu.ops import flash_attention as fa_mod

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    B, S = 2, 16
    args = (
        jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32),
        jnp.asarray(rng.standard_normal((B, 3, 32, 32)), jnp.float32),
        jnp.ones((B, S), jnp.int32),
    )
    plain = ee_forward(params, cfg, *args)

    monkeypatch.setenv("MMEE_FUSED_BIAS", "1")
    monkeypatch.setattr(fa_mod, "use_flash_attention", lambda: True)
    # flash itself would also trigger; interpret mode handles both kernels
    fused = ee_forward(params, cfg, *args)
    np.testing.assert_allclose(
        np.asarray(fused.policy_logits()), np.asarray(plain.policy_logits()),
        atol=2e-2, rtol=1e-2,  # bf16 bias quantization inside the kernel
    )


@pytest.mark.slow
def test_materialize_bias_matches_xla_chain():
    """The pallas bias builder must equal make_attention_bias(pad_to=P)
    (bf16 tolerance; -inf pad columns)."""
    from multi_modal_early_exit_tpu.ops.fused_bias_attention import (
        materialize_bias,
    )

    cfg = LayoutLMv3Config.tiny()
    rng = np.random.default_rng(4)
    b, s, h = 2, 20, 4
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    x0 = rng.integers(0, 900, (b, s, 1))
    y0 = rng.integers(0, 900, (b, s, 1))
    bbox = jnp.asarray(np.concatenate([x0, y0, x0 + 40, y0 + 25], -1),
                       jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    mask = mask.at[0, -4:].set(0)
    t1 = jnp.asarray(rng.standard_normal((cfg.rel_pos_bins, h)), jnp.float32)
    tx = jnp.asarray(rng.standard_normal((cfg.rel_2d_pos_bins, h)),
                     jnp.float32)
    ty = jnp.asarray(rng.standard_normal((cfg.rel_2d_pos_bins, h)),
                     jnp.float32)

    params = {"encoder": {"rel_pos_bias": t1, "rel_pos_x_bias": tx,
                          "rel_pos_y_bias": ty}}
    want = np.asarray(
        M.make_attention_bias(
            params, cfg.replace(num_labels=4), pos, bbox, mask,
            dtype=jnp.bfloat16, pad_to=128,
        ),
        np.float32,
    )
    scale = 1.0 / math.sqrt(cfg.replace(num_labels=4).head_dim)
    got = np.asarray(
        materialize_bias(
            pos, bbox[:, :, 0], bbox[:, :, 3], mask,
            t1 * scale, tx * scale, ty * scale,
            rel_bins=cfg.rel_pos_bins, max_rel=cfg.max_rel_pos,
            rel2d_bins=cfg.rel_2d_pos_bins, max_rel2d=cfg.max_rel_2d_pos,
        ),
        np.float32,
    )
    assert got.shape == want.shape == (b, h, 128, 128)
    # unmasked block matches to bf16 precision (mask sentinels differ:
    # kernel uses -1e30, XLA chain uses finfo.min — both kill softmax)
    np.testing.assert_allclose(got[1, :, :s, :s], want[1, :, :s, :s],
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(
        got[0, :, :s, : s - 4], want[0, :, :s, : s - 4],
        atol=5e-3, rtol=1e-2,
    )
    # pad columns and masked keys are large-negative in both
    assert (got[:, :, :s, s:] < -1e29).all()
    assert (got[0, :, :s, s - 4:s] < -1e29).all()


@pytest.mark.slow
def test_materialize_bias_table_gradients():
    """Custom VJP: table grads equal jax.grad through the XLA gather chain
    (same buckets, same sums — up to the kernel's bf16 lookup rounding which
    does not affect the cotangent routing)."""
    from multi_modal_early_exit_tpu.models.layoutlmv3 import modeling as M2
    from multi_modal_early_exit_tpu.ops.fused_bias_attention import (
        materialize_bias,
    )

    cfg = LayoutLMv3Config.tiny(num_labels=4)
    rng = np.random.default_rng(11)
    b, s, h = 2, 20, 4
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    x0 = rng.integers(0, 900, (b, s, 1))
    y0 = rng.integers(0, 900, (b, s, 1))
    bbox = jnp.asarray(np.concatenate([x0, y0, x0 + 40, y0 + 25], -1),
                       jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    t1 = jnp.asarray(rng.standard_normal((cfg.rel_pos_bins, h)), jnp.float32)
    tx = jnp.asarray(rng.standard_normal((cfg.rel_2d_pos_bins, h)), jnp.float32)
    ty = jnp.asarray(rng.standard_normal((cfg.rel_2d_pos_bins, h)), jnp.float32)
    gw = jnp.asarray(rng.standard_normal((b, h, 128, 128)), jnp.float32)

    scale = 1.0 / math.sqrt(cfg.head_dim)

    def loss_kernel(t1, tx, ty):
        bias = materialize_bias(
            pos, bbox[:, :, 0], bbox[:, :, 3], mask,
            t1 * scale, tx * scale, ty * scale,
            rel_bins=cfg.rel_pos_bins, max_rel=cfg.max_rel_pos,
            rel2d_bins=cfg.rel_2d_pos_bins, max_rel2d=cfg.max_rel_2d_pos,
            out_dtype=jnp.float32,
        )
        return (bias * gw).sum()

    def loss_xla(t1, tx, ty):
        params = {"encoder": {"rel_pos_bias": t1, "rel_pos_x_bias": tx,
                              "rel_pos_y_bias": ty}}
        bias = M2.make_attention_bias(
            params, cfg, pos, bbox, mask, dtype=jnp.float32, pad_to=128,
        )
        return (bias * gw).sum()

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(t1, tx, ty)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(t1, tx, ty)
    for a, b_ in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-5)


@pytest.mark.slow
def test_prepadded_bias_pad_rows_are_finite():
    """make_attention_bias(pad_to=P) must pad key COLUMNS with -inf but
    query ROWS with finite values: an all--inf row has an undefined row
    softmax, and on real TPUs the resulting NaN lse poisons dk/dv through
    the flash backward's row contraction (caught by the on-TPU numerics
    gate, scripts/tpu_numerics_check.py)."""
    cfg = LayoutLMv3Config.tiny(num_labels=4)
    rng = np.random.default_rng(3)
    b, s = 2, 24
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    x0 = rng.integers(0, 900, (b, s, 1))
    y0 = rng.integers(0, 900, (b, s, 1))
    bbox = jnp.asarray(np.concatenate([x0, y0, x0 + 50, y0 + 30], -1),
                       jnp.int32)
    mask = jnp.ones((b, s), jnp.int32).at[1, -5:].set(0)
    h = cfg.num_attention_heads
    params = {"encoder": {
        "rel_pos_bias": jnp.asarray(
            rng.standard_normal((cfg.rel_pos_bins, h)), jnp.float32),
        "rel_pos_x_bias": jnp.asarray(
            rng.standard_normal((cfg.rel_2d_pos_bins, h)), jnp.float32),
        "rel_pos_y_bias": jnp.asarray(
            rng.standard_normal((cfg.rel_2d_pos_bins, h)), jnp.float32),
    }}
    bias = np.asarray(M.make_attention_bias(
        params, cfg, pos, bbox, mask, dtype=jnp.float32, pad_to=64))
    assert bias.shape == (b, h, 64, 64)
    # pad key columns: large negative for every REAL query row (pad-row x
    # pad-col cells are don't-care)
    assert (bias[:, :, :s, s:] < -1e30).all()
    # pad query rows: finite on real key columns (row softmax well-defined)
    assert np.isfinite(bias[:, :, s:, :s]).all()
    assert (np.abs(bias[0, :, s:, :s]) < 1e6).all()

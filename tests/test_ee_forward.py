"""EE model forward: shapes, gating, LTE, exit decisions, jit-ability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.models.ee.model import (
    canonical_exit_order,
    decide_exits,
    ee_forward,
    init_ee_params,
)
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)


def make_batch(cfg: LayoutLMv3Config, batch=2, seq=12, seed=0):
    rng = np.random.RandomState(seed)
    input_ids = rng.randint(3, cfg.vocab_size, size=(batch, seq))
    attention_mask = np.ones((batch, seq), np.int32)
    x0 = rng.randint(0, 900, size=(batch, seq))
    y0 = rng.randint(0, 900, size=(batch, seq))
    bbox = np.stack([x0, y0, x0 + 50, y0 + 20], axis=-1)
    pixel_values = rng.randn(batch, 3, cfg.input_size, cfg.input_size).astype(np.float32)
    return (
        jnp.asarray(input_ids),
        jnp.asarray(bbox),
        jnp.asarray(pixel_values),
        jnp.asarray(attention_mask),
    )


def build(exits, strategy="ramp", use_lte=False, num_labels=5):
    backbone = LayoutLMv3Config.tiny(num_labels=num_labels)
    exit_cfg = ExitConfig(
        exits=exits,
        encoder_layer_strategy=strategy,
        use_lte=use_lte,
        inference_strategy="lte" if use_lte else "max_confidence",
    )
    cfg = EEModelConfig(backbone=backbone, exit=exit_cfg)
    params = init_ee_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.mark.slow
def test_canonical_order_swaps_embeddings():
    cfg, _ = build(("text_avg", "vision_avg", 1, 2))
    assert canonical_exit_order(cfg.exit) == ("vision_avg", "text_avg", 1, 2)


@pytest.mark.slow
def test_ramp_forward_shapes():
    cfg, params = build(("text_avg", "vision_avg", "text_visual_concat", 1, 2))
    ids, bbox, pv, mask = make_batch(cfg.backbone)
    out = ee_forward(params, cfg, ids, bbox, pv, mask)
    E, B, K = 5, 2, 5
    assert out.exit_logits.shape == (E, B, K)
    assert out.logits.shape == (B, K)
    assert out.exit_criteria.shape == (E + 1, B)
    assert out.gated_logits is None
    store = out.policy_logits()
    assert store.shape == (E + 1, B, K)
    np.testing.assert_allclose(np.asarray(store[-1]), np.asarray(out.logits))


@pytest.mark.slow
def test_gate_forward_shapes():
    cfg, params = build(("vision_avg", 2), strategy="gate")
    ids, bbox, pv, mask = make_batch(cfg.backbone)
    out = ee_forward(params, cfg, ids, bbox, pv, mask)
    assert out.exit_logits.shape == (2, 2, 2)  # gate heads emit 2 logits
    assert out.gate_inputs.shape == (2, 2, cfg.backbone.hidden_size)
    assert out.gated_logits.shape == (2, 2, 5)
    store = out.policy_logits()
    assert store.shape == (3, 2, 5)


@pytest.mark.slow
def test_lte_forward():
    cfg, params = build(("text_visual_concat", 1, 2), use_lte=True)
    ids, bbox, pv, mask = make_batch(cfg.backbone)
    out = ee_forward(params, cfg, ids, bbox, pv, mask)
    assert out.lte_scores.shape == (3, 2)  # concat + 2 encoder exits
    assert bool(jnp.all((out.lte_scores >= 0) & (out.lte_scores <= 1)))


@pytest.mark.slow
def test_decide_exits_thresholds():
    cfg, params = build(("vision_avg", 1))
    ids, bbox, pv, mask = make_batch(cfg.backbone)
    out = ee_forward(params, cfg, ids, bbox, pv, mask)
    # threshold > 1 → nothing exits early → final classifier index E=2
    exits = decide_exits(out, cfg.exit, threshold=2.0)
    np.testing.assert_array_equal(np.asarray(exits), [2, 2])
    # threshold 0 → everything exits at the first exit
    exits = decide_exits(out, cfg.exit, threshold=0.0)
    np.testing.assert_array_equal(np.asarray(exits), [0, 0])


@pytest.mark.slow
def test_ee_forward_jits():
    cfg, params = build(("text_avg", 1))
    ids, bbox, pv, mask = make_batch(cfg.backbone)
    fwd = jax.jit(
        lambda p, a, b, c, d: ee_forward(p, cfg, a, b, c, d).policy_logits()
    )
    store = fwd(params, ids, bbox, pv, mask)
    eager = ee_forward(params, cfg, ids, bbox, pv, mask).policy_logits()
    np.testing.assert_allclose(np.asarray(store), np.asarray(eager), atol=1e-5)


@pytest.mark.slow
def test_training_mode_dropout_is_stochastic():
    cfg, params = build(("text_avg", 1))
    ids, bbox, pv, mask = make_batch(cfg.backbone)
    out1 = ee_forward(params, cfg, ids, bbox, pv, mask,
                      deterministic=False, rng=jax.random.key(1))
    out2 = ee_forward(params, cfg, ids, bbox, pv, mask,
                      deterministic=False, rng=jax.random.key(2))
    assert not np.allclose(np.asarray(out1.logits), np.asarray(out2.logits))


@pytest.mark.slow
def test_seq_pad_multiple_is_output_invariant():
    """Padding the concatenated sequence to a lane multiple (TPU alignment)
    must not change any exit/final logits — padded keys are masked out."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import (
        ee_forward,
        init_ee_params,
    )
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", "vision_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B, S = 3, 14
    args = (
        jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32),
        jnp.asarray(rng.standard_normal((B, 3, 32, 32)), jnp.float32),
        jnp.asarray(
            (rng.random((B, S)) > 0.2).astype(np.int32), jnp.int32
        ),
    )
    plain = ee_forward(params, cfg, *args)
    padded = ee_forward(params, cfg, *args, seq_pad_multiple=16)
    np.testing.assert_allclose(
        np.asarray(padded.policy_logits()), np.asarray(plain.policy_logits()),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(padded.exit_criteria), np.asarray(plain.exit_criteria),
        atol=2e-5, rtol=1e-4,
    )


def test_ee_forward_jit_smoke():
    """Fast-subset smoke: jitted policy store has the right shape, finite
    values, and decide_exits returns valid indices (full jit-vs-eager
    equality lives in test_ee_forward_jits, marked slow)."""
    cfg, params = build(("text_avg", 1))
    ids, bbox, pv, mask = make_batch(cfg.backbone)
    fwd = jax.jit(
        lambda p, a, b, c, d: ee_forward(p, cfg, a, b, c, d).policy_logits()
    )
    store = np.asarray(fwd(params, ids, bbox, pv, mask))
    assert store.shape == (3, 2, 5)
    assert np.isfinite(store).all()

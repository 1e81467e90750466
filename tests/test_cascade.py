"""Single-program capacity-constrained cascade vs the exact threshold policy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.models.ee.cascade import (
    capacities_from_distribution,
    make_cascade_forward,
)
from multi_modal_early_exit_tpu.models.ee.model import (
    decide_exits,
    ee_forward,
    init_ee_params,
)
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)


@pytest.fixture(scope="module")
def setup():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", "vision_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B, S = 12, 20
    batch = (
        jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32),
        jnp.asarray(rng.standard_normal((B, 3, 32, 32)), jnp.float32),
        jnp.ones((B, S), jnp.int32),
    )
    return cfg, params, batch


@pytest.mark.slow
@pytest.mark.parametrize("threshold", [0.0, 0.3, 2.0])
def test_full_capacity_matches_exact_policy(setup, threshold):
    cfg, params, batch = setup
    B = batch[0].shape[0]
    out = ee_forward(params, cfg, *batch)
    expected_exits = np.asarray(decide_exits(out, cfg.exit, threshold))
    store = np.asarray(out.policy_logits(), np.float32)
    expected_logits = store[expected_exits, np.arange(B)]

    cascade = jax.jit(
        make_cascade_forward(cfg, capacities=(B, B), threshold=threshold)
    )
    res = cascade(params, *batch)
    np.testing.assert_array_equal(np.asarray(res.exit_ids), expected_exits)
    np.testing.assert_allclose(
        np.asarray(res.logits), expected_logits, atol=3e-5, rtol=1e-4
    )
    assert not np.asarray(res.capacity_exited).any()


@pytest.mark.slow
def test_capacity_constrained_exits_are_marked(setup):
    cfg, params, batch = setup
    B = batch[0].shape[0]
    # threshold 2.0 -> nobody exits voluntarily; capacity 4 forces B-4 out
    cascade = jax.jit(
        make_cascade_forward(cfg, capacities=(4, 4), threshold=2.0)
    )
    res = cascade(params, *batch)
    exits = np.asarray(res.exit_ids)
    forced = np.asarray(res.capacity_exited)
    assert forced.sum() == B - 4
    # forced samples exited at the deepest embedding exit (index 1 here)
    assert (exits[forced] <= 2).all()
    # the 4 surviving samples reached the final classifier
    assert (exits[~forced] == cfg.num_exits).all()


def test_capacities_from_distribution():
    dist = {0: 0.5, 1: 0.2, 2: 0.2, 3: 0.1}
    caps = capacities_from_distribution(
        dist, batch=64, n_emb=2, n_stages=2, margin=1.0, multiple=8
    )
    # 30% survive embeddings -> 24 rounded; 10% survive exit 2 -> 8
    assert caps == (24, 8)


def test_capacities_binomial_tail_beats_flat_margin_at_high_survival():
    """tail sizing: mean + z*sigma of Binomial(B, p). At p=0.737/B=64 the
    flat 1.25 margin rounds to the FULL batch (the stage saves nothing)
    while the 99.5% binomial quantile needs only 56 rows."""
    dist = {0: 0.26, 1: 0.02, 2: 0.707, 3: 0.011}
    flat = capacities_from_distribution(dist, 64, n_emb=2, n_stages=2)
    tailed = capacities_from_distribution(
        dist, 64, n_emb=2, n_stages=2, tail=0.995
    )
    assert flat == (64, 8)
    assert tailed == (56, 8)
    # certain survival must still cover the whole batch
    all_deep = {0: 0.0, 1: 0.0}
    assert capacities_from_distribution(
        all_deep, 64, n_emb=2, n_stages=1, tail=0.995
    ) == (64,)


@pytest.mark.slow
def test_cascade_gate_heads_match_exact_policy(setup):
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1), encoder_layer_strategy="gate"),
    )
    params = init_ee_params(jax.random.key(4), cfg)
    _, _, batch = setup
    B = batch[0].shape[0]
    out = ee_forward(params, cfg, *batch)
    threshold = 0.6
    expected_exits = np.asarray(decide_exits(out, cfg.exit, threshold))
    store = np.asarray(out.policy_logits(), np.float32)
    expected_logits = store[expected_exits, np.arange(B)]

    cascade = jax.jit(
        make_cascade_forward(cfg, capacities=(B, B), threshold=threshold)
    )
    res = cascade(params, *batch)
    np.testing.assert_array_equal(np.asarray(res.exit_ids), expected_exits)
    assert res.logits.shape == (B, 4)
    np.testing.assert_allclose(np.asarray(res.logits), expected_logits,
                               atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_cascade_with_flash_kernels_matches_xla_path(monkeypatch):
    """The cascade's flash path (pallas bias builder + fused attention +
    once-per-cascade lane padding) must reproduce the plain XLA cascade —
    decisions exactly, logits to bf16-ish tolerance (the builder quantizes
    the bias to bf16)."""
    from jax.experimental.pallas import tpu as pltpu

    from multi_modal_early_exit_tpu.ops import flash_attention as fa_mod

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", "vision_avg", 1)),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(9)
    B, S = 8, 20
    ids = jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32)
    bbox = jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32)
    pv = jnp.asarray(rng.standard_normal((B, 3, 32, 32)), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)
    mask = mask.at[0, -4:].set(0)

    cascade = make_cascade_forward(cfg, capacities=(8, 8), threshold=0.5)
    plain = cascade(params, ids, bbox, pv, mask)

    import multi_modal_early_exit_tpu.models.ee.cascade as cascade_mod

    monkeypatch.setattr(fa_mod, "use_flash_attention", lambda: True)
    # cascade binds the gate at import time; patch its module name too so
    # the once-per-cascade lane padding + pallas bias builder path runs
    monkeypatch.setattr(cascade_mod, "use_flash_attention", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        flash = cascade(params, ids, bbox, pv, mask)

    np.testing.assert_array_equal(
        np.asarray(flash.exit_ids), np.asarray(plain.exit_ids)
    )
    np.testing.assert_allclose(
        np.asarray(flash.logits), np.asarray(plain.logits),
        atol=5e-2, rtol=5e-2,
    )


@pytest.mark.slow
def test_capacity_priority_is_margin_to_own_threshold():
    """Capacity-pressure regression with PER-EXIT thresholds: the rows
    forced out must be the most-confident survivors (equivalently, the
    largest margin to their exit's bar — at any top_k every running row
    carries the criterion of the SAME most-recent exit, so the two
    orderings coincide; see the cascade's ordering note)."""
    from multi_modal_early_exit_tpu.evaluation.thresholds import csf_matrix

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", "vision_avg", 1)),
    )
    params = init_ee_params(jax.random.key(2), cfg)
    rng = np.random.default_rng(23)
    B, S = 16, 20
    batch = (
        jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        jnp.asarray(np.sort(rng.integers(0, 500, (B, S, 4)), -1), jnp.int32),
        jnp.asarray(rng.standard_normal((B, 3, 32, 32)), jnp.float32),
        jnp.ones((B, S), jnp.int32),
    )
    store = np.asarray(
        ee_forward(params, cfg, *batch).policy_logits(), np.float64
    )
    scores = csf_matrix(store)  # (E+1, B); order: vision_avg, text_avg, 1
    # data-driven bars: almost nobody clears vision_avg, ~1/4 clear
    # text_avg — guarantees a large surviving set to squeeze
    thr_vec = [
        float(np.quantile(scores[0], 0.95)),
        float(np.quantile(scores[1], 0.75)),
        0.5,
    ]

    # offline: who survives the two embedding exits?
    exited = (scores[0] > thr_vec[0]) | (
        ~(scores[0] > thr_vec[0]) & (scores[1] > thr_vec[1])
    )
    running = ~exited
    n_run = int(running.sum())
    assert n_run >= 4, "quantile bars must leave survivors"
    cap0 = n_run - 2  # force exactly 2 capacity overflows
    # margin at the LAST embedding exit (text_avg = canonical index 1)
    margin = scores[1] - thr_vec[1]
    run_idx = np.flatnonzero(running)
    forced_expected = set(
        run_idx[np.argsort(-margin[run_idx])][: n_run - cap0].tolist()
    )

    cascade = jax.jit(
        make_cascade_forward(
            cfg, capacities=(cap0, cap0), threshold=thr_vec
        )
    )
    res = cascade(params, *batch)
    forced = set(np.flatnonzero(np.asarray(res.capacity_exited)).tolist())
    assert forced == forced_expected

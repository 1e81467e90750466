"""End-to-end trained anytime demo (VERDICT round-1 item #9): train a tiny
EE model on the synthetic dataset until the loss actually drops, then run the
full reference flow — harvest (with npz write-through cache) → per-exit
temperature calibration → threshold sweep with per-threshold runs → and
finally the single-program cascade at the calibrated operating point, which
must reproduce the exact offline policy's accuracy at iso average-depth.

Reference anchors: training hot loop EE/models/EE_modules.py:344-377, eval
flow EE/eval.py:227-346, anytime curve EE/thresh.py:228-302.
"""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.data.datasets import build_synthetic
from multi_modal_early_exit_tpu.data.loader import (
    accumulation_layout,
    iterate_batches,
)
from multi_modal_early_exit_tpu.evaluation.pipeline import (
    calibrate,
    full_test_iteration,
    get_logits,
)
from multi_modal_early_exit_tpu.evaluation.policy import (
    Policy,
    exit_distribution_of,
)
from multi_modal_early_exit_tpu.models.ee.cascade import (
    capacities_from_distribution,
    make_cascade_forward,
)
from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)
from multi_modal_early_exit_tpu.training.trainer import (
    EETrainer,
    TrainingArguments,
)
from multi_modal_early_exit_tpu.utils.wandb_compat import init_wandb

pytestmark = pytest.mark.slow

SEQ, IMG, LABELS = 32, 32, 4


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    cwd = os.getcwd()
    os.chdir(d)
    yield str(d)
    os.chdir(cwd)


@pytest.fixture(scope="module")
def trained(workdir):
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=LABELS),
        exit=ExitConfig(
            exits=("text_avg", "vision_avg", 1),
            training_strategy="one_stage_subgraphs_weighted",
            gamma=0.3,
        ),
    )
    train_ds = build_synthetic(
        "train", n_train=96, num_labels=LABELS, seq_len=SEQ, image_size=IMG
    )
    params = init_ee_params(jax.random.key(0), cfg)
    args = TrainingArguments(
        learning_rate=1e-3, num_epochs=12, train_batch_size=8, seed=0
    )
    trainer = EETrainer(cfg, params, args, total_steps=12 * 12)
    rng = jax.random.key(1)
    losses = []
    step = 0
    for epoch in range(args.num_epochs):
        for batch in iterate_batches(train_ds, 8, shuffle=True, epoch=epoch):
            batch.pop("sample_mask")
            loss, _ = trainer.train_step(
                accumulation_layout(batch, 1), jax.random.fold_in(rng, step)
            )
            losses.append(loss)
            step += 1
    return cfg, trainer.params, losses


def test_training_converges(trained):
    _, _, losses = trained
    first = np.mean(losses[:6])
    last = np.mean(losses[-6:])
    assert last < 0.5 * first, (first, last)


@pytest.fixture(scope="module")
def harvested(trained, workdir):
    cfg, params, _ = trained
    config = {
        "checkpoint": "e2e-ckpt", "dataset": "synthetic", "labelset": "test",
        "inference_strategy": "max_confidence",
        "exit_policy": "max_confidence_global_thresholding_policy",
    }
    test_ds = build_synthetic(
        "test", n_eval=64, num_labels=LABELS, seq_len=SEQ, image_size=IMG
    )
    val_ds = build_synthetic(
        "validation", n_eval=64, num_labels=LABELS, seq_len=SEQ, image_size=IMG
    )
    logits, refs, stats = get_logits(params, cfg, test_ds, config,
                                     batch_size=16)
    val_cfg = dict(config, labelset="validation")
    val_logits, val_refs, _ = get_logits(params, cfg, val_ds, val_cfg,
                                         batch_size=16)
    return cfg, params, config, logits, refs, val_logits, val_refs


def test_harvest_cache_roundtrip(trained, harvested, workdir):
    """First harvest writes the npz cache; a rerun loads it bit-identically
    (the reference caches inside get_logits, EE/utils.py:147-158)."""
    cfg, params, config, logits, refs, _, _ = harvested
    cached = glob.glob("results/*/exit_logits-test.npz")
    assert cached, "get_logits must write its cache on miss"
    test_ds = build_synthetic(
        "test", n_eval=64, num_labels=LABELS, seq_len=SEQ, image_size=IMG
    )
    logits2, refs2, stats2 = get_logits(params, cfg, test_ds, config,
                                        batch_size=16)
    np.testing.assert_array_equal(np.asarray(logits2), np.asarray(logits))
    np.testing.assert_array_equal(refs2, refs)
    assert stats2 == {}  # cache hit: no forward ran


def test_calibrated_sweep_with_per_threshold_runs(harvested):
    cfg, params, config, logits, refs, val_logits, val_refs = harvested
    config = dict(config, calibrate=True)
    calibrated = calibrate(logits, val_logits, val_refs, config)
    assert "calibration_metrics" in config
    assert len(config["calibration_metrics"]["temperature"]) == logits.shape[0]

    results = full_test_iteration(
        calibrated, refs, config, start_threshold=0.3, step=0.2,
        run_factory=init_wandb,
    )
    assert len(results) == 4  # 0.3, 0.5, 0.7, 0.9
    for entry in results:
        assert "accuracy" in entry and "average_exit" in entry
    # one observability run per threshold (EE/eval.py:253-255)
    run_dirs = glob.glob("runs/*thr*")
    assert len(run_dirs) >= 4


def test_cascade_matches_offline_policy_at_operating_point(harvested):
    """The serving cascade at validation-calibrated capacities reproduces the
    offline policy: same accuracy (exactly, when capacities cover the true
    survivor counts) and same average exit depth."""
    cfg, params, config, logits, refs, val_logits, val_refs = harvested
    threshold = 0.5
    pol_cfg = dict(config, exit_threshold=threshold)

    # offline policy on the dumped logits (the reference contract)
    exits_store, predictions, dist = Policy(
        logits, pol_cfg
    ).max_confidence_global_thresholding_policy()
    policy_acc = float(np.mean(predictions.argmax(-1) == refs))
    policy_avg_exit = float(np.mean(exits_store))

    # validation exit distribution -> static capacities
    val_exits, _, val_dist = Policy(
        val_logits, pol_cfg
    ).max_confidence_global_thresholding_policy()
    E = logits.shape[0] - 1
    n_emb = 2
    caps = capacities_from_distribution(
        val_dist, batch=64, n_emb=n_emb, n_stages=2, margin=1.5, multiple=8
    )

    test_ds = build_synthetic(
        "test", n_eval=64, num_labels=LABELS, seq_len=SEQ, image_size=IMG
    )
    batch = test_ds[np.arange(64)]
    cascade = make_cascade_forward(cfg, capacities=caps, threshold=threshold)
    result = jax.jit(cascade)(
        params,
        jnp.asarray(batch["input_ids"]), jnp.asarray(batch["bbox"]),
        jnp.asarray(batch["pixel_values"]),
        jnp.asarray(batch["attention_mask"]),
    )
    casc_pred = np.asarray(result.logits).argmax(-1)
    casc_acc = float(np.mean(casc_pred == refs))
    casc_avg_exit = float(np.mean(np.asarray(result.exit_ids)))

    # iso-accuracy + iso-depth at the operating point; capacity margin 1.5
    # usually covers all survivors, in which case the match is exact
    n_forced = int(np.asarray(result.capacity_exited).sum())
    assert casc_acc >= policy_acc - (0.02 if n_forced else 0.0)
    assert casc_avg_exit <= policy_avg_exit + (0.1 if n_forced else 1e-6)
    if n_forced == 0:
        np.testing.assert_array_equal(
            np.asarray(result.exit_ids), exits_store.astype(np.int64)
        )
        assert casc_acc == policy_acc

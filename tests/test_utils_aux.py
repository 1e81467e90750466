"""Aux subsystem tests: artifacts, wandb fallback, plots, checkpointing."""

import json
import os

import numpy as np
import pytest


def test_dump_and_reload_artifacts(tmp_path):
    from multi_modal_early_exit_tpu.utils.artifacts import (
        config_to_checkpoint,
        dump_logits,
        load_npz,
    )

    config = {"checkpoint": "ckpts/my-model", "test_dataset": "org/my-ds",
              "exit_threshold": 0.5, "downsampling": 0}
    logits = np.random.randn(3, 10, 4)
    refs = np.random.randint(0, 4, 10)
    out = dump_logits(logits, refs, config, name="test", root=str(tmp_path))
    assert out.endswith("my-model-my-ds")
    np.testing.assert_allclose(
        load_npz(os.path.join(out, "exit_logits-test.npz")), logits
    )
    with open(os.path.join(out, "config.json")) as f:
        saved = json.load(f)
    assert "exit_threshold" not in saved  # sanitized (EE/utils.py:253-266)


def test_file_run_logger(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from multi_modal_early_exit_tpu.utils.wandb_compat import init_wandb, nameit

    config = {"dataset": "x/yds", "checkpoint": "c1", "calibrate": True}
    assert nameit(config) == "yds-c1-calibrated"
    run = init_wandb(config)
    run.log({"accuracy": np.float64(0.5), "arr": np.arange(3)})
    run.finish()
    log_file = os.path.join("runs", "yds-c1-calibrated", "log.jsonl")
    lines = [json.loads(l) for l in open(log_file)]
    assert lines[0]["_config"]["dataset"] == "x/yds"
    assert lines[1]["accuracy"] == 0.5
    assert lines[1]["arr"] == [0, 1, 2]


def test_plot_exits_writes_grids(tmp_path):
    from multi_modal_early_exit_tpu.evaluation.plots import plot_exits

    rng = np.random.default_rng(0)
    E, N, K = 2, 12, 4
    store = rng.standard_normal((E + 1, N, K))
    refs = rng.integers(0, K, N)
    exits = rng.integers(0, E + 1, N)
    pixel_values = rng.standard_normal((N, 3, 24, 24)).astype(np.float32)
    saved = plot_exits(store, refs, exits, pixel_values,
                       id2label={i: f"c{i}" for i in range(K)},
                       out_dir=str(tmp_path))
    assert saved
    for path in saved.values():
        assert os.path.exists(path)
        assert os.path.getsize(path) > 0


def test_average_meter():
    from multi_modal_early_exit_tpu.utils.meters import AverageMeter

    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0)
    assert m.count == 3
    assert m.avg == pytest.approx(2.0)

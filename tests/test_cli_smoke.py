"""Fast CLI smoke: one debugEE training epoch + an evaluate dump.

The full CLI integration spine (train -> checkpoint -> sweep -> research ->
plots) lives in test_cli_pipeline.py and is marked slow; this file keeps the
CLI entry points covered in the fast subset (`pytest -m "not slow"`).
"""

import glob
import json
import os

import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_smoke")
    cwd = os.getcwd()
    os.chdir(d)
    yield str(d)
    os.chdir(cwd)


@pytest.fixture(scope="module")
def trained(workdir):
    from multi_modal_early_exit_tpu.cli import train

    metrics = train.main([
        "with", "debugEE", "epochs=1", "batch_size=8",
        "exits=text_avg,1", "training_strategy=joint_weighted_avg",
        "lr=3e-4", "output_dir=save", "eval_batch_size=8",
    ])
    ckpts = sorted(glob.glob("save/*/checkpoint-*"))
    return metrics, ckpts


def test_cli_train_and_evaluate_smoke(trained):
    # single test so the module fixture is built exactly once regardless of
    # how pytest-xdist distributes tests across workers
    metrics, ckpts = trained
    assert "accuracy" in metrics
    assert "exit_0_accuracy" in metrics
    assert len(ckpts) >= 1
    assert os.path.exists(os.path.join(ckpts[-1], "config.json"))

    from multi_modal_early_exit_tpu.cli import evaluate

    evaluate.main([
        "-c", ckpts[-1], "-d", "synthetic_rvl_cdip_tiny",
        "--exit_threshold", "-1",
    ])
    dumps = glob.glob("results/*/exit_logits-test.npz")
    assert dumps, "dump mode wrote no logit store"
    cfgs = glob.glob("results/*/config.json")
    assert cfgs
    json.load(open(cfgs[0]))


def test_cli_train_and_evaluate_layoutlmv2(workdir):
    # dense-v2 CLI wiring (ADVICE r4 medium): the (LayoutLMv2Config, params)
    # bundle must train through EETrainer's dense path and dump through
    # cli.evaluate's single-row store branch
    from multi_modal_early_exit_tpu.cli import evaluate, train

    metrics = train.main([
        "with", "debugEE", "model=layoutlmv2", "epochs=1", "batch_size=8",
        "lr=3e-4", "output_dir=save_v2", "eval_batch_size=8",
    ])
    assert "accuracy" in metrics
    assert "exit_0_share" in metrics  # single-row store: final share only
    ckpts = sorted(glob.glob("save_v2/*/checkpoint-*"))
    assert ckpts

    out = evaluate.main([
        "-c", ckpts[-1], "-d", "synthetic_rvl_cdip_tiny",
        "--exit_threshold", "-1",
    ])
    assert out["mode"] == "dump"

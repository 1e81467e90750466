"""End-to-end CLI pipeline test: train -> checkpoint -> evaluate -> artifacts.

This is the integration spine (reference flow: IC_only.py then eval.py then
thresh.py) on the tiny synthetic dataset.
"""

import glob
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    cwd = os.getcwd()
    os.chdir(d)
    yield str(d)
    os.chdir(cwd)


@pytest.fixture(scope="module")
def trained(workdir):
    from multi_modal_early_exit_tpu.cli import train

    metrics = train.main([
        "with", "debugEE", "epochs=1", "batch_size=4",
        "exits=text_avg,1", "training_strategy=joint_weighted_avg",
        "lr=3e-4", "output_dir=save", "eval_batch_size=8",
    ])
    ckpts = sorted(glob.glob("save/*/checkpoint-*"))
    return metrics, ckpts


def test_train_produces_metrics_and_checkpoints(trained):
    metrics, ckpts = trained
    assert "accuracy" in metrics
    assert "exit_0_accuracy" in metrics
    assert len(ckpts) >= 1
    assert os.path.exists(os.path.join(ckpts[-1], "config.json"))


def test_checkpoint_roundtrip(trained):
    from multi_modal_early_exit_tpu.training.checkpoint import load_checkpoint

    _, ckpts = trained
    params, config, _, step = load_checkpoint(ckpts[-1])
    assert config["model"] == "EElayoutlmv3"
    assert "backbone" in params
    assert step is not None


def test_evaluate_full_sweep_writes_artifacts(trained):
    from multi_modal_early_exit_tpu.cli import evaluate

    _, ckpts = trained
    out = evaluate.main([
        "-c", ckpts[-1], "-d", "synthetic_rvl_cdip_tiny",
        "--exit_threshold", "0.5", "--calibrate", "true",
        "--full_test", "true", "--step", "0.25",
    ])
    assert out["mode"] == "full_test"
    assert out["n_thresholds"] == 2  # 0.5, 0.75

    # artifact contract (reference: EE/utils.py:240-271, EE/eval.py:266-274)
    dirs = glob.glob("results/*")
    assert dirs
    root = dirs[0]
    assert os.path.exists(os.path.join(root, "exit_logits-calibrated.npz"))
    sweep_files = glob.glob(
        os.path.join(root, "*", "calibrated-metrics.json")
    )
    assert sweep_files
    with open(sweep_files[0]) as f:
        results = json.load(f)
    assert len(results) == 2
    for entry in results:
        assert "accuracy" in entry
        assert "GFLOPs reduction" in entry
        assert "exit_distribution" in entry


def test_evaluate_dump_mode(trained):
    from multi_modal_early_exit_tpu.cli import evaluate

    _, ckpts = trained
    out = evaluate.main([
        "-c", ckpts[-1], "-d", "synthetic_rvl_cdip_tiny",
    ])
    assert out["mode"] == "dump"
    files = glob.glob("results/*/exit_logits-test.npz")
    assert files
    store = np.load(files[0])["arr_0"]
    assert store.ndim == 3
    assert store.shape[0] == 3  # 2 exits + final


def test_research_cli_over_dump(trained):
    from multi_modal_early_exit_tpu.cli import research

    dirs = [d for d in glob.glob("results/*")
            if os.path.exists(os.path.join(d, "exit_logits-test.npz"))]
    out = research.main([
        "--checkpoint-dir", dirs[0], "--num-mixtures", "2000",
        "--backend", "auto", "--time-sweeps",
    ])
    assert out["pareto"]
    assert os.path.exists(os.path.join(dirs[0], "mixture_search.json"))
    # --time-sweeps records the reference's __main__ wall-clock harness
    # (EE/thresh.py:313-315) as an artifact
    import json as _json

    with open(os.path.join(dirs[0], "sweep_timings.json")) as f:
        timings = _json.load(f)
    assert set(timings["seconds"]) >= {"opt0", "opt1"}
    accs = [p["accuracy"] for p in out["pareto"]]
    exits = [p["average_exit"] for p in out["pareto"]]
    # pareto front: accuracy increases along increasing average exit
    assert accs == sorted(accs)
    assert exits == sorted(exits)


def test_evaluate_plot_exits_writes_grids(trained):
    from multi_modal_early_exit_tpu.cli import evaluate

    _, ckpts = trained
    evaluate.main([
        "-c", ckpts[-1], "-d", "synthetic_rvl_cdip_tiny",
        "--exit_threshold", "0.5", "--plot_exits",
    ])
    pngs = glob.glob("results/*/plots/exit_*.png")
    assert pngs
    assert all(os.path.getsize(p) > 0 for p in pngs)

"""Serving pipeline: raw inputs -> labels, chunking, checkpoint restore."""

import glob
import os

import numpy as np
import pytest

import jax

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)
from multi_modal_early_exit_tpu.serving import Pipeline


@pytest.fixture(scope="module")
def pipe():
    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.tiny(num_labels=4),
        exit=ExitConfig(exits=("text_avg", 1), global_threshold=0.3),
    )
    params = init_ee_params(jax.random.key(0), cfg)
    return Pipeline(params, cfg, id2label={i: f"class_{i}" for i in range(4)},
                    batch_size=4, seq_len=32)


@pytest.mark.slow
def test_predict_from_words_and_images(pipe):
    from PIL import Image

    n = 6  # exercises padding + chunking (batch_size=4)
    images = [Image.new("RGB", (64, 64), (255, 255, 255)) for _ in range(n)]
    words = [["invoice", "total", "due"] for _ in range(n)]
    boxes = [[[10, 10, 60, 30], [70, 10, 140, 30], [10, 40, 60, 70]]
             for _ in range(n)]
    results = pipe.predict(images, words, boxes)
    assert len(results) == n
    for r in results:
        assert r["label"].startswith("class_")
        assert 0.0 < r["confidence"] <= 1.0
        assert 0 <= r["exit"] <= 2
        assert r["exit_name"] in ("text_avg", "1", "final")
    # identical inputs -> identical outputs
    assert len({r["label"] for r in results}) == 1
    # serving-health counters (ADVICE r4: observable capacity-exit drift)
    m = pipe.metrics()
    assert m["documents_served"] >= n
    assert 0.0 <= m["capacity_exit_rate"] <= 1.0
    assert m["capacity_tail"] == 0.995


@pytest.mark.slow
def test_pipeline_checkpoint_roundtrip(tmp_path, pipe):
    from multi_modal_early_exit_tpu.config.experiment import ExperimentConfig
    from multi_modal_early_exit_tpu.training.checkpoint import save_checkpoint

    exp = ExperimentConfig(model="EElayoutlmv3", exits=("text_avg", 1))
    # shrink the experiment's backbone to the tiny test model via registry
    # dims inferred from params in from_checkpoint
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, pipe.params, config=exp.to_dict(), step=0)
    restored = Pipeline.from_checkpoint(ckpt, batch_size=4, seq_len=32)
    # restored pipeline predicts with the same params
    from PIL import Image

    images = [Image.new("RGB", (32, 32), (200, 200, 200))]
    words = [["memo"]]
    boxes = [[[5, 5, 25, 20]]]
    a = pipe.predict(images, words, boxes)
    b = restored.predict(images, words, boxes)
    assert a[0]["label_id"] == b[0]["label_id"]
    assert a[0]["exit"] == b[0]["exit"]


@pytest.mark.slow
def test_pipeline_accepts_per_exit_thresholds(pipe):
    """A mixture-derived per-exit threshold vector drives the Pipeline's
    cascade (r5: evaluation.select_mixture_operating_point -> serving)."""
    from PIL import Image

    mix_pipe = Pipeline(
        pipe.params, pipe.cfg,
        id2label={i: f"class_{i}" for i in range(4)},
        batch_size=4, seq_len=32, threshold=[0.25, 0.4],
    )
    images = [Image.new("RGB", (64, 64), (255, 255, 255))] * 4
    words = [["memo", "subject"]] * 4
    boxes = [[[5, 5, 50, 20], [60, 5, 120, 20]]] * 4
    results = mix_pipe.predict(images, words, boxes)
    assert len(results) == 4
    assert all(0 <= r["exit"] <= 2 for r in results)

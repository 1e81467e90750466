"""Image-only (dit) and text-only (bert) model variants + registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.experiment import ExperimentConfig
from multi_modal_early_exit_tpu.models.layoutlmv3.config import LayoutLMv3Config
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    forward_image_classification,
    forward_text_classification,
    init_params,
)
from multi_modal_early_exit_tpu.models.registry import MODEL_NAMES, build_model


@pytest.fixture(scope="module")
def tiny():
    cfg = LayoutLMv3Config.tiny(num_labels=4)
    params = init_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.mark.slow
def test_image_only_forward(tiny):
    cfg, params = tiny
    cfg = cfg.replace(
        has_relative_attention_bias=False, has_spatial_attention_bias=False
    )
    pv = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, 32, 32)), jnp.float32
    )
    logits = forward_image_classification(params, cfg, pv)
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_text_only_forward(tiny):
    cfg, params = tiny
    ids = jnp.asarray(
        np.random.default_rng(1).integers(3, 1000, (2, 12)), jnp.int32
    )
    logits = forward_text_classification(params, cfg, ids)
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["dit", "bert", "layoutlmv3", "EElayoutlmv3",
                                  "LTElayoutlmv3"])
@pytest.mark.slow
def test_registry_builds(name):
    cfg = ExperimentConfig(model=name, exits=("text_avg", 1))
    model_cfg, params = build_model(
        cfg, num_labels=4, num_hidden_layers=2, image_size=32, seq_len=16
    )
    assert "backbone" in params
    if name in ("EElayoutlmv3", "LTElayoutlmv3"):
        assert model_cfg.num_exits == 2
        if name == "LTElayoutlmv3":
            assert model_cfg.exit.use_lte
            assert "lte" in params
    else:
        assert model_cfg.num_exits == 0
    if name == "dit":
        assert not model_cfg.backbone.has_relative_attention_bias


def test_registry_rejects_unknown_and_pix2struct():
    with pytest.raises(ValueError):
        build_model(ExperimentConfig(model="nope"))
    with pytest.raises(NotImplementedError):
        build_model(ExperimentConfig(model="pix2struct"))

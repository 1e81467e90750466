"""Base-config golden parity: the full reference-size model (12 layers,
hidden 768, 512 text + 197 visual tokens — microsoft/layoutlmv3-base shape,
reference: EE/configs.py:399, EE/data/RVL_CDIP.py:98) against stored torch
outputs.

The artifact (tests/golden/layoutlmv3_base_golden.npz) was generated ONCE by
scripts/make_golden_base.py: weights come from ``init_params(key(42))``
(reproducible forever from the seed), were converted JAX->torch, and the HF
``LayoutLMv3ForSequenceClassification`` forward was run on CPU. This test
therefore needs no torch: rebuild the params from the seed, run our forward,
compare. Closes BASELINE.md's logit-parity target at the true model size
(VERDICT round-1 missing item #2).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.models.ee.model import ee_forward
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    backbone_apply,
    forward_sequence_classification,
    init_params,
)

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "layoutlmv3_base_golden.npz"
)


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


@pytest.fixture(scope="module")
def base_setup(golden):
    cfg = LayoutLMv3Config.base(num_labels=16)
    params = init_params(jax.random.key(int(golden["jax_seed"])), cfg)
    batch = (
        jnp.asarray(golden["input_ids"]),
        jnp.asarray(golden["bbox"]),
        jnp.asarray(golden["pixel_values"]),
        jnp.asarray(golden["attention_mask"]),
    )
    return cfg, params, batch


def test_base_logits_match_torch(base_setup, golden):
    cfg, params, (ids, bbox, pv, mask) = base_setup
    got = np.asarray(
        forward_sequence_classification(params, cfg, ids, bbox, pv, mask)
    )
    np.testing.assert_allclose(got, golden["logits"], atol=2e-4, rtol=1e-3)


def test_base_per_layer_cls_match_torch(base_setup, golden):
    """Every EE tap point (per-layer [CLS] state, EE/models/LayoutLMv3.py:226)
    matches torch at the full depth — the strongest parity statement for the
    early-exit heads."""
    cfg, params, (ids, bbox, pv, mask) = base_setup
    out = backbone_apply(params, cfg, ids, bbox, pv, mask, collect_cls=True)
    got = np.asarray(out.cls_per_layer)  # (12, B, 768)
    want = golden["cls_per_layer"]
    assert got.shape == want.shape
    # activations grow with depth; scale-aware tolerance
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state[:, 0, :]),
        golden["last_hidden_cls"], atol=5e-4, rtol=1e-3,
    )


def test_base_ee_forward_consistent_with_dense(base_setup, golden):
    """ee_forward at base size: final logits equal the dense classification
    logits (same weights, same math) and hence the torch golden."""
    cfg, params, (ids, bbox, pv, mask) = base_setup
    ee_cfg = EEModelConfig(
        backbone=cfg, exit=ExitConfig(exits=("text_avg", "vision_avg", 7))
    )
    ee_params = {"backbone": params}
    # heads are extra params; init them small but real
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params

    full = init_ee_params(jax.random.key(0), ee_cfg)
    full["backbone"] = params
    out = ee_forward(full, ee_cfg, ids, bbox, pv, mask)
    np.testing.assert_allclose(
        np.asarray(out.logits), golden["logits"], atol=2e-4, rtol=1e-3
    )
    assert out.exit_logits.shape[0] == 3
    del ee_params


def test_base_bf16_flash_path_close(base_setup, golden):
    """bf16 params + flash/fused-bias kernels (interpret mode) must stay
    within bf16 tolerance of the torch golden — the serving configuration."""
    from jax.experimental.pallas import tpu as pltpu

    from multi_modal_early_exit_tpu.ops import flash_attention as fa

    cfg, params, (ids, bbox, pv, mask) = base_setup
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params
    )
    orig = fa.use_flash_attention
    fa.use_flash_attention = lambda: True
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                forward_sequence_classification(
                    params16, cfg, ids, bbox, pv.astype(jnp.bfloat16), mask
                ),
                np.float32,
            )
    finally:
        fa.use_flash_attention = orig
    # bf16 end-to-end at 12 layers: ~1e-1 absolute on unit-scale logits
    np.testing.assert_allclose(got, golden["logits"], atol=0.25, rtol=0.1)
    # and the prediction ranking is preserved
    assert (got.argmax(-1) == golden["logits"].argmax(-1)).all()

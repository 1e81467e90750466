"""Functional + torch-parity coverage for the dit/bert model variants
(VERDICT r3 #7): the single-modality forwards must match the HF torch
implementation restricted to that modality, train (loss decreases), and not
allocate the unused modality's parameters.

Reference anchors: EE/configs.py:429-449 (dit — image-only classifier),
EE/configs.py:482-493 (bert — text-only classifier).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.experiment import ExperimentConfig
from multi_modal_early_exit_tpu.models.layoutlmv3.config import LayoutLMv3Config
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    embed_text,
    embed_vision,
    encoder_apply,
    forward_image_classification,
    forward_text_classification,
    make_attention_bias,
)
from multi_modal_early_exit_tpu.models.registry import build_model


@pytest.mark.slow
def test_single_modality_params_pruned():
    """dit allocates no text tower, bert no vision tower, and neither the
    multimodal post-concat LayerNorm (VERDICT r3 #7: the registry used to
    allocate the full multimodal set for single-modality models)."""
    dit_cfg, dit_params = build_model(
        ExperimentConfig(model="dit"), num_labels=4, num_hidden_layers=2,
        image_size=32, seq_len=16,
    )
    bert_cfg, bert_params = build_model(
        ExperimentConfig(model="bert"), num_labels=4, num_hidden_layers=2,
        image_size=32, seq_len=16,
    )
    assert set(dit_params["backbone"]) == {"visual", "encoder", "classifier"}
    assert set(bert_params["backbone"]) == {
        "embeddings", "encoder", "classifier"
    }
    # the pruned towers dominate the count: dit must be much smaller
    count = lambda p: sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))
    assert count(dit_params) < count(bert_params)


torch = pytest.importorskip("torch")

from transformers.models.layoutlmv3.configuration_layoutlmv3 import (  # noqa: E402
    LayoutLMv3Config as HFConfig,
)
from transformers.models.layoutlmv3.modeling_layoutlmv3 import (  # noqa: E402
    LayoutLMv3Model,
)

from multi_modal_early_exit_tpu.models.layoutlmv3.convert import (  # noqa: E402
    convert_torch_state_dict,
)


def _hf_conf(cfg: LayoutLMv3Config) -> "HFConfig":
    return HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        coordinate_size=cfg.coordinate_size,
        shape_size=cfg.shape_size,
        rel_pos_bins=cfg.rel_pos_bins,
        max_rel_pos=cfg.max_rel_pos,
        rel_2d_pos_bins=cfg.rel_2d_pos_bins,
        max_rel_2d_pos=cfg.max_rel_2d_pos,
        input_size=cfg.input_size,
        patch_size=cfg.patch_size,
        has_relative_attention_bias=cfg.has_relative_attention_bias,
        has_spatial_attention_bias=cfg.has_spatial_attention_bias,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


def test_dit_torch_parity():
    """Image-only forward (dit) vs the HF torch model driven with
    pixel_values only — same visual tower, no attention bias (ViT-style)."""
    cfg = LayoutLMv3Config.tiny(num_labels=4).replace(
        has_relative_attention_bias=False, has_spatial_attention_bias=False
    )
    torch.manual_seed(0)
    hf = LayoutLMv3Model(_hf_conf(cfg)).eval()
    params = jax.tree.map(
        jnp.asarray, convert_torch_state_dict(hf.state_dict(), cfg, prefix="")
    )
    pv = np.random.RandomState(1).randn(
        2, 3, cfg.input_size, cfg.input_size
    ).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(pv)).last_hidden_state.numpy()
    vis = embed_vision(params["visual"], cfg, jnp.asarray(pv))
    got, _, _ = encoder_apply(params["encoder"], cfg, vis, attn_bias=None)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_bert_torch_parity():
    """Text-only forward (bert) vs the HF torch model driven without
    pixel_values — text(+zero-layout) embeddings + 1D relative bias."""
    cfg = LayoutLMv3Config.tiny(num_labels=4).replace(
        has_spatial_attention_bias=False
    )
    torch.manual_seed(1)
    hf = LayoutLMv3Model(_hf_conf(cfg)).eval()
    params = jax.tree.map(
        jnp.asarray, convert_torch_state_dict(hf.state_dict(), cfg, prefix="")
    )
    rng = np.random.RandomState(2)
    b, s = 2, 12
    ids = rng.randint(3, cfg.vocab_size, size=(b, s)).astype(np.int64)
    bbox = np.zeros((b, s, 4), np.int64)
    mask = np.ones((b, s), np.int64)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), bbox=torch.tensor(bbox),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    temb = embed_text(params["embeddings"], cfg, jnp.asarray(ids), jnp.asarray(bbox))
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    bias = make_attention_bias(
        params, cfg, pos, jnp.asarray(bbox), jnp.asarray(mask)
    )
    got, _, _ = encoder_apply(params["encoder"], cfg, temb, bias)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["dit", "bert"])
def test_variant_trains(name):
    """A few optimizer steps on synthetic data: the loss must drop — the
    variants are trainable models, not just shape-correct forwards."""
    import optax

    from multi_modal_early_exit_tpu.data.datasets import synthetic_documents

    model_cfg, params = build_model(
        ExperimentConfig(model=name, seed=0), num_labels=4,
        num_hidden_layers=2, image_size=32, seq_len=16,
    )
    bb = model_cfg.backbone
    docs = synthetic_documents(16, num_labels=4, seq_len=16, image_size=32,
                               seed=3)
    labels = jnp.asarray(docs["labels"])
    if name == "dit":
        inputs = (jnp.asarray(docs["pixel_values"]),)
        fwd = lambda p, *a: forward_image_classification(p, bb, *a)
    else:
        inputs = (
            jnp.asarray(docs["input_ids"]),
            jnp.asarray(docs["bbox"]),
            jnp.asarray(docs["attention_mask"]),
        )
        fwd = lambda p, *a: forward_text_classification(p, bb, *a)

    def loss_fn(p):
        logits = fwd(p["backbone"], *inputs)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    tx = optax.adam(2e-4)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, loss

    losses = []
    for _ in range(15):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses

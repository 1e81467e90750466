"""Numerical parity of the JAX LayoutLMv3 against the HF torch implementation.

This is the hard correctness gate from SURVEY.md §7: exit/final logits must be
numerically close to the PyTorch reference implementation so the downstream
calibration/policy stack reproduces. Pretrained weights are unavailable
offline, so parity is checked on random-initialized torch models converted via
``convert_torch_state_dict`` — this exercises every weight and every op.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.layoutlmv3.configuration_layoutlmv3 import LayoutLMv3Config as HFConfig
from transformers.models.layoutlmv3.modeling_layoutlmv3 import (
    LayoutLMv3ForSequenceClassification,
    LayoutLMv3Model,
)

from multi_modal_early_exit_tpu.models.layoutlmv3 import (
    LayoutLMv3Config,
    backbone_apply,
    convert_torch_state_dict,
    forward_sequence_classification,
)
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    create_position_ids_from_input_ids,
    relative_position_bucket,
)


def tiny_cfg(num_labels=4):
    return LayoutLMv3Config.tiny(num_labels=num_labels)


def hf_cfg_from(cfg: LayoutLMv3Config, num_labels: int) -> "HFConfig":
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
        num_labels=num_labels,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout=0.0,
    )


def random_batch(cfg: LayoutLMv3Config, batch=2, seq=16, seed=0):
    rng = np.random.RandomState(seed)
    input_ids = rng.randint(3, cfg.vocab_size, size=(batch, seq)).astype(np.int64)
    # put some padding at the end of sample 1
    input_ids[1, seq - 4:] = cfg.pad_token_id
    attention_mask = (input_ids != cfg.pad_token_id).astype(np.int64)
    x0 = rng.randint(0, 900, size=(batch, seq))
    y0 = rng.randint(0, 900, size=(batch, seq))
    w = rng.randint(0, 100, size=(batch, seq))
    h = rng.randint(0, 100, size=(batch, seq))
    bbox = np.stack([x0, y0, x0 + w, y0 + h], axis=-1).astype(np.int64)
    pixel_values = rng.randn(batch, 3, cfg.input_size, cfg.input_size).astype(np.float32)
    return input_ids, bbox, attention_mask, pixel_values


def test_relative_position_bucket_matches_torch():
    from transformers.models.layoutlmv3.modeling_layoutlmv3 import LayoutLMv3Encoder

    hf = LayoutLMv3Encoder(hf_cfg_from(tiny_cfg(), 4))
    rel = np.arange(-300, 300).reshape(1, -1)
    got = relative_position_bucket(jnp.asarray(rel), 32, 128)
    want = hf.relative_position_bucket(torch.tensor(rel), num_buckets=32, max_distance=128)
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_position_ids_match_torch():
    from transformers.models.layoutlmv3.modeling_layoutlmv3 import LayoutLMv3TextEmbeddings

    cfg = tiny_cfg()
    emb = LayoutLMv3TextEmbeddings(hf_cfg_from(cfg, 4))
    ids = np.array([[5, 6, 7, 1, 1], [9, 1, 8, 7, 1]])
    got = create_position_ids_from_input_ids(jnp.asarray(ids), cfg.pad_token_id)
    want = emb.create_position_ids_from_input_ids(torch.tensor(ids), cfg.pad_token_id)
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


@pytest.mark.slow
@pytest.mark.parametrize("seq", [16, 12])
def test_backbone_parity(seq):
    cfg = tiny_cfg()
    hf_conf = hf_cfg_from(cfg, 4)
    torch.manual_seed(0)
    hf_model = LayoutLMv3Model(hf_conf).eval()

    params = convert_torch_state_dict(hf_model.state_dict(), cfg, prefix="")
    params = jax.tree.map(jnp.asarray, params)

    input_ids, bbox, attention_mask, pixel_values = random_batch(cfg, seq=seq)

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.tensor(input_ids),
            bbox=torch.tensor(bbox),
            attention_mask=torch.tensor(attention_mask),
            pixel_values=torch.tensor(pixel_values),
        ).last_hidden_state.numpy()

    out = backbone_apply(
        params, cfg,
        jnp.asarray(input_ids), jnp.asarray(bbox), jnp.asarray(pixel_values),
        jnp.asarray(attention_mask),
    )
    got = np.asarray(out.last_hidden_state)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_sequence_classification_parity():
    cfg = tiny_cfg(num_labels=7)
    hf_conf = hf_cfg_from(cfg, 7)
    torch.manual_seed(1)
    hf_model = LayoutLMv3ForSequenceClassification(hf_conf).eval()

    cfg = cfg.replace(num_labels=7)
    params = convert_torch_state_dict(hf_model.state_dict(), cfg, prefix="layoutlmv3.")
    params = jax.tree.map(jnp.asarray, params)

    input_ids, bbox, attention_mask, pixel_values = random_batch(cfg, seq=10, seed=3)

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.tensor(input_ids),
            bbox=torch.tensor(bbox),
            attention_mask=torch.tensor(attention_mask),
            pixel_values=torch.tensor(pixel_values),
        ).logits.numpy()

    got = np.asarray(
        forward_sequence_classification(
            params, cfg,
            jnp.asarray(input_ids), jnp.asarray(bbox), jnp.asarray(pixel_values),
            jnp.asarray(attention_mask),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_converter_round_trip_identity_base_size():
    """Exporter ∘ importer == identity at BASE size (VERDICT r3 #2a): the
    golden-base artifact is generated through the exporter
    (scripts/make_golden_base.py), so a transposition bug symmetric in both
    directions would make the golden test pass while real checkpoint
    imports were wrong. The round trip pins every leaf bit-exactly."""
    from multi_modal_early_exit_tpu.models.layoutlmv3.convert import (
        jax_params_to_torch_state_dict,
    )
    from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
        init_params,
    )

    cfg = LayoutLMv3Config.base(num_labels=16)
    params = init_params(jax.random.key(42), cfg)
    sd = jax_params_to_torch_state_dict(params, cfg)
    back = convert_torch_state_dict(sd, cfg, prefix="layoutlmv3.")

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (path_a, a), (path_b, b) in zip(flat_a, flat_b):
        assert path_a == path_b
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=str(path_a),
        )
    # and the state_dict covers the full HF module (no silently-dropped
    # weights): load into a real torch model strictly up to buffers
    hf_conf = hf_cfg_from(cfg, 16)
    model = LayoutLMv3ForSequenceClassification(hf_conf)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    real_missing = [m for m in missing if not m.endswith("position_ids")]
    assert not real_missing, real_missing
    assert not unexpected, unexpected

"""Generate the base-config golden parity artifact (run ONCE, output checked
in at tests/golden/layoutlmv3_base_golden.npz).

Closes the BASELINE.md logit-parity target at the *reference* model size:
``microsoft/layoutlmv3-base`` shape (12 layers, hidden 768), 512 text + 197
visual tokens (reference: EE/configs.py:399, EE/data/RVL_CDIP.py:98).
Pretrained weights are unavailable offline, so the weights are a seeded
random init — but generated on the JAX side (``init_params(key(42))``, which
is reproducible forever from the seed) and converted JAX->torch here, so the
parity test needs NO torch at test time: it rebuilds the params from the
seed and compares against the stored torch outputs.

Usage: python scripts/make_golden_base.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from multi_modal_early_exit_tpu.models.layoutlmv3.convert import (
    jax_params_to_torch_state_dict,
)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import torch
    from transformers.models.layoutlmv3.configuration_layoutlmv3 import (
        LayoutLMv3Config as HFConfig,
    )
    from transformers.models.layoutlmv3.modeling_layoutlmv3 import (
        LayoutLMv3ForSequenceClassification,
    )

    from multi_modal_early_exit_tpu.models.layoutlmv3.config import LayoutLMv3Config
    from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import init_params

    cfg = LayoutLMv3Config.base(num_labels=16)
    params = init_params(jax.random.key(42), cfg)

    hf_conf = HFConfig(
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
        num_labels=cfg.num_labels,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    torch.manual_seed(0)
    model = LayoutLMv3ForSequenceClassification(hf_conf).eval()
    sd = jax_params_to_torch_state_dict(params, cfg)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # only buffers (position_ids etc.) may be missing
    real_missing = [m for m in missing if not m.endswith("position_ids")]
    assert not real_missing, f"missing weights: {real_missing}"
    assert not unexpected, f"unexpected: {unexpected}"

    # reference-budget inputs: 512 text tokens (with a padded tail on half
    # the batch) + 197 visual tokens from 224x224 pixels
    rng = np.random.RandomState(7)
    batch, seq = 2, 512
    input_ids = rng.randint(3, cfg.vocab_size, size=(batch, seq)).astype(np.int64)
    input_ids[1, seq - 57:] = cfg.pad_token_id
    attention_mask = (input_ids != cfg.pad_token_id).astype(np.int64)
    x0 = rng.randint(0, 900, size=(batch, seq))
    y0 = rng.randint(0, 900, size=(batch, seq))
    bbox = np.stack(
        [x0, y0, x0 + rng.randint(0, 100, size=(batch, seq)),
         y0 + rng.randint(0, 100, size=(batch, seq))], axis=-1
    ).astype(np.int64)
    pixel_values = rng.randn(batch, 3, cfg.input_size, cfg.input_size).astype(
        np.float32
    )

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(input_ids),
            bbox=torch.tensor(bbox),
            attention_mask=torch.tensor(attention_mask),
            pixel_values=torch.tensor(pixel_values),
            output_hidden_states=True,
        )
    logits = out.logits.numpy()
    # per-layer [CLS] states: the exact tap points of the EE encoder exits
    # (reference: EE/models/LayoutLMv3.py:226)
    cls_per_layer = np.stack(
        [h[:, 0, :].numpy() for h in out.hidden_states[1:]], axis=0
    )
    last_hidden = out.hidden_states[-1].numpy()

    out_path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "layoutlmv3_base_golden.npz",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(
        out_path,
        input_ids=input_ids.astype(np.int32),
        bbox=bbox.astype(np.int32),
        attention_mask=attention_mask.astype(np.int32),
        pixel_values=pixel_values,
        logits=logits,
        cls_per_layer=cls_per_layer.astype(np.float32),
        last_hidden_cls=last_hidden[:, 0, :].astype(np.float32),
        jax_seed=np.int32(42),
        torch_version=np.bytes_(torch.__version__.encode()),
    )
    print("wrote", out_path, os.path.getsize(out_path) / 1e6, "MB")
    print("logits[0,:4] =", logits[0, :4])


if __name__ == "__main__":
    main()

"""Real-weights parity gate: microsoft/layoutlmv3-base torch vs this framework.

The reference's operating regime is fine-tuning pretrained
``microsoft/layoutlmv3-base`` (EE/configs.py:399-409). This environment is
zero-egress, so the run is gated on a local HF cache (or an explicit
checkpoint path); when weights are available the script

  1. loads the torch model,
  2. imports its state_dict through ``convert_torch_state_dict``,
  3. runs both forwards on a reference-budget batch (512 text tokens + 197
     visual tokens, half-padded sample included),
  4. asserts logit + per-layer [CLS] parity, and
  5. writes ``PRETRAINED_PARITY.json`` next to the repo root.

Usage:
    python scripts/check_pretrained_parity.py [model_name_or_path]

Exit codes: 0 parity ok, 2 weights unavailable (skipped), 1 parity FAILED.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT_MODEL = "microsoft/layoutlmv3-base"
ATOL, RTOL = 2e-4, 1e-3


def load_torch_model(name_or_path: str):
    """Load the HF torch model from the local cache only (zero egress)."""
    from transformers.models.layoutlmv3.modeling_layoutlmv3 import (
        LayoutLMv3Model,
    )

    kwargs = {}
    if not os.path.isdir(name_or_path):
        kwargs["local_files_only"] = True
    return LayoutLMv3Model.from_pretrained(name_or_path, **kwargs).eval()


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_MODEL
    try:
        model = load_torch_model(name)
    except Exception as e:
        print(
            f"SKIP: pretrained weights for {name!r} not available locally "
            f"({type(e).__name__}: {e}). Populate the HF cache (or pass a "
            f"checkpoint dir) and re-run.",
            file=sys.stderr,
        )
        return 2

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch

    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        LayoutLMv3Config,
    )
    from multi_modal_early_exit_tpu.models.layoutlmv3.convert import (
        convert_torch_state_dict,
    )
    from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
        backbone_apply,
    )

    hfc = model.config
    cfg = LayoutLMv3Config.base().replace(
        vocab_size=hfc.vocab_size,
        hidden_size=hfc.hidden_size,
        num_hidden_layers=hfc.num_hidden_layers,
        num_attention_heads=hfc.num_attention_heads,
        intermediate_size=hfc.intermediate_size,
        max_position_embeddings=hfc.max_position_embeddings,
    )
    params = convert_torch_state_dict(model.state_dict(), cfg, prefix="")
    params = jax.tree.map(jnp.asarray, params)

    # reference-budget batch (512 text + 197 visual), half-padded sample
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
    want_last = out.last_hidden_state.numpy()
    want_cls = np.stack(
        [h[:, 0, :].numpy() for h in out.hidden_states[1:]], axis=0
    )

    got = backbone_apply(
        params, cfg,
        jnp.asarray(input_ids), jnp.asarray(bbox), jnp.asarray(pixel_values),
        jnp.asarray(attention_mask), collect_cls=True,
    )
    got_last = np.asarray(got.last_hidden_state)
    got_cls = np.asarray(got.cls_per_layer)

    max_abs = float(np.max(np.abs(got_last - want_last)))
    max_abs_cls = float(np.max(np.abs(got_cls - want_cls)))
    ok = bool(
        np.allclose(got_last, want_last, atol=ATOL, rtol=RTOL)
        and np.allclose(got_cls, want_cls, atol=ATOL, rtol=RTOL)
    )
    artifact = {
        "model": name,
        "ok": ok,
        "max_abs_diff_last_hidden": max_abs,
        "max_abs_diff_cls_per_layer": max_abs_cls,
        "atol": ATOL,
        "rtol": RTOL,
        "batch": batch,
        "seq": seq,
        "torch_version": torch.__version__,
    }
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "PRETRAINED_PARITY.json"
    )
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Model registry/builder (parity: ``build_model``, EE/configs.py:361-515).

Model names supported by the reference and their equivalents here:

- ``EElayoutlmv3``   early-exit LayoutLMv3 (the flagship)
- ``LTElayoutlmv3``  EE LayoutLMv3 with learning-to-exit heads enabled
                     (the reference's default model name whose class file is
                     missing — LTE actually lives in the encoder; here it is
                     simply use_lte=True)
- ``layoutlmv3``     dense LayoutLMv3 classifier, no exits
- ``dit`` / ``dit_rvl``  image-only ViT-style classifier (vision tower only)
- ``bert``           text-only encoder classifier (no visual tokens, no 2D
                     bias)
- ``layoutlmv2``     approximated by the layoutlmv3 architecture (the
                     reference only uses it through HF AutoModel; the fused
                     text+layout+vision design here subsumes it)
- ``pix2struct``     NotImplementedError (parity: EE/configs.py:508)

When a HuggingFace torch checkpoint is available locally (zero-egress cache),
``model_weights`` is converted into the pytree via convert.py; otherwise
parameters are randomly initialized.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
    EEModelConfig,
    LayoutLMv3Config,
)

Params = Dict[str, Any]

MODEL_NAMES = (
    "EElayoutlmv3", "LTElayoutlmv3", "layoutlmv3", "dit", "dit_rvl",
    "bert", "layoutlmv2", "pix2struct",
)


def _backbone_config(
    cfg, num_labels: int, image_size: Optional[int], seq_len: Optional[int]
) -> LayoutLMv3Config:
    size = getattr(cfg, "model_size", "base")
    if size == "tiny":
        # widen the vocab to the tokenizer's range: the data layer's
        # HashWordTokenizer emits ids in [0, 50265) regardless of model size
        bb = LayoutLMv3Config.tiny(num_labels=num_labels).replace(
            vocab_size=LayoutLMv3Config.base().vocab_size
        )
    elif size == "base":
        bb = LayoutLMv3Config.base(num_labels=num_labels)
    else:
        raise ValueError(f"unknown model_size {size!r} (want 'base'/'tiny')")
    if image_size and image_size != bb.input_size:
        bb = bb.replace(input_size=image_size)
    if seq_len and seq_len > bb.max_position_embeddings - 2:
        bb = bb.replace(max_position_embeddings=seq_len + 2)
    fold = int(getattr(cfg, "scan_fold", 1) or 1)
    if fold > 1:
        bb = bb.replace(scan_fold=fold)
    return bb


def _maybe_load_pretrained(bb: LayoutLMv3Config, weights: str) -> Optional[Params]:
    """Convert a locally-cached torch checkpoint; None when unavailable.

    Distinguishes "checkpoint not cached" (expected in zero-egress
    environments: silent random-init fallback, as the trainer will warn) from
    "conversion failed" (a real bug: loudly logged so it cannot degrade to
    random weights unnoticed)."""
    try:
        import torch  # noqa: F401
        from transformers import LayoutLMv3Model

        from multi_modal_early_exit_tpu.models.layoutlmv3.convert import (
            convert_torch_state_dict,
        )
    except Exception:
        return None  # torch/transformers absent: hermetic random init
    try:
        hf = LayoutLMv3Model.from_pretrained(weights, local_files_only=True)
    except Exception:
        from multi_modal_early_exit_tpu.utils.logging import logger_message

        logger_message(
            f"pretrained weights '{weights}' not in the local cache; "
            "using random initialization",
            type="warning",
        )
        return None
    try:
        return convert_torch_state_dict(hf.state_dict(), bb, prefix="")
    except Exception as e:
        from multi_modal_early_exit_tpu.utils.logging import logger_message

        logger_message(
            f"FAILED converting pretrained weights '{weights}' ({e!r}); "
            "falling back to random initialization — fix the converter!",
            type="error",
        )
        return None


def _maybe_load_pretrained_v2(v2, weights: str) -> Optional[Params]:
    """v2 twin of _maybe_load_pretrained: convert a locally-cached torch
    LayoutLMv2 checkpoint (transformer side only — the detectron2 visual
    tower keeps its JAX init, see layoutlmv2/convert.py docstring)."""
    try:
        from transformers import LayoutLMv2Model

        from multi_modal_early_exit_tpu.models.layoutlmv2.convert import (
            convert_v2_torch_state_dict,
        )
    except Exception:
        return None
    try:
        hf = LayoutLMv2Model.from_pretrained(weights, local_files_only=True)
    except Exception:
        return None
    try:
        return convert_v2_torch_state_dict(hf.state_dict(), v2, prefix="")
    except Exception as e:
        from multi_modal_early_exit_tpu.utils.logging import logger_message

        logger_message(
            f"FAILED converting v2 weights '{weights}' ({e!r}); random init",
            type="error",
        )
        return None


def pad_embedding_tables(pre: Params, init: Params) -> Params:
    """Pad pretrained embedding tables up to the (wider) initialized ones.

    When the runtime config widens a table beyond the checkpoint — vocab to
    the hermetic tokenizer range, positions when seq_len pushes
    max_position_embeddings past the checkpoint's — the pretrained rows
    occupy the front and the random-init tail is kept; a short table would
    make the embedding gather silently CLAMP out-of-range ids onto its
    last row. Non-2D leaves (LayerNorm) and matching shapes pass through."""
    import numpy as np

    out = dict(pre)
    for key_name, arr in pre.items():
        init_arr = init.get(key_name)
        if (
            key_name != "LayerNorm"
            and init_arr is not None
            and np.ndim(arr) == 2
            and arr.shape[0] < np.shape(init_arr)[0]
            and arr.shape[1] == np.shape(init_arr)[1]
        ):
            full = np.asarray(init_arr).copy()
            full[: arr.shape[0]] = arr
            out[key_name] = full
    return out


def infer_backbone_config(
    params: Params, base: Optional[LayoutLMv3Config] = None
) -> LayoutLMv3Config:
    """Reconstruct the backbone config from a parameter pytree's shapes.

    Every shape-bearing field (vocab, hidden, layers, heads, intermediate,
    coordinate/shape sizes, positions, patch/input size, bias bins, labels)
    is read off the arrays; non-shape hyperparameters (dropouts, eps,
    max_rel distances) come from ``base`` (defaults: base()). Used by
    serving.Pipeline.from_checkpoint so restored models always match their
    weights regardless of what the saved config recorded.
    """
    import numpy as np

    base = base or LayoutLMv3Config.base()
    bb = params["backbone"] if "backbone" in params else params
    enc = bb["encoder"]
    layers = enc["layers"]
    hidden = int(np.shape(layers["intermediate"]["kernel"])[1])
    kwargs = dict(
        hidden_size=hidden,
        num_hidden_layers=int(
            np.shape(jax.tree.leaves(layers)[0])[0]
        ),
        intermediate_size=int(np.shape(layers["intermediate"]["bias"])[1]),
        has_relative_attention_bias="rel_pos_bias" in enc,
        has_spatial_attention_bias="rel_pos_x_bias" in enc,
    )
    if "embeddings" in bb:  # text tower present (absent on dit checkpoints)
        emb = bb["embeddings"]
        kwargs.update(
            vocab_size=int(np.shape(emb["word_embeddings"])[0]),
            max_position_embeddings=int(
                np.shape(emb["position_embeddings"])[0]
            ),
            max_2d_position_embeddings=int(
                np.shape(emb["x_position_embeddings"])[0]
            ),
            coordinate_size=int(np.shape(emb["x_position_embeddings"])[1]),
            shape_size=int(np.shape(emb["h_position_embeddings"])[1]),
        )
    if "visual" in bb:  # vision tower present (absent on bert checkpoints)
        patch_kernel_in = int(
            np.shape(bb["visual"]["patch_embed"]["kernel"])[0]
        )
        patch_size = int(round((patch_kernel_in / 3) ** 0.5))
        n_patches = int(np.shape(bb["visual"]["pos_embed"])[1]) - 1
        input_size = int(round(n_patches ** 0.5)) * patch_size
        kwargs.update(patch_size=patch_size, input_size=input_size)
    if "classifier" in bb:
        kwargs["num_labels"] = int(
            np.shape(bb["classifier"]["out_proj"]["bias"])[0]
        )
    if "rel_pos_bias" in enc:
        kwargs["rel_pos_bins"] = int(np.shape(enc["rel_pos_bias"])[0])
        kwargs["num_attention_heads"] = int(np.shape(enc["rel_pos_bias"])[1])
    else:
        # heads not shape-inferable without bias tables; keep base ratio
        kwargs["num_attention_heads"] = max(hidden // base.head_dim, 1)
    if "rel_pos_x_bias" in enc:
        kwargs["rel_2d_pos_bins"] = int(np.shape(enc["rel_pos_x_bias"])[0])
    return base.replace(**kwargs)


def build_model(
    cfg,
    num_labels: int = 16,
    num_hidden_layers: Optional[int] = None,
    image_size: Optional[int] = None,
    seq_len: Optional[int] = None,
    rng: Optional[jax.Array] = None,
) -> Tuple[EEModelConfig, Params]:
    """Build (model config, params) from an ExperimentConfig-like object."""
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import init_params

    name = cfg.model
    if name not in MODEL_NAMES:
        raise ValueError(f"unknown model {name!r}; available: {MODEL_NAMES}")
    if name == "pix2struct":
        raise NotImplementedError(
            "pix2struct is not implemented (parity: EE/configs.py:508)"
        )

    rng = rng if rng is not None else jax.random.key(cfg.seed)
    bb = _backbone_config(cfg, num_labels, image_size, seq_len)
    if num_hidden_layers:
        bb = bb.replace(num_hidden_layers=num_hidden_layers)

    if name in ("dit", "dit_rvl"):
        # image-only: no text embeddings used at runtime; disable the 1D/2D
        # relative bias like a plain ViT
        bb = bb.replace(
            has_relative_attention_bias=False, has_spatial_attention_bias=False
        )
    if name == "bert":
        bb = bb.replace(has_spatial_attention_bias=False)

    exit_cfg = cfg.exit_config() if hasattr(cfg, "exit_config") else ExitConfig()
    if name == "LTElayoutlmv3":
        exit_cfg = ExitConfig(**{**exit_cfg.to_dict(), "use_lte": True})
    if name == "layoutlmv2":
        # The GENUINE v2 architecture (models/layoutlmv2): ResNeXt-FPN
        # visual tower pooled to the 7x7 grid, visual-grid spatial
        # embeddings, unscaled relative bias, 3x-hidden concat classifier
        # (parity: HF LayoutLMv2ForSequenceClassification; the reference
        # builds it through AutoModel, EE/configs.py:451-462). Returns a
        # (LayoutLMv2Config, params) bundle — a dense baseline with no EE
        # heads; train it via make_train_step(loss_fn=
        # layoutlmv2.sequence_classification_loss).
        from multi_modal_early_exit_tpu.models.layoutlmv2 import (
            LayoutLMv2Config,
        )
        from multi_modal_early_exit_tpu.models.layoutlmv2.modeling import (
            init_params as init_v2_params,
        )

        size = getattr(cfg, "model_size", "base")
        v2 = (LayoutLMv2Config.tiny if size == "tiny" else LayoutLMv2Config.base)(
            num_labels=num_labels
        )
        if num_hidden_layers:
            v2 = v2.replace(num_hidden_layers=num_hidden_layers)
        if image_size and image_size != v2.input_size:
            v2 = v2.replace(input_size=image_size)
        if seq_len and seq_len > v2.max_position_embeddings - 2:
            v2 = v2.replace(max_position_embeddings=seq_len + 2)
        # widen the vocab to the hermetic data layer's tokenizer range: the
        # HashWordTokenizer emits ids in [0, 50265) regardless of model, so a
        # 30522-row v2 table would silently clamp ~40% of ids onto its last
        # row. Pretrained rows (if any) occupy the first 30522 slots; the
        # widened tail keeps its random init.
        tok_vocab = LayoutLMv3Config.base().vocab_size  # 50265
        v2 = v2.replace(vocab_size=max(v2.vocab_size, tok_vocab))
        params = init_v2_params(rng, v2)
        weights = getattr(cfg, "model_weights", "") or ""
        if "layoutlmv3" in weights:
            # the experiment default names the v3 checkpoint; v2 loads its own
            # (parity: EE/configs.py:451-462 from_pretrained layoutlmv2-base)
            weights = "microsoft/layoutlmv2-base-uncased"
        if weights and size == "base":
            pre = _maybe_load_pretrained_v2(v2, weights)
            if pre is not None:
                pre.pop("classifier", None)  # label count differs per dataset
                if "embeddings" in pre:
                    pre["embeddings"] = pad_embedding_tables(
                        pre["embeddings"], params["embeddings"]
                    )
                params.update(jax.tree.map(jnp.asarray, pre))
            else:
                from multi_modal_early_exit_tpu.utils.logging import (
                    logger_message,
                )

                logger_message(
                    "layoutlmv2 baseline trains from RANDOM init (pretrained "
                    f"'{weights}' unavailable) — numbers are not comparable "
                    "to the reference's from_pretrained baseline",
                    type="warning",
                )
        return v2, params

    if name in ("layoutlmv3", "dit", "dit_rvl", "bert"):
        # dense models: no exits; single-modality variants only allocate the
        # tower they use (dit has no word/layout embeddings, bert no visual
        # patch tower — reference: EE/configs.py:429-449, 482-493)
        model_cfg = EEModelConfig(backbone=bb, exit=ExitConfig(exits=()))
        params: Params = {
            "backbone": init_params(
                rng, bb,
                with_text=name not in ("dit", "dit_rvl"),
                with_vision=name != "bert",
            )
        }
    else:
        model_cfg = EEModelConfig(backbone=bb, exit=exit_cfg)
        params = init_ee_params(rng, model_cfg)

    weights = getattr(cfg, "model_weights", "") or ""
    if (
        weights and bb.input_size == 224
        and getattr(cfg, "model_size", "base") == "base"
    ):
        pretrained = _maybe_load_pretrained(bb, weights)
        if pretrained is not None:
            classifier = params["backbone"].get("classifier")
            pretrained["classifier"] = classifier
            params["backbone"] = jax.tree.map(
                jnp.asarray, pretrained
            )
    return model_cfg, params

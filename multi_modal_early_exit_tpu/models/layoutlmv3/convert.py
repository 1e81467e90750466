"""Convert HuggingFace torch LayoutLMv3 checkpoints to this framework's pytree.

Used both for loading pretrained ``microsoft/layoutlmv3-base`` weights (when
available on disk) and as the numerical-parity bridge in tests: a random-init
torch ``LayoutLMv3ForSequenceClassification`` converted here must produce
logits identical to ``forward_sequence_classification`` (float32 tolerance).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from multi_modal_early_exit_tpu.models.layoutlmv3.config import LayoutLMv3Config

Params = Dict[str, Any]


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (works for plain numpy too)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: Mapping[str, Any], prefix: str) -> Params:
    return {
        "kernel": _t(sd[f"{prefix}.weight"]).T.copy(),
        "bias": _t(sd[f"{prefix}.bias"]).copy(),
    }


def _layer_norm(sd: Mapping[str, Any], prefix: str) -> Params:
    return {
        "scale": _t(sd[f"{prefix}.weight"]).copy(),
        "bias": _t(sd[f"{prefix}.bias"]).copy(),
    }


def convert_torch_state_dict(
    sd: Mapping[str, Any], cfg: LayoutLMv3Config, prefix: str = "layoutlmv3."
) -> Params:
    """Map an HF ``LayoutLMv3ForSequenceClassification`` (or bare
    ``LayoutLMv3Model`` with ``prefix=""``) state_dict onto our param pytree."""
    p = prefix

    emb = f"{p}embeddings."
    embeddings = {
        "word_embeddings": _t(sd[f"{emb}word_embeddings.weight"]).copy(),
        "position_embeddings": _t(sd[f"{emb}position_embeddings.weight"]).copy(),
        "token_type_embeddings": _t(sd[f"{emb}token_type_embeddings.weight"]).copy(),
        "x_position_embeddings": _t(sd[f"{emb}x_position_embeddings.weight"]).copy(),
        "y_position_embeddings": _t(sd[f"{emb}y_position_embeddings.weight"]).copy(),
        "h_position_embeddings": _t(sd[f"{emb}h_position_embeddings.weight"]).copy(),
        "w_position_embeddings": _t(sd[f"{emb}w_position_embeddings.weight"]).copy(),
        "LayerNorm": _layer_norm(sd, f"{emb}LayerNorm"),
    }

    # Conv2d (O, C, kh, kw) -> unfold matmul kernel ((C*kh*kw), O); the patch
    # extractor flattens in (c, ph, pw) order which matches this reshape.
    conv_w = _t(sd[f"{p}patch_embed.proj.weight"])
    o = conv_w.shape[0]
    visual = {
        "patch_embed": {
            "kernel": conv_w.reshape(o, -1).T.copy(),
            "bias": _t(sd[f"{p}patch_embed.proj.bias"]).copy(),
        },
        "cls_token": _t(sd[f"{p}cls_token"]).copy(),
        "pos_embed": _t(sd[f"{p}pos_embed"]).copy(),
        "norm": _layer_norm(sd, f"{p}norm"),
    }

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{p}encoder.layer.{i}."
        layers.append(
            {
                "attention": {
                    "query": _linear(sd, f"{lp}attention.self.query"),
                    "key": _linear(sd, f"{lp}attention.self.key"),
                    "value": _linear(sd, f"{lp}attention.self.value"),
                    "output": _linear(sd, f"{lp}attention.output.dense"),
                    "output_LayerNorm": _layer_norm(sd, f"{lp}attention.output.LayerNorm"),
                },
                "intermediate": _linear(sd, f"{lp}intermediate.dense"),
                "output": _linear(sd, f"{lp}output.dense"),
                "output_LayerNorm": _layer_norm(sd, f"{lp}output.LayerNorm"),
            }
        )
    import jax

    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)

    encoder: Params = {"layers": stacked}
    if cfg.has_relative_attention_bias:
        encoder["rel_pos_bias"] = _t(sd[f"{p}encoder.rel_pos_bias.weight"]).T.copy()
    if cfg.has_spatial_attention_bias:
        encoder["rel_pos_x_bias"] = _t(sd[f"{p}encoder.rel_pos_x_bias.weight"]).T.copy()
        encoder["rel_pos_y_bias"] = _t(sd[f"{p}encoder.rel_pos_y_bias.weight"]).T.copy()

    params: Params = {
        "embeddings": embeddings,
        "visual": visual,
        "LayerNorm": _layer_norm(sd, f"{p}LayerNorm"),
        "encoder": encoder,
    }

    if "classifier.dense.weight" in sd:
        params["classifier"] = {
            "dense": _linear(sd, "classifier.dense"),
            "out_proj": _linear(sd, "classifier.out_proj"),
        }
    return params


# ---------------------------------------------------------------------------
# exporter (inverse direction): JAX pytree -> HF torch state_dict
# ---------------------------------------------------------------------------

def _layer_slice(tree: Mapping[str, Any], i: int) -> Params:
    return {k: np.asarray(v)[i] for k, v in tree.items()}


def jax_params_to_torch_state_dict(
    params: Params, cfg: LayoutLMv3Config, prefix: str = "layoutlmv3."
) -> Dict[str, Any]:
    """Exact inverse of :func:`convert_torch_state_dict`: export our param
    pytree as an HF ``LayoutLMv3ForSequenceClassification`` state_dict.

    Used by scripts/make_golden_base.py to generate torch-side golden
    outputs from a seeded JAX init, and round-trip-tested against the
    importer (tests/test_model_parity.py) so a transposition bug symmetric
    in both directions cannot hide: the composition must be the identity
    on every leaf."""
    import torch

    sd: Dict[str, Any] = {}

    def t(x):
        return torch.tensor(np.asarray(x, np.float32))

    def put_linear(pfx, p):
        sd[f"{pfx}.weight"] = t(np.asarray(p["kernel"]).T)
        sd[f"{pfx}.bias"] = t(p["bias"])

    def put_ln(pfx, p):
        sd[f"{pfx}.weight"] = t(p["scale"])
        sd[f"{pfx}.bias"] = t(p["bias"])

    pre = prefix
    emb = params["embeddings"]
    for name in (
        "word_embeddings", "position_embeddings", "token_type_embeddings",
        "x_position_embeddings", "y_position_embeddings",
        "h_position_embeddings", "w_position_embeddings",
    ):
        sd[f"{pre}embeddings.{name}.weight"] = t(emb[name])
    put_ln(f"{pre}embeddings.LayerNorm", emb["LayerNorm"])

    vis = params["visual"]
    kern = np.asarray(vis["patch_embed"]["kernel"])  # (C*ph*pw, O)
    o = kern.shape[1]
    sd[f"{pre}patch_embed.proj.weight"] = t(
        kern.T.reshape(o, cfg.num_channels, cfg.patch_size, cfg.patch_size)
    )
    sd[f"{pre}patch_embed.proj.bias"] = t(vis["patch_embed"]["bias"])
    sd[f"{pre}cls_token"] = t(vis["cls_token"])
    sd[f"{pre}pos_embed"] = t(vis["pos_embed"])
    put_ln(f"{pre}norm", vis["norm"])
    put_ln(f"{pre}LayerNorm", params["LayerNorm"])

    enc = params["encoder"]
    for i in range(cfg.num_hidden_layers):
        lp = f"{pre}encoder.layer.{i}."
        att = enc["layers"]["attention"]
        put_linear(f"{lp}attention.self.query", _layer_slice(att["query"], i))
        put_linear(f"{lp}attention.self.key", _layer_slice(att["key"], i))
        put_linear(f"{lp}attention.self.value", _layer_slice(att["value"], i))
        put_linear(f"{lp}attention.output.dense", _layer_slice(att["output"], i))
        put_ln(f"{lp}attention.output.LayerNorm",
               _layer_slice(att["output_LayerNorm"], i))
        put_linear(f"{lp}intermediate.dense",
                   _layer_slice(enc["layers"]["intermediate"], i))
        put_linear(f"{lp}output.dense", _layer_slice(enc["layers"]["output"], i))
        put_ln(f"{lp}output.LayerNorm",
               _layer_slice(enc["layers"]["output_LayerNorm"], i))
    if cfg.has_relative_attention_bias:
        sd[f"{pre}encoder.rel_pos_bias.weight"] = t(
            np.asarray(enc["rel_pos_bias"]).T
        )
    if cfg.has_spatial_attention_bias:
        sd[f"{pre}encoder.rel_pos_x_bias.weight"] = t(
            np.asarray(enc["rel_pos_x_bias"]).T
        )
        sd[f"{pre}encoder.rel_pos_y_bias.weight"] = t(
            np.asarray(enc["rel_pos_y_bias"]).T
        )

    if "classifier" in params:
        put_linear("classifier.dense", params["classifier"]["dense"])
        put_linear("classifier.out_proj", params["classifier"]["out_proj"])
    return sd

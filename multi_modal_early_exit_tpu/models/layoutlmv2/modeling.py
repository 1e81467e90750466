"""LayoutLMv2 in pure-functional JAX, designed TPU-first.

Parity target: HF ``LayoutLMv2ForSequenceClassification``
(microsoft/layoutlmv2-base-uncased) — the model the reference instantiates
through AutoModel (EE/configs.py:451-462). The reference never trains v2
through its EE machinery; this implements the genuine dense architecture so
a reference user switching frameworks finds the real v2, not a v3 stand-in.

What is shared with the v3 implementation (bit-identical machinery):
- the encoder stack (post-LN layers, exact GELU) — v3 inherited v2's
  layer design, so ``layoutlmv3.modeling.{init_encoder, encoder_apply}``
  run v2's encoder, including the packed flash-attention kernels;
- the relative 1D/2D attention bias — v2 defined the bucketing that v3
  reuses (HF modeling_layoutlmv2.relative_position_bucket; cx = bbox x0,
  cy = bbox y1), so ``make_attention_bias``/``kernel_attention_bias``
  apply unchanged;
- the text-embedding parameter structure (word/pos/token_type + 6-way
  concat spatial embeddings) — ``init_text_embeddings`` +
  ``spatial_position_embeddings`` are reused; only position-id semantics
  differ (v2: plain arange; v3: RoBERTa skip-padding).

What is genuinely v2 and implemented here:
- the visual tower: a ResNeXt-FPN (bottleneck stages with grouped 3x3
  convs and frozen-BN affines, FPN lateral+top-down, the p2 level
  average-pooled to the 7x7 ``image_feature_pool_shape`` grid), projected
  to hidden size — TPU-native ``lax.conv_general_dilated`` NCHW convs
  (MXU) instead of detectron2 (HF modeling_layoutlmv2.LayoutLMv2VisualBackbone);
- visual-token embeddings: pooled features + 1D position embeddings +
  spatial embeddings of the 7x7 visual-grid boxes, with a SEPARATE
  visual LayerNorm (HF LayoutLMv2Model._calc_img_embeddings);
- fast_qkv: HF stores one (H, 3H) qkv matrix with q/v biases only; the
  converter folds it into the standard q/k/v parameter layout (k bias 0),
  which is mathematically identical (HF LayoutLMv2SelfAttention.compute_qkv);
- the classification head: concat([CLS final, mean(initial visual emb),
  mean(final visual emb)]) -> dropout -> Linear(3H, K)
  (HF LayoutLMv2ForSequenceClassification.forward).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multi_modal_early_exit_tpu.models.layoutlmv2.config import LayoutLMv2Config
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (
    RngStream,
    _normal,
    dropout,
    encoder_apply,
    init_encoder,
    init_linear,
    init_layer_norm,
    init_text_embeddings,
    kernel_attention_bias,
    layer_norm,
    linear,
    make_attention_bias,
    spatial_position_embeddings,
)
from multi_modal_early_exit_tpu.ops.flash_attention import use_flash_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# visual tower: ResNeXt-FPN with frozen-BN affines (detectron2 equivalent)
# ---------------------------------------------------------------------------

def _conv_init(key, c_out: int, c_in: int, k: int, std: float, dtype):
    # OIHW layout, matching torch Conv2d weights for conversion
    return _normal(key, (c_out, c_in, k, k), std, dtype)


def init_frozen_bn(c: int, dtype=jnp.float32) -> Params:
    """detectron2 FrozenBatchNorm2d: buffers are constants, so at apply
    time it is a per-channel affine y = x*scale + bias with
    scale = w/sqrt(var+eps), bias = b - mean*scale (folded at conversion;
    identity at random init)."""
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def frozen_bn(p: Params, x: jax.Array) -> jax.Array:
    return x * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]


def conv2d(w: jax.Array, x: jax.Array, stride: int = 1, groups: int = 1,
           padding: str | int = 0) -> jax.Array:
    pad = padding if isinstance(padding, str) else [(padding, padding)] * 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )


def init_bottleneck(key, c_in: int, c_mid: int, c_out: int, groups: int,
                    stride: int, std: float, dtype) -> Params:
    k = jax.random.split(key, 4)
    p: Params = {
        "conv1": _conv_init(k[0], c_mid, c_in, 1, std, dtype),
        "bn1": init_frozen_bn(c_mid, dtype),
        "conv2": _conv_init(k[1], c_mid, c_mid // groups, 3, std, dtype),
        "bn2": init_frozen_bn(c_mid, dtype),
        "conv3": _conv_init(k[2], c_out, c_mid, 1, std, dtype),
        "bn3": init_frozen_bn(c_out, dtype),
    }
    if stride != 1 or c_in != c_out:
        p["shortcut"] = _conv_init(k[3], c_out, c_in, 1, std, dtype)
        p["shortcut_bn"] = init_frozen_bn(c_out, dtype)
    return p


def bottleneck_apply(p: Params, x: jax.Array, groups: int, stride: int) -> jax.Array:
    out = jax.nn.relu(frozen_bn(p["bn1"], conv2d(p["conv1"], x)))
    out = jax.nn.relu(frozen_bn(
        p["bn2"], conv2d(p["conv2"], out, stride=stride, groups=groups, padding=1)
    ))
    out = frozen_bn(p["bn3"], conv2d(p["conv3"], out))
    if "shortcut" in p:
        x = frozen_bn(p["shortcut_bn"], conv2d(p["shortcut"], x, stride=stride))
    return jax.nn.relu(out + x)


def init_visual_backbone(key, cfg: LayoutLMv2Config, dtype=jnp.float32) -> Params:
    std = cfg.initializer_range
    keys = jax.random.split(key, 2 + len(cfg.backbone_depths) * 2)
    stem_c = cfg.backbone_stem_channels
    p: Params = {
        "stem_conv": _conv_init(keys[0], stem_c, 3, 7, std, dtype),
        "stem_bn": init_frozen_bn(stem_c, dtype),
        # detectron2 normalizes inside the backbone (BGR means/stds)
        "pixel_mean": jnp.asarray([103.53, 116.28, 123.675], dtype)[None, :, None, None],
        "pixel_std": jnp.asarray([57.375, 57.12, 58.395], dtype)[None, :, None, None],
    }
    c_in = stem_c
    stages = []
    fpn_lateral = []
    for s, depth in enumerate(cfg.backbone_depths):
        c_mid = cfg.backbone_groups * cfg.backbone_width_per_group * (2 ** s)
        c_out = stem_c * 4 * (2 ** s)
        blocks = []
        for b in range(depth):
            blocks.append(init_bottleneck(
                jax.random.fold_in(keys[1 + s], b), c_in, c_mid, c_out,
                cfg.backbone_groups, stride=2 if (b == 0 and s > 0) else 1,
                std=std, dtype=dtype,
            ))
            c_in = c_out
        stages.append(blocks)
        klat = jax.random.fold_in(keys[1 + len(cfg.backbone_depths) + s], 0)
        fpn_lateral.append({
            "conv": _conv_init(klat, cfg.fpn_channels, c_out, 1, std, dtype),
            "bias": jnp.zeros((cfg.fpn_channels,), dtype),
        })
    p["stages"] = stages
    p["fpn_lateral"] = fpn_lateral
    # only the finest level ("p2") is consumed downstream — allocate just
    # its 3x3 output conv (no unused per-level parameters)
    p["fpn_output_p2"] = {
        "conv": _conv_init(
            jax.random.fold_in(keys[-1], 7), cfg.fpn_channels,
            cfg.fpn_channels, 3, std, dtype,
        ),
        "bias": jnp.zeros((cfg.fpn_channels,), dtype),
    }
    return p


def visual_backbone_apply(p: Params, cfg: LayoutLMv2Config, images: jax.Array) -> jax.Array:
    """(B, 3, H, W) images -> (B, pool_h*pool_w, fpn_channels) features.

    ResNeXt stages -> FPN (lateral 1x1 + nearest top-down + 3x3 output),
    take the finest level (detectron2 out_feature "p2"), adaptive-average-
    pool to ``image_feature_pool_shape`` (HF LayoutLMv2VisualBackbone.forward)."""
    x = (images - p["pixel_mean"]) / p["pixel_std"]
    x = jax.nn.relu(frozen_bn(p["stem_bn"], conv2d(p["stem_conv"], x, stride=2, padding=3)))
    # 3x3/2 max pool, pad 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)],
    )
    feats = []
    for s, blocks in enumerate(p["stages"]):
        for b, blk in enumerate(blocks):
            x = bottleneck_apply(blk, x, cfg.backbone_groups,
                                 stride=2 if (b == 0 and s > 0) else 1)
        feats.append(x)
    # FPN top-down
    laterals = [
        conv2d(lat["conv"], f) + lat["bias"][None, :, None, None]
        for lat, f in zip(p["fpn_lateral"], feats)
    ]
    out = laterals[-1]
    pyramid = [out]
    for lvl in range(len(laterals) - 2, -1, -1):
        up = jnp.repeat(jnp.repeat(out, 2, axis=2), 2, axis=3)
        up = up[:, :, : laterals[lvl].shape[2], : laterals[lvl].shape[3]]
        out = laterals[lvl] + up
        pyramid.append(out)
    p2 = pyramid[-1]
    p2 = conv2d(p["fpn_output_p2"]["conv"], p2, padding=1) \
        + p["fpn_output_p2"]["bias"][None, :, None, None]
    # adaptive average pool to (pool_h, pool_w)
    ph, pw = cfg.image_feature_pool_shape[0], cfg.image_feature_pool_shape[1]
    b, c, h, w = p2.shape
    assert h % ph == 0 and w % pw == 0, (
        f"backbone output {h}x{w} must divide the pool shape {ph}x{pw}"
    )
    pooled = p2.reshape(b, c, ph, h // ph, pw, w // pw).mean(axis=(3, 5))
    return pooled.reshape(b, c, ph * pw).transpose(0, 2, 1)  # (B, 49, C)


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

def visual_grid_bbox(cfg: LayoutLMv2Config, max_len: int = 1000) -> jnp.ndarray:
    """Boxes of the pool-grid visual tokens on the 0-1000 grid (parity:
    LayoutLMv2Model._calc_visual_bbox — no CLS box, unlike v3)."""
    ph, pw = cfg.image_feature_pool_shape[0], cfg.image_feature_pool_shape[1]
    ex = (jnp.arange(0, max_len * (pw + 1), max_len) // pw).astype(jnp.int32)
    ey = (jnp.arange(0, max_len * (ph + 1), max_len) // ph).astype(jnp.int32)
    x0 = jnp.tile(ex[:-1], (ph, 1))
    x1 = jnp.tile(ex[1:], (ph, 1))
    y0 = jnp.tile(ey[:-1], (pw, 1)).T
    y1 = jnp.tile(ey[1:], (pw, 1)).T
    return jnp.stack([x0, y0, x1, y1], axis=-1).reshape(-1, 4)


def embed_text_v2(
    p: Params,
    cfg: LayoutLMv2Config,
    input_ids: jax.Array,
    bbox: jax.Array,
    token_type_ids: Optional[jax.Array] = None,
    deterministic: bool = True,
    rngs: Optional[RngStream] = None,
) -> jax.Array:
    """word + plain-arange position + 6-way-concat spatial + token_type,
    LN(eps), dropout (parity: LayoutLMv2Model._calc_text_embeddings —
    v2 does NOT use RoBERTa skip-padding position ids)."""
    b, s = input_ids.shape
    position_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = p["word_embeddings"][input_ids]
    x = x + p["position_embeddings"][position_ids]
    x = x + spatial_position_embeddings(p, bbox)
    x = x + p["token_type_embeddings"][token_type_ids]
    x = layer_norm(p["LayerNorm"], x, cfg.layer_norm_eps)
    return dropout(x, cfg.hidden_dropout_prob, deterministic,
                   rngs.next() if rngs else None)


def embed_vision_v2(
    p: Params,
    cfg: LayoutLMv2Config,
    pixel_values: jax.Array,
    deterministic: bool = True,
    rngs: Optional[RngStream] = None,
) -> jax.Array:
    """backbone -> proj + position + visual-grid spatial embeddings,
    separate visual LayerNorm (parity: LayoutLMv2Model._calc_img_embeddings)."""
    feats = visual_backbone_apply(p["visual_backbone"], cfg, pixel_values)
    x = linear(p["visual_proj"], feats)
    n = x.shape[1]
    pos_ids = jnp.arange(n, dtype=jnp.int32)
    x = x + p["embeddings"]["position_embeddings"][pos_ids][None]
    vb = visual_grid_bbox(cfg)[None]
    vb = jnp.broadcast_to(vb, (x.shape[0], n, 4))
    x = x + spatial_position_embeddings(p["embeddings"], vb)
    if cfg.has_visual_segment_embedding:
        x = x + p["visual_segment_embedding"][None, None, :]
    x = layer_norm(p["visual_LayerNorm"], x, cfg.layer_norm_eps)
    return dropout(x, cfg.hidden_dropout_prob, deterministic,
                   rngs.next() if rngs else None)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_params(key, cfg: LayoutLMv2Config, dtype=jnp.float32) -> Params:
    enc_cfg = cfg.encoder_cfg()
    k = jax.random.split(key, 6)
    params: Params = {
        "embeddings": init_text_embeddings(k[0], enc_cfg, dtype),
        "visual_backbone": init_visual_backbone(k[1], cfg, dtype),
        "visual_proj": init_linear(
            k[2], cfg.image_feature_pool_shape[2], cfg.hidden_size,
            cfg.initializer_range, dtype,
        ),
        "visual_LayerNorm": init_layer_norm(cfg.hidden_size, dtype),
        "encoder": init_encoder(k[3], enc_cfg, dtype),
        "classifier": init_linear(
            k[4], 3 * cfg.hidden_size, cfg.num_labels, cfg.initializer_range,
            dtype,
        ),
    }
    if cfg.has_visual_segment_embedding:
        params["visual_segment_embedding"] = _normal(
            k[5], (cfg.hidden_size,), cfg.initializer_range, dtype
        )
    return params


@dataclasses.dataclass
class LayoutLMv2Output:
    logits: jax.Array              # (B, K)
    last_hidden_state: jax.Array   # (B, S_text + S_vis, H)
    initial_visual_embeddings: jax.Array  # (B, S_vis, H)


def forward_sequence_classification(
    params: Params,
    cfg: LayoutLMv2Config,
    input_ids: jax.Array,
    bbox: jax.Array,
    pixel_values: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    seq_pad_multiple: Optional[int] = None,
) -> LayoutLMv2Output:
    """Text+visual sequence -> 12-layer encoder (shared v3 machinery) ->
    concat([CLS], mean initial visual, mean final visual) -> classifier
    (parity: LayoutLMv2ForSequenceClassification.forward)."""
    rngs = RngStream(rng)
    enc_cfg = cfg.encoder_cfg()
    b, s_t = input_ids.shape

    if attention_mask is None:
        attention_mask = jnp.ones((b, s_t), jnp.int32)

    text_emb = embed_text_v2(
        params["embeddings"], cfg, input_ids, bbox,
        deterministic=deterministic, rngs=rngs,
    )
    vis_emb = embed_vision_v2(
        params, cfg, pixel_values, deterministic=deterministic, rngs=rngs
    )
    s_v = vis_emb.shape[1]

    hidden = jnp.concatenate([text_emb, vis_emb], axis=1)
    vis_bb = jnp.broadcast_to(visual_grid_bbox(cfg)[None], (b, s_v, 4))
    full_bbox = jnp.concatenate([bbox, vis_bb], axis=1)
    # v2 position ids: text arange; visual arange restarting at 0
    pos_ids = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.arange(s_t, dtype=jnp.int32)[None], (b, s_t)),
            jnp.broadcast_to(jnp.arange(s_v, dtype=jnp.int32)[None], (b, s_v)),
        ],
        axis=1,
    )
    full_mask = jnp.concatenate(
        [attention_mask, jnp.ones((b, s_v), attention_mask.dtype)], axis=1
    )

    if seq_pad_multiple:
        s_all = hidden.shape[1]
        pad = (-s_all) % seq_pad_multiple
        if pad:
            hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
            full_bbox = jnp.pad(full_bbox, ((0, 0), (0, pad), (0, 0)))
            pos_ids = jnp.pad(pos_ids, ((0, 0), (0, pad)))
            full_mask = jnp.pad(full_mask, ((0, 0), (0, pad)))

    if (
        enc_cfg.has_relative_attention_bias
        and enc_cfg.has_spatial_attention_bias
        and use_flash_attention()
    ):
        bias = kernel_attention_bias(
            {"encoder": params["encoder"]}, enc_cfg, pos_ids, full_bbox,
            full_mask, dtype=hidden.dtype,
        )
    else:
        bias = make_attention_bias(
            {"encoder": params["encoder"]}, enc_cfg, pos_ids, full_bbox,
            full_mask, dtype=hidden.dtype,
        )

    final, _, _ = encoder_apply(
        params["encoder"], enc_cfg, hidden, bias,
        deterministic=deterministic, rng=rngs.next(), collect_cls=False,
    )

    cls_final = final[:, 0, :]
    final_vis = final[:, s_t : s_t + s_v, :]
    head_in = jnp.concatenate(
        [cls_final, jnp.mean(vis_emb, axis=1), jnp.mean(final_vis, axis=1)],
        axis=-1,
    )
    head_in = dropout(head_in, cfg.hidden_dropout_prob, deterministic, rngs.next())
    logits = linear(params["classifier"], head_in)
    return LayoutLMv2Output(
        logits=logits,
        last_hidden_state=final,
        initial_visual_embeddings=vis_emb,
    )


def sequence_classification_loss(
    params: Params,
    cfg: LayoutLMv2Config,
    batch: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
    exit_weights=None,  # unused: dense model (signature-compatible with ee_loss_fn)
    deterministic: bool = False,
    compute_dtype=None,
):
    """Cross-entropy objective with ee_loss_fn's signature so the generic
    ``training.trainer.make_train_step(loss_fn=...)`` trains v2 (the
    reference trains dense AutoModels through its generic trainer,
    EE/IC_only.py:176-178; single-label CE per
    LayoutLMv2ForSequenceClassification.forward)."""
    fwd_params = params
    pixel_values = batch["pixel_values"]
    if compute_dtype is not None:
        fwd_params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        pixel_values = pixel_values.astype(compute_dtype)
    out = forward_sequence_classification(
        fwd_params, cfg, batch["input_ids"], batch["bbox"], pixel_values,
        batch.get("attention_mask"), deterministic=deterministic, rng=rng,
    )
    logits = out.logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = batch["labels"]
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
    return loss, {"logits": logits}

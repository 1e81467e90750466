"""LayoutLMv3 in pure-functional JAX, designed TPU-first.

Numerical parity target: HuggingFace ``LayoutLMv3ForSequenceClassification``
(the substrate of the reference model, EE/models/LayoutLMv3.py:669) — logits
must match the torch implementation to float32 tolerance so the reference's
calibration/policy stack reproduces bit-for-bit downstream.

TPU-first design choices:
- Parameters are plain nested dicts of ``jnp`` arrays; encoder layers are
  *stacked* along a leading axis and run with ``lax.scan`` (single compiled
  layer body, fast compile, natural pjit sharding).
- The patch embedding is an unfold+matmul (MXU) instead of a conv.
- The relative 1D/2D attention bias and the additive padding mask are fused
  into one per-head bias computed once per forward and broadcast over layers
  (the reference computes them once per forward too: LayoutLMv3.py:170-179).
- The scan collects each layer's [CLS] state, so early-exit heads can be run
  batched after the scan instead of branching inside it.
- Attention softmax: the reference uses the CogView PB-relax trick
  (modeling_layoutlmv3.py cogview_attention), which is algebraically the
  standard max-subtracted softmax; ``jax.nn.softmax`` is identical math.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_early_exit_tpu.models.layoutlmv3.config import LayoutLMv3Config

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _normal(key, shape, std, dtype):
    return std * jax.random.normal(key, shape, dtype)


def init_linear(key, d_in: int, d_out: int, std: float, dtype=jnp.float32) -> Params:
    return {
        "kernel": _normal(key, (d_in, d_out), std, dtype),
        "bias": jnp.zeros((d_out,), dtype),
    }


def linear(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["kernel"] + p["bias"]


def init_layer_norm(d: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    return _layer_norm_core(x, p["scale"], p["bias"], float(eps))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_core(x, scale, bias, eps: float):
    """LayerNorm with f32 moments and a hand-written VJP.

    Autodiff of the naive form makes XLA save the f32 upcast AND the f32
    normalized tensor per call — at the training budget that is 2 full-size
    f32 residuals per LN per layer streamed to HBM and back (profiled as the
    f32 (L,B,S,H) stacks in docs/PROFILE_TRAIN.md). The custom VJP saves
    only the (narrow) input and the (B,S,1) moments and recomputes the
    normalized tensor on the fly in the backward."""
    xf = x.astype(jnp.float32)
    if os.environ.get("MMEE_LN_MATMUL_MOMENTS") == "1":
        # experimental (eval-path): moments as ones-vector contractions so
        # the reduce rides the MXU instead of the VPU-serial lane reduce —
        # probing the MLP-down+LN fused-reduce stall (PROFILE_HARVEST.md)
        h = xf.shape[-1]
        ones = jnp.ones((h,), jnp.float32)
        mean = (xf @ ones)[..., None] * (1.0 / h)
        var = (jnp.square(xf) @ ones)[..., None] * (1.0 / h) - jnp.square(mean)
        var = jnp.maximum(var, 0.0)
    else:
        # TWO-pass moments in the primal (eval programs): inference fuses
        # the preceding matmul + residual + LN into one kernel, and the
        # sequential mean -> E[(x-mean)^2] form measures FASTER there
        # (cascade 1233 vs 1203 docs/sec with the one-pass form). The
        # TRAINING forward (_layer_norm_fwd below) uses the one-pass
        # E[x^2]-mean^2 form, which measures faster un-fused (+1% train
        # step). The forms differ only by f32 rounding, far below the bf16
        # output quantum.
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _layer_norm_fwd(x, scale, bias, eps: float):
    xf = x.astype(jnp.float32)
    # one-pass moments (see the primal's note for the eval/train split)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    rsig = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = (xf - mean) * rsig
    out = (y * scale + bias).astype(x.dtype)
    # moments saved DENSE (…, S): a trailing size-1 tiled dim pads the lane
    # dim to 128 — 128x stash memory/bandwidth (see ops/flash_attention lse)
    return out, (x, mean[..., 0], rsig[..., 0], scale)


def _layer_norm_bwd(eps: float, res, g):
    x, mean, rsig, scale = res
    mean = mean[..., None]
    rsig = rsig[..., None]
    gf = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rsig
    reduce_dims = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=reduce_dims).astype(scale.dtype)
    dbias = jnp.sum(gf, axis=reduce_dims).astype(scale.dtype)
    gs = gf * scale.astype(jnp.float32)
    dx = rsig * (
        gs
        - jnp.mean(gs, axis=-1, keepdims=True)
        - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True)
    )
    return dx.astype(x.dtype), dscale, dbias


_layer_norm_core.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def dropout(x: jax.Array, rate: float, deterministic: bool, rng) -> jax.Array:
    """Position-hash dropout (ops/hashing.py): ~8 VPU int ops per element vs
    threefry's ~12 ms/step at the reference budget; one scalar key draw per
    call site. Same Bernoulli(keep) semantics, different (hash) stream."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    from multi_modal_early_exit_tpu.ops.hashing import hash_dropout

    return hash_dropout(x, rate, rng)


@jax.custom_vjp
def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU with a recompute VJP.

    Autodiff of ``jax.nn.gelu(approximate=False)`` makes XLA save FOUR
    full-size residuals per MLP (pre-activation, erfc, exp, output — the
    bf16 (L,B,S,4H) stacks in docs/PROFILE_TRAIN.md). This saves only the
    pre-activation and recomputes the two transcendentals in the backward:
    ~5 GB/step less HBM residual traffic for ~2 ms of VPU recompute at the
    reference budget."""
    return jax.nn.gelu(x, approximate=False)


def _gelu_fwd(x):
    return jax.nn.gelu(x, approximate=False), x


def _gelu_bwd(x, g):
    xf = x.astype(jnp.float32)
    cdf = 0.5 * jax.lax.erfc(-xf * np.float32(1.0 / math.sqrt(2)))
    pdf = jnp.exp(-0.5 * jnp.square(xf)) * np.float32(
        1.0 / math.sqrt(2.0 * math.pi)
    )
    return ((g.astype(jnp.float32) * (cdf + xf * pdf)).astype(x.dtype),)


gelu_exact.defvjp(_gelu_fwd, _gelu_bwd)


class RngStream:
    """Deterministic stream of dropout keys (static number of call sites)."""

    def __init__(self, rng: Optional[jax.Array]):
        self.rng = rng
        self.count = 0

    def next(self) -> Optional[jax.Array]:
        if self.rng is None:
            return None
        self.count += 1
        return jax.random.fold_in(self.rng, self.count)


# ---------------------------------------------------------------------------
# text embeddings  (parity: modeling_layoutlmv3.LayoutLMv3TextEmbeddings)
# ---------------------------------------------------------------------------

def init_text_embeddings(key, cfg: LayoutLMv3Config, dtype=jnp.float32) -> Params:
    k = jax.random.split(key, 7)
    std = cfg.initializer_range
    word = _normal(k[0], (cfg.vocab_size, cfg.hidden_size), std, dtype)
    word = word.at[cfg.pad_token_id].set(0.0)
    pos = _normal(k[1], (cfg.max_position_embeddings, cfg.hidden_size), std, dtype)
    pos = pos.at[cfg.pad_token_id].set(0.0)
    return {
        "word_embeddings": word,
        "position_embeddings": pos,
        "token_type_embeddings": _normal(
            k[2], (cfg.type_vocab_size, cfg.hidden_size), std, dtype
        ),
        "x_position_embeddings": _normal(
            k[3], (cfg.max_2d_position_embeddings, cfg.coordinate_size), std, dtype
        ),
        "y_position_embeddings": _normal(
            k[4], (cfg.max_2d_position_embeddings, cfg.coordinate_size), std, dtype
        ),
        "h_position_embeddings": _normal(
            k[5], (cfg.max_2d_position_embeddings, cfg.shape_size), std, dtype
        ),
        "w_position_embeddings": _normal(
            k[6], (cfg.max_2d_position_embeddings, cfg.shape_size), std, dtype
        ),
        "LayerNorm": init_layer_norm(cfg.hidden_size, dtype),
    }


def create_position_ids_from_input_ids(input_ids: jax.Array, padding_idx: int) -> jax.Array:
    """RoBERTa-style position ids: padding stays at padding_idx, others count up."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


def spatial_position_embeddings(p: Params, bbox: jax.Array) -> jax.Array:
    """Concat of left/upper/right/lower coordinate + h/w shape embeddings
    (parity: LayoutLMv3TextEmbeddings.calculate_spatial_position_embeddings)."""
    left = p["x_position_embeddings"][bbox[:, :, 0]]
    upper = p["y_position_embeddings"][bbox[:, :, 1]]
    right = p["x_position_embeddings"][bbox[:, :, 2]]
    lower = p["y_position_embeddings"][bbox[:, :, 3]]
    h = p["h_position_embeddings"][jnp.clip(bbox[:, :, 3] - bbox[:, :, 1], 0, 1023)]
    w = p["w_position_embeddings"][jnp.clip(bbox[:, :, 2] - bbox[:, :, 0], 0, 1023)]
    return jnp.concatenate([left, upper, right, lower, h, w], axis=-1)


def embed_text(
    p: Params,
    cfg: LayoutLMv3Config,
    input_ids: jax.Array,
    bbox: jax.Array,
    token_type_ids: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    deterministic: bool = True,
    rngs: Optional[RngStream] = None,
) -> jax.Array:
    if position_ids is None:
        position_ids = create_position_ids_from_input_ids(input_ids, cfg.pad_token_id)
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = p["word_embeddings"][input_ids]
    x = x + p["token_type_embeddings"][token_type_ids]
    x = x + p["position_embeddings"][position_ids]
    x = x + spatial_position_embeddings(p, bbox)
    x = layer_norm(p["LayerNorm"], x, cfg.layer_norm_eps)
    x = dropout(x, cfg.hidden_dropout_prob, deterministic,
                rngs.next() if rngs else None)
    return x


# ---------------------------------------------------------------------------
# visual embeddings  (parity: LayoutLMv3PatchEmbeddings + forward_image)
# ---------------------------------------------------------------------------

def init_visual_embeddings(key, cfg: LayoutLMv3Config, dtype=jnp.float32) -> Params:
    k = jax.random.split(key, 2)
    std = cfg.initializer_range
    patch_dim = cfg.num_channels * cfg.patch_size * cfg.patch_size
    n = cfg.num_patches_side
    return {
        "patch_embed": init_linear(k[0], patch_dim, cfg.hidden_size, std, dtype),
        "cls_token": jnp.zeros((1, 1, cfg.hidden_size), dtype),
        "pos_embed": jnp.zeros((1, n * n + 1, cfg.hidden_size), dtype),
        "norm": init_layer_norm(cfg.hidden_size, dtype),  # eps 1e-6 in apply
    }


def extract_patches(pixel_values: jax.Array, patch: int) -> jax.Array:
    """(B, C, H, W) -> (B, h*w, C*patch*patch) with (c, ph, pw) flattening order,
    matching the torch Conv2d(stride=kernel) weight layout."""
    b, c, h, w = pixel_values.shape
    hp, wp = h // patch, w // patch
    x = pixel_values.reshape(b, c, hp, patch, wp, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, hp, wp, C, patch, patch)
    return x.reshape(b, hp * wp, c * patch * patch)


def embed_vision(
    p: Params,
    cfg: LayoutLMv3Config,
    pixel_values: jax.Array,
    deterministic: bool = True,
    rngs: Optional[RngStream] = None,
) -> jax.Array:
    """Patch embedding + [CLS] + learned abs position embedding + LayerNorm(eps=1e-6)
    (parity: LayoutLMv3Model.forward_image; pos_drop has p=0.0)."""
    patches = extract_patches(pixel_values, cfg.patch_size)
    x = linear(p["patch_embed"], patches)  # (B, N, H) — MXU matmul
    b = x.shape[0]
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"]
    x = layer_norm(p["norm"], x, 1e-6)
    return x


def visual_bbox(cfg: LayoutLMv3Config, max_len: int = 1000) -> jnp.ndarray:
    """Bounding boxes of visual patch tokens on the 0-1000 grid, with the
    [CLS] box [1,1,999,999] prepended (parity: LayoutLMv3Model.init_visual_bbox)."""
    size = cfg.num_patches_side
    edges_x = (jnp.arange(0, max_len * (size + 1), max_len) // size).astype(jnp.int32)
    edges_y = edges_x
    x0 = jnp.tile(edges_x[:-1], (size, 1))
    x1 = jnp.tile(edges_x[1:], (size, 1))
    y0 = jnp.tile(edges_y[:-1], (size, 1)).T
    y1 = jnp.tile(edges_y[1:], (size, 1)).T
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1).reshape(-1, 4)
    cls_box = jnp.array([[1, 1, max_len - 1, max_len - 1]], dtype=jnp.int32)
    return jnp.concatenate([cls_box, boxes], axis=0)  # (N+1, 4)


# ---------------------------------------------------------------------------
# relative position bias  (parity: LayoutLMv3Encoder._cal_{1d,2d}_pos_emb)
# ---------------------------------------------------------------------------

def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """Bidirectional T5-style log bucketing; integer semantics match torch."""
    num_buckets = num_buckets // 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    n_safe = jnp.maximum(n, 1)  # avoid log(0); masked out by is_small anyway
    val_if_large = max_exact + (
        jnp.log(n_safe.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def rel_pos_1d_bias(
    table: jax.Array, cfg: LayoutLMv3Config, position_ids: jax.Array
) -> jax.Array:
    """(B, heads, S, S) 1D relative-position bias; ``table`` is (bins, heads)."""
    rel = position_ids[:, None, :] - position_ids[:, :, None]
    buckets = relative_position_bucket(rel, cfg.rel_pos_bins, cfg.max_rel_pos)
    return table[buckets].transpose(0, 3, 1, 2)


def rel_pos_2d_bias(
    table_x: jax.Array, table_y: jax.Array, cfg: LayoutLMv3Config, bbox: jax.Array
) -> jax.Array:
    """(B, heads, S, S) spatial bias from x0 and y1 coordinates."""
    cx = bbox[:, :, 0]
    cy = bbox[:, :, 3]
    bx = relative_position_bucket(
        cx[:, None, :] - cx[:, :, None], cfg.rel_2d_pos_bins, cfg.max_rel_2d_pos
    )
    by = relative_position_bucket(
        cy[:, None, :] - cy[:, :, None], cfg.rel_2d_pos_bins, cfg.max_rel_2d_pos
    )
    return table_x[bx].transpose(0, 3, 1, 2) + table_y[by].transpose(0, 3, 1, 2)


def fused_rel_pos_bias(
    enc: Params,
    cfg: LayoutLMv3Config,
    position_ids: jax.Array,
    bbox: jax.Array,
    scale: float = 1.0,
    out_dtype=jnp.float32,
) -> jax.Array:
    """(B, heads, S, S) combined 1D+2D relative bias via ONE gather.

    TPU gathers are slow (~element-rate-bound, far off HBM bandwidth), and
    the naive formulation does three (B,S,S)->(...,heads) gathers — profiled
    at ~70% of the whole forward. Here the three bucket tables are
    pre-summed into one (rel_bins * 2d_bins^2, heads) table (tiny:
    32*64*64*12 entries) and the three bucket indices are packed into one
    integer, so the per-token work is a single gather. Numerically identical
    to rel_pos_1d_bias + rel_pos_2d_bias (same lookups, same f32 sums).

    The 1D bucket matrix depends only on position ids, which are the
    constant [0..s_t)+[0..s_v) layout — XLA constant-folds it.
    """
    bins_1d, bins_2d = cfg.rel_pos_bins, cfg.rel_2d_pos_bins
    rel = position_ids[:, None, :] - position_ids[:, :, None]
    b1 = relative_position_bucket(rel, bins_1d, cfg.max_rel_pos)
    cx = bbox[:, :, 0]
    cy = bbox[:, :, 3]
    bx = relative_position_bucket(
        cx[:, None, :] - cx[:, :, None], bins_2d, cfg.max_rel_2d_pos
    )
    by = relative_position_bucket(
        cy[:, None, :] - cy[:, :, None], bins_2d, cfg.max_rel_2d_pos
    )
    packed = (b1 * bins_2d + bx) * bins_2d + by  # (B, S, S)

    # combined table: T[b1, bx, by, h] = (T1[b1,h] + Tx[bx,h] + Ty[by,h])*scale
    # — summed/scaled in f32, rounded ONCE to out_dtype, so the big gather
    # and everything downstream moves half the bytes under bf16
    t1 = enc["rel_pos_bias"].astype(jnp.float32)
    tx = enc["rel_pos_x_bias"].astype(jnp.float32)
    ty = enc["rel_pos_y_bias"].astype(jnp.float32)
    table = (
        (t1[:, None, None, :] + tx[None, :, None, :] + ty[None, None, :, :])
        * scale
    ).reshape(bins_1d * bins_2d * bins_2d, -1).astype(out_dtype)

    return table[packed].transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# encoder  (parity: LayoutLMv3Layer / LayoutLMv3Encoder)
# ---------------------------------------------------------------------------

def init_encoder_layer(key, cfg: LayoutLMv3Config, dtype=jnp.float32) -> Params:
    k = jax.random.split(key, 6)
    h, i = cfg.hidden_size, cfg.intermediate_size
    std = cfg.initializer_range
    return {
        "attention": {
            "query": init_linear(k[0], h, h, std, dtype),
            "key": init_linear(k[1], h, h, std, dtype),
            "value": init_linear(k[2], h, h, std, dtype),
            "output": init_linear(k[3], h, h, std, dtype),
            "output_LayerNorm": init_layer_norm(h, dtype),
        },
        "intermediate": init_linear(k[4], h, i, std, dtype),
        "output": init_linear(k[5], i, h, std, dtype),
        "output_LayerNorm": init_layer_norm(h, dtype),
    }


def init_encoder(key, cfg: LayoutLMv3Config, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    layers = [init_encoder_layer(keys[i], cfg, dtype) for i in range(cfg.num_hidden_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    std = cfg.initializer_range
    params: Params = {"layers": stacked}
    if cfg.has_relative_attention_bias:
        params["rel_pos_bias"] = _normal(
            keys[-3], (cfg.rel_pos_bins, cfg.num_attention_heads), std, dtype
        )
    if cfg.has_spatial_attention_bias:
        params["rel_pos_x_bias"] = _normal(
            keys[-2], (cfg.rel_2d_pos_bins, cfg.num_attention_heads), std, dtype
        )
        params["rel_pos_y_bias"] = _normal(
            keys[-1], (cfg.rel_2d_pos_bins, cfg.num_attention_heads), std, dtype
        )
    return params


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def _packed_qkv_and_seed(p, cfg, hidden, deterministic, rng_attn):
    """Packed (B, S, hidden) q/k/v projections plus the attention-dropout
    (rate, seed) pair the packed flash kernels consume. Shared by every
    packed-kernel branch of attention_apply so the projection and seed
    derivation cannot drift between training paths. Rate collapses to 0
    when no rng is provided (matching dropout()'s no-op behavior)."""
    qp = linear(p["query"], hidden)
    kp = linear(p["key"], hidden)
    vp = linear(p["value"], hidden)
    rate = 0.0 if deterministic else cfg.attention_probs_dropout_prob
    if rate > 0.0 and rng_attn is None:
        rate = 0.0
    if rate > 0.0:
        seed = jax.random.randint(
            rng_attn, (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return qp, kp, vp, rate, seed


def _attn_epilogue(p, cfg, ctx, hidden, deterministic, rng_out):
    """Output projection, dropout, residual LayerNorm — the epilogue every
    attention formulation shares."""
    out = linear(p["output"], ctx)
    out = dropout(out, cfg.hidden_dropout_prob, deterministic, rng_out)
    return layer_norm(p["output_LayerNorm"], out + hidden, cfg.layer_norm_eps)


def attention_apply(
    p: Params,
    cfg: LayoutLMv3Config,
    hidden: jax.Array,
    attn_bias: Optional[jax.Array],
    deterministic: bool,
    rng_attn: Optional[jax.Array],
    rng_out: Optional[jax.Array],
) -> jax.Array:
    """Self-attention block with additive bias; reference order of operations:
    scores = (q/√d)·kᵀ + bias; softmax; dropout; ·v; dense; dropout; LN(res)."""
    d = cfg.head_dim

    from multi_modal_early_exit_tpu.ops.flash_attention import (
        flash_attention_packed,
        flash_attention_packed_train,
        use_flash_attention,
    )

    if isinstance(attn_bias, ChainedBiasContext) and use_flash_attention():
        # chained-dbias training path: returns (layer output, passed-through
        # bias); the caller (encoder scan) carries the bias so the backward
        # accumulates the bias cotangent in kernel
        from multi_modal_early_exit_tpu.ops.flash_attention import (
            flash_attention_packed_train_chained,
        )

        qp, kp, vp, rate, seed = _packed_qkv_and_seed(
            p, cfg, hidden, deterministic, rng_attn
        )
        ctx, bias_out = flash_attention_packed_train_chained(
            qp, kp, vp, attn_bias.bias, seed, cfg.num_attention_heads,
            rate=rate,
        )
        ctx = ctx.astype(hidden.dtype)
        attn_out = _attn_epilogue(p, cfg, ctx, hidden, deterministic, rng_out)
        return attn_out, ChainedBiasContext(bias_out)

    if isinstance(attn_bias, TrainBiasContext) and use_flash_attention():
        # training path with in-kernel table gradients: the backward reduces
        # ds directly into the (bins, H) tables — no (B,H,S,S) dbias
        # write/accumulate/re-reduce (docs/PROFILE_TRAIN.md residual)
        from multi_modal_early_exit_tpu.ops.flash_attention import (
            flash_attention_packed_train_tables,
        )

        qp, kp, vp, rate, seed = _packed_qkv_and_seed(
            p, cfg, hidden, deterministic, rng_attn
        )
        ctx = flash_attention_packed_train_tables(
            qp, kp, vp, attn_bias.bias,
            attn_bias.t1, attn_bias.tx, attn_bias.ty,
            attn_bias.position_ids, attn_bias.cx, attn_bias.cy, seed,
            cfg.num_attention_heads, rate=rate,
            rel_bins=cfg.rel_pos_bins, max_rel=cfg.max_rel_pos,
            rel2d_bins=cfg.rel_2d_pos_bins, max_rel2d=cfg.max_rel_2d_pos,
        ).astype(hidden.dtype)
        return _attn_epilogue(p, cfg, ctx, hidden, deterministic, rng_out)

    if (
        not isinstance(
            attn_bias, (FusedBiasContext, TrainBiasContext, ChainedBiasContext)
        )
        and attn_bias is not None
        and attn_bias.shape[1] == cfg.num_attention_heads
        and use_flash_attention()
    ):
        # packed-layout kernels: q/k/v stay (B, S, hidden) straight out of
        # the projections — no (B,H,S,D) transposes exist in forward OR
        # backward, so XLA keeps natural layouts on the surrounding
        # matmul/LN fusions (the transpose copies + distorted layouts cost
        # ~25% of a cascade encoder layer). Deterministic path: fwd-only
        # kernel; stochastic path: train twin with in-kernel position-hash
        # dropout + packed fused backward.
        qp, kp, vp, rate, seed = _packed_qkv_and_seed(
            p, cfg, hidden, deterministic, rng_attn
        )
        if rate > 0.0:
            ctx = flash_attention_packed_train(
                qp, kp, vp, attn_bias, seed, cfg.num_attention_heads,
                rate=rate,
            ).astype(hidden.dtype)
        else:
            ctx = flash_attention_packed(
                qp, kp, vp, attn_bias, cfg.num_attention_heads
            ).astype(hidden.dtype)
        return _attn_epilogue(p, cfg, ctx, hidden, deterministic, rng_out)

    q = _split_heads(linear(p["query"], hidden), cfg.num_attention_heads)
    k = _split_heads(linear(p["key"], hidden), cfg.num_attention_heads)
    v = _split_heads(linear(p["value"], hidden), cfg.num_attention_heads)

    if isinstance(attn_bias, FusedBiasContext):
        # in-kernel bias construction: no (B,H,S,S) tensor exists at all
        from multi_modal_early_exit_tpu.ops.fused_bias_attention import (
            fused_bias_attention,
        )

        ctx = fused_bias_attention(
            q, k, v,
            attn_bias.position_ids, attn_bias.cx, attn_bias.cy,
            attn_bias.mask, attn_bias.t1, attn_bias.tx, attn_bias.ty,
            rel_bins=cfg.rel_pos_bins, max_rel=cfg.max_rel_pos,
            rel2d_bins=cfg.rel_2d_pos_bins, max_rel2d=cfg.max_rel_2d_pos,
        )
        ctx = ctx.astype(hidden.dtype)
        b, h, s, _ = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        return _attn_epilogue(p, cfg, ctx, hidden, deterministic, rng_out)

    was_chained = isinstance(attn_bias, ChainedBiasContext)
    if was_chained:
        # defensive: flash was disabled between build and apply — compose
        # in XLA and pass the bias through (accumulation falls back to the
        # autodiff add)
        attn_bias = attn_bias.bias
    if isinstance(attn_bias, TrainBiasContext):
        # defensive: a TrainBiasContext only reaches here if flash was
        # disabled between build and apply; its bias is stop-gradient, so
        # table grads are zero on this fallback — callers gate on
        # use_flash_attention() before building one
        attn_bias = attn_bias.bias

    # XLA composition (non-flash backends and head-mismatched biases; the
    # `flash_attention` (B,H,S,D) kernel pair remains available for direct
    # callers, e.g. parallel.kernels.sharded_flash_attention)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q / math.sqrt(d), k,
        preferred_element_type=jnp.float32,
    )
    if attn_bias is not None:
        s = scores.shape[-1]
        if attn_bias.shape[-1] != s:  # pre-padded bias: use the S slice
            attn_bias = attn_bias[:, :, :s, :s]
        scores = scores + attn_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    probs = dropout(
        probs, cfg.attention_probs_dropout_prob, deterministic, rng_attn
    )
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    )
    ctx = ctx.astype(hidden.dtype)
    b, h, s, _ = ctx.shape
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)

    out = _attn_epilogue(p, cfg, ctx, hidden, deterministic, rng_out)
    if was_chained:
        return out, ChainedBiasContext(attn_bias)
    return out


def encoder_layer_apply(
    p: Params,
    cfg: LayoutLMv3Config,
    hidden: jax.Array,
    attn_bias: Optional[jax.Array],
    deterministic: bool = True,
    rngs: Optional[Tuple[jax.Array, ...]] = None,
) -> jax.Array:
    r = rngs or (None, None, None)
    attn_out = attention_apply(
        p["attention"], cfg, hidden, attn_bias, deterministic, r[0], r[1]
    )
    chained_bias = None
    if isinstance(attn_bias, ChainedBiasContext):
        attn_out, chained_bias = attn_out
    # NOTE: a fused-MLP custom VJP (save only pre-GELU, recompute the GELU
    # for the down-proj weight grad) was built and measured SLOWER
    # (142 -> 135 docs/sec at the reference budget): XLA already overlaps
    # the twin (L,B,S,4H) stashes with the matmuls, while the hand VJP
    # serializes the recompute. Keep the composable form.
    inter = gelu_exact(linear(p["intermediate"], attn_out))
    out = linear(p["output"], inter)
    out = dropout(out, cfg.hidden_dropout_prob, deterministic, r[2])
    out = layer_norm(p["output_LayerNorm"], out + attn_out, cfg.layer_norm_eps)
    if chained_bias is not None:
        return out, chained_bias
    return out


def encoder_apply(
    p: Params,
    cfg: LayoutLMv3Config,
    hidden: jax.Array,
    attn_bias: Optional[jax.Array],
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    collect_cls: bool = True,
    collect_hidden: bool = False,
):
    """Run all layers with ``lax.scan`` over stacked layer params.

    Returns ``(final_hidden, cls_per_layer, hidden_per_layer)`` where
    ``cls_per_layer`` is (L, B, H): the [CLS] state *after* each layer —
    exactly the exit-head input the reference taps per layer
    (EE/models/LayoutLMv3.py:226 ``hidden_states[:, 0, :]``).

    ``MMEE_LAYERS_PER_STEP`` (default 1) folds that many layers into each
    scan step. The loop-invariant attention-bias cotangent is accumulated
    once per scan STEP in the backward (an HBM-bound select_add over the
    (B,H,S,S) accumulator — 11.9 ms/step at 12 steps in the r4 profile);
    folding n layers per step sums the n in-step bias cotangents before the
    accumulator round-trip, cutting that traffic by n. Numerics are
    unchanged (same layer order, same rngs).
    """
    num_layers = cfg.num_hidden_layers
    fold = effective_scan_fold(cfg)
    if rng is not None:
        layer_rngs = jax.random.split(rng, num_layers * 3).reshape(num_layers, 3)
    else:
        layer_rngs = None

    chained = isinstance(attn_bias, ChainedBiasContext)

    def body(carry, xs):
        if chained:
            # the bias rides the scan carry: each layer's backward folds its
            # bias cotangent into the carried accumulator in kernel
            h, bias_arr = carry
            layer_bias = ChainedBiasContext(bias_arr)
        else:
            h = carry
            layer_bias = attn_bias
        if layer_rngs is not None:
            fold_p, fold_rs = xs
        else:
            fold_p, fold_rs = xs, None
        cls_taps = []
        hidden_taps = []
        for i in range(fold):
            layer_p = jax.tree.map(lambda x: x[i], fold_p)
            rs = tuple(fold_rs[i]) if fold_rs is not None else None
            h = encoder_layer_apply(
                layer_p, cfg, h, layer_bias, deterministic, rs
            )
            if chained:
                h, bias_ctx = h
                layer_bias = bias_ctx
            if collect_cls:
                cls_taps.append(h[:, 0, :])
            if collect_hidden:
                hidden_taps.append(h)
        carry = (h, layer_bias.bias) if chained else h
        ys = {}
        if collect_cls:
            ys["cls"] = jnp.stack(cls_taps)
        if collect_hidden:
            ys["hidden"] = jnp.stack(hidden_taps)
        return carry, ys

    if cfg.gradient_checkpointing:
        body = jax.checkpoint(body)

    stacked = jax.tree.map(
        lambda x: x.reshape((num_layers // fold, fold) + x.shape[1:]),
        p["layers"],
    )
    if layer_rngs is not None:
        xs = (stacked, layer_rngs.reshape(num_layers // fold, fold, 3))
    else:
        xs = stacked
    init = (hidden, attn_bias.bias) if chained else hidden
    final, ys = jax.lax.scan(body, init, xs)
    if chained:
        final = final[0]
    unfold = lambda y: (
        None if y is None else y.reshape((num_layers,) + y.shape[2:])
    )
    return final, unfold(ys.get("cls")), unfold(ys.get("hidden"))


# ---------------------------------------------------------------------------
# classification head  (parity: LayoutLMv3ClassificationHead)
# ---------------------------------------------------------------------------

def init_classifier(key, cfg: LayoutLMv3Config, dtype=jnp.float32) -> Params:
    k = jax.random.split(key, 2)
    std = cfg.initializer_range
    return {
        "dense": init_linear(k[0], cfg.hidden_size, cfg.hidden_size, std, dtype),
        "out_proj": init_linear(k[1], cfg.hidden_size, cfg.num_labels, std, dtype),
    }


def classifier_apply(
    p: Params,
    cfg: LayoutLMv3Config,
    x: jax.Array,
    deterministic: bool = True,
    rngs: Optional[RngStream] = None,
) -> jax.Array:
    rate = cfg.classifier_dropout_prob
    x = dropout(x, rate, deterministic, rngs.next() if rngs else None)
    x = jnp.tanh(linear(p["dense"], x))
    x = dropout(x, rate, deterministic, rngs.next() if rngs else None)
    return linear(p["out_proj"], x)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_params(
    key,
    cfg: LayoutLMv3Config,
    dtype=jnp.float32,
    with_text: bool = True,
    with_vision: bool = True,
) -> Params:
    """Full-model parameters. Single-modality variants (the reference's
    ``dit`` image-only and ``bert`` text-only models, EE/configs.py:429-449,
    482-493) pass ``with_text=False`` / ``with_vision=False`` so unused
    modality towers are never allocated; the post-concat modality LayerNorm
    exists only in the multimodal forward and is dropped with either."""
    k = jax.random.split(key, 5)
    params: Params = {}
    if with_text:
        params["embeddings"] = init_text_embeddings(k[0], cfg, dtype)
    if with_vision:
        params["visual"] = init_visual_embeddings(k[1], cfg, dtype)
    if with_text and with_vision:
        # post-concat modality LayerNorm (LayoutLMv3Model.LayerNorm)
        params["LayerNorm"] = init_layer_norm(cfg.hidden_size, dtype)
    params["encoder"] = init_encoder(k[2], cfg, dtype)
    params["classifier"] = init_classifier(k[3], cfg, dtype)
    return params


class ChainedBiasContext(NamedTuple):
    """Training-path marker: carry the (pre-padded, materialized) bias
    through the encoder scan so each layer's attention backward adds its
    bias cotangent into the running accumulator IN KERNEL
    (ops/flash_attention.flash_attention_packed_train_chained) instead of
    emitting a fresh (B,H,S,S) dbias for a separate XLA select_add pass.
    The bias stays differentiable — the accumulated cotangent flows into
    the bias builder's VJP (one bucket reduction per step)."""

    bias: jax.Array  # (B, H, P, P)


class TrainBiasContext(NamedTuple):
    """Training-path bias bundle for the in-kernel-table-gradient attention
    (ops/flash_attention.flash_attention_packed_train_tables): the bias is
    materialized ONCE per step (cheap per-layer read) while the backward
    reduces the bias cotangent straight into the three (bins, H) tables —
    the (B, H, S, S) dbias round-trip that dominated the train-step profile
    (docs/PROFILE_TRAIN.md) never exists. ``bias`` is stop-gradient; the
    scaled tables are the gradient receivers."""

    bias: jax.Array          # (B, H, P, P), stop-gradient
    position_ids: jax.Array  # (B, S) int32
    cx: jax.Array            # (B, S) int32
    cy: jax.Array            # (B, S) int32
    t1: jax.Array            # (rel_bins, H) f32, 1/sqrt(d) folded
    tx: jax.Array            # (rel2d_bins, H)
    ty: jax.Array            # (rel2d_bins, H)


class FusedBiasContext(NamedTuple):
    """Raw ingredients for in-kernel bias construction
    (ops/fused_bias_attention.py): per-token vectors + pre-scaled tables.
    Passed to the encoder in place of the materialized (B,H,S,S) bias."""

    position_ids: jax.Array  # (B, S) int32
    cx: jax.Array            # (B, S) int32
    cy: jax.Array            # (B, S) int32
    mask: jax.Array          # (B, S) int32
    t1: jax.Array            # (rel_bins, H) f32, 1/sqrt(d) folded
    tx: jax.Array            # (rel2d_bins, H)
    ty: jax.Array            # (rel2d_bins, H)


def use_table_grad_attention(default: bool = False) -> bool:
    """In-kernel table-gradient training attention
    (flash_attention_packed_train_tables). MMEE_TABLE_GRADS=1 forces it on,
    =0 forces it off; unset uses the measured-best default — currently OFF:
    the per-layer in-kernel bucket reduction measures slower than the
    dbias-accumulate path at the reference budget (see docs/PROFILE_TRAIN.md);
    the op stays available as the memory-bound-shape escape hatch (no
    (B,H,S,S) cotangent tensors at all, peak grad memory drops by
    ~12 x B*H*S^2)."""
    import os

    flag = os.environ.get("MMEE_TABLE_GRADS")
    if flag == "0":
        return False
    if flag:
        return True
    return default


def effective_scan_fold(cfg) -> int:
    """Layers folded per encoder scan step: MMEE_LAYERS_PER_STEP override,
    else cfg.scan_fold; invalid values/divisors fall back gracefully."""
    try:
        fold = int(os.environ.get("MMEE_LAYERS_PER_STEP", "0"))
    except ValueError:  # empty/garbage env value: behave like unset
        fold = 0
    fold = fold or getattr(cfg, "scan_fold", 1)
    if fold < 1 or cfg.num_hidden_layers % fold:
        return 1
    return fold


def use_chained_dbias(default: bool = False) -> bool:
    """Chained-dbias training attention (the bias rides layer-to-layer;
    each layer's backward adds its ds into the carried cotangent in kernel
    via input_output_aliases). MMEE_CHAINED_DBIAS forces it on (1) or off
    (0); the call-site default is fold-dependent: OFF under a scan (the
    carry copies cost more than the in-kernel add saves — 134 -> 125
    docs/sec, r3) but ON at full unroll (no carry copies exist, and the
    in-kernel add replaces the 12-way dbias sum: 171.0 -> 181.4 docs/sec
    at the reference budget, r5)."""
    flag = os.environ.get("MMEE_CHAINED_DBIAS")
    if flag == "0":
        return False
    if flag:
        return True
    return default


def use_fused_bias_attention(default: bool = False) -> bool:
    """In-kernel bias construction (TPU only).

    MMEE_FUSED_BIAS=1 forces it on, =0 forces it off; unset uses the call
    site's measured-best default — currently OFF everywhere: the one-pass
    Pallas bias builder (kernel_attention_bias) + flash reads beat per-layer
    in-kernel bias recomputation at both full-batch and compacted-stage row
    counts. The in-kernel variant remains the memory-bound-shape escape
    hatch (no (B,H,S,S) tensor at all).
    """
    import os

    from multi_modal_early_exit_tpu.ops.flash_attention import (
        use_flash_attention,
    )

    flag = os.environ.get("MMEE_FUSED_BIAS")
    if flag == "0":
        return False
    if flag:
        return use_flash_attention()
    return default and use_flash_attention()


def kernel_attention_bias(
    p: Params,
    cfg: LayoutLMv3Config,
    position_ids: jax.Array,
    bbox: jax.Array,
    attention_mask: jax.Array,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """(B, H, P, P) bias built by the Pallas one-hot-matmul kernel
    (ops/fused_bias_attention.materialize_bias) — replaces the XLA
    gather+transpose+pad chain on TPU; numerically the same lookups,
    emitted at the flash kernel's padded width (P = ceil(S/128)*128)."""
    from multi_modal_early_exit_tpu.ops.fused_bias_attention import (
        materialize_bias,
    )

    enc = p["encoder"]
    scale = 1.0 / math.sqrt(cfg.head_dim) if cfg.scale_bias else 1.0
    return materialize_bias(
        position_ids.astype(jnp.int32),
        bbox[:, :, 0].astype(jnp.int32),
        bbox[:, :, 3].astype(jnp.int32),
        attention_mask.astype(jnp.int32),
        enc["rel_pos_bias"].astype(jnp.float32) * scale,
        enc["rel_pos_x_bias"].astype(jnp.float32) * scale,
        enc["rel_pos_y_bias"].astype(jnp.float32) * scale,
        rel_bins=cfg.rel_pos_bins, max_rel=cfg.max_rel_pos,
        rel2d_bins=cfg.rel_2d_pos_bins, max_rel2d=cfg.max_rel_2d_pos,
        out_dtype=dtype,
    )


def make_attention_bias(
    p: Params,
    cfg: LayoutLMv3Config,
    position_ids: jax.Array,
    bbox: jax.Array,
    attention_mask: Optional[jax.Array],
    dtype=jnp.float32,
    pad_to: Optional[int] = None,
) -> jax.Array:
    """Fused additive bias: (rel_pos + rel_2d_pos)/√d + padding mask.

    The reference adds the biases scaled by 1/√d inside attention
    (modeling_layoutlmv3.py LayoutLMv3SelfAttention.forward) and a
    (1-mask)·finfo.min extended mask; combining them here lets XLA hoist the
    whole bias out of the layer scan.

    ``pad_to``: pad the finished bias once to a lane-aligned width P >= S
    (-inf key columns) so the fused attention kernel never re-pads the
    ~GB-scale bias per layer while matmuls stay at the true length.

    In bf16 the whole (B,H,S,S) pipeline (gather + mask add + pad) runs at
    the narrow dtype — the table sums stay f32, so values are exact-then-
    rounded-once; the f32 path is numerically identical to the reference.
    """
    enc = p["encoder"]
    scale = 1.0 / math.sqrt(cfg.head_dim) if cfg.scale_bias else 1.0
    neg = jnp.finfo(jnp.float32).min
    if cfg.has_relative_attention_bias and cfg.has_spatial_attention_bias:
        # single-gather fused path; scale folded into the tiny table
        bias = fused_rel_pos_bias(
            enc, cfg, position_ids, bbox, scale=scale, out_dtype=dtype
        )
    else:
        bias32 = jnp.zeros((1, 1, 1, 1), jnp.float32)
        if cfg.has_relative_attention_bias:
            bias32 = bias32 + rel_pos_1d_bias(
                enc["rel_pos_bias"].astype(jnp.float32), cfg, position_ids
            ) * scale
        if cfg.has_spatial_attention_bias:
            bias32 = bias32 + rel_pos_2d_bias(
                enc["rel_pos_x_bias"].astype(jnp.float32),
                enc["rel_pos_y_bias"].astype(jnp.float32),
                cfg,
                bbox,
            ) * scale
        bias = bias32.astype(dtype)
    if attention_mask is not None:
        mask_bias = (
            (1.0 - attention_mask.astype(jnp.float32)) * neg
        ).astype(dtype)
        bias = bias + mask_bias[:, None, None, :]
    if pad_to is not None and pad_to > bias.shape[-1]:
        extra = pad_to - bias.shape[-1]
        pad_val = jnp.asarray(neg, jnp.float32).astype(dtype)
        # key COLUMNS pad with -inf (padded keys must carry zero attention
        # weight); query ROWS pad with 0 — an all--inf query row makes the
        # row softmax/lse numerically undefined, and on real TPUs the
        # resulting NaN poisons dk/dv through the flash backward's
        # row-contraction (pad rows' outputs are garbage either way and are
        # never read)
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, 0), (0, extra)),
            constant_values=pad_val,
        )
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, extra), (0, 0)))
    return bias


@dataclasses.dataclass
class BackboneOutput:
    """Seams needed by the EE model (mirrors EEModelOutput fields that matter)."""

    last_hidden_state: jax.Array  # (B, S, H)
    cls_per_layer: Optional[jax.Array]  # (L, B, H)
    visual_embeddings: jax.Array  # (B, Sv, H) pre-concat
    text_embeddings: Optional[jax.Array]  # (B, St, H) pre-concat
    combined_embeddings: jax.Array  # (B, S, H) post LN+dropout (encoder input)
    hidden_per_layer: Optional[jax.Array] = None  # (L, B, S, H)


def backbone_apply(
    params: Params,
    cfg: LayoutLMv3Config,
    input_ids: jax.Array,
    bbox: jax.Array,
    pixel_values: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    collect_cls: bool = True,
    collect_hidden: bool = False,
    seq_pad_multiple: Optional[int] = None,
) -> BackboneOutput:
    """Full multimodal backbone (parity: LayoutLMv3Model.forward with both
    text and image inputs, the only configuration the reference exercises).

    ``seq_pad_multiple`` pads the concatenated sequence ONCE before the
    encoder to a multiple of the given value (e.g. 128, the TPU lane width):
    the 709-token reference budget tiles badly on the MXU, and padding here
    — instead of per-layer inside the attention kernel — avoids a full HBM
    round-trip of the (B,H,S,S) bias each layer. Padded positions carry
    attention-mask 0 so they never influence real tokens.
    """
    rngs = RngStream(rng)
    b, s_t = input_ids.shape

    if attention_mask is None:
        attention_mask = jnp.ones((b, s_t), jnp.int32)

    text_emb = embed_text(
        params["embeddings"], cfg, input_ids, bbox,
        deterministic=deterministic, rngs=rngs,
    )
    vis_emb = embed_vision(
        params["visual"], cfg, pixel_values, deterministic=deterministic, rngs=rngs
    )
    s_v = vis_emb.shape[1]

    combined = jnp.concatenate([text_emb, vis_emb], axis=1)
    combined = layer_norm(params["LayerNorm"], combined, cfg.layer_norm_eps)
    combined = dropout(combined, cfg.hidden_dropout_prob, deterministic, rngs.next())

    # final bbox / position ids / mask over the concatenated sequence
    vis_bbox = jnp.broadcast_to(visual_bbox(cfg)[None], (b, s_v, 4))
    final_bbox = jnp.concatenate([bbox, vis_bbox], axis=1)
    text_pos = jnp.broadcast_to(jnp.arange(s_t, dtype=jnp.int32)[None], (b, s_t))
    vis_pos = jnp.broadcast_to(jnp.arange(s_v, dtype=jnp.int32)[None], (b, s_v))
    final_position_ids = jnp.concatenate([text_pos, vis_pos], axis=1)
    full_mask = jnp.concatenate(
        [attention_mask, jnp.ones((b, s_v), attention_mask.dtype)], axis=1
    )

    combined_unpadded = combined  # exit heads take modality means pre-pad
    if seq_pad_multiple:
        s_all = combined.shape[1]
        pad = (-s_all) % seq_pad_multiple
        if pad:
            combined = jnp.pad(combined, ((0, 0), (0, pad), (0, 0)))
            final_bbox = jnp.pad(final_bbox, ((0, 0), (0, pad), (0, 0)))
            final_position_ids = jnp.pad(
                final_position_ids, ((0, 0), (0, pad))
            )
            full_mask = jnp.pad(full_mask, ((0, 0), (0, pad)))

    # bias follows the compute dtype: bf16 halves the dominant (B,H,S,S)
    # HBM buffer when running a bf16 model; f32 params keep f32 bias (parity).
    # With the fused attention kernel active, build the bias ONCE at the
    # lane-aligned width so no per-layer re-pad of the bias is needed while
    # QKV/MLP matmuls stay at the true (smaller) sequence length.
    from multi_modal_early_exit_tpu.ops.flash_attention import (
        DEFAULT_BLOCK_Q,
        use_flash_attention,
    )

    if (
        deterministic
        and cfg.has_relative_attention_bias
        and cfg.has_spatial_attention_bias
        and use_fused_bias_attention()
    ):
        scale = 1.0 / math.sqrt(cfg.head_dim)
        enc = params["encoder"]
        attn_bias = FusedBiasContext(
            position_ids=final_position_ids.astype(jnp.int32),
            cx=final_bbox[:, :, 0].astype(jnp.int32),
            cy=final_bbox[:, :, 3].astype(jnp.int32),
            mask=full_mask.astype(jnp.int32),
            t1=enc["rel_pos_bias"].astype(jnp.float32) * scale,
            tx=enc["rel_pos_x_bias"].astype(jnp.float32) * scale,
            ty=enc["rel_pos_y_bias"].astype(jnp.float32) * scale,
        )
    else:
        # pre-pad the bias only when the flash kernel will actually consume
        # it (same eligibility as attention_apply)
        flash_eligible = use_flash_attention()
        if (
            flash_eligible
            # the pallas builder's one-hot lookups run in bf16; route only
            # bf16 models through it so f32 stays bit-exact vs the reference
            and combined.dtype == jnp.bfloat16
            and cfg.has_relative_attention_bias
            and cfg.has_spatial_attention_bias
        ):
            # pallas bias builder: one pass, flash layout, pad included
            attn_bias = kernel_attention_bias(
                params, cfg, final_position_ids, final_bbox, full_mask,
                dtype=combined.dtype,
            )
            if not deterministic and use_table_grad_attention():
                # training escape hatch: hand the layers the raw
                # table/position operands so the attention backward reduces
                # the bias cotangent into the tables in-kernel (no (B,H,S,S)
                # cotangent tensors at all); the materialized bias itself
                # carries no gradient
                scale = 1.0 / math.sqrt(cfg.head_dim)
                enc = params["encoder"]
                attn_bias = TrainBiasContext(
                    bias=jax.lax.stop_gradient(attn_bias),
                    position_ids=final_position_ids.astype(jnp.int32),
                    cx=final_bbox[:, :, 0].astype(jnp.int32),
                    cy=final_bbox[:, :, 3].astype(jnp.int32),
                    t1=enc["rel_pos_bias"].astype(jnp.float32) * scale,
                    tx=enc["rel_pos_x_bias"].astype(jnp.float32) * scale,
                    ty=enc["rel_pos_y_bias"].astype(jnp.float32) * scale,
                )
            elif not deterministic and use_chained_dbias(
                default=effective_scan_fold(cfg) == cfg.num_hidden_layers
            ):
                # chain the bias layer-to-layer so each layer's backward
                # accumulates its bias cotangent in kernel (kills the
                # per-layer dbias write + accumulation pass); default ON
                # exactly when the encoder is fully unrolled — see
                # use_chained_dbias for the measured fold tradeoff
                attn_bias = ChainedBiasContext(attn_bias)
        else:
            bias_pad_to = None
            if flash_eligible and combined.shape[1] % DEFAULT_BLOCK_Q:
                bias_pad_to = (
                    -(-combined.shape[1] // DEFAULT_BLOCK_Q) * DEFAULT_BLOCK_Q
                )
            attn_bias = make_attention_bias(
                params, cfg, final_position_ids, final_bbox, full_mask,
                dtype=combined.dtype, pad_to=bias_pad_to,
            )

    final, cls_per_layer, hidden_per_layer = encoder_apply(
        params["encoder"], cfg, combined, attn_bias,
        deterministic=deterministic, rng=rngs.next(),
        collect_cls=collect_cls, collect_hidden=collect_hidden,
    )

    return BackboneOutput(
        last_hidden_state=final,
        cls_per_layer=cls_per_layer,
        visual_embeddings=vis_emb,
        text_embeddings=text_emb,
        combined_embeddings=combined_unpadded,
        hidden_per_layer=hidden_per_layer,
    )


def forward_image_classification(
    params: Params,
    cfg: LayoutLMv3Config,
    pixel_values: jax.Array,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Image-only ViT-style classification (the reference's ``dit`` model,
    EE/configs.py:429-449): patch embed + encoder without relative biases +
    classifier on [CLS]. Reuses the same parameter tree; text tables unused."""
    rngs = RngStream(rng)
    vis_emb = embed_vision(
        params["visual"], cfg, pixel_values, deterministic=deterministic,
        rngs=rngs,
    )
    final, _, _ = encoder_apply(
        params["encoder"], cfg, vis_emb, attn_bias=None,
        deterministic=deterministic, rng=rngs.next(), collect_cls=False,
    )
    return classifier_apply(
        params["classifier"], cfg, final[:, 0, :],
        deterministic=deterministic, rngs=rngs,
    )


def forward_text_classification(
    params: Params,
    cfg: LayoutLMv3Config,
    input_ids: jax.Array,
    bbox: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Text-only classification (the reference's ``bert`` model,
    EE/configs.py:482-493): text(+layout) embeddings + encoder with the 1D
    relative bias + classifier on [CLS]. ``bbox`` defaults to zeros (plain
    BERT semantics — no layout signal)."""
    rngs = RngStream(rng)
    b, s = input_ids.shape
    if bbox is None:
        bbox = jnp.zeros((b, s, 4), jnp.int32)
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    text_emb = embed_text(
        params["embeddings"], cfg, input_ids, bbox,
        deterministic=deterministic, rngs=rngs,
    )
    position_ids = jnp.broadcast_to(
        jnp.arange(s, dtype=jnp.int32)[None], (b, s)
    )
    attn_bias = make_attention_bias(
        params, cfg, position_ids, bbox, attention_mask
    )
    final, _, _ = encoder_apply(
        params["encoder"], cfg, text_emb, attn_bias,
        deterministic=deterministic, rng=rngs.next(), collect_cls=False,
    )
    return classifier_apply(
        params["classifier"], cfg, final[:, 0, :],
        deterministic=deterministic, rngs=rngs,
    )


def forward_sequence_classification(
    params: Params,
    cfg: LayoutLMv3Config,
    input_ids: jax.Array,
    bbox: jax.Array,
    pixel_values: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense (no-exit) classification logits
    (parity: LayoutLMv3ForSequenceClassification.forward)."""
    out = backbone_apply(
        params, cfg, input_ids, bbox, pixel_values, attention_mask,
        deterministic=deterministic, rng=rng, collect_cls=False,
    )
    rngs = RngStream(jax.random.fold_in(rng, 10_000) if rng is not None else None)
    return classifier_apply(
        params["classifier"], cfg, out.last_hidden_state[:, 0, :],
        deterministic=deterministic, rngs=rngs,
    )

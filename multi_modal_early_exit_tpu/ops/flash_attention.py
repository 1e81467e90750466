"""Pallas TPU fused attention with additive bias.

The LayoutLMv3 attention pattern is ``softmax((q/sqrt(d)) k^T + bias) v``
with a per-head additive bias (relative 1D + 2D position + padding mask,
computed once per forward — modeling.make_attention_bias). XLA materializes
the (B, H, S, S) score and probability tensors in HBM every layer; at the
reference budget (S=709, H=12) that is ~48 MB of HBM traffic per sample per
layer. This kernel keeps scores/probabilities entirely in VMEM: per
(batch*head, q-block) grid cell it reads a q tile, the full K/V (S*D bf16 is
~100 KB — comfortably VMEM-resident), and the bias tile, computes the
softmax in fp32 on-chip, and writes only the (Bq, D) output.

Used for the deterministic (inference) path; training falls back to the XLA
composition (attention-dropout needs the probability tensor anyway).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # q (1, 1, Bq, D), k/v (1, 1, S, D), bias (1, 1, Bq, S) -> o (1, 1, Bq, D)
    q = q_ref[0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, S)
    s = s + bias_ref[0, 0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, target: int, value=0.0) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(
    q: jax.Array,  # (B, H, S, D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # (B, H, S, S) additive (incl. padding mask)
    block_q: int = DEFAULT_BLOCK_Q,
) -> jax.Array:
    """Fused attention; returns (B, H, S, D) in q's dtype.

    Sequence length is padded to a multiple of ``block_q`` internally; the
    bias pad is NEG_INF on key columns so padded keys receive zero weight.

    Differentiable: the backward pass recomputes attention with the XLA
    composition (``reference_attention``) and differentiates that — the
    forward stays a Pallas kernel, gradients are exact (same math).
    """
    return _flash_attention_fwd_impl(q, k, v, bias, block_q)


@functools.partial(jax.jit, static_argnames=("block_q",))
def _flash_attention_fwd_impl(q, k, v, bias, block_q: int = DEFAULT_BLOCK_Q):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s_pad = -(-s // block_q) * block_q

    # operate on the (B, H, S, D)/(B, H, S, S) layouts directly — no
    # flattening reshapes (a reshape before pallas_call forces an HBM copy
    # of the ~GB-scale bias tensor)
    qp = _pad_to(q, 2, s_pad)
    kp = _pad_to(k, 2, s_pad)
    vp = _pad_to(v, 2, s_pad)
    bp = _pad_to(_pad_to(bias, 3, s_pad, NEG_INF), 2, s_pad)

    grid = (b, h, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda i, hh, j: (i, hh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s_pad, d),
                             lambda i, hh, j: (i, hh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s_pad, d),
                             lambda i, hh, j: (i, hh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, s_pad),
                             lambda i, hh, j: (i, hh, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda i, hh, j: (i, hh, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d,
            bytes_accessed=(
                2 * b * h * s_pad * d * qp.dtype.itemsize * 2
                + b * h * s_pad * s_pad * bp.dtype.itemsize
            ),
            transcendentals=b * h * s_pad * s_pad,
        ),
    )(qp, kp, vp, bp)
    return out[:, :, :s, :]


def _flash_attention_vjp_fwd(q, k, v, bias, block_q):
    return _flash_attention_fwd_impl(q, k, v, bias, block_q), (q, k, v, bias)


def _flash_attention_vjp_bwd(block_q, residuals, g):
    q, k, v, bias = residuals
    s = q.shape[2]
    bias_s = bias[:, :, :s, :s] if bias.shape[-1] != s else bias
    _, vjp = jax.vjp(reference_attention, q, k, v, bias_s)
    dq, dk, dv, dbias_s = vjp(g)
    if bias.shape[-1] != s:
        widths = [(0, 0), (0, 0),
                  (0, bias.shape[2] - s), (0, bias.shape[3] - s)]
        dbias = jnp.pad(dbias_s, widths)
    else:
        dbias = dbias_s
    return dq, dk, dv, dbias


flash_attention.defvjp(_flash_attention_vjp_fwd, _flash_attention_vjp_bwd)


def reference_attention(q, k, v, bias) -> jax.Array:
    """Pure-jnp reference (identical math to modeling.attention_apply)."""
    d = q.shape[-1]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q / math.sqrt(d), k,
        preferred_element_type=jnp.float32,
    )
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def use_flash_attention() -> bool:
    """Flash path on TPU backends only (pallas TPU lowering).
    Set MMEE_DISABLE_FLASH=1 to force the XLA composition."""
    import os

    if os.environ.get("MMEE_DISABLE_FLASH"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False

"""Pallas TPU fused attention with additive bias — forward AND backward.

The LayoutLMv3 attention pattern is ``softmax((q/sqrt(d)) k^T + bias) v``
with a per-head additive bias (relative 1D + 2D position + padding mask,
computed once per forward — modeling.make_attention_bias). XLA materializes
the (B, H, S, S) score and probability tensors in HBM every layer; at the
reference budget (S=709, H=12) that is ~48 MB of HBM traffic per sample per
layer. This kernel keeps scores/probabilities entirely in VMEM: per
(batch, head, q-block) grid cell it reads a q tile, the full K/V (S*D bf16
is ~100 KB — comfortably VMEM-resident), and the bias tile, computes the
softmax in fp32 on-chip, and writes only the (Bq, D) output plus a (Bq,)
logsumexp row statistic.

The backward is ONE fused Pallas kernel per layout (standard flash
recompute scheme — no (B,H,S,S) probability tensor ever touches HBM; the
only S×S HBM tensors in the whole fwd+bwd are the bias read and the dbias
write, which the model genuinely needs because the relative-position
bucket tables are trained — reference training hot loop:
EE/models/EE_modules.py:344-377): grid (B, H, S/block_q), recomputing the
probability tile from the saved logsumexp, forming dS on-chip, emitting dq
and the dS tile (which IS dbias) per cell, and accumulating dk/dv in
VMEM-resident f32 output blocks whose index is constant over the q-block
axis (so they never round-trip to HBM between grid steps).

Attention-probability dropout (the reference trains with
attention_probs_dropout_prob > 0) runs *inside* the kernel using a
counter-based position hash (`dropout_uniform`): mask(b,h,i,j) is a pure
function of (seed, b, h, i, j), so the forward and both backward kernels
regenerate bit-identical masks with zero HBM traffic and no dependence on
kernel tiling. (The stateful pltpu PRNG is deliberately not used: its
stream order would couple the mask to the grid schedule, and it is a no-op
under the CPU interpreter that the test suite runs on.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_modal_early_exit_tpu.ops.hashing import dropout_uniform

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


# ---------------------------------------------------------------------------
# position-hash dropout (ops/hashing.py supplies the uniform)
# ---------------------------------------------------------------------------

def _dropout_scale_tile(
    seed, bh, row0, col0, shape, rate: float
) -> jax.Array:
    """(shape) tile of mask/keep_prob values for positions starting at
    (row0, col0): 0 where dropped, 1/keep where kept."""
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    u = dropout_uniform(seed, bh, rows, cols)
    keep = 1.0 - rate
    return jnp.where(u < keep, jnp.float32(1.0 / keep), jnp.float32(0.0))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _attn_fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
    *, scale: float, rate: float, block_q: int,
):
    # q (1, 1, Bq, D), k/v (1, 1, S, D), bias (1, 1, Bq, S) -> o (1, 1, Bq, D)
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    q_blk = pl.program_id(2)
    # matmuls run at the INPUT dtype with f32 accumulation: for bf16 inputs
    # the MXU's bf16xbf16->f32 mode is bit-identical to upcasting first
    # (bf16 products are exact in f32) but ~4x faster than the emulated f32
    # matmul the upcast forces; f32 inputs keep full-precision behavior.
    # The 1/sqrt(d) scale is applied to the f32 scores, never to bf16 q.
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Bq, S)
    s = s + bias_ref[0, 0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    if rate > 0.0:
        bh = b_idx * pl.num_programs(1) + h_idx
        p = p * _dropout_scale_tile(
            seed_ref[0], bh, q_blk * block_q, 0, p.shape, rate
        )
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(denom)  # (Bq, 1)


def _pad_to(x: jax.Array, axis: int, target: int, value=0.0) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _tile_width(s: int, bias_width: int, block_q: int) -> tuple[int, int]:
    """Padded sequence width and q-block size such that the block tiles it.

    A pre-padded (wider) bias fixes the compute width; the q-block must
    tile it exactly, so shrink the block until it divides (a model-level
    pre-pad is a multiple of 128, the floor). Shared by the forward and
    backward impls so a custom-vjp pair always agrees on the layout.
    """
    s_pad = max(-(-s // block_q) * block_q, bias_width)
    while block_q > 8 and s_pad % block_q:
        block_q //= 2
    s_pad = max(-(-s // block_q) * block_q, bias_width)
    if s_pad % block_q:
        raise ValueError(
            f"pre-padded bias width {bias_width} does not tile by any "
            f"q-block size >= 8"
        )
    return s_pad, block_q


def _pre_padded_layout(s: int, bias_width: int, block_q: int) -> tuple[int, int]:
    """Tile layout for the chained op, whose bias arrives PRE-padded: the
    bias width IS the kernel width (the backward aliases the caller's
    cotangent buffer for the in-place accumulate, so it cannot re-pad) and
    the q-block shrinks until it divides that width. Shared by the primal,
    fwd, and bwd so the custom-vjp trio always agrees on the layout — any
    128-multiple pre-pad works, not only widths the default 256 block
    happens to tile."""
    if bias_width < s:
        raise ValueError(
            "flash_attention_packed_train_chained requires a bias pre-padded "
            f"to at least the sequence length: bias width {bias_width} < {s}"
        )
    while block_q > 8 and bias_width % block_q:
        block_q //= 2
    if bias_width % block_q:
        raise ValueError(
            f"pre-padded bias width {bias_width} does not tile by any "
            f"q-block size >= 8"
        )
    return bias_width, block_q


@functools.partial(
    jax.jit, static_argnames=("block_q", "rate", "with_lse")
)
def _flash_attention_fwd_impl(
    q, k, v, bias, seed, block_q: int, rate: float, with_lse: bool = False
):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s_pad, block_q = _tile_width(s, bias.shape[-1], block_q)

    # operate on the (B, H, S, D)/(B, H, S, S) layouts directly — no
    # flattening reshapes (a reshape before pallas_call forces an HBM copy
    # of the ~GB-scale bias tensor)
    qp = _pad_to(q, 2, s_pad)
    kp = _pad_to(k, 2, s_pad)
    vp = _pad_to(v, 2, s_pad)
    bp = _pad_to(_pad_to(bias, 3, s_pad, NEG_INF), 2, s_pad)

    grid = (b, h, s_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _attn_fwd_kernel, scale=scale, rate=rate, block_q=block_q
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            # (B, H, S, 1): trailing singleton keeps the block TPU-legal
            jax.ShapeDtypeStruct((b, h, s_pad, 1), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
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
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda i, hh, j: (i, hh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda i, hh, j: (i, hh, j, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d,
            bytes_accessed=(
                2 * b * h * s_pad * d * qp.dtype.itemsize * 2
                + b * h * s_pad * s_pad * bp.dtype.itemsize
            ),
            transcendentals=b * h * s_pad * s_pad,
        ),
    )(seed, qp, kp, vp, bp)
    if with_lse:
        return out[:, :, :s, :], lse
    return out[:, :, :s, :]


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _attn_bwd_fused_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dbias_ref, dk_ref, dv_ref,
    *, scale: float, rate: float, block_q: int,
):
    """Per (b, h, q-block): dq + dbias tiles, with dk/dv ACCUMULATED across
    the q-block grid dimension (their output blocks map to the same position
    for every j, so they live in VMEM for the whole (b, h) sweep and are
    written back once). One probability recompute serves all four grads —
    half the qk^T/exp/bias-read/dropout-hash work of a two-kernel scheme."""
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    q_blk = pl.program_id(2)
    # input-dtype matmuls (see forward kernel): bf16 operands use the native
    # MXU mode; intermediates (p, ds) are cast back to the input dtype for
    # their matmuls — the same rounding the forward applies to p.
    q = q_ref[0, 0]          # (Bq, D)
    k = k_ref[0, 0]          # (S, D)
    v = v_ref[0, 0]          # (S, D)
    do = do_ref[0, 0]        # (Bq, D)
    lse = lse_ref[0, 0]     # (Bq, 1)
    delta = delta_ref[0, 0]  # (Bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0, 0].astype(jnp.float32)  # (Bq, S)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, S)
    if rate > 0.0:
        bh = b_idx * pl.num_programs(1) + h_idx
        c = _dropout_scale_tile(
            seed_ref[0], bh, q_blk * block_q, 0, p.shape, rate
        )
        p_dropped = p * c
        dp = dp * c
    else:
        p_dropped = p
    ds = p * (dp - delta)  # (Bq, S) — this IS dbias for the tile
    dbias_ref[0, 0] = ds.astype(dbias_ref.dtype)
    ds_c = ds.astype(q.dtype)
    p_c = p_dropped.astype(do.dtype)
    dq_ref[0, 0] = (
        jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)

    @pl.when(q_blk == 0)
    def _init():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    # dk_j += sum_i ds_ij q_i * scale ; dv_j += sum_i (p*c)_ij do_i
    dk_ref[0, 0] += jax.lax.dot_general(
        ds_c, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dv_ref[0, 0] += jax.lax.dot_general(
        p_c, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("block_q", "rate")
)
def _flash_attention_bwd_impl(
    q, k, v, bias, seed, o, lse, g, block_q: int, rate: float
):
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s_pad, block_q = _tile_width(s, bias.shape[-1], block_q)

    qp = _pad_to(q, 2, s_pad)
    kp = _pad_to(k, 2, s_pad)
    vp = _pad_to(v, 2, s_pad)
    bp = _pad_to(_pad_to(bias, 3, s_pad, NEG_INF), 2, s_pad)
    gp = _pad_to(g, 2, s_pad)
    op = _pad_to(o, 2, s_pad)
    # pad lse with +BIG so p = exp(s - lse) underflows to 0 for rows the
    # forward never saw (their do rows are 0 anyway)
    lsep = _pad_to(lse, 2, s_pad, -NEG_INF)  # (B, H, S_pad, 1)
    # delta_i = rowsum(do_i * o_i) = sum_j p~_ij dL/dp_ij (cheap, in XLA)
    delta = jnp.sum(
        gp.astype(jnp.float32) * op.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B, H, S_pad, 1)

    row_spec = pl.BlockSpec((1, 1, block_q, d), lambda i, hh, j: (i, hh, j, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, 1, s_pad, d), lambda i, hh, j: (i, hh, 0, 0),
                             memory_space=pltpu.VMEM)
    vec_row_spec = pl.BlockSpec((1, 1, block_q, 1),
                                lambda i, hh, j: (i, hh, j, 0),
                                memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    grid_q = (b, h, s_pad // block_q)
    dq, dbias, dk32, dv32 = pl.pallas_call(
        functools.partial(
            _attn_bwd_fused_kernel, scale=scale, rate=rate, block_q=block_q
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, s_pad), bias.dtype),
            # dk/dv accumulate across q-blocks in f32 (their block index is
            # constant over j, so the accumulator stays VMEM-resident)
            jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=grid_q,
            in_specs=[
                seed_spec,
                row_spec,   # q tile
                full_spec,  # k
                full_spec,  # v
                pl.BlockSpec((1, 1, block_q, s_pad),
                             lambda i, hh, j: (i, hh, j, 0),
                             memory_space=pltpu.VMEM),  # bias tile
                row_spec,   # do tile
                vec_row_spec,  # lse tile
                vec_row_spec,  # delta tile
            ],
            out_specs=[
                row_spec,  # dq
                pl.BlockSpec((1, 1, block_q, s_pad),
                             lambda i, hh, j: (i, hh, j, 0),
                             memory_space=pltpu.VMEM),  # dbias
                full_spec,  # dk accumulator
                full_spec,  # dv accumulator
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s_pad * s_pad * d,
            bytes_accessed=(
                6 * b * h * s_pad * d * qp.dtype.itemsize
                + 2 * b * h * s_pad * s_pad * bp.dtype.itemsize
            ),
            transcendentals=b * h * s_pad * s_pad,
        ),
    )(seed, qp, kp, vp, bp, gp, lsep, delta)
    dk = dk32.astype(k.dtype)
    dv = dv32.astype(v.dtype)

    dq = dq[:, :, :s, :]
    dk = dk[:, :, :s, :]
    dv = dv[:, :, :s, :]
    # dbias in the padded region is exactly zero (padded q rows have do=0;
    # padded key columns have p=0) — slice back to the caller's bias shape.
    dbias = dbias[:, :, : bias.shape[2], : bias.shape[3]]
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# public custom-vjp op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_core(q, k, v, bias, seed, block_q: int, rate: float):
    return _flash_attention_fwd_impl(q, k, v, bias, seed, block_q, rate)


def _flash_core_fwd(q, k, v, bias, seed, block_q, rate):
    o, lse = _flash_attention_fwd_impl(
        q, k, v, bias, seed, block_q, rate, with_lse=True
    )
    return o, (q, k, v, bias, seed, o, lse)


def _flash_core_bwd(block_q, rate, residuals, g):
    q, k, v, bias, seed, o, lse = residuals
    dq, dk, dv, dbias = _flash_attention_bwd_impl(
        q, k, v, bias, seed, o, lse, g, block_q, rate
    )
    return dq, dk, dv, dbias, None  # seed (int) gets no cotangent


_flash_attention_core.defvjp(_flash_core_fwd, _flash_core_bwd)

_ZERO_SEED = np.zeros((1,), np.int32)


def flash_attention(
    q: jax.Array,  # (B, H, S, D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # (B, H, S', S') additive, S' >= S (incl. padding mask)
    block_q: int = DEFAULT_BLOCK_Q,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | None = None,  # (1,) int32
) -> jax.Array:
    """Fused attention; returns (B, H, S, D) in q's dtype.

    Sequence length is padded to a multiple of ``block_q`` internally; the
    bias pad is NEG_INF on key columns so padded keys receive zero weight.
    ``bias`` may already be pre-padded wider than S (model-level pre-pad).

    Differentiable with a Pallas backward (flash recompute — no (S,S)
    probability tensor in HBM in either direction). With
    ``dropout_rate > 0`` attention-probability dropout runs in-kernel from
    the position-hash mask seeded by ``dropout_seed``; gradients see the
    identical mask.
    """
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires a dropout_seed")
    seed = _ZERO_SEED if dropout_seed is None else dropout_seed
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return _flash_attention_core(
        q, k, v, bias, seed, block_q, float(dropout_rate)
    )


# ---------------------------------------------------------------------------
# packed-layout forward kernel: q/k/v as (B, S, H*D) rows
# ---------------------------------------------------------------------------

def _attn_fwd_packed_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref,
    *, scale: float, head_dim: int, heads_per_cell: int,
):
    """One (batch, q-block, head-group) cell over PACKED (rows, H*D)
    operands.

    The head group is the INNERMOST grid dim and q/k/v/o blocks are constant
    over it, so Pallas keeps the full contiguous rows VMEM-resident across
    all heads (one DMA per q-block for q/o, one per batch for k/v) — no
    (B,H,S,D) transpose copies exist anywhere. Lane-dim dynamic slices carve
    out head groups (Mosaic demands 128-aligned dynamic lane offsets, hence
    groups of heads totalling a lane-tile multiple); heads split statically
    within the group."""
    width = heads_per_cell * head_dim
    if width == q_ref.shape[-1]:
        # single head group: a STATIC full-width slice (Mosaic cannot prove
        # program_id(2)*width is lane-aligned even when the grid dim is 1)
        cols = slice(None)
    else:
        cols = pl.ds(pl.program_id(2) * width, width)
    # input-dtype matmuls (see _attn_fwd_kernel): bf16 operands hit the
    # native MXU mode; the scale lands on the f32 scores
    qg = q_ref[0, :, cols]                               # (Bq, hp*D)
    kg = k_ref[0, :, cols]                               # (S, hp*D)
    vg = v_ref[0, :, cols]                               # (S, hp*D)
    outs = []
    for e in range(heads_per_cell):
        lo, hi = e * head_dim, (e + 1) * head_dim
        s = jax.lax.dot_general(
            qg[:, lo:hi], kg[:, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[0, e].astype(jnp.float32)   # (Bq, S)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(
            jnp.dot(p.astype(vg.dtype), vg[:, lo:hi],
                    preferred_element_type=jnp.float32)
        )
    o_ref[0, :, cols] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_packed(
    q: jax.Array,      # (B, S, H*D) — projection output, NO head transpose
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,   # (B, H, S', S') additive, S' >= S (incl. mask)
    num_heads: int,
    block_q: int = 256,
) -> jax.Array:
    """Deterministic fused attention on the packed (B, S, hidden) layout.

    Returns (B, S, H*D) in q's dtype — the layout the output projection
    consumes directly. Compared to ``flash_attention`` this removes the
    three (B,S,H,D)->(B,H,S,D) transpose copies and the context transpose
    per layer AND stops XLA distorting neighbour fusion layouts to feed
    them (profiled at ~25% of a cascade encoder layer), and runs 256-row
    q-blocks (fewer grid cells, bigger bias DMAs): together 980 -> 1236
    docs/sec on the cascade benchmark. No dropout (deterministic paths
    only; training's stochastic path uses
    ``flash_attention_packed_train``). Still
    differentiable — the VJP recomputes through the (B,H,S,D) backward
    kernels, so grad-of-eval-mode callers work.
    """
    return _flash_packed_impl(q, k, v, bias, num_heads, block_q)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q"))
def _flash_packed_impl(q, k, v, bias, num_heads: int, block_q: int):
    b, s, hd = q.shape
    d = hd // num_heads
    # Mosaic requires dynamic lane offsets to be 128-aligned: group heads so
    # each group spans a lane-tile multiple (base-config: 2 heads x 64 =
    # 128). When no divisor of num_heads aligns, fall back to ONE group —
    # offset 0 is trivially aligned.
    hp = num_heads
    if 128 % d == 0:
        cand = 128 // d
        while cand < num_heads and num_heads % cand:
            cand *= 2
        hp = min(cand, num_heads)
    s_pad, block_q = _tile_width(s, bias.shape[-1], block_q)
    qp = _pad_to(q, 1, s_pad)
    kp = _pad_to(k, 1, s_pad)
    vp = _pad_to(v, 1, s_pad)
    bp = _pad_to(_pad_to(bias, 3, s_pad, NEG_INF), 2, s_pad)

    row_spec = pl.BlockSpec((1, block_q, hd), lambda i, j, hh: (i, j, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, s_pad, hd), lambda i, j, hh: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _attn_fwd_packed_kernel, scale=1.0 / math.sqrt(d), head_dim=d,
            heads_per_cell=hp,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, s_pad // block_q, num_heads // hp),  # heads innermost
            in_specs=[
                row_spec,   # q rows (resident across heads)
                full_spec,  # k rows (resident across heads and q-blocks)
                full_spec,  # v rows
                pl.BlockSpec((1, hp, block_q, s_pad),
                             lambda i, j, hh: (i, hh, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=row_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s_pad * s_pad * hd,
            bytes_accessed=(
                4 * b * s_pad * hd * qp.dtype.itemsize
                + b * num_heads * s_pad * s_pad * bp.dtype.itemsize
            ),
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
    )(qp, kp, vp, bp)
    return out[:, :s, :]


# ---------------------------------------------------------------------------
# packed-layout TRAINING kernels: fwd with lse + in-kernel dropout, fused bwd
# ---------------------------------------------------------------------------

def _packed_head_groups(num_heads: int, d: int) -> int:
    """Heads per grid cell such that the lane slice width hp*d is a
    128-multiple (Mosaic dynamic-lane-offset rule); falls back to one group
    (static full-width slice) when no divisor aligns."""
    hp = num_heads
    if 128 % d == 0:
        cand = 128 // d
        while cand < num_heads and num_heads % cand:
            cand *= 2
        hp = min(cand, num_heads)
    return hp


def _packed_cols(ref, width: int):
    if width == ref.shape[-1]:
        return slice(None)
    return pl.ds(pl.program_id(2) * width, width)


def _col_to_row(x: jax.Array) -> jax.Array:
    """(N, 1) column -> (N,) lane vector via a 2-D transpose (the one
    sublane<->lane relayout Mosaic supports everywhere). Used to emit
    per-row statistics (lse, delta) as DENSE (…, S) tensors: a trailing
    size-1 tiled dim ((B,H,S,1) with T(8,128)) physically pads the lane dim
    to 128 — a 128x memory/bandwidth blow-up that showed up as ~4 ms/step
    of pure layout copies in the train profile (docs/PROFILE_TRAIN.md)."""
    return jax.lax.transpose(x, (1, 0))[0]


def _row_to_col(x: jax.Array) -> jax.Array:
    """(N,) lane vector -> (N, 1) column (inverse of _col_to_row)."""
    return jax.lax.transpose(x[None, :], (1, 0))


def _attn_fwd_packed_train_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
    *, scale: float, rate: float, head_dim: int, heads_per_cell: int,
    num_heads: int, block_q: int,
):
    """Packed-train forward: like the deterministic packed kernel plus the
    DENSE (B, H, S) logsumexp output and the in-kernel position-hash dropout.
    The mask is a pure function of (seed, b*H+h, i, j) — identical to the
    (B,H,S,D) kernels', so either pair regenerates the other's stream."""
    b_idx = pl.program_id(0)
    j = pl.program_id(1)
    hg = pl.program_id(2)
    width = heads_per_cell * head_dim
    cols = _packed_cols(q_ref, width)
    qg = q_ref[0, :, cols]
    kg = k_ref[0, :, cols]
    vg = v_ref[0, :, cols]
    outs = []
    for e in range(heads_per_cell):
        lo, hi = e * head_dim, (e + 1) * head_dim
        s = jax.lax.dot_general(
            qg[:, lo:hi], kg[:, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[0, e].astype(jnp.float32)   # (Bq, S)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = p / denom
        if rate > 0.0:
            bh = b_idx * num_heads + (hg * heads_per_cell + e)
            p = p * _dropout_scale_tile(
                seed_ref[0], bh, j * block_q, 0, p.shape, rate
            )
        outs.append(
            jnp.dot(p.astype(vg.dtype), vg[:, lo:hi],
                    preferred_element_type=jnp.float32)
        )
        # lse block spans ALL heads (Mosaic wants the sublane dim full or
        # 8-divisible); each cell writes its group's rows. hh is innermost,
        # so the block stays VMEM-resident across the head-group sweep.
        h_idx = pl.program_id(2) * heads_per_cell + e
        lse_ref[0, h_idx] = _col_to_row(m + jnp.log(denom))  # (Bq,)
    o_ref[0, :, cols] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _attn_bwd_packed_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref, lse_ref,
    *refs,
    scale: float, rate: float, head_dim: int, heads_per_cell: int,
    num_heads: int, block_q: int, chained: bool = False,
):
    """Packed-layout fused backward, grid (b, head-group, q-block).

    ``chained``: an incoming bias-cotangent tile (the running cross-layer
    accumulator) is supplied and the kernel emits ``gbias + ds`` in place
    (the caller aliases the accumulator buffer onto the dbias output), so
    the encoder's per-layer bias-cotangent accumulation costs one in-kernel
    add instead of a separate (B,H,S,S) write + XLA select_add pass.

    The q-block dim is INNERMOST so the per-(b, head-group) dk/dv f32
    accumulator blocks are revisited consecutively and accumulate in VMEM
    across the j sweep — the exact pattern of the proven head-form kernel
    (_attn_bwd_fused_kernel). Every output block belongs to one head group
    (full-block writes; no dynamic lane-slice stores on revisited buffers —
    that combination miscompiled to NaN dk/dv on real TPUs while passing in
    interpret mode). One probability recompute per head serves
    dq/dbias/dk/dv."""
    if chained:
        gbias_ref, dq_ref, dbias_ref, dk_ref, dv_ref = refs
    else:
        gbias_ref = None
        dq_ref, dbias_ref, dk_ref, dv_ref = refs
    b_idx = pl.program_id(0)
    hg = pl.program_id(1)
    j = pl.program_id(2)
    # q/k/v/do/o arrive lane-dim-blocked to this cell's head-group columns
    # (width = hp*D): the spec slices the group, so k/v DMA per (b, group)
    # is width/hd of the full rows instead of all heads' columns. Input-
    # dtype matmuls (see _attn_bwd_fused_kernel).
    qg = q_ref[0]                                        # (Bq, hp*D)
    kg = k_ref[0]                                        # (S, hp*D)
    vg = v_ref[0]
    dog = do_ref[0]
    og = o_ref[0]

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dq_parts = []
    dk_parts = []
    dv_parts = []
    for e in range(heads_per_cell):
        lo, hi = e * head_dim, (e + 1) * head_dim
        q, k, v, do = qg[:, lo:hi], kg[:, lo:hi], vg[:, lo:hi], dog[:, lo:hi]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias_ref[0, e].astype(jnp.float32)    # (Bq, S)
        p = jnp.exp(s - _row_to_col(lse_ref[0, hg * heads_per_cell + e]))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            bh = b_idx * num_heads + (hg * heads_per_cell + e)
            c = _dropout_scale_tile(
                seed_ref[0], bh, j * block_q, 0, p.shape, rate
            )
            p_dropped = p * c
            dp = dp * c
        else:
            p_dropped = p
        # delta[i] = sum_d do*o over this head's slice, computed in-register
        # (no (B,H,S,1) delta tensor / XLA reduce pass exists at all)
        delta = jnp.sum(
            do.astype(jnp.float32) * og[:, lo:hi].astype(jnp.float32),
            axis=-1, keepdims=True,
        )                                                 # (Bq, 1)
        ds = p * (dp - delta)                             # (Bq, S)
        if chained:
            dbias_ref[0, e] = (
                gbias_ref[0, e].astype(jnp.float32) + ds
            ).astype(dbias_ref.dtype)
        else:
            dbias_ref[0, e] = ds.astype(dbias_ref.dtype)
        ds_c = ds.astype(q.dtype)
        p_c = p_dropped.astype(do.dtype)
        dq_parts.append(
            jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * scale
        )
        dk_parts.append(jax.lax.dot_general(
            ds_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)
        dv_parts.append(jax.lax.dot_general(
            p_c, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    dq_ref[0] = jnp.concatenate(dq_parts, -1).astype(dq_ref.dtype)
    dk_ref[0] += jnp.concatenate(dk_parts, -1)
    dv_ref[0] += jnp.concatenate(dv_parts, -1)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "rate")
)
def _flash_packed_train_fwd_impl(
    q, k, v, bias, seed, num_heads: int, block_q: int, rate: float
):
    b, s, hd = q.shape
    d = hd // num_heads
    hp = _packed_head_groups(num_heads, d)
    s_pad, block_q = _tile_width(s, bias.shape[-1], block_q)
    qp = _pad_to(q, 1, s_pad)
    kp = _pad_to(k, 1, s_pad)
    vp = _pad_to(v, 1, s_pad)
    bp = _pad_to(_pad_to(bias, 3, s_pad, NEG_INF), 2, s_pad)

    row_spec = pl.BlockSpec((1, block_q, hd), lambda i, j, hh: (i, j, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, s_pad, hd), lambda i, j, hh: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(
            _attn_fwd_packed_train_kernel, scale=1.0 / math.sqrt(d),
            rate=rate, head_dim=d, heads_per_cell=hp, num_heads=num_heads,
            block_q=block_q,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad, hd), q.dtype),
            # DENSE (B, H, S) lse: a trailing size-1 tiled dim would pad the
            # lane dim to 128 (128x memory + pathological stash copies)
            jax.ShapeDtypeStruct((b, num_heads, s_pad), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=(b, s_pad // block_q, num_heads // hp),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
                row_spec, full_spec, full_spec,
                pl.BlockSpec((1, hp, block_q, s_pad),
                             lambda i, j, hh: (i, hh, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                row_spec,
                pl.BlockSpec((1, num_heads, block_q),
                             lambda i, j, hh: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s_pad * s_pad * hd,
            bytes_accessed=(
                4 * b * s_pad * hd * qp.dtype.itemsize
                + b * num_heads * s_pad * s_pad * bp.dtype.itemsize
            ),
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
    )(seed, qp, kp, vp, bp)
    return out[:, :s, :], lse


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "rate")
)
def _flash_packed_bwd_impl(
    q, k, v, bias, seed, o, lse, g, num_heads: int, block_q: int, rate: float,
    gbias=None,
):
    b, s, hd = q.shape
    d = hd // num_heads
    hp = _packed_head_groups(num_heads, d)
    s_pad, block_q = _tile_width(s, bias.shape[-1], block_q)
    qp = _pad_to(q, 1, s_pad)
    kp = _pad_to(k, 1, s_pad)
    vp = _pad_to(v, 1, s_pad)
    gp = _pad_to(g, 1, s_pad)
    op = _pad_to(o, 1, s_pad)
    bp = _pad_to(_pad_to(bias, 3, s_pad, NEG_INF), 2, s_pad)
    lsep = _pad_to(lse, 2, s_pad, -NEG_INF)  # (B, H, S_pad) dense
    # delta (sum_d do*o per row/head) is computed IN KERNEL from the o rows

    n_hg = num_heads // hp
    width = hp * d
    lse_spec = pl.BlockSpec((1, num_heads, block_q),
                            lambda i, hh, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, hp, block_q, s_pad),
                             lambda i, hh, j: (i, hh, j, 0),
                             memory_space=pltpu.VMEM)
    # ALL packed operands and outputs are lane-dim-blocked to the cell's
    # head-group columns: every block is full-width for its cell (no
    # dynamic lane-slice loads/stores), q/do/o rows cost the same total DMA
    # as unblocked, and k/v rows per (b, group) shrink from all heads'
    # columns to the group's width/hd slice (6x less k/v traffic at the
    # base config). dq per (group, q-block); dk/dv accumulate per group
    # over the innermost j sweep (the head-form kernel's proven revisit
    # pattern); everything lands DIRECTLY in the packed (B, S, hd) layout.
    row_spec_g = pl.BlockSpec((1, block_q, width),
                              lambda i, hh, j: (i, j, hh),
                              memory_space=pltpu.VMEM)
    kv_spec_g = pl.BlockSpec((1, s_pad, width),
                             lambda i, hh, j: (i, 0, hh),
                             memory_space=pltpu.VMEM)
    dq_spec = row_spec_g
    acc_spec = kv_spec_g
    chained = gbias is not None
    operands = [seed, qp, kp, vp, bp, gp, op, lsep]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        row_spec_g,  # q rows (group columns)
        kv_spec_g,   # k (group columns)
        kv_spec_g,   # v
        bias_spec,   # bias tile
        row_spec_g,  # do rows
        row_spec_g,  # o rows (in-kernel delta)
        lse_spec,    # lse
    ]
    alias_kwargs = {}
    if chained:
        # the incoming cross-layer bias-cotangent accumulator: read the
        # tile, add ds, write back IN PLACE (aliased onto the dbias output)
        if gbias.shape != (b, num_heads, s_pad, s_pad):
            raise ValueError(
                "chained bias cotangent must be pre-padded to the kernel "
                f"width: got {gbias.shape}, want {(b, num_heads, s_pad, s_pad)}"
            )
        operands.append(gbias.astype(bias.dtype))
        in_specs.append(bias_spec)
        alias_kwargs["input_output_aliases"] = {8: 1}
    dq4, dbias, dk4, dv4 = pl.pallas_call(
        functools.partial(
            _attn_bwd_packed_kernel, scale=1.0 / math.sqrt(d), rate=rate,
            head_dim=d, heads_per_cell=hp, num_heads=num_heads,
            block_q=block_q, chained=chained,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads, s_pad, s_pad), bias.dtype),
            jax.ShapeDtypeStruct((b, s_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, s_pad, hd), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=(b, n_hg, s_pad // block_q),
            in_specs=in_specs,
            out_specs=[
                dq_spec,    # dq (per group + q-block)
                bias_spec,  # dbias
                acc_spec,   # dk accumulator (VMEM-resident per (b, group))
                acc_spec,   # dv accumulator
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * s_pad * s_pad * hd,
            bytes_accessed=(
                6 * b * s_pad * hd * qp.dtype.itemsize
                + 2 * b * num_heads * s_pad * s_pad * bp.dtype.itemsize
            ),
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        **alias_kwargs,
    )(*operands)

    dq = dq4[:, :s, :]
    dk = dk4[:, :s, :].astype(k.dtype)
    dv = dv4[:, :s, :].astype(v.dtype)
    dbias = dbias[:, :, : bias.shape[2], : bias.shape[3]]
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_packed_train(
    q: jax.Array,      # (B, S, H*D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,   # (B, H, S', S')
    seed: jax.Array,   # (1,) int32
    num_heads: int,
    block_q: int = 256,
    rate: float = 0.0,
) -> jax.Array:
    """Training twin of ``flash_attention_packed``: packed (B, S, hidden)
    layout end-to-end, in-kernel position-hash dropout, and a packed fused
    backward — no (B,H,S,D) transposes exist in the forward OR backward
    program. The dropout mask function matches the (B,H,S,D) kernels', so
    outputs/gradients are bit-comparable across the two formulations."""
    out, _ = _flash_packed_train_fwd_impl(
        q, k, v, bias, seed, num_heads, block_q, rate
    )
    return out


def _packed_train_fwd(q, k, v, bias, seed, num_heads, block_q, rate):
    out, lse = _flash_packed_train_fwd_impl(
        q, k, v, bias, seed, num_heads, block_q, rate
    )
    return out, (q, k, v, bias, seed, out, lse)


def _packed_train_bwd(num_heads, block_q, rate, residuals, g):
    q, k, v, bias, seed, o, lse = residuals
    dq, dk, dv, dbias = _flash_packed_bwd_impl(
        q, k, v, bias, seed, o, lse, g, num_heads, block_q, rate
    )
    return dq, dk, dv, dbias, None


flash_attention_packed_train.defvjp(_packed_train_fwd, _packed_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_packed_train_chained(
    q: jax.Array,      # (B, S, H*D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,   # (B, H, P, P) PRE-PADDED to the kernel width
    seed: jax.Array,   # (1,) int32
    num_heads: int,
    block_q: int = 256,
    rate: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Training attention that CHAINS the bias through the layer.

    Returns ``(out, bias)`` with ``bias`` passed through unchanged (free —
    XLA aliases the buffer). When the encoder scan carries the bias through
    every layer this way, autodiff delivers each layer's backward the
    RUNNING bias-cotangent accumulator as the pass-through output's
    cotangent; the fused backward kernel adds its ds tile into that buffer
    in place (``input_output_aliases``). The per-layer (B,H,S,S) dbias
    write + XLA select_add accumulation pass of the plain op
    (docs/PROFILE_TRAIN.md, ~20% of the train step) collapses into one
    in-kernel add. ``bias`` must be pre-padded square to a width tileable
    by some q-block (the model pads to a 128-multiple); the q-block shrinks
    to match (_pre_padded_layout), so any such width works."""
    s_pad, block_q = _pre_padded_layout(q.shape[1], bias.shape[-1], block_q)
    if bias.shape[-2] != s_pad:
        raise ValueError(
            "flash_attention_packed_train_chained requires a SQUARE "
            f"pre-padded bias; got {bias.shape}"
        )
    out, _ = _flash_packed_train_fwd_impl(
        q, k, v, bias, seed, num_heads, block_q, rate
    )
    return out, bias


def _packed_chained_fwd(q, k, v, bias, seed, num_heads, block_q, rate):
    s_pad, block_q = _pre_padded_layout(q.shape[1], bias.shape[-1], block_q)
    if bias.shape[-2] != s_pad:
        raise ValueError(
            "flash_attention_packed_train_chained requires a SQUARE "
            f"pre-padded bias; got {bias.shape}"
        )
    out, lse = _flash_packed_train_fwd_impl(
        q, k, v, bias, seed, num_heads, block_q, rate
    )
    return (out, bias), (q, k, v, bias, seed, out, lse)


def _packed_chained_bwd(num_heads, block_q, rate, residuals, g):
    q, k, v, bias, seed, o, lse = residuals
    g_out, g_bias = g
    # re-derive the layout the fwd used (block_q here is the caller's
    # original static value, not the resolved one)
    _, block_q = _pre_padded_layout(q.shape[1], bias.shape[-1], block_q)
    dq, dk, dv, dbias = _flash_packed_bwd_impl(
        q, k, v, bias, seed, o, lse, g_out, num_heads, block_q, rate,
        gbias=g_bias,
    )
    return dq, dk, dv, dbias, None


flash_attention_packed_train_chained.defvjp(
    _packed_chained_fwd, _packed_chained_bwd
)


# ---------------------------------------------------------------------------
# packed TRAINING op with IN-KERNEL TABLE GRADIENTS
#
# The trained bias parameters are three tiny (bins, H) bucket tables; the
# (B, H, S, S) bias itself is just their broadcast. The plain train op
# (flash_attention_packed_train) emits a full-size dbias per layer which the
# encoder scan accumulates and a separate kernel finally reduces into the
# tables — profiled at ~20% of the train step (docs/PROFILE_TRAIN.md): ~2.7 GB
# written + 5.4 GB read/added per step for gradients whose final size is 4 KB.
# This op's backward instead reduces ds directly into the per-bucket tables
# inside the kernel (one-hot matmuls on the MXU, accumulated across the whole
# grid like dk/dv) — the bias cotangent never exists in HBM.
# ---------------------------------------------------------------------------

def _attn_bwd_packed_tables_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref, lse_ref,
    pos_ref, cx_ref, cy_ref,
    dq_ref, dk_ref, dv_ref, dt1_ref, dtx_ref, dty_ref,
    ds_scratch,
    *, scale: float, rate: float, head_dim: int, heads_per_cell: int,
    num_heads: int, block_q: int, block_k: int,
    rel_bins: int, max_rel: int, rel2d_bins: int, max_rel2d: int,
):
    """Packed fused backward that reduces the bias cotangent into the three
    relative-position tables in-kernel. Grid (b, head-group, q-block), j
    innermost: dk/dv accumulate per (b, group) exactly as in
    _attn_bwd_packed_kernel; the (bins, H) table accumulators use a constant
    index map so they stay VMEM-resident across the ENTIRE grid (the
    _table_grads_kernel pattern) — every cell adds its head group's
    contribution via a full-block (bins, hp) @ (hp, H) head-selection matmul
    (no dynamic lane-slice stores on revisited buffers)."""
    from multi_modal_early_exit_tpu.ops.fused_bias_attention import _bucket

    b_idx = pl.program_id(0)
    hg = pl.program_id(1)
    j = pl.program_id(2)
    width = heads_per_cell * head_dim
    cols = (
        slice(None) if width == q_ref.shape[-1]
        else pl.ds(hg * width, width)
    )
    qg = q_ref[0, :, cols]                               # (Bq, hp*D)
    kg = k_ref[0, :, cols]                               # (S, hp*D)
    vg = v_ref[0, :, cols]
    dog = do_ref[0, :, cols]
    og = o_ref[0, :, cols]

    @pl.when(j == 0)
    def _init_kv():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    @pl.when((b_idx == 0) & (hg == 0) & (j == 0))
    def _init_tables():
        dt1_ref[:] = jnp.zeros_like(dt1_ref)
        dtx_ref[:] = jnp.zeros_like(dtx_ref)
        dty_ref[:] = jnp.zeros_like(dty_ref)

    dq_parts = []
    dk_parts = []
    dv_parts = []
    for e in range(heads_per_cell):
        lo, hi = e * head_dim, (e + 1) * head_dim
        q, k, v, do = qg[:, lo:hi], kg[:, lo:hi], vg[:, lo:hi], dog[:, lo:hi]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias_ref[0, e].astype(jnp.float32)    # (Bq, S)
        p = jnp.exp(s - _row_to_col(lse_ref[0, hg * heads_per_cell + e]))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            bh = b_idx * num_heads + (hg * heads_per_cell + e)
            c = _dropout_scale_tile(
                seed_ref[0], bh, j * block_q, 0, p.shape, rate
            )
            p_dropped = p * c
            dp = dp * c
        else:
            p_dropped = p
        delta = jnp.sum(
            do.astype(jnp.float32) * og[:, lo:hi].astype(jnp.float32),
            axis=-1, keepdims=True,
        )                                                 # (Bq, 1)
        ds = p * (dp - delta)                             # (Bq, S)
        # pad rows/cols carry ds == 0 by construction (do rows are 0-padded
        # and padded-key bias is -inf so p underflows) — safe to bucket-sum
        # the whole tile. bf16 stash = the dtype the dbias tensor had.
        ds_scratch[e] = ds.astype(ds_scratch.dtype)
        ds_c = ds.astype(q.dtype)
        p_c = p_dropped.astype(do.dtype)
        dq_parts.append(
            jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * scale
        )
        dk_parts.append(jax.lax.dot_general(
            ds_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)
        dv_parts.append(jax.lax.dot_general(
            p_c, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    dq_ref[0] = jnp.concatenate(dq_parts, -1).astype(dq_ref.dtype)
    dk_ref[0] += jnp.concatenate(dk_parts, -1)
    dv_ref[0] += jnp.concatenate(dv_parts, -1)

    # ---- bucket-sum ds into the table accumulators ----
    s_pad = pos_ref.shape[2]
    h_total = dt1_ref.shape[1]
    rows = pl.ds(j * block_q, block_q)
    pos_r = pos_ref[0, 0, rows]
    cx_r = cx_ref[0, 0, rows]
    cy_r = cy_ref[0, 0, rows]
    # head-selection matrix: sel[e, h] = 1 where h == hg*hp + e, so the
    # (bins, hp) partial lands in this group's columns of the (bins, H)
    # accumulator through a full-block matmul
    # sel/partial stay f32: the (bins, hp) partial sums up to block_q*block_k
    # ds terms per tile — rounding them to bf16 before the tiny
    # (bins,hp)@(hp,H) selection matmul would add a precision loss the
    # dbias-accumulate path doesn't have; only the ds stash is bf16.
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (heads_per_cell, h_total), 1)
        == hg * heads_per_cell
        + jax.lax.broadcasted_iota(jnp.int32, (heads_per_cell, h_total), 0)
    ).astype(jnp.float32)

    n_cb = s_pad // block_k

    def col_body(cb, _):
        ccols = pl.ds(cb * block_k, block_k)
        gt = ds_scratch[:, :, ccols].reshape(heads_per_cell, -1)  # (hp, bq*bk)

        def accumulate(out_ref, vec_r, vec_c, bins, max_d):
            buckets = _bucket(vec_c[None, :] - vec_r[:, None], bins, max_d)
            onehot = (
                buckets[None, :, :]
                == jax.lax.broadcasted_iota(
                    jnp.int32, (bins, block_q, block_k), 0
                )
            ).astype(gt.dtype).reshape(bins, -1)
            partial = jax.lax.dot_general(
                onehot, gt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bins, hp) f32
            out_ref[:] = out_ref[:] + jax.lax.dot_general(
                partial, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        accumulate(dt1_ref, pos_r, pos_ref[0, 0, ccols], rel_bins, max_rel)
        accumulate(dtx_ref, cx_r, cx_ref[0, 0, ccols], rel2d_bins, max_rel2d)
        accumulate(dty_ref, cy_r, cy_ref[0, 0, ccols], rel2d_bins, max_rel2d)
        return 0

    jax.lax.fori_loop(0, n_cb, col_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "rate", "rel_bins", "max_rel",
                     "rel2d_bins", "max_rel2d"),
)
def _flash_packed_bwd_tables_impl(
    q, k, v, bias, pos, cx, cy, seed, o, lse, g,
    num_heads: int, block_q: int, rate: float,
    rel_bins: int, max_rel: int, rel2d_bins: int, max_rel2d: int,
):
    b, s, hd = q.shape
    d = hd // num_heads
    hp = _packed_head_groups(num_heads, d)
    s_pad, block_q = _tile_width(s, bias.shape[-1], block_q)
    # table-grad column-block width: 128 on real inputs (model pre-pads to a
    # lane multiple; dynamic lane offsets must be 128-aligned); smaller
    # tiling only arises on tiny interpret-mode test shapes
    block_k = 128 if s_pad % 128 == 0 else math.gcd(s_pad, 128)
    qp = _pad_to(q, 1, s_pad)
    kp = _pad_to(k, 1, s_pad)
    vp = _pad_to(v, 1, s_pad)
    gp = _pad_to(g, 1, s_pad)
    op = _pad_to(o, 1, s_pad)
    bp = _pad_to(_pad_to(bias, 3, s_pad, NEG_INF), 2, s_pad)
    lsep = _pad_to(lse, 2, s_pad, -NEG_INF)  # (B, H, S_pad) dense
    posp = _pad_to(pos.astype(jnp.int32), 1, s_pad)[:, None, :]
    cxp = _pad_to(cx.astype(jnp.int32), 1, s_pad)[:, None, :]
    cyp = _pad_to(cy.astype(jnp.int32), 1, s_pad)[:, None, :]
    # delta (sum_d do*o per row/head) is computed IN KERNEL from the o rows

    n_hg = num_heads // hp
    width = hp * d
    row_spec = pl.BlockSpec((1, block_q, hd), lambda i, hh, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, s_pad, hd), lambda i, hh, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, num_heads, block_q),
                            lambda i, hh, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, hp, block_q, s_pad),
                             lambda i, hh, j: (i, hh, j, 0),
                             memory_space=pltpu.VMEM)
    posvec_spec = pl.BlockSpec((1, 1, s_pad), lambda i, hh, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    dq_spec = pl.BlockSpec((1, block_q, width),
                           lambda i, hh, j: (i, j, hh),
                           memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, s_pad, width),
                            lambda i, hh, j: (i, 0, hh),
                            memory_space=pltpu.VMEM)
    table_spec = lambda bins: pl.BlockSpec(  # noqa: E731
        (bins, num_heads), lambda i, hh, j: (0, 0), memory_space=pltpu.VMEM
    )
    dq4, dk4, dv4, dt1, dtx, dty = pl.pallas_call(
        functools.partial(
            _attn_bwd_packed_tables_kernel, scale=1.0 / math.sqrt(d),
            rate=rate, head_dim=d, heads_per_cell=hp, num_heads=num_heads,
            block_q=block_q, block_k=block_k,
            rel_bins=rel_bins, max_rel=max_rel,
            rel2d_bins=rel2d_bins, max_rel2d=max_rel2d,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b, s_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, s_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((rel_bins, num_heads), jnp.float32),
            jax.ShapeDtypeStruct((rel2d_bins, num_heads), jnp.float32),
            jax.ShapeDtypeStruct((rel2d_bins, num_heads), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=(b, n_hg, s_pad // block_q),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                row_spec,     # q rows
                full_spec,    # k
                full_spec,    # v
                bias_spec,    # bias tile
                row_spec,     # do rows
                row_spec,     # o rows (in-kernel delta)
                lse_spec,     # lse
                posvec_spec,  # pos
                posvec_spec,  # cx
                posvec_spec,  # cy
            ],
            out_specs=[
                dq_spec,
                acc_spec,               # dk accumulator (per (b, group))
                acc_spec,               # dv accumulator
                table_spec(rel_bins),   # dt1 (resident across whole grid)
                table_spec(rel2d_bins),  # dtx
                table_spec(rel2d_bins),  # dty
            ],
            scratch_shapes=[
                pltpu.VMEM((hp, block_q, s_pad), bias.dtype),  # ds stash
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * s_pad * s_pad * hd
            + 2 * b * s_pad * s_pad * (rel_bins + 2 * rel2d_bins) * num_heads,
            bytes_accessed=(
                6 * b * s_pad * hd * qp.dtype.itemsize
                + b * num_heads * s_pad * s_pad * bp.dtype.itemsize
            ),
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
    )(seed, qp, kp, vp, bp, gp, op, lsep, posp, cxp, cyp)

    dq = dq4[:, :s, :]
    dk = dk4[:, :s, :].astype(k.dtype)
    dv = dv4[:, :s, :].astype(v.dtype)
    return dq, dk, dv, dt1, dtx, dty


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15, 16, 17)
)
def flash_attention_packed_train_tables(
    q: jax.Array,      # (B, S, H*D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,   # (B, H, S', S') materialized ONCE per step (no grad)
    t1: jax.Array,     # (rel_bins, H) f32 scaled tables — gradient receivers
    tx: jax.Array,     # (rel2d_bins, H)
    ty: jax.Array,     # (rel2d_bins, H)
    pos: jax.Array,    # (B, S) int32
    cx: jax.Array,     # (B, S) int32
    cy: jax.Array,     # (B, S) int32
    seed: jax.Array,   # (1,) int32
    num_heads: int,
    block_q: int = 256,
    rate: float = 0.0,
    rel_bins: int = 32,
    max_rel: int = 128,
    rel2d_bins: int = 64,
    max_rel2d: int = 256,
) -> jax.Array:
    """Training attention whose backward produces TABLE gradients directly.

    Forward = ``flash_attention_packed_train`` (the materialized ``bias`` is
    read per layer — cheaper than per-layer in-kernel rebuild at these
    shapes). Backward reduces ds straight into (bins, H) cotangents for
    ``t1``/``tx``/``ty`` via one-hot matmuls accumulated across the grid:
    the (B, H, S, S) bias cotangent never exists. CALLER CONTRACT: ``bias``
    must equal the broadcast of (t1, tx, ty) over (pos, cx, cy) plus the
    padding mask (i.e. what ``materialize_bias``/``make_attention_bias``
    builds from the same operands) — the VJP differentiates through that
    relationship analytically. ``bias`` itself receives no cotangent; pass
    it through ``jax.lax.stop_gradient``."""
    out, _ = _flash_packed_train_fwd_impl(
        q, k, v, bias, seed, num_heads, block_q, rate
    )
    return out


def _packed_tables_fwd(
    q, k, v, bias, t1, tx, ty, pos, cx, cy, seed,
    num_heads, block_q, rate, rel_bins, max_rel, rel2d_bins, max_rel2d,
):
    out, lse = _flash_packed_train_fwd_impl(
        q, k, v, bias, seed, num_heads, block_q, rate
    )
    return out, (q, k, v, bias, pos, cx, cy, seed, out, lse)


def _packed_tables_bwd(
    num_heads, block_q, rate, rel_bins, max_rel, rel2d_bins, max_rel2d,
    residuals, g,
):
    q, k, v, bias, pos, cx, cy, seed, o, lse = residuals
    dq, dk, dv, dt1, dtx, dty = _flash_packed_bwd_tables_impl(
        q, k, v, bias, pos, cx, cy, seed, o, lse, g,
        num_heads, block_q, rate, rel_bins, max_rel, rel2d_bins, max_rel2d,
    )
    return (dq, dk, dv, None, dt1, dtx, dty, None, None, None, None)


flash_attention_packed_train_tables.defvjp(
    _packed_tables_fwd, _packed_tables_bwd
)


def _packed_fwd(q, k, v, bias, num_heads, block_q):
    return _flash_packed_impl(q, k, v, bias, num_heads, block_q), (q, k, v, bias)


def _packed_bwd(num_heads, block_q, residuals, g):
    """Gradients via the (B,H,S,D) flash backward (one recomputed forward
    for the lse). The transposes live only in this backward path."""
    q, k, v, bias = residuals
    b, s, hd = q.shape
    d = hd // num_heads

    def split(x):
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(b, s, hd)

    qh, kh, vh, gh = split(q), split(k), split(v), split(g)
    o, lse = _flash_attention_fwd_impl(
        qh, kh, vh, bias, _ZERO_SEED, block_q, 0.0, with_lse=True
    )
    dq, dk, dv, dbias = _flash_attention_bwd_impl(
        qh, kh, vh, bias, _ZERO_SEED, o, lse, gh, block_q, 0.0
    )
    return merge(dq), merge(dk), merge(dv), dbias


flash_attention_packed.defvjp(_packed_fwd, _packed_bwd)


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


def reference_attention_hash_dropout(q, k, v, bias, seed, rate) -> jax.Array:
    """jnp reference including the position-hash dropout mask — the oracle
    the kernel's dropout path is tested against."""
    b, h, s, d = q.shape
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q / math.sqrt(d), k,
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)[:, :, :s, :s]
    p = jax.nn.softmax(scores, axis=-1)
    bh = (jnp.arange(b)[:, None] * h + jnp.arange(h)[None, :])[:, :, None, None]
    rows = jnp.arange(s)[None, None, :, None]
    cols = jnp.arange(s)[None, None, None, :]
    u = dropout_uniform(jnp.asarray(seed).reshape(()), bh, rows, cols)
    keep = 1.0 - rate
    p = p * jnp.where(u < keep, 1.0 / keep, 0.0)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


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

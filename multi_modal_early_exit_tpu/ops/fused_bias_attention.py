"""Pallas attention with IN-KERNEL relative-position bias construction.

The standard path materializes the (B, H, S, S) additive bias in HBM
(~450 MB bf16 at the reference budget, batch 16) and every layer re-reads
it. This kernel removes that tensor entirely: per (batch, q-block) grid cell
it reconstructs the bias tile from the raw per-token vectors —

    bias[i, j, h] = T1[bucket(pos_i - pos_j), h]
                  + Tx[bucket2d(cx_i - cx_j), h]
                  + Ty[bucket2d(cy_i - cy_j), h]   (+ -inf on masked keys)

— using the T5 log-bucketing math on the VPU and tiny one-hot matmuls on
the MXU for the table lookups (TPU has no fast vector gather; a
(bq*bk, bins) @ (bins, heads) matmul IS the lookup). All 12 heads are
processed per grid cell so the bias tile is built once and reused.

Inputs per forward: pos/cx/cy/mask are (B, S) vectors — a few hundred KB
instead of hundreds of MB. HBM traffic per layer drops by the whole bias
read; peak memory no longer scales with B*H*S^2, unblocking larger batches.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _bucket(rel: jax.Array, num_buckets: int, max_distance: int) -> jax.Array:
    """T5 bidirectional log bucketing (modeling.relative_position_bucket),
    VPU-friendly: int compares + one log over f32."""
    nb = num_buckets // 2
    ret = (rel > 0).astype(jnp.int32) * nb
    n = jnp.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    n_safe = jnp.maximum(n, 1).astype(jnp.float32)
    val_large = max_exact + (
        jnp.log(n_safe / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, nb - 1)
    return ret + jnp.where(is_small, n, val_large)


def _lookup(buckets: jax.Array, table: jax.Array) -> jax.Array:
    """(bq, bk) int buckets + (bins, H) table -> (H, bq, bk) via one-hot
    matmul (the MXU-native gather). Head-major output so downstream refs
    index heads on an untiled leading dim (Mosaic lane-alignment rule)."""
    bq, bk = buckets.shape
    bins, h = table.shape
    onehot = (
        buckets[None, :, :]
        == jax.lax.broadcasted_iota(jnp.int32, (bins, bq, bk), 0)
    ).astype(jnp.bfloat16)  # exact 0/1 — bf16 halves VMEM pressure
    return jax.lax.dot_general(
        table.astype(jnp.bfloat16), onehot.reshape(bins, bq * bk),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(h, bq, bk)


def _kernel(
    pos_ref, cx_ref, cy_ref, mask_ref,      # (B, S) int32 (full, tiny)
    t1_ref, tx_ref, ty_ref,                 # (bins, H) f32 (pre-scaled)
    q_ref, k_ref, v_ref,                    # (1, H, bq/S, D)
    o_ref,                                  # (1, H, bq, D)
    *, scale: float, block_q: int, block_k: int,
    rel_bins: int, max_rel: int, rel2d_bins: int, max_rel2d: int,
    num_heads: int,
):
    j = pl.program_id(1)
    s = pos_ref.shape[2]
    rows = pl.ds(j * block_q, block_q)

    # refs are (1, 1, S) blocks: dynamic slices stay in the (aligned) lane
    # dim — Mosaic rejects dynamic indexing of the sublane dim
    pos_r = pos_ref[0, 0, rows]
    cx_r = cx_ref[0, 0, rows]
    cy_r = cy_ref[0, 0, rows]

    n_cb = s // block_k

    def bias_block(cb):
        cols = pl.ds(cb * block_k, block_k)
        pos_c = pos_ref[0, 0, cols]
        cx_c = cx_ref[0, 0, cols]
        cy_c = cy_ref[0, 0, cols]
        mask_c = mask_ref[0, 0, cols]
        # rel[i, j] = value_j - value_i (key minus query): matches the HF
        # convention in modeling.rel_pos_1d_bias / rel_pos_2d_bias
        b1 = _bucket(pos_c[None, :] - pos_r[:, None], rel_bins, max_rel)
        bx = _bucket(cx_c[None, :] - cx_r[:, None], rel2d_bins, max_rel2d)
        by = _bucket(cy_c[None, :] - cy_r[:, None], rel2d_bins, max_rel2d)
        bias = (
            _lookup(b1, t1_ref[:])
            + _lookup(bx, tx_ref[:])
            + _lookup(by, ty_ref[:])
        )  # (H, bq, bk) f32
        bias = bias + jnp.where(
            mask_c == 0, NEG_INF, 0.0
        )[None, None, :]
        return bias

    # build the full (bq, S, H) bias tile in column blocks, then run all
    # heads against it (bias shared across heads — built once per cell)
    def run(bias_scratch):
        def col_body(cb, _):
            bias_scratch[:, :, pl.ds(cb * block_k, block_k)] = (
                bias_block(cb).astype(bias_scratch.dtype)
            )
            return 0

        jax.lax.fori_loop(0, n_cb, col_body, 0)

        def head_body(h, _):
            # leading (untiled) dims allow dynamic indexing; lane/sublane
            # slices stay static. Matmul at the input dtype (bf16 operands
            # use the native MXU mode), scale applied to the f32 scores.
            q = q_ref[0, h]
            k = k_ref[0, h]
            v = v_ref[0, h]
            sc = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            sc = sc + bias_scratch[h].astype(jnp.float32)
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp(sc - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / denom).astype(v.dtype)
            o_ref[0, h] = jnp.dot(
                p, v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, num_heads, head_body, 0)

    pl.run_scoped(
        run,
        pltpu.VMEM((num_heads, block_q, s), jnp.bfloat16),
    )


def _pad_axis(x, axis, target, value=0):
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "rel_bins", "max_rel",
                              "rel2d_bins", "max_rel2d")
)
def fused_bias_attention(
    q: jax.Array,          # (B, H, S, D)
    k: jax.Array,
    v: jax.Array,
    position_ids: jax.Array,   # (B, S) int32
    cx: jax.Array,             # (B, S) int32  (bbox x0)
    cy: jax.Array,             # (B, S) int32  (bbox y1)
    attention_mask: jax.Array, # (B, S) 1=real, 0=pad
    t1: jax.Array,             # (rel_bins, H) f32, scale pre-folded
    tx: jax.Array,             # (rel2d_bins, H)
    ty: jax.Array,             # (rel2d_bins, H)
    block_q: int = 128,
    block_k: int = 128,
    rel_bins: int = 32,
    max_rel: int = 128,
    rel2d_bins: int = 64,
    max_rel2d: int = 256,
) -> jax.Array:
    """softmax((q/sqrt(d)) k^T + rel_bias + mask) v with the bias built
    in-kernel. Returns (B, H, S, D) in q's dtype."""
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s_pad = -(-s // max(block_q, block_k)) * max(block_q, block_k)

    qp = _pad_axis(q, 2, s_pad)
    kp = _pad_axis(k, 2, s_pad)
    vp = _pad_axis(v, 2, s_pad)
    # (B, 1, S): per-sample blocks with legal Mosaic tiling (dims equal)
    pos = _pad_axis(position_ids.astype(jnp.int32), 1, s_pad)[:, None, :]
    cxp = _pad_axis(cx.astype(jnp.int32), 1, s_pad)[:, None, :]
    cyp = _pad_axis(cy.astype(jnp.int32), 1, s_pad)[:, None, :]
    maskp = _pad_axis(attention_mask.astype(jnp.int32), 1, s_pad)[:, None, :]

    grid = (b, s_pad // block_q)
    kernel = functools.partial(
        _kernel, scale=scale, block_q=block_q, block_k=block_k,
        rel_bins=rel_bins, max_rel=max_rel,
        rel2d_bins=rel2d_bins, max_rel2d=max_rel2d, num_heads=h,
    )
    vec_spec = pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    table_spec = lambda bins: pl.BlockSpec(  # noqa: E731
        (bins, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                vec_spec, vec_spec, vec_spec, vec_spec,
                table_spec(rel_bins), table_spec(rel2d_bins),
                table_spec(rel2d_bins),
                pl.BlockSpec((1, h, block_q, d), lambda i, j: (i, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, s_pad, d), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, s_pad, d), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, block_q, d),
                                   lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # bias scratch + one-hot transients sit just above the 16M
            # default scoped-vmem soft limit at some batch sizes
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d
            + 2 * b * s_pad * s_pad * (rel_bins + 2 * rel2d_bins) * h,
            bytes_accessed=2 * b * h * s_pad * d * q.dtype.itemsize * 2,
            transcendentals=b * (h + 3) * s_pad * s_pad,
        ),
    )(pos, cxp, cyp, maskp, t1, tx, ty, qp, kp, vp)
    return out[:, :, :s, :]


def _bias_tile_kernel(
    pos_ref, cx_ref, cy_ref, mask_ref,      # (1, 1, S) int32 blocks
    t1_ref, tx_ref, ty_ref,                 # (bins, H) f32 (pre-scaled)
    o_ref,                                  # (1, H, bq, S) bias out
    *, block_q: int, block_k: int,
    rel_bins: int, max_rel: int, rel2d_bins: int, max_rel2d: int,
):
    j = pl.program_id(1)
    s = pos_ref.shape[2]
    rows = pl.ds(j * block_q, block_q)
    pos_r = pos_ref[0, 0, rows]
    cx_r = cx_ref[0, 0, rows]
    cy_r = cy_ref[0, 0, rows]
    n_cb = s // block_k

    def col_body(cb, _):
        cols = pl.ds(cb * block_k, block_k)
        pos_c = pos_ref[0, 0, cols]
        cx_c = cx_ref[0, 0, cols]
        cy_c = cy_ref[0, 0, cols]
        mask_c = mask_ref[0, 0, cols]
        b1 = _bucket(pos_c[None, :] - pos_r[:, None], rel_bins, max_rel)
        bx = _bucket(cx_c[None, :] - cx_r[:, None], rel2d_bins, max_rel2d)
        by = _bucket(cy_c[None, :] - cy_r[:, None], rel2d_bins, max_rel2d)
        bias = (
            _lookup(b1, t1_ref[:])
            + _lookup(bx, tx_ref[:])
            + _lookup(by, ty_ref[:])
        )  # (H, bq, bk) f32
        bias = bias + jnp.where(mask_c == 0, NEG_INF, 0.0)[None, None, :]
        o_ref[0, :, :, cols] = bias.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_cb, col_body, 0)


def materialize_bias(
    position_ids: jax.Array,   # (B, S) int32
    cx: jax.Array,
    cy: jax.Array,
    attention_mask: jax.Array,
    t1: jax.Array,             # (rel_bins, H) f32, scale pre-folded
    tx: jax.Array,
    ty: jax.Array,
    block_q: int = 128,
    block_k: int = 128,
    rel_bins: int = 32,
    max_rel: int = 128,
    rel2d_bins: int = 64,
    max_rel2d: int = 256,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Build the (B, H, P, P) additive bias with the one-hot-matmul pallas
    kernel — a drop-in replacement for the XLA gather+transpose(+pad) chain
    in make_attention_bias, emitted directly in the flash kernel's layout
    and padded width (P = ceil(S / block) * block, -inf pad columns).

    Differentiable wrt the three tables (custom VJP: segment-sum of the
    bias cotangent into the buckets) so the training path can use it too."""
    return _materialize_bias_vjp(
        position_ids, cx, cy, attention_mask, t1, tx, ty,
        block_q, block_k, rel_bins, max_rel, rel2d_bins, max_rel2d,
        jnp.dtype(out_dtype),
    )


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "rel_bins", "max_rel",
                              "rel2d_bins", "max_rel2d", "out_dtype")
)
def _materialize_bias_impl(
    position_ids, cx, cy, attention_mask, t1, tx, ty,
    block_q, block_k, rel_bins, max_rel, rel2d_bins, max_rel2d, out_dtype,
):
    b, s = position_ids.shape
    h = t1.shape[1]
    s_pad = -(-s // max(block_q, block_k)) * max(block_q, block_k)
    pos = _pad_axis(position_ids.astype(jnp.int32), 1, s_pad)[:, None, :]
    cxp = _pad_axis(cx.astype(jnp.int32), 1, s_pad)[:, None, :]
    cyp = _pad_axis(cy.astype(jnp.int32), 1, s_pad)[:, None, :]
    maskp = _pad_axis(attention_mask.astype(jnp.int32), 1, s_pad)[:, None, :]

    kernel = functools.partial(
        _bias_tile_kernel, block_q=block_q, block_k=block_k,
        rel_bins=rel_bins, max_rel=max_rel,
        rel2d_bins=rel2d_bins, max_rel2d=max_rel2d,
    )
    vec_spec = pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    table_spec = lambda bins: pl.BlockSpec(  # noqa: E731
        (bins, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, s_pad), out_dtype),
        grid_spec=pl.GridSpec(
            grid=(b, s_pad // block_q),
            in_specs=[
                vec_spec, vec_spec, vec_spec, vec_spec,
                table_spec(rel_bins), table_spec(rel2d_bins),
                table_spec(rel2d_bins),
            ],
            out_specs=pl.BlockSpec(
                (1, h, block_q, s_pad), lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * s_pad * (rel_bins + 2 * rel2d_bins) * h,
            bytes_accessed=b * h * s_pad * s_pad * 2,
            transcendentals=3 * b * s_pad * s_pad,
        ),
    )(pos, cxp, cyp, maskp, t1, tx, ty)


def _table_grads_kernel(
    pos_ref, cx_ref, cy_ref, g_ref,          # (1,1,S) vecs + (1,H,bq,S) dbias
    dt1_ref, dtx_ref, dty_ref,               # (bins, H) f32 accumulators
    *, block_q: int, block_k: int, s_true: int,
    rel_bins: int, max_rel: int, rel2d_bins: int, max_rel2d: int,
):
    """dtable[r, h] = sum over positions with bucket r of the bias cotangent.

    One-hot matmuls on the MXU replace the sort-based XLA scatter that a
    segment-sum lowers to (profiled at ~180 ms/step at the reference budget
    — 3 scatters over 8M elements; this kernel does the same reduction in
    ~milliseconds). Outputs use a constant index map: every grid cell maps
    to the same (bins, H) block, which therefore lives in VMEM across the
    whole sequential grid and is written back once (zero-init on the first
    cell, accumulate afterwards)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    s = pos_ref.shape[2]
    h = g_ref.shape[1]
    rows = pl.ds(j * block_q, block_q)
    pos_r = pos_ref[0, 0, rows]
    cx_r = cx_ref[0, 0, rows]
    cy_r = cy_ref[0, 0, rows]

    @pl.when((i == 0) & (j == 0))
    def _init():
        dt1_ref[:] = jnp.zeros_like(dt1_ref)
        dtx_ref[:] = jnp.zeros_like(dtx_ref)
        dty_ref[:] = jnp.zeros_like(dty_ref)

    n_cb = s // block_k

    def col_body(cb, _):
        cols = pl.ds(cb * block_k, block_k)
        # the padded region of the builder's output is unspecified filler
        # (its VJP contract covers only the true S x S block): mask it so a
        # consumer that integrates pad values cannot corrupt table grads
        row_ok = (j * block_q
                  + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                  ) < s_true
        col_ok = (cb * block_k
                  + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                  ) < s_true
        valid = row_ok & col_ok
        # g tile for all heads: (H, bq, bk) -> (H, bq*bk) (collapse-trailing
        # reshape, the only shape cast Mosaic supports here) in the
        # cotangent's own dtype — a bf16 cotangent costs a bf16 one-hot
        g_tile = g_ref[0, :, :, cols]
        g_tile = jnp.where(valid[None], g_tile, jnp.zeros_like(g_tile))
        gt = g_tile.reshape(h, -1)

        def accumulate(out_ref, vec_r, vec_c, bins, max_d):
            buckets = _bucket(vec_c[None, :] - vec_r[:, None], bins, max_d)
            onehot = (
                buckets[None, :, :]
                == jax.lax.broadcasted_iota(
                    jnp.int32, (bins, block_q, block_k), 0
                )
            ).astype(gt.dtype).reshape(bins, -1)
            out_ref[:] = out_ref[:] + jax.lax.dot_general(
                onehot, gt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        accumulate(dt1_ref, pos_r, pos_ref[0, 0, cols], rel_bins, max_rel)
        accumulate(dtx_ref, cx_r, cx_ref[0, 0, cols], rel2d_bins, max_rel2d)
        accumulate(dty_ref, cy_r, cy_ref[0, 0, cols], rel2d_bins, max_rel2d)
        return 0

    jax.lax.fori_loop(0, n_cb, col_body, 0)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "rel_bins", "max_rel",
                              "rel2d_bins", "max_rel2d")
)
def _table_grads(
    position_ids, cx, cy, g,
    block_q, block_k, rel_bins, max_rel, rel2d_bins, max_rel2d,
):
    b, s = position_ids.shape
    h = g.shape[1]
    s_pad = g.shape[3]
    # bucket vectors at the padded width; padded-region cotangent is zero so
    # whatever buckets the pad positions land in receive nothing
    pos = _pad_axis(position_ids.astype(jnp.int32), 1, s_pad)[:, None, :]
    cxp = _pad_axis(cx.astype(jnp.int32), 1, s_pad)[:, None, :]
    cyp = _pad_axis(cy.astype(jnp.int32), 1, s_pad)[:, None, :]

    kernel = functools.partial(
        _table_grads_kernel, block_q=block_q, block_k=block_k, s_true=s,
        rel_bins=rel_bins, max_rel=max_rel,
        rel2d_bins=rel2d_bins, max_rel2d=max_rel2d,
    )
    vec_spec = pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = lambda bins: pl.BlockSpec(  # noqa: E731
        (bins, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((rel_bins, h), jnp.float32),
            jax.ShapeDtypeStruct((rel2d_bins, h), jnp.float32),
            jax.ShapeDtypeStruct((rel2d_bins, h), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=(b, s_pad // block_q),
            in_specs=[
                vec_spec, vec_spec, vec_spec,
                pl.BlockSpec((1, h, block_q, s_pad),
                             lambda i, j: (i, 0, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[acc_spec(rel_bins), acc_spec(rel2d_bins),
                       acc_spec(rel2d_bins)],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * s_pad * (rel_bins + 2 * rel2d_bins) * h,
            bytes_accessed=b * h * s_pad * s_pad * g.dtype.itemsize,
            transcendentals=3 * b * s_pad * s_pad,
        ),
    )(pos, cxp, cyp, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _materialize_bias_vjp(
    position_ids, cx, cy, attention_mask, t1, tx, ty,
    block_q, block_k, rel_bins, max_rel, rel2d_bins, max_rel2d, out_dtype,
):
    return _materialize_bias_impl(
        position_ids, cx, cy, attention_mask, t1, tx, ty,
        block_q=block_q, block_k=block_k, rel_bins=rel_bins, max_rel=max_rel,
        rel2d_bins=rel2d_bins, max_rel2d=max_rel2d, out_dtype=out_dtype,
    )


def _materialize_bias_fwd(
    position_ids, cx, cy, attention_mask, t1, tx, ty,
    block_q, block_k, rel_bins, max_rel, rel2d_bins, max_rel2d, out_dtype,
):
    out = _materialize_bias_impl(
        position_ids, cx, cy, attention_mask, t1, tx, ty,
        block_q=block_q, block_k=block_k, rel_bins=rel_bins, max_rel=max_rel,
        rel2d_bins=rel2d_bins, max_rel2d=max_rel2d, out_dtype=out_dtype,
    )
    return out, (position_ids, cx, cy)


def _materialize_bias_bwd(
    block_q, block_k, rel_bins, max_rel, rel2d_bins, max_rel2d, out_dtype,
    residuals, g,
):
    """dtable[r, h] = sum of the bias cotangent over positions whose bucket
    is r. The bias is built once per forward and shared across layers, so
    this runs once per train step. The mask/-inf term is constant (no grad);
    the padded region's cotangent is identically zero under the flash
    backward, and is sliced off here regardless."""
    position_ids, cx, cy = residuals
    # tables are always fed as f32 (scale pre-folded by the callers)
    dt1, dtx, dty = _table_grads(
        position_ids, cx, cy, g,
        block_q, block_k, rel_bins, max_rel, rel2d_bins, max_rel2d,
    )
    return (None, None, None, None, dt1, dtx, dty)


_materialize_bias_vjp.defvjp(_materialize_bias_fwd, _materialize_bias_bwd)

"""Fused, differentiable Pallas TPU kernel: RoIAlign (7x7, adaptive
sampling) + max pool.

The XLA implementation (``lfb_tpu/ops/roi_align.py``) materializes four
(N, P, G, P, G, C) corner gathers in HBM -- ~1.6 GB of traffic for an AVA
batch.  Here each grid step keeps one clip's temporally-pooled feature map
(H x W x C ~= 1.6 MB) in VMEM and emits the box's final pooled vector
directly, fusing the head's 7x7 max-pool
(reference ``lib/models/head_helper.py:104-115``) into the same kernel.

TPU kernels cannot dynamically index VMEM per element, so the bilinear
gather is expressed the MXU way: the four corner lookups of all
7x7 x 4x4 sample points become a weighted one-hot selection matrix
``select`` (S, H*W) with the bilinear weights folded into the rows.  Since
bin-averaging is linear, the per-bin sample sum commutes with the feature
matmul: ``bins = (Q @ select) @ fmap / count`` where Q (P^2, S) is the
static bin-pooling one-hot.  Contracting to P^2 = 49 rows *before* touching
the channel dimension cuts the big matmul 16x vs. gathering all S = 784
samples, small enough to run it in f32.

The backward pass is the transpose of the same linear map.  With
``T = Q @ select`` and first-max-tie routing mask M (P^2, C):

    d_fmap = T^T @ (M * d_out / count)            # (H*W, C) per box

accumulated per batch element by a second kernel whose grid walks batch
elements and whose inner loop visits every box, predicated on the box's
batch index -- robust to any proposal ordering.  This keeps AVA training on
the fused path instead of falling back to the XLA gather pair.

Semantics identical to legacy Caffe2 RoIAlign with sampling_ratio=0 (see
roi_align.py); the per-box feature map is selected with a scalar-prefetch
index map so only referenced maps are DMA'd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lfb_tpu.ops.pallas_common import out_struct

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_MAX_GRID = 4


def _box_select(rois_ref, n, *, pooled: int, spatial_scale: float,
                height: int, width: int):
    """Weighted selection matrix for box ``n``: (S, HW) f32, plus the
    adaptive sample count.  S enumerates ((ph*P + pw)*G + iy)*G + ix."""
    P, G = pooled, _MAX_GRID
    S = P * P * G * G
    HW = height * width

    x1 = rois_ref[n, 1] * spatial_scale
    y1 = rois_ref[n, 2] * spatial_scale
    x2 = rois_ref[n, 3] * spatial_scale
    y2 = rois_ref[n, 4] * spatial_scale

    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P
    grid_w = jnp.clip(jnp.ceil(roi_w / P), 1, G)
    grid_h = jnp.clip(jnp.ceil(roi_h / P), 1, G)
    count = grid_w * grid_h

    ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    ix = (ids % G).astype(jnp.float32)
    iy = ((ids // G) % G).astype(jnp.float32)
    pw = ((ids // (G * G)) % P).astype(jnp.float32)
    ph = (ids // (G * G * P)).astype(jnp.float32)

    ys = y1 + ph * bin_h + (iy + 0.5) * bin_h / grid_h
    xs = x1 + pw * bin_w + (ix + 0.5) * bin_w / grid_w
    lattice_ok = (iy < grid_h) & (ix < grid_w)

    def corners(v, size):
        outside = (v < -1.0) | (v > float(size))
        v = jnp.maximum(v, 0.0)
        lo = jnp.floor(v)
        hi_clamp = lo >= size - 1
        lo = jnp.where(hi_clamp, float(size - 1), lo)
        v = jnp.where(hi_clamp, lo, v)
        hi = jnp.where(hi_clamp, lo, lo + 1)
        return lo.astype(jnp.int32), hi.astype(jnp.int32), v - lo, outside

    y_lo, y_hi, fy, y_out = corners(ys, height)
    x_lo, x_hi, fx, x_out = corners(xs, width)
    w_ok = jnp.where(lattice_ok & ~(y_out | x_out), 1.0, 0.0)  # (S, 1)

    # Fold all four bilinear corners into ONE weighted selection matrix.
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, HW), 1)
    select = jnp.zeros((S, HW), jnp.float32)
    for yi, xi, w in (
            (y_lo, x_lo, (1 - fy) * (1 - fx)),
            (y_lo, x_hi, (1 - fy) * fx),
            (y_hi, x_lo, fy * (1 - fx)),
            (y_hi, x_hi, fy * fx)):
        select = select + jnp.where(cols == yi * width + xi, w * w_ok, 0.0)
    return select, count


def _bin_pool_matrix(pooled: int):
    """Static one-hot Q (P^2, S): Q[p, s] = 1 iff sample s lies in bin p."""
    P, G = pooled, _MAX_GRID
    S = P * P * G * G
    rows = jax.lax.broadcasted_iota(jnp.int32, (P * P, S), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (P * P, S), 1)
    return jnp.where(cols // (G * G) == rows, 1.0, 0.0).astype(jnp.float32)


def _box_bins(rois_ref, n, fmap, *, pooled: int, spatial_scale: float,
              height: int, width: int):
    """Per-bin averaged features for box ``n``: (P^2, C) f32, plus count."""
    select, count = _box_select(rois_ref, n, pooled=pooled,
                                spatial_scale=spatial_scale,
                                height=height, width=width)
    q = _bin_pool_matrix(pooled)
    # Contracting to P^2 rows first makes these matmuls small enough to run
    # at true-f32 MXU precision (default TPU f32 dots round through bf16,
    # which is enough noise to flip near-tie max bins vs. the XLA path).
    t = jax.lax.dot_general(q, select, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (P^2, HW)
    bins = jax.lax.dot_general(t, fmap, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    return bins / count, t, count


def _roi_kernel(batch_idx_ref, rois_ref, fmap_ref, out_ref, *,
                pooled: int, spatial_scale: float, height: int, width: int):
    i = pl.program_id(0)
    HW = height * width
    fmap = fmap_ref[0].reshape(HW, fmap_ref.shape[-1])
    bins, _, _ = _box_bins(rois_ref, i, fmap, pooled=pooled,
                           spatial_scale=spatial_scale,
                           height=height, width=width)
    out_ref[0, 0, :] = jnp.max(bins, axis=0)


def _roi_bwd_kernel(batch_idx_ref, rois_ref, fmap_ref, dout_ref, dfmap_ref,
                    acc_ref, *, pooled: int, spatial_scale: float,
                    height: int, width: int, n_boxes: int):
    """One grid step per batch element b; accumulates every box with
    batch_idx == b into the (HW, C) scratch, then writes the block."""
    b = pl.program_id(0)
    HW = height * width
    C = fmap_ref.shape[-1]
    fmap = fmap_ref[0].reshape(HW, C)
    acc_ref[...] = jnp.zeros((HW, C), jnp.float32)

    def body(n, carry):
        @pl.when(batch_idx_ref[n] == b)
        def _():
            bins, t, count = _box_bins(rois_ref, n, fmap, pooled=pooled,
                                       spatial_scale=spatial_scale,
                                       height=height, width=width)
            # Max-pool gradient: route to the FIRST maximal bin per channel
            # (row-major bin order), matching XLA's select_and_scatter_add.
            is_max = bins >= jnp.max(bins, axis=0, keepdims=True)
            row = jax.lax.broadcasted_iota(jnp.int32, bins.shape, 0)
            first_idx = jnp.min(jnp.where(is_max, row, bins.shape[0]),
                                axis=0, keepdims=True)
            first = (row == first_idx).astype(jnp.float32)
            g_pc = first * (dout_ref[n, :][None, :] / count)   # (P^2, C)
            acc_ref[...] += jax.lax.dot_general(
                t, g_pc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)           # (HW, C)
        return carry

    jax.lax.fori_loop(0, n_boxes, body, 0)
    dfmap_ref[0] = acc_ref[...].reshape(height, width, C)


def _fwd_call(features, rois, pooled: int, spatial_scale: float):
    B, H, W, C = features.shape
    N = rois.shape[0]
    batch_idx = rois[:, 0].astype(jnp.int32)
    feats = features.astype(jnp.float32)
    rois = rois.astype(jnp.float32)

    kernel = functools.partial(_roi_kernel, pooled=pooled,
                               spatial_scale=spatial_scale, height=H, width=W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,        # batch_idx drives the fmap index map
        grid=(N,),
        in_specs=[
            pl.BlockSpec((N, 5), lambda i, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W, C), lambda i, b: (b[i], 0, 0, 0)),
        ],
        # (N, 1, C) so each grid step's block is a full (1, C) tile.
        out_specs=pl.BlockSpec((1, 1, C), lambda i, b: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_struct((N, 1, C), jnp.float32, feats),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * (pooled * pooled) * H * W * C,
            bytes_accessed=(N * H * W * C + N * C) * 4,
            transcendentals=0,
        ),
    )(batch_idx, rois, feats)
    return out[:, 0, :]


def _bwd_call(features, rois, dout, pooled: int, spatial_scale: float):
    B, H, W, C = features.shape
    N = rois.shape[0]
    batch_idx = rois[:, 0].astype(jnp.int32)
    feats = features.astype(jnp.float32)
    rois = rois.astype(jnp.float32)
    dout = dout.astype(jnp.float32)

    kernel = functools.partial(_roi_bwd_kernel, pooled=pooled,
                               spatial_scale=spatial_scale, height=H,
                               width=W, n_boxes=N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((N, 5), lambda i, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W, C), lambda i, b: (i, 0, 0, 0)),
            pl.BlockSpec((N, C), lambda i, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i, b: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((H * W, C), jnp.float32)],
    )
    dfmap = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_struct((B, H, W, C), jnp.float32, feats),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * (pooled * pooled) * H * W * C,
            bytes_accessed=(B * H * W * C * 2 + N * C) * 4,
            transcendentals=0,
        ),
    )(batch_idx, rois, feats, dout)
    return dfmap.astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _roi_align_maxpool(features, rois, pooled: int, spatial_scale: float):
    return _fwd_call(features, rois, pooled, spatial_scale)


def _roi_align_maxpool_fwd(features, rois, pooled, spatial_scale):
    return _fwd_call(features, rois, pooled, spatial_scale), (features, rois)


def _roi_align_maxpool_bwd(pooled, spatial_scale, residuals, g):
    features, rois = residuals
    dfeat = _bwd_call(features, rois, g, pooled, spatial_scale)
    # RoI coordinates are data (loader proposals), not parameters; the
    # reference CUDA op likewise defines no coordinate gradient.
    return dfeat, jnp.zeros_like(rois)


_roi_align_maxpool.defvjp(_roi_align_maxpool_fwd, _roi_align_maxpool_bwd)


def roi_align_maxpool(features: jax.Array, rois: jax.Array, *,
                      pooled: int = 7,
                      spatial_scale: float = 1.0 / 16.0) -> jax.Array | None:
    """(B, H, W, C) features + (N, 5) rois -> (N, C) pooled vectors.

    Differentiable w.r.t. ``features`` (custom Pallas VJP).  Returns None
    when Pallas is unavailable (caller falls back to the XLA roi_align +
    max_pool_2d pair).
    """
    if not _HAS_PALLAS:
        return None
    return _roi_align_maxpool(features, rois, pooled, float(spatial_scale))

"""Fused Pallas TPU kernel: RoIAlign (7x7, adaptive sampling) + max pool.

The XLA implementation (``lfb_tpu/ops/roi_align.py``) materializes four
(N, P, G, P, G, C) corner gathers in HBM -- ~1.6 GB of traffic for an AVA
batch.  Here each grid step keeps one clip's temporally-pooled feature map
(H x W x C ~= 2 MB) in VMEM and emits the box's final pooled vector
directly, fusing the head's 7x7 max-pool
(reference ``lib/models/head_helper.py:104-115``) into the same kernel.

TPU kernels cannot dynamically index VMEM per element, so the bilinear
gather is expressed the MXU way: the four corner lookups of all
7x7 x 4x4 sample points become one-hot (S, H*W) x (H*W, C) matmuls with the
bilinear weights folded into the one-hot rows.

Semantics identical to legacy Caffe2 RoIAlign with sampling_ratio=0 (see
roi_align.py); the per-box feature map is selected with a scalar-prefetch
index map so only referenced maps are DMA'd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_MAX_GRID = 4


def _roi_kernel(batch_idx_ref, rois_ref, fmap_ref, out_ref, *,
                pooled: int, spatial_scale: float, height: int, width: int):
    i = pl.program_id(0)
    P, G = pooled, _MAX_GRID
    S = P * P * G * G
    HW = height * width

    x1 = rois_ref[i, 1] * spatial_scale
    y1 = rois_ref[i, 2] * spatial_scale
    x2 = rois_ref[i, 3] * spatial_scale
    y2 = rois_ref[i, 4] * spatial_scale

    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P
    grid_w = jnp.clip(jnp.ceil(roi_w / P), 1, G)
    grid_h = jnp.clip(jnp.ceil(roi_h / P), 1, G)
    count = grid_w * grid_h

    # Sample lattice (S, 1): s = ((ph*P + pw)*G + iy)*G + ix.
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

    # Fold all four bilinear corners into ONE weighted selection matrix
    # (S, HW); a single MXU matmul then gathers + interpolates every sample
    # point at once (separate per-corner matmuls blow the VMEM budget).
    fmap = fmap_ref[0].reshape(HW, fmap_ref.shape[-1]).astype(jnp.bfloat16)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, HW), 1)

    select = jnp.zeros((S, HW), jnp.float32)
    for yi, xi, w in (
            (y_lo, x_lo, (1 - fy) * (1 - fx)),
            (y_lo, x_hi, (1 - fy) * fx),
            (y_hi, x_lo, fy * (1 - fx)),
            (y_hi, x_hi, fy * fx)):
        select = select + jnp.where(cols == yi * width + xi, w * w_ok, 0.0)

    acc = jax.lax.dot_general(
        select.astype(jnp.bfloat16), fmap, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (S, C)

    bins = acc.reshape(P * P, G * G, -1).sum(axis=1) / count  # (P*P, C)
    out_ref[0, 0, :] = jnp.max(bins, axis=0)


def roi_align_maxpool(features: jax.Array, rois: jax.Array, *,
                      pooled: int = 7,
                      spatial_scale: float = 1.0 / 16.0) -> jax.Array | None:
    """(B, H, W, C) features + (N, 5) rois -> (N, C) pooled vectors.

    Returns None when Pallas is unavailable (caller falls back to the XLA
    roi_align + max_pool_2d pair).
    """
    if not _HAS_PALLAS:
        return None
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
        out_shape=jax.ShapeDtypeStruct((N, 1, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * N * pooled * pooled * _MAX_GRID * _MAX_GRID * H * W * C,
            bytes_accessed=(N * H * W * C + N * C) * 4,
            transcendentals=0,
        ),
    )(batch_idx, rois, feats)
    return out[:, 0, :]

"""Fused Pallas TPU kernel: RoIAlign (7x7, adaptive sampling) + max pool.

The XLA implementation (``lfb_tpu/ops/roi_align.py``) materializes four
(N, P, G, P, G, C) corner gathers in HBM -- ~1.6 GB of traffic for an AVA
batch.  Here each grid step keeps one clip's pooled feature map
(H x W x C ~= 2 MB) in VMEM and produces the box's final pooled vector
directly, fusing the 7x7 max-pool of the head
(reference ``lib/models/head_helper.py:104-115``) into the same kernel.

Semantics identical to legacy Caffe2 RoIAlign with sampling_ratio=0 (see
roi_align.py docstring); the per-box feature map is selected with a
scalar-prefetch index map so only referenced maps are DMA'd.
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
    x1 = rois_ref[i, 1] * spatial_scale
    y1 = rois_ref[i, 2] * spatial_scale
    x2 = rois_ref[i, 3] * spatial_scale
    y2 = rois_ref[i, 4] * spatial_scale

    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled
    grid_w = jnp.clip(jnp.ceil(roi_w / pooled), 1, _MAX_GRID).astype(jnp.int32)
    grid_h = jnp.clip(jnp.ceil(roi_h / pooled), 1, _MAX_GRID).astype(jnp.int32)
    count = (grid_w * grid_h).astype(jnp.float32)

    fmap = fmap_ref[0]  # (H, W, C) in VMEM

    def bilinear(y, x):
        """Sample fmap at continuous (y, x) with legacy border handling."""
        outside = (y < -1.0) | (y > float(height)) | \
                  (x < -1.0) | (x > float(width))
        y = jnp.maximum(y, 0.0)
        x = jnp.maximum(x, 0.0)
        y_lo = jnp.floor(y)
        x_lo = jnp.floor(x)
        y_hi_clamp = y_lo >= height - 1
        x_hi_clamp = x_lo >= width - 1
        y_lo = jnp.where(y_hi_clamp, float(height - 1), y_lo)
        x_lo = jnp.where(x_hi_clamp, float(width - 1), x_lo)
        y = jnp.where(y_hi_clamp, y_lo, y)
        x = jnp.where(x_hi_clamp, x_lo, x)
        yl = y_lo.astype(jnp.int32)
        xl = x_lo.astype(jnp.int32)
        yh = jnp.where(y_hi_clamp, yl, yl + 1)
        xh = jnp.where(x_hi_clamp, xl, xl + 1)
        fy = y - y_lo
        fx = x - x_lo
        v_ll = fmap[yl, xl, :]
        v_lh = fmap[yl, xh, :]
        v_hl = fmap[yh, xl, :]
        v_hh = fmap[yh, xh, :]
        val = ((1 - fy) * (1 - fx) * v_ll + (1 - fy) * fx * v_lh
               + fy * (1 - fx) * v_hl + fy * fx * v_hh)
        return jnp.where(outside, 0.0, val)

    max_acc = jnp.full((fmap.shape[-1],), -jnp.inf, jnp.float32)
    for ph in range(pooled):
        for pw in range(pooled):
            acc = jnp.zeros((fmap.shape[-1],), jnp.float32)
            for iy in range(_MAX_GRID):
                yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / grid_h.astype(
                    jnp.float32)
                y_ok = iy < grid_h
                for ix in range(_MAX_GRID):
                    xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / grid_w.astype(
                        jnp.float32)
                    ok = y_ok & (ix < grid_w)
                    acc = acc + jnp.where(ok, bilinear(yy, xx), 0.0)
            max_acc = jnp.maximum(max_acc, acc / count)
    out_ref[0, :] = max_acc


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
        out_specs=pl.BlockSpec((1, C), lambda i, b: (i, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
    )(batch_idx, rois, feats)

"""RoIAlign on TPU: pure-XLA gather/bilinear implementation.

Replaces the reference's external CUDA op (loaded from
``libcaffe2_detectron_ops_gpu.so`` at ``lib/utils/c2.py:34-55``, called with
``pooled_w=pooled_h=7, spatial_scale=1/16, sampling_ratio=0`` at
``lib/models/lfb_helper.py:144-150``).  Semantics follow legacy Caffe2
RoIAlign (no half-pixel alignment offset):

  * ROI coords scaled by ``spatial_scale``; width/height clamped to >= 1.
  * ``sampling_ratio=0`` => an adaptive per-ROI grid of
    ``ceil(roi_size / pooled_size)`` bilinear samples per bin, averaged.
  * Bilinear samples outside ``[-1, size]`` contribute zero; in-range
    coords clamp to the border.

XLA needs static shapes, so the adaptive grid is realized as a static
``max_grid``-sized sample lattice with per-ROI masking -- numerically
identical to the dynamic CUDA loop for any ROI whose adaptive grid fits in
``max_grid`` (grid = ceil(crop/16/pooled) = 2..3 for all reference configs;
the default max of 4 leaves headroom).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(
    features: jax.Array,
    rois: jax.Array,
    *,
    pooled_h: int = 7,
    pooled_w: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 0,
    max_grid: int = 4,
) -> jax.Array:
    """RoIAlign over channels-last feature maps.

    Args:
      features: (B, H, W, C) feature map.
      rois: (N, 5) rows of ``[batch_idx, x1, y1, x2, y2]`` in input-pixel
        coordinates (the reference's ``proposals`` blob layout,
        ``lib/datasets/ava_data_input.py:232-243``).
      pooled_h, pooled_w: output bin grid.
      spatial_scale: feature-map stride reciprocal.
      sampling_ratio: >0 for a fixed grid; 0 for adaptive (ceil) gridding.
      max_grid: static bound on the adaptive grid (asserted at trace time
        when sampling_ratio > 0).

    Returns:
      (N, pooled_h, pooled_w, C) pooled features, float32.
    """
    B, H, W, C = features.shape
    N = rois.shape[0]
    f32 = jnp.float32
    feats = features.astype(f32)
    rois = rois.astype(f32)

    batch_idx = rois[:, 0].astype(jnp.int32)  # (N,)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale

    roi_w = jnp.maximum(x2 - x1, 1.0)  # (N,)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pooled_w
    bin_h = roi_h / pooled_h

    if sampling_ratio > 0:
        assert sampling_ratio <= max_grid
        grid_w = jnp.full((N,), sampling_ratio, jnp.int32)
        grid_h = jnp.full((N,), sampling_ratio, jnp.int32)
    else:
        grid_w = jnp.clip(jnp.ceil(roi_w / pooled_w), 1, max_grid).astype(jnp.int32)
        grid_h = jnp.clip(jnp.ceil(roi_h / pooled_h), 1, max_grid).astype(jnp.int32)

    # Static sample lattice: (pooled, max_grid) per spatial axis.
    ph = jnp.arange(pooled_h, dtype=f32)          # (P,)
    pw = jnp.arange(pooled_w, dtype=f32)
    ig = jnp.arange(max_grid, dtype=f32)          # (G,)

    # Sample coords: start + p*bin + (i+0.5)*bin/grid   [N,P,G]
    def coords(start, bin_sz, grid, p):
        return (start[:, None, None]
                + p[None, :, None] * bin_sz[:, None, None]
                + (ig[None, None, :] + 0.5) * bin_sz[:, None, None]
                / grid[:, None, None].astype(f32))

    ys = coords(y1, bin_h, grid_h, ph)   # (N, P, G)
    xs = coords(x1, bin_w, grid_w, pw)   # (N, P, G)

    # Bilinear interpolation weights/corners per sample point.
    def corners(v, size):
        outside = (v < -1.0) | (v > size)
        v = jnp.clip(v, 0.0, None)
        lo = jnp.floor(v)
        hi_clamp = lo >= size - 1
        lo = jnp.where(hi_clamp, size - 1, lo)
        v = jnp.where(hi_clamp, lo, v)
        hi = jnp.where(hi_clamp, lo, lo + 1)
        frac = v - lo
        return lo.astype(jnp.int32), hi.astype(jnp.int32), frac, outside

    y_lo, y_hi, fy, y_out = corners(ys, float(H))   # (N, P, G)
    x_lo, x_hi, fx, x_out = corners(xs, float(W))

    # Validity of each lattice point under the adaptive grid.
    iy_valid = jnp.arange(max_grid)[None, None, :] < grid_h[:, None, None]  # (N,P,G)
    ix_valid = jnp.arange(max_grid)[None, None, :] < grid_w[:, None, None]

    # Broadcast to the full (N, Ph, Gh, Pw, Gw) sample grid.
    def bg_y(a):  # (N,P,G) -> (N,Ph,Gh,1,1)
        return a[:, :, :, None, None]

    def bg_x(a):
        return a[:, None, None, :, :]

    b = batch_idx[:, None, None, None, None]

    def gather(yi, xi):
        # fancy-gather (N,Ph,Gh,Pw,Gw,C)
        return feats[b, yi, xi, :]

    yl, yh = bg_y(y_lo), bg_y(y_hi)
    xl, xh = bg_x(x_lo), bg_x(x_hi)
    fy_b, fx_b = bg_y(fy), bg_x(fx)

    w_ll = (1 - fy_b) * (1 - fx_b)
    w_lh = (1 - fy_b) * fx_b
    w_hl = fy_b * (1 - fx_b)
    w_hh = fy_b * fx_b

    val = (gather(yl, xl) * w_ll[..., None]
           + gather(yl, xh) * w_lh[..., None]
           + gather(yh, xl) * w_hl[..., None]
           + gather(yh, xh) * w_hh[..., None])

    outside = bg_y(y_out) | bg_x(x_out)
    valid = bg_y(iy_valid) & bg_x(ix_valid)
    val = jnp.where((outside | ~valid)[..., None], 0.0, val)

    # Average over the two grid axes (Gh at dim 2, Gw at dim 4).
    count = (grid_h * grid_w).astype(f32)[:, None, None, None]  # (N,1,1,1)
    pooled = jnp.sum(val, axis=(2, 4)) / count
    return pooled  # (N, Ph, Pw, C)

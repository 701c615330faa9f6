"""Output heads: clip-level global pooling (Charades/EPIC) and box-level
RoIAlign pooling (AVA).  Reference: ``lib/models/head_helper.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lfb_tpu.models.spec import ModelSpec
from lfb_tpu.ops.pooling import max_pool_2d
from lfb_tpu.ops.roi_align import roi_align


def basic_head(spec: ModelSpec, features: jax.Array) -> jax.Array:
    """Global avg pool -> (B, 2048).

    The reference pools with kernel [pool_stride, S, S] where pool_stride =
    TRAIN.VIDEO_LENGTH/2 and S = crop/16 (``head_helper.py:37-40``); with
    matching video length that is exactly a global mean.
    """
    B, T, H, W, C = features.shape
    ps = spec.pool_stride
    assert T == ps, (
        'head temporal extent {} != TRAIN.VIDEO_LENGTH/2 = {}'.format(T, ps))
    return jnp.mean(features.astype(jnp.float32), axis=(1, 2, 3))


def roi_head(spec: ModelSpec, features: jax.Array,
             proposals: jax.Array, train: bool = False) -> jax.Array:
    """Temporal mean -> RoIAlign(7x7, 1/16, adaptive sampling) -> 7x7 max
    pool -> (N, 2048).  Reference ``head_helper.py:61-123``.

    Args:
      features: (B, T, H, W, C) res5 output.
      proposals: (N, 5) rows [batch_idx, x1, y1, x2, y2] in input pixels
        (zero rows for padding are harmless: they pool a 1x1-pixel corner).
    """
    fmap = jnp.mean(features.astype(jnp.float32), axis=1)   # (B, H, W, C)
    res = spec.roi_resolution
    # The Pallas kernel carries a custom VJP (transpose-matmul feature
    # gradient), so training uses it too; pallas_ok handles the
    # backend/mesh gating.
    from lfb_tpu.models.layers import pallas_ok
    if pallas_ok(spec):
        from lfb_tpu.ops.pallas_roi_align import roi_align_maxpool
        out = roi_align_maxpool(fmap, proposals, pooled=res,
                                spatial_scale=spec.roi_spatial_scale)
        if out is not None:
            return out
    feats = roi_align(
        fmap, proposals, pooled_h=res, pooled_w=res,
        spatial_scale=spec.roi_spatial_scale, sampling_ratio=0)
    if res > 1:
        feats = max_pool_2d(feats, (res, res), (1, 1))       # (N, 1, 1, C)
    return feats.reshape(feats.shape[0], feats.shape[-1])


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:  # pragma: no cover
        return False

"""Pooling ops over NDHWC tensors (reduce_window lowers to fused TPU loops).

Floor-mode output sizing matches Caffe2/cuDNN pooling used by the reference
(e.g. pool1 [1,3,3]/[1,2,2]/pad[0,1,1] at ``lib/models/resnet_video.py:190-196``,
pool2 [2,1,1]/[2,1,1] at ``:219-225``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _pool(x, kernels, strides, pads, init, op, spatial_rank):
    # x: (B, *spatial, C); kernels/strides/pads over the spatial dims only.
    window = (1,) + tuple(int(k) for k in kernels) + (1,)
    stride = (1,) + tuple(int(s) for s in strides) + (1,)
    padding = ((0, 0),) + tuple((int(p), int(p)) for p in pads) + ((0, 0),)
    assert len(window) == x.ndim, (window, x.shape)
    return lax.reduce_window(x, init, op, window, stride, padding)


def max_pool_3d(x: jax.Array, kernels: Sequence[int], strides: Sequence[int],
                pads: Sequence[int] = (0, 0, 0)) -> jax.Array:
    """(B, T, H, W, C) max pool. Padding uses -inf so it never wins."""
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return _pool(x, kernels, strides, pads, neg_inf, lax.max, 3)


def avg_pool_3d(x: jax.Array, kernels: Sequence[int], strides: Sequence[int],
                pads: Sequence[int] = (0, 0, 0)) -> jax.Array:
    """(B, T, H, W, C) average pool (count includes padding, as in Caffe2's
    default; all reference call sites use pad=0 so this is only relevant for
    exotic configs)."""
    summed = _pool(x, kernels, strides, pads, 0.0, lax.add, 3)
    count = 1
    for k in kernels:
        count *= int(k)
    return summed / jnp.asarray(count, dtype=summed.dtype)


def max_pool_2d(x: jax.Array, kernels: Sequence[int], strides: Sequence[int],
                pads: Sequence[int] = (0, 0)) -> jax.Array:
    """(B, H, W, C) max pool (used by the RoI head's 7x7 -> 1x1 reduction,
    reference ``lib/models/head_helper.py:112-115``)."""
    neg_inf = -jnp.inf
    return _pool(x, kernels, strides, pads, neg_inf, lax.max, 2)


def global_avg_pool(x: jax.Array, axes: Sequence[int]) -> jax.Array:
    """Mean over the given axes, keeping dims (the basic head's global pool,
    reference ``lib/models/head_helper.py:37-40``)."""
    return jnp.mean(x, axis=tuple(axes), keepdims=True)

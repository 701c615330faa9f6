"""Frozen-BN channel affine: ``y = x * scale + bias``.

TPU-native equivalent of the reference's custom CUDA ``AffineNd`` operator
(reference: ``caffe2_customized_ops/video/affine_nd_op.cu:32-58``).  On TPU
this is a broadcasted fused multiply-add that XLA folds into the preceding
convolution's epilogue -- no custom kernel needed for speed-of-light.

Frozen semantics: the reference's ``AffineNdGradient`` backpropagates only
``dX = dY * scale`` and produces no scale/bias gradients (reference:
``caffe2_customized_ops/video/affine_nd_op.cc:45-52``), so affine parameters
never train.  We reproduce that exactly with ``stop_gradient`` on the
parameters, which yields the identical vjp.
"""

from __future__ import annotations

import jax


def affine_nd(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """Per-channel affine over a channels-last tensor.

    Args:
      x: (..., C) activations (any rank; channel must be the last axis --
         lfb_tpu uses NDHWC layout throughout, unlike the reference's NCTHW).
      scale, bias: (C,) frozen parameters.
    """
    scale = jax.lax.stop_gradient(scale)
    bias = jax.lax.stop_gradient(bias)
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)

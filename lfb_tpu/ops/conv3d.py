"""3D convolution on TPU via ``lax.conv_general_dilated``.

Layout is channels-last NDHWC with DHWIO kernels -- the layout XLA:TPU tiles
onto the MXU without transposes (the reference uses Caffe2 NCTHW + cuDNN,
``lib/models/model_builder_video.py:176-221``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# (batch, T, H, W, channel) activations; (kT, kH, kW, in, out) kernels.
DIMENSION_NUMBERS = ('NDHWC', 'DHWIO', 'NDHWC')


def conv3d(
    x: jax.Array,
    w: jax.Array,
    *,
    strides: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] | str = (0, 0, 0),
    dilation: Sequence[int] = (1, 1, 1),
    groups: int = 1,
    bias: jax.Array | None = None,
    compute_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """3D conv over (B, T, H, W, Cin) with (kT, kH, kW, Cin/groups, Cout) kernel.

    ``padding`` is either a lax padding string or per-dim symmetric pad
    (pT, pH, pW), matching the reference's symmetric ``pads=[p]*2`` usage.
    """
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [(int(p), int(p)) for p in padding]
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    else:
        w = w.astype(x.dtype)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=tuple(int(s) for s in strides),
        padding=pad,
        rhs_dilation=tuple(int(d) for d in dilation),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(in_dtype if compute_dtype is None else compute_dtype)


def conv1x1(x: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Pointwise (1x1x1) conv as a single MXU matmul.

    ``x``: (..., Cin); ``w``: (Cin, Cout) or a (1,1,1,Cin,Cout) DHWIO kernel.
    Used for the theta/phi/g/out projections of non-local and FBO blocks.
    """
    if w.ndim == 5:
        w = w.reshape(w.shape[-2], w.shape[-1])
    out = jnp.einsum('...i,io->...o', x, w.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out

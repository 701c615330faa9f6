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
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    w = w.astype(x.dtype)
    # No preferred_element_type: XLA:TPU accumulates bf16 convs in f32
    # internally and emits the operand dtype, and the conv transpose rule
    # (reverse-mode AD) requires matching operand/cotangent dtypes.
    out = lax.conv_general_dilated(
        x, w,
        window_strides=tuple(int(s) for s in strides),
        padding=pad,
        rhs_dilation=tuple(int(d) for d in dilation),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv1_space_to_depth(x: jax.Array, w: jax.Array, *, temporal_pad: int,
                         compute_dtype: jnp.dtype | None = None) -> jax.Array:
    """Stem conv (kT x 7 x 7, stride 1x2x2, pad ptx3x3) via 2x2
    space-to-depth.

    The raw stem conv has Cin=3, which starves the MXU's 128-lane
    contraction (measured ~10 TFLOP/s on v5e); packing 2x2 spatial blocks
    into channels turns it into an equivalent (kT x 4 x 4, stride 1,
    Cin=12) conv that runs ~1.8x faster.  Numerically identical: the packed
    kernel w2[t, I, J, (p,q,c), o] = w[t, 2I+p-1, 2J+q-1, c, o] (zero
    where out of range) reproduces every original tap.

    Requires even H, W; kernel 7x7; spatial stride 2; pad 3.
    """
    kt, kh, kw, cin, cout = w.shape
    assert (kh, kw) == (7, 7), (kh, kw)
    B, T, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0 and C == cin
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    xp = x.reshape(B, T, H // 2, 2, W // 2, 2, C)
    xp = xp.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, H // 2, W // 2, 4 * C)

    # Packed kernel w2[t, I, J, (p,q,c), o] = w[t, 2I+p-1, 2J+q-1, c, o]:
    # pad taps to 8x8 (one leading zero row/col), then block-reshape.
    # Packing runs in the weight's own dtype with a single cast at the end
    # (casting first triggers a pathological XLA:TPU compile on some
    # backends).
    wp = jnp.pad(w, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(kt, 4, 2, 4, 2, cin, cout)
    w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(kt, 4, 4, 4 * cin, cout)
    w2 = w2.astype(x.dtype)

    out = lax.conv_general_dilated(
        xp, w2, (1, 1, 1),
        [(temporal_pad, temporal_pad), (2, 1), (2, 1)],
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


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

"""Fused Pallas TPU kernel for identity bottleneck blocks (inference).

A ResNet bottleneck in frozen-affine mode is

    h  = relu(affine1(conv_{kTx1x1}(x)))      # branch2a, C -> Ci
    h  = relu(affine2(conv_{1x3x3}(h)))       # branch2b, Ci -> Ci, dilation d
    y  = relu(affine3(conv_{1x1x1}(h)) + x)   # branch2c + identity shortcut

(reference ``lib/models/resnet_helper.py:35-119``).  Executed as separate
XLA convolutions every full-width (C-channel) tensor round-trips HBM
several times per block; on v5e the res2/res3 stages sit at the HBM
roofline at ~25% MXU utilization.  This kernel runs the whole block per
(batch, frame) with all intermediates in VMEM:

  * the frozen affine scales are folded into the conv weights outside the
    kernel (``w' = w * s``, bias ``b``), so the kernel computes plain
    matmul + bias + relu chains;
  * branch2a's temporal taps are per-tap matmuls over a rolling ring of
    input slices (one new HBM read per frame, prefetched one frame ahead
    -- same scheme as ``pallas_stem``); out-of-range taps (the conv's
    temporal zero padding) are masked out of the accumulation;
  * branch2b's 3x3 runs as 9 shifted matmuls over a zero-margined VMEM
    copy of branch2a's output: with positions flattened row-major
    (r = h*W + w), tap (dh, dw) is the row slice at offset dh*W*d + dw*d;
    width-edge wraparound rows are masked per tap (they correspond to the
    conv's spatial zero padding);
  * branch2c is one matmul whose f32 accumulator takes the residual add
    and final relu before the single HBM write.

Per block this reads the C-channel input once and writes the output once
(vs >= 2 reads + 1 write of the full-width tensor plus the Ci-channel
round-trips for XLA), roughly halving stage HBM traffic.

Supported envelope (checked by :func:`_supported`; caller falls back to
the XLA path): identity shortcut, all strides 1, groups=1, frozen-affine
norm, C a multiple of 128, H*W a multiple of 16, VMEM budget.
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

from lfb_tpu.ops.pallas_common import out_struct

_VMEM_BUDGET = 32 * 1024 * 1024


def _margin(W: int, d: int) -> int:
    """Zero margin rows around the branch2b input buffer, rounded to the
    f32 sublane tile so the center slice stays aligned."""
    m = d * (W + 1)
    return (m + 7) // 8 * 8


def _kernel(x_hbm, w2a_ref, b2a_ref, w2b_ref, b2b_ref, w2c_ref, b2c_ref,
            o_ref, xs, buf, sem, *, kt: int, pad_t: int, W: int, HW: int,
            d: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)
    S = kt + 1          # ring slots: kt live taps + 1 in-flight prefetch
    M0 = _margin(W, d)

    def fetch(real_idx, slot):
        return pltpu.make_async_copy(x_hbm.at[b, real_idx], xs.at[slot],
                                     sem.at[slot])

    def slot_of(real_idx):
        return jax.lax.rem(real_idx, S)

    # --- rolling input window (same scheme as pallas_stem) ---
    @pl.when(t == 0)
    def _():
        for r in range(pad_t + 1):      # frame 0's in-range taps
            if r < T:
                fetch(r, r % S).start()
        for r in range(pad_t + 1):
            if r < T:
                fetch(r, r % S).wait()

    @pl.when(t > 0)
    def _():
        r = t + pad_t                   # newest tap of this frame
        @pl.when(r < T)
        def _():
            fetch(r, slot_of(r)).wait()

    @pl.when(t < T - 1)
    def _():
        r = t + 1 + pad_t               # prefetch next frame's newest tap
        @pl.when(r < T)
        def _():
            fetch(r, slot_of(r)).start()

    # Zero the branch2b buffer margins once (they are never written again).
    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        buf[0:M0, :] = jnp.zeros((M0, buf.shape[1]), buf.dtype)
        buf[M0 + HW:, :] = jnp.zeros((buf.shape[0] - M0 - HW, buf.shape[1]),
                                     buf.dtype)

    # --- branch2a: temporal taps as per-tap matmuls; out-of-range taps
    # (temporal zero padding) masked out of the accumulation. ---
    acc = jnp.zeros((HW, w2a_ref.shape[2]), jnp.float32)
    for s in range(kt):
        r = t + s - pad_t
        # Out-of-range taps are the conv's temporal zero padding: the slot
        # index is clamped valid and the (garbage) product masked to zero.
        p = jax.lax.dot_general(
            xs[slot_of(jnp.maximum(r, 0))], w2a_ref[s],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if kt > 1:
            in_range = jnp.logical_and(r >= 0, r < T)
            p = jnp.where(in_range, p, 0.0)
        acc = acc + p
    h = jnp.maximum(acc + b2a_ref[0].astype(jnp.float32), 0.0)
    buf[M0:M0 + HW, :] = h.astype(buf.dtype)

    # --- branch2b: 9 shifted matmuls with width-edge masks. ---
    col = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W
    acc = jnp.zeros((HW, w2b_ref.shape[2]), jnp.float32)
    for j in range(9):
        dh, dw = j // 3 - 1, j % 3 - 1
        a = buf[pl.dslice(M0 + (dh * W + dw) * d, HW), :]
        if dw:
            valid = (col >= d) if dw < 0 else (col < W - d)
            a = jnp.where(valid, a, 0)
        acc = acc + jax.lax.dot_general(
            a, w2b_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    h = jnp.maximum(acc + b2b_ref[0].astype(jnp.float32),
                    0.0).astype(buf.dtype)

    # --- branch2c + residual + relu, single HBM write. ---
    out = jax.lax.dot_general(
        h, w2c_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b2c_ref[0].astype(jnp.float32)
    out = out + xs[slot_of(t)].astype(jnp.float32)
    o_ref[0, 0] = jnp.maximum(out, 0.0).astype(o_ref.dtype)


def _supported(x_shape, kt: int, ci: int, dilation: int,
               itemsize: int) -> bool:
    if not _HAS_PALLAS:
        return False
    B, T, H, W, C = x_shape
    HW = H * W
    if C % 128 or HW % 16 or W % 8:
        return False
    if dilation * (W + 1) >= HW:
        return False
    vmem = ((kt + 1) * HW * C                      # input ring
            + (HW + 2 * _margin(W, dilation)) * ci   # branch2b buffer
            + HW * C                               # output block
            + kt * C * ci + 9 * ci * ci + ci * C) * itemsize
    return vmem <= _VMEM_BUDGET


def fused_identity_bottleneck(x: jax.Array, w2a: jax.Array, b2a: jax.Array,
                              w2b: jax.Array, b2b: jax.Array,
                              w2c: jax.Array, b2c: jax.Array, *,
                              temporal_pad: int,
                              dilation: int = 1) -> jax.Array | None:
    """Fused identity bottleneck (all strides 1, affine already folded).

    Args:
      x:   (B, T, H, W, C) activations.
      w2a: (kt, C, Ci) branch2a weights (affine scale folded in).
      b2a: (Ci,) branch2a affine bias.
      w2b: (9, Ci, Ci) branch2b 3x3 weights, taps row-major (dh, dw).
      b2b: (Ci,) branch2b affine bias.
      w2c: (Ci, C) branch2c weights.  b2c: (C,) bias.
      temporal_pad: (kt-1)//2, the branch2a temporal zero padding.
      dilation: branch2b spatial dilation (res5 uses 2).

    Returns (B, T, H, W, C), or None outside the supported envelope.
    """
    kt, C, ci = w2a.shape
    if not _supported(x.shape, kt, ci, dilation, x.dtype.itemsize):
        return None
    assert temporal_pad == kt // 2, (temporal_pad, kt)
    B, T, H, W, _ = x.shape
    HW = H * W
    M0 = _margin(W, dilation)
    dt = x.dtype

    xf = x.reshape(B, T, HW, C)
    kernel = functools.partial(_kernel, kt=kt, pad_t=temporal_pad, W=W,
                               HW=HW, d=dilation)
    out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x stays in HBM
            pl.BlockSpec((kt, C, ci), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((1, ci), lambda b, t: (0, 0)),
            pl.BlockSpec((9, ci, ci), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((1, ci), lambda b, t: (0, 0)),
            pl.BlockSpec((ci, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, HW, C), lambda b, t: (b, t, 0, 0)),
        out_shape=out_struct((B, T, HW, C), dt, x),
        scratch_shapes=[
            pltpu.VMEM((kt + 1, HW, C), dt),
            pltpu.VMEM((HW + 2 * M0, ci), dt),
            pltpu.SemaphoreType.DMA((kt + 1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * HW * (kt * C * ci + 9 * ci * ci + ci * C),
            bytes_accessed=2 * B * T * HW * C * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
    )(xf, w2a.astype(dt), b2a.reshape(1, ci).astype(dt),
      w2b.astype(dt), b2b.reshape(1, ci).astype(dt),
      w2c.astype(dt), b2c.reshape(1, C).astype(dt))
    return out.reshape(B, T, H, W, C)


def fold_bottleneck_params(params, prefix: str):
    """Fold the frozen affine scales of a bottleneck into its conv weights.

    Returns (w2a, b2a, w2b, b2b, w2c, b2c) in the kernel's layouts, or None
    if the block's param names are not the plain bottleneck set.
    """
    try:
        w2a = params[prefix + '_branch2a_w']
        s1 = params[prefix + '_branch2a_bn_s']
        b1 = params[prefix + '_branch2a_bn_b']
        w2b = params[prefix + '_branch2b_w']
        s2 = params[prefix + '_branch2b_bn_s']
        b2 = params[prefix + '_branch2b_bn_b']
        w2c = params[prefix + '_branch2c_w']
        s3 = params[prefix + '_branch2c_bn_s']
        b3 = params[prefix + '_branch2c_bn_b']
    except KeyError:
        return None
    kt, kh, kw, cin, ci = w2a.shape
    if (kh, kw) != (1, 1) or w2b.shape[:3] != (1, 3, 3):
        return None
    w2a = w2a.reshape(kt, cin, ci) * s1
    w2b = w2b.reshape(9, ci, w2b.shape[-1]) * s2
    w2c = w2c.reshape(ci, w2c.shape[-1]) * s3
    return w2a, b1, w2b, b2, w2c, b3

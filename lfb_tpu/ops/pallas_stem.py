"""Pallas TPU kernel for the stem conv (kT x 7 x 7, stride 1x2x2, Cin=3).

The raw stem conv starves the MXU (Cin=3 -> ~10 TFLOP/s measured on v5e,
45% of the whole backbone's inference time), and the XLA space-to-depth
conv reformulation triggers pathologically slow convolution autotuning on
some backends.  This implementation splits the work:

  XLA (pure data movement, deterministic): space-to-depth pack + 4x4
      spatial-tap unfold -> xr (B, T+2p, hp/RB, RB*wp, 256) where 256 is
      the 192-channel unfold padded to lane alignment and matmul rows come
      pre-flattened (in-kernel reshapes / rank-3 dots measured >10x slower).
  Pallas (grid B x rows x T x kT, temporal tap innermost): one dense
      (RB*wp, 256) x (256, 64) MXU matmul per tap accumulated into a
      persistent f32 VMEM scratch, written out on the last tap.  A single
      xr operand (the tap offset lives in the grid) avoids XLA
      materializing kT aliased operand copies.

Batches run through ``lax.map`` in chunks to bound the im2col transient.

Numerically identical to the direct conv up to bf16 rounding.  Inference
path only (no VJP); training differentiates through the plain conv.
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

_ROW_BLOCK = 32
_CK = 256


def _stem_kernel(xr_ref, w_ref, out_ref, scratch, sems, *, kt: int,
                 t_padded: int):
    b = pl.program_id(0)
    r = pl.program_id(1)
    t = pl.program_id(2)
    ring = kt + 1

    def dma(s, slot):
        return pltpu.make_async_copy(
            xr_ref.at[b, s, r], scratch.at[slot], sems.at[slot])

    # Rolling window over the padded T axis: slice s lives in slot s % ring.
    # One-step lookahead keeps the newest slice's DMA overlapped with the
    # previous step's matmuls.
    @pl.when(t == 0)
    def _():
        for s in range(kt):
            dma(s, s).start()
        @pl.when(kt < t_padded)
        def _():
            dma(kt, kt % ring).start()
        for s in range(kt):
            dma(s, s).wait()

    @pl.when(t > 0)
    def _():
        s_wait = t + kt - 1
        dma(s_wait, s_wait % ring).wait()
        s_next = t + kt
        @pl.when(s_next < t_padded)
        def _():
            dma(s_next, s_next % ring).start()

    # Static slot indices per ring phase: dynamic scratch[slot] reads cost a
    # full VMEM copy each (measured ~4x kernel slowdown).
    for phase in range(ring):
        @pl.when(t % ring == phase)
        def _(phase=phase):
            acc = jnp.zeros((scratch.shape[1], 64), jnp.float32)
            for dt in range(kt):
                acc = acc + jax.lax.dot_general(
                    scratch[(phase + dt) % ring], w_ref[dt],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[0, 0, 0] = acc.astype(out_ref.dtype)


def stem_conv_s2d(x: jax.Array, w: jax.Array, *, temporal_pad: int,
                  compute_dtype=jnp.bfloat16,
                  batch_chunk: int = 4) -> jax.Array | None:
    """(B,T,H,W,3) x (kT,7,7,3,64) stride (1,2,2) pad (pt,3,3) -> stem conv
    output (B,T,H/2,W/2,64).  Returns None outside the supported envelope
    (caller falls back to the XLA conv)."""
    if not _HAS_PALLAS:
        return None
    kt, kh, kw, cin, cout = w.shape
    B, T, H, W, C = x.shape
    if ((kh, kw, cin, cout) != (7, 7, 3, 64) or H % 2 or W % 2
            or (H // 2) % _ROW_BLOCK or temporal_pad != kt // 2):
        return None
    if B > batch_chunk and B % batch_chunk == 0:
        chunked = x.reshape((B // batch_chunk, batch_chunk) + x.shape[1:])
        out = jax.lax.map(
            lambda xc: _stem_conv_impl(xc, w, temporal_pad=temporal_pad,
                                       compute_dtype=compute_dtype),
            chunked)
        return out.reshape((B,) + out.shape[2:])
    return _stem_conv_impl(x, w, temporal_pad=temporal_pad,
                           compute_dtype=compute_dtype)


def _stem_conv_impl(x, w, *, temporal_pad, compute_dtype):
    kt, kh, kw, cin, cout = w.shape
    B, T, H, W, C = x.shape
    hp, wp = H // 2, W // 2
    unfold = 16 * 4 * cin  # 192

    # Space-to-depth pack + spatial unfold (XLA: slices + concat only).
    xb = x.astype(compute_dtype)
    xp = xb.reshape(B, T, hp, 2, wp, 2, C)
    xp = xp.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, hp, wp, 4 * C)
    xpad = jnp.pad(xp, ((0, 0), (temporal_pad, temporal_pad),
                        (2, 1), (2, 1), (0, 0)))
    xr = jnp.concatenate(
        [xpad[:, :, dh:dh + hp, dw:dw + wp, :]
         for dh in range(4) for dw in range(4)], axis=-1)
    # Pad the contraction dim to a 128-lane multiple (192-lane blocks cost a
    # VMEM relayout on every load) and pre-flatten matmul rows.
    xr = jnp.pad(xr, ((0, 0),) * 4 + ((0, _CK - unfold),))
    xr = xr.reshape(B, xr.shape[1], hp // _ROW_BLOCK, _ROW_BLOCK * wp, _CK)

    # w2[t, (DH,DW,p,q,c), o] = w[t, 2*DH+p-1, 2*DW+q-1, c, o].
    wpad = jnp.pad(w, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wpad.reshape(kt, 4, 2, 4, 2, cin, cout)
    w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(kt, unfold, cout)
    w2 = jnp.pad(w2, ((0, 0), (0, _CK - unfold), (0, 0))).astype(compute_dtype)

    rows = _ROW_BLOCK * wp
    t_padded = T + 2 * temporal_pad
    # xr laid out (B, T', R, rows, CK) so per-(b, s, r) slices are contiguous.
    kernel = functools.partial(_stem_kernel, kt=kt, t_padded=t_padded)
    out = pl.pallas_call(
        kernel,
        grid=(B, hp // _ROW_BLOCK, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # xr stays in HBM
            pl.BlockSpec((kt, _CK, cout), lambda b, r, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, rows, cout),
                               lambda b, r, t: (b, t, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (B, T, hp // _ROW_BLOCK, rows, cout), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((kt + 1, rows, _CK), compute_dtype),
            pltpu.SemaphoreType.DMA((kt + 1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * hp * wp * kt * _CK * cout,
            bytes_accessed=2 * B * T * hp * wp * (_CK + cout),
            transcendentals=0,
        ),
    )(xr, w2)
    return out.reshape(B, T, hp, wp, cout)

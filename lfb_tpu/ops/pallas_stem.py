"""Pallas TPU kernel for the stem conv (kT x 7 x 7, stride 1x2x2, Cin=3).

The raw stem conv starves the MXU (Cin=3) and XLA's convolution emitter
materializes an im2col in HBM -- at the measured effective HBM bandwidth
(~260-380 GB/s on the attached v5e) that makes the stem ~45% of whole-model
inference.  The XLA space-to-depth conv reformulation avoids some of it but
triggers pathologically slow convolution autotuning on some backends.

This kernel keeps the unfold entirely in VMEM:

  XLA prep (pure data movement, one fused transpose):
      space-to-depth pack (2x2 spatial -> 12 channels, zero-padded to 16),
      spatial halo pad, then layout (B, T+2p, C=16, HP * 128) where the
      lane dim flattens (h2, w2): lane = h2 * 128 + w2.  In this layout
      every (dh, h-block) tap slice is a 128-aligned lane slice, and the
      dw taps become +-1..3 lane shifts.

  Pallas kernel, grid (B, T):
      DMAs the kT temporal tap slices into VMEM, builds ONE un-shifted
      A matrix (K = kT*4*C, M = 2048 positions) per 16-row block with
      plain aligned sublane-block copies, then a single MXU dot
      A^T(K,M) x W(K, 4*64) computes all 4 dw taps at once; the dw
      results are combined with masked 32-bit rolls of the f32
      accumulator (out[m] = sum_dw O_dw[m + dw - 2]; values dragged
      across a 128-lane row boundary are masked to zero -- they
      correspond to the conv's zero padding, so rows need no w halo and
      crop 256 (wp = 128) packs the lanes exactly).

      The (M, dw*64+o) output orientation lands channels-last, so the
      XLA post-processing is a pure reshape + pad-column slice -- no
      940 MB transpose.

Measured (v5e, marginal per frame at large grid): ~32 us vs ~150 us for
the plain XLA conv path; whole-stem ~16 ms vs 75-77 ms at B=16, T=32.

Numerically identical to the direct conv up to bf16 rounding.  Training
uses :func:`stem_conv_s2d_diff`: the same kernel forward with a custom VJP
whose backward is the equivalent XLA conv's VJP (the stem is linear).
Reference: stem at ``lib/models/resnet_video.py`` (conv1 7x7x{5,3}).
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

_HB = 16          # minimum output rows per block (envelope requirement)
_LANES = 128      # padded s2d width (wp + 3 halo <= 128)
_C = 16           # s2d channels (4 * Cin(3), zero-padded to 16)
_DH = 4           # s2d kernel taps (7-tap stride-2 -> 4 taps, one zero pad)
_DW = 4


def _pick_hb(hp: int) -> int:
    """Output rows per block: the biggest of 64/32/16 dividing hp.  Larger
    blocks mean fewer programs and a taller M per MXU pass (measured on
    v5e, serialized A/B: 23.2 / 22.9 / 22.1 ms isolated at B=16 crop 256
    for hb 16 / 32 / 64), bounded by VMEM (the A matrix is K x hb*128)."""
    for hb in (64, 32, 16):
        if hp % hb == 0:
            return hb
    return _HB


def _ring_window_and_a_matrix(x_hbm, xs, a_ref, sem, *, kt: int, hb: int):
    """Shared by the forward and dW kernels: advance the rolling temporal
    input window and build this block's A matrix.

    Rolling temporal window: consecutive output frames share kt-1 of
    their kt tap slices, so only the NEW slice is fetched per frame --
    and it is prefetched one frame ahead (slot (t+kt) % S is unused by
    frame t's taps t..t+kt-1), overlapping the DMA with compute.
    HBM reads drop kt-fold vs refetching the full window.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    blk = pl.program_id(2)
    T = pl.num_programs(1)
    blk_l = hb * _LANES
    S = kt + 1   # ring slots: kt live taps + 1 in-flight prefetch

    def fetch(slice_idx, slot):
        return pltpu.make_async_copy(x_hbm.at[b, slice_idx], xs.at[slot],
                                     sem.at[slot])

    @pl.when(blk == 0)
    def _():
        @pl.when(t == 0)
        def _():
            for s in range(kt):
                fetch(s, s).start()
            for s in range(kt):
                fetch(s, s).wait()

        @pl.when(t > 0)
        def _():
            slot = jax.lax.rem(t + kt - 1, S)
            fetch(t + kt - 1, slot).wait()

        @pl.when(t < T - 1)
        def _():
            slot = jax.lax.rem(t + kt, S)
            fetch(t + kt, slot).start()

    row = 0
    for s in range(kt):
        slot = jax.lax.rem(t + s, S)
        for dh in range(_DH):
            start = (blk * hb + dh) * _LANES
            a_ref[row * _C:(row + 1) * _C, :] = xs[
                slot, :, pl.dslice(start, blk_l)]
            row += 1


def _stem_kernel(x_hbm, w_ref, o_ref, xs, a_ref, sem, *, kt: int,
                 nblk: int, hb: int):
    blk_l = hb * _LANES
    _ring_window_and_a_matrix(x_hbm, xs, a_ref, sem, kt=kt, hb=hb)
    # (K, M)^T x (K, 4*64): all dw taps in one MXU pass, channels-last.
    # f32 operands get true-f32 MXU passes (default TPU f32 dots round
    # through bf16); Mosaic rejects the HIGHEST hint on bf16 operands.
    precision = (jax.lax.Precision.HIGHEST
                 if a_ref.dtype == jnp.float32 else None)
    o4 = jax.lax.dot_general(
        a_ref[...], w_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                          # (M, 256) f32
    # Rows carry NO w halo: tap dw contributes at offset delta = dw - 2,
    # applied as a roll of the position (sublane) axis.  A rolled value is
    # valid iff w + delta stays inside its own 128-lane row; values dragged
    # across a row boundary are masked to zero (they correspond to the
    # conv's zero padding).
    w_lane = jax.lax.broadcasted_iota(jnp.int32, (blk_l, 1), 0) % _LANES
    acc = jnp.zeros((blk_l, o4.shape[1] // _DW), jnp.float32)
    for dw in range(_DW):
        delta = dw - 2
        o = o4[:, dw * 64:(dw + 1) * 64]
        if delta:
            o = pltpu.roll(o, (blk_l - delta) % blk_l, 0)
            valid = (w_lane >= -delta) if delta < 0 else (
                w_lane < _LANES - delta)
            o = jnp.where(valid, o, 0.0)
        acc = acc + o
    o_ref[0, 0, 0] = acc.astype(o_ref.dtype)


def _supported(x_shape, w_shape, temporal_pad: int) -> bool:
    if not _HAS_PALLAS:
        return False
    kt, kh, kw, cin, cout = w_shape
    B, T, H, W, C = x_shape
    hp, wp = H // 2, W // 2
    return ((kh, kw, cin, cout) == (7, 7, 3, 64) and H % 2 == 0
            and W % 2 == 0 and hp % _HB == 0 and wp <= _LANES
            and temporal_pad == kt // 2)


def _pack_x(x: jax.Array, temporal_pad: int, compute_dtype):
    """XLA prep: s2d pack + halo pad + (C, h*128+w) layout, with ONE
    transpose (transposes with a 12/16-wide minor dim are relayout-bound;
    two of them measured 11 ms at B=16)."""
    B, T, H, W, C = x.shape
    hp, wp = H // 2, W // 2
    hp2 = hp + 3
    xp = x.astype(compute_dtype).reshape(B, T, hp, 2, wp, 2, C)
    # (B, T, hpar, wpar, c, h2, w2); channel packing (hpar, wpar, c).
    xt = xp.transpose(0, 1, 3, 5, 6, 2, 4).reshape(B, T, 4 * C, hp, wp)
    # h halo rows for the dh taps; w rows are exactly 128 lanes (no halo --
    # dw offsets are applied as masked output rolls in the kernel).
    xt = jnp.pad(xt, ((0, 0), (temporal_pad, temporal_pad),
                      (0, _C - 4 * C), (2, 1), (0, _LANES - wp)))
    return xt.reshape(B, T + 2 * temporal_pad, _C, hp2 * _LANES)


def _pack_w(w: jax.Array, compute_dtype):
    """Weights -> w4[(kt,dh,c2), dw*64 + o] with the s2d channel packing
    c2 = hpar*2*cin + wpar*cin + c and kernel taps zero-padded 7 -> 8
    (leading zero), matching the ``_pack_x`` layout."""
    kt, kh, kw, cin, cout = w.shape
    wpad = jnp.pad(w, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wpad.reshape(kt, _DH, 2, _DW, 2, cin, cout)
    # (kt, dh, hpar, dw, wpar, c, o) -> (kt, dh, (hpar, wpar, c), dw, o)
    w2 = w2.transpose(0, 1, 2, 4, 5, 3, 6).reshape(kt, _DH, 4 * cin, _DW,
                                                   cout)
    w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, _C - 4 * cin), (0, 0), (0, 0)))
    return w2.reshape(kt * _DH * _C, _DW * cout).astype(compute_dtype)


def _unpack_dw4(dw4: jax.Array, kt: int, cin: int, cout: int) -> jax.Array:
    """Inverse of ``_pack_w`` for the weight cotangent: (K, 4*cout) ->
    (kt, 7, 7, cin, cout).  Zero-padded rows/channels carry no gradient by
    construction, so plain slicing inverts the packing exactly."""
    d = dw4.reshape(kt, _DH, _C, _DW, cout)[:, :, :4 * cin]
    d = d.reshape(kt, _DH, 2, 2, cin, _DW, cout)
    # (kt, dh, hpar, wpar, c, dw, o) -> (kt, dh, hpar, dw, wpar, c, o)
    d = d.transpose(0, 1, 2, 5, 3, 4, 6)
    d = d.reshape(kt, 2 * _DH, 2 * _DW, cin, cout)
    return d[:, 1:, 1:]


def stem_conv_s2d(x: jax.Array, w: jax.Array, *, temporal_pad: int,
                  compute_dtype=jnp.bfloat16,
                  batch_chunk: int = 0) -> jax.Array | None:
    """(B,T,H,W,3) x (kT,7,7,3,64) stride (1,2,2) pad (pt,3,3) -> stem conv
    output (B,T,H/2,W/2,64).  Returns None outside the supported envelope
    (caller falls back to the XLA conv)."""
    del batch_chunk  # kept for call-site compat; no HBM im2col to bound
    if not _supported(x.shape, w.shape, temporal_pad):
        return None
    kt, kh, kw, cin, cout = w.shape
    B, T, H, W, C = x.shape
    hp, wp = H // 2, W // 2
    hp2 = hp + 3

    xt = _pack_x(x, temporal_pad, compute_dtype)
    w4 = _pack_w(w, compute_dtype)

    hb = _pick_hb(hp)
    if jnp.dtype(compute_dtype).itemsize >= 4 and hb > 32:
        # f32 at hb=64 overflows scoped VMEM (measured on v5e: 69.6M of
        # the 64M stack limit at crop 256); halve the block like the dW
        # kernel does.
        hb = 32
    nblk = hp // hb
    K = kt * _DH * _C
    kernel = functools.partial(_stem_kernel, kt=kt, nblk=nblk, hb=hb)
    out = pl.pallas_call(
        kernel,
        grid=(B, T, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # xt stays in HBM
            pl.BlockSpec((K, _DW * cout), lambda b, t, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, hb * _LANES, cout),
                               lambda b, t, r: (b, t, r, 0, 0)),
        out_shape=out_struct(
            (B, T, nblk, hb * _LANES, cout), compute_dtype, x),
        scratch_shapes=[
            pltpu.VMEM((kt + 1, _C, hp2 * _LANES), compute_dtype),
            pltpu.VMEM((K, hb * _LANES), compute_dtype),
            pltpu.SemaphoreType.DMA((kt + 1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * hp * _LANES * K * _DW * cout,
            # Rolling window: each padded input slice is DMA'd once.
            bytes_accessed=B * ((T + 2 * temporal_pad) * _C * hp2 * _LANES
                                + T * hp * _LANES * cout) * 2,
            transcendentals=0,
        ),
    )(xt, w4)
    # (B, T, nblk, HB*128, 64): lanes flatten (h, w) -> reshape + slice the
    # 128->wp pad columns away; channels already last.
    out = out.reshape(B, T, hp, _LANES, cout)[:, :, :, :wp, :]
    return out


# --------------------------------------------------------------------------- #
# Weight-gradient kernel (training path)
# --------------------------------------------------------------------------- #

def _stem_dw_kernel(x_hbm, g_ref, dw_ref, xs, a_ref, do4, sem, *, kt: int,
                    cout: int, hb: int):
    """dW = sum over (b, t, blk) of A_blk @ dO4_blk.

    Reuses the forward kernel's rolling-window DMA and A-matrix build; the
    incoming cotangent block is "un-rolled" (the exact transpose of the
    forward's masked dw-combination rolls) into dO4 (M, 4*cout), and one
    MXU pass accumulates the (K, 4*cout) packed weight gradient, which
    stays VMEM-resident across the whole grid.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    blk = pl.program_id(2)
    blk_l = hb * _LANES

    _ring_window_and_a_matrix(x_hbm, xs, a_ref, sem, kt=kt, hb=hb)

    first = jnp.logical_and(b == 0, jnp.logical_and(t == 0, blk == 0))
    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # Transpose of the forward roll-combine: out[m] += o4[m+delta]*valid[m]
    # => dO4[m'] = (g*valid)[m'-delta], i.e. mask at the OUTPUT position
    # then roll forward by delta.
    w_lane = jax.lax.broadcasted_iota(jnp.int32, (blk_l, 1), 0) % _LANES
    # Mosaic's rotate requires 32-bit data; roll in f32 and store back in
    # the kernel dtype for the MXU pass.
    gy = g_ref[0, 0, 0].astype(jnp.float32)              # (M, cout)
    for dw in range(_DW):
        delta = dw - 2
        gg = gy
        if delta:
            valid = (w_lane >= -delta) if delta < 0 else (
                w_lane < _LANES - delta)
            gg = jnp.where(valid, gg, 0.0)
            gg = pltpu.roll(gg, delta % blk_l, 0)
        do4[:, dw * cout:(dw + 1) * cout] = gg.astype(do4.dtype)

    # f32 operands get true-f32 MXU passes (same guard as the forward
    # kernel: default TPU f32 dots round through bf16).
    precision = (jax.lax.Precision.HIGHEST
                 if a_ref.dtype == jnp.float32 else None)
    dw_ref[...] += jax.lax.dot_general(
        a_ref[...], do4[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def stem_conv_s2d_dw(x: jax.Array, g: jax.Array, w_shape, *,
                     temporal_pad: int,
                     compute_dtype=jnp.bfloat16) -> jax.Array | None:
    """Weight gradient of the stem conv: (x, dOut) -> dW (kt,7,7,3,64).

    The XLA grad-weights conv inherits the forward's Cin=3 MXU starvation
    (measured 20.8 ms at B=8 on v5e, ~13% of the whole train step); this
    kernel computes it at the forward kernel's efficiency.  Returns None
    outside the forward envelope.
    """
    kt, kh, kw, cin, cout = w_shape
    if not _supported(x.shape, w_shape, temporal_pad):
        return None
    B, T, H, W, C = x.shape
    hp, wp = H // 2, W // 2
    hp2 = hp + 3

    xt = _pack_x(x, temporal_pad, compute_dtype)
    # Cotangent -> the forward kernel's block layout (pad wp -> 128 lanes
    # with zeros; they correspond to cropped columns and carry no gradient).
    g4 = jnp.pad(g.astype(compute_dtype),
                 ((0, 0), (0, 0), (0, 0), (0, _LANES - wp), (0, 0)))
    hb = _pick_hb(hp)
    if jnp.dtype(compute_dtype).itemsize >= 4 and hb > 32:
        # f32 scratch (A + do4 + g blocks) at hb=64 exceeds total VMEM
        # (measured 132.5M of 128M); halve the block.
        hb = 32
    nblk = hp // hb
    g4 = g4.reshape(B, T, nblk, hb * _LANES, cout)

    K = kt * _DH * _C
    kernel = functools.partial(_stem_dw_kernel, kt=kt, cout=cout, hb=hb)
    dw4 = pl.pallas_call(
        kernel,
        grid=(B, T, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # xt stays in HBM
            pl.BlockSpec((1, 1, 1, hb * _LANES, cout),
                         lambda b, t, r: (b, t, r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, _DW * cout), lambda b, t, r: (0, 0)),
        out_shape=out_struct((K, _DW * cout), jnp.float32, x),
        scratch_shapes=[
            pltpu.VMEM((kt + 1, _C, hp2 * _LANES), compute_dtype),
            pltpu.VMEM((K, hb * _LANES), compute_dtype),
            pltpu.VMEM((hb * _LANES, _DW * cout), compute_dtype),
            pltpu.SemaphoreType.DMA((kt + 1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * hp * _LANES * K * _DW * cout,
            bytes_accessed=B * ((T + 2 * temporal_pad) * _C * hp2 * _LANES
                                + T * hp * _LANES * cout) * 2,
            transcendentals=0,
        ),
    )(xt, g4)
    return _unpack_dw4(dw4, kt, cin, cout)


# --------------------------------------------------------------------------- #
# Differentiable wrapper (training path)
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _stem_diff(x, w, temporal_pad, axis_name):
    return stem_conv_s2d(x, w, temporal_pad=temporal_pad,
                         compute_dtype=x.dtype)


def _stem_diff_fwd(x, w, temporal_pad, axis_name):
    return _stem_diff(x, w, temporal_pad, axis_name), (x, w)


def _stem_diff_bwd(temporal_pad, axis_name, res, g):
    # The stem conv is linear, so its VJP is the pair (dX = transposed
    # conv, dW = grad-weights conv).  dW runs through the fused Pallas
    # kernel (the XLA grad-weights conv inherits the forward's Cin=3 MXU
    # starvation); dX stays the XLA transposed conv -- in training the
    # stem input is the data batch, whose cotangent nothing consumes, so
    # XLA dead-code-eliminates it from the step.
    x, w = res
    from lfb_tpu.ops.conv3d import conv3d
    dw = stem_conv_s2d_dw(x, g, w.shape, temporal_pad=temporal_pad,
                          compute_dtype=x.dtype)
    if dw is None:
        # XLA grad-weights fallback (interpret-mode tests; envelope drift).
        # Under a shard_map body with check_vma typing, jax.vjp ITSELF
        # inserts the psum for the replicated (device-invariant) weight
        # while transposing -- measured: dw ratio 1.0 vs the single-device
        # reference with no explicit collective, N x with one added -- so
        # adding a psum here would double-count.
        _, vjp = jax.vjp(
            lambda x_, w_: conv3d(x_, w_, strides=(1, 2, 2),
                                  padding=(temporal_pad, 3, 3)), x, w)
        dx, dw = vjp(g.astype(x.dtype))
    else:
        dw = dw.astype(w.dtype)
        if axis_name is not None:
            # The Pallas dW kernel computes the per-shard partial sum as a
            # primal (non-transposed) computation, so AD cannot insert the
            # collective for the replicated weight: psum explicitly
            # (check_vma rejects a device-varying cotangent for an
            # invariant operand).
            dw = jax.lax.psum(dw, axis_name)
        _, vjp_x = jax.vjp(
            lambda x_: conv3d(x_, w, strides=(1, 2, 2),
                              padding=(temporal_pad, 3, 3)), x)
        dx, = vjp_x(g.astype(x.dtype))
    return dx, dw


_stem_diff.defvjp(_stem_diff_fwd, _stem_diff_bwd)


def stem_conv_s2d_diff(x: jax.Array, w: jax.Array, *, temporal_pad: int,
                       axis_name: str | None = None) -> jax.Array | None:
    """Differentiable fused stem: Pallas forward (in ``x.dtype``), XLA-conv
    backward.  ``axis_name`` names the shard_map data axis when running in a
    per-device body (the weight cotangent is psum'd over it).  Returns None
    outside the supported envelope."""
    if not _supported(x.shape, w.shape, temporal_pad):
        return None
    return _stem_diff(x, w, temporal_pad, axis_name)

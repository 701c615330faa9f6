"""Fused Pallas TPU attention kernel for non-local / FBO blocks.

One kernel computes QK^T -> scale -> softmax -> PV without materializing the
(Nq, Nk) affinity matrix in HBM.  The reference realizes this as three
separate Caffe2 ops (two ``BatchMatMul`` + cuDNN ``Softmax``,
``lib/models/nonlocal_helper.py:94-121``); fusing it removes two HBM
round-trips of the affinity tensor (e.g. 3136 x 784 x f32 per clip for the
in-backbone NL at res4).

Shape regime (small-context attention, whole K/V fits VMEM):
  * in-backbone NL:  Nq = T*H*W (<= 4096), Nk = T*(H/2)*(W/2) (<= 1024),
    C = 512 or 1024.
  * FBO-NL:          Nq = 1, Nk = LFB window (<= 512), C = 512.

The grid tiles (batch, query); keys/values for the current batch element are
resident in VMEM across the whole query sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lfb_tpu.ops.pallas_common import out_struct

try:  # Pallas import is deferred-safe for non-TPU debugging environments.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Query tile (sublane-aligned for f32/bf16).
_Q_TILE = 256
# VMEM budget guard: skip fusion when K/V for one batch element would not fit.
_MAX_KV_BYTES = 6 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)           # (TQ, C)
    k = k_ref[0].astype(jnp.float32)           # (Nk, C)
    v = v_ref[0].astype(jnp.float32)           # (Nk, C)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # (TQ, Nk)
    if scale != 1.0:
        logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)  # (TQ, C)
    o_ref[0] = out.astype(o_ref.dtype)
    lse_ref[0] = (m[:, 0] + jnp.log(denom[:, 0]))[:, None]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    """Backward for one q-tile; dk/dv accumulate across the q-tile grid dim
    (the (b,) output blocks persist in VMEM while the inner grid dim
    sweeps)."""
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)            # (TQ, C)
    k = k_ref[0].astype(jnp.float32)            # (Nk, C)
    v = v_ref[0].astype(jnp.float32)            # (Nk, C)
    do = do_ref[0].astype(jnp.float32)          # (TQ, C)
    lse = lse_ref[0]                            # (TQ, 1)
    delta = delta_ref[0]                        # (TQ, 1)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if scale != 1.0:
        logits = logits * scale
    p = jnp.exp(logits - lse)                   # (TQ, Nk)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                       # (TQ, Nk)

    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    if scale != 1.0:
        dq = dq * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if scale != 1.0:
        dk = dk * scale
    dk_ref[0] += dk.astype(dk_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _supported(q, k):
    B, Nq, C = q.shape
    Nk = k.shape[1]
    if not _HAS_PALLAS or C % 128 != 0:
        return False
    kv_bytes = 2 * Nk * C * jnp.dtype(jnp.float32).itemsize
    return kv_bytes <= _MAX_KV_BYTES


def _fwd_call(q, k, v, scale: float):
    B, Nq, C = q.shape
    Nk = k.shape[1]
    tile = min(_Q_TILE, _round_up(Nq, 8))
    nq_pad = _round_up(Nq, tile)
    if nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - Nq), (0, 0)))
    grid = (B, nq_pad // tile)
    kernel = functools.partial(_attn_kernel, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            out_struct((B, nq_pad, C), q.dtype, q),
            out_struct((B, nq_pad, 1), jnp.float32, q),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nq_pad * Nk * C * 2,
            bytes_accessed=(B * nq_pad * C + 2 * B * Nk * C) * 4,
            transcendentals=B * nq_pad * Nk,
        ),
    )(q, k, v)
    if nq_pad != Nq:
        out = out[:, :Nq, :]
        lse = lse[:, :Nq, :]
    return out, lse


def _bwd_call(q, k, v, do, lse, delta, scale: float):
    B, Nq, C = q.shape
    Nk = k.shape[1]
    tile = min(_Q_TILE, _round_up(Nq, 8))
    nq_pad = _round_up(Nq, tile)
    if nq_pad != Nq:
        pad = ((0, 0), (0, nq_pad - Nq), (0, 0))
        q = jnp.pad(q, pad)
        do = jnp.pad(do, pad)
        # Padded rows must contribute nothing: exp(0 - inf) = 0.
        lse = jnp.pad(lse, pad, constant_values=jnp.inf)
        delta = jnp.pad(delta, pad)
    grid = (B, nq_pad // tile)
    kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0)),
        ),
        out_shape=(
            out_struct((B, nq_pad, C), jnp.float32, q),
            out_struct((B, Nk, C), jnp.float32, q),
            out_struct((B, Nk, C), jnp.float32, q),
        ),
    )(q, k, v, do, lse, delta)
    if nq_pad != Nq:
        dq = dq[:, :Nq, :]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention(q, k, v, scale: float):
    return _fwd_call(q, k, v, scale)[0]


def _fused_attention_fwd(q, k, v, scale: float):
    out, lse = _fwd_call(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _fused_attention_bwd(scale: float, residuals, g):
    q, k, v, out, lse = residuals
    # delta = rowsum(dO * O) -- the softmax-normalization correction term.
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    dq, dk, dv = _bwd_call(q, k, v, g, lse, delta, scale)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    *, scale: float | None = None) -> jax.Array | None:
    """Fused attention over (B, Nq, C) x (B, Nk, C), differentiable (custom
    flash-style VJP).  Returns None when the shape regime is outside this
    kernel's envelope (caller falls back to the XLA path)."""
    if not _supported(q, k):
        return None
    return _fused_attention(q, k, v,
                            float(scale) if scale is not None else 1.0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m

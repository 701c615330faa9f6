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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
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


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    *, scale: float | None = None) -> jax.Array | None:
    """Fused attention over (B, Nq, C) x (B, Nk, C). Returns None when the
    shape regime is outside this kernel's envelope (caller falls back to the
    XLA path)."""
    if not _HAS_PALLAS:
        return None
    B, Nq, C = q.shape
    Nk = k.shape[1]
    if C % 128 != 0:
        return None
    kv_bytes = 2 * Nk * C * jnp.dtype(jnp.float32).itemsize
    if kv_bytes > _MAX_KV_BYTES:
        return None

    tile = min(_Q_TILE, _round_up(Nq, 8))
    nq_pad = _round_up(Nq, tile)
    if nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - Nq), (0, 0)))

    grid = (B, nq_pad // tile)
    kernel = functools.partial(
        _attn_kernel, scale=float(scale) if scale is not None else 1.0)
    out = pl.pallas_call(
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
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nq_pad, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nq_pad * Nk * C * 2,
            bytes_accessed=(B * nq_pad * C + 2 * B * Nk * C) * 4,
            transcendentals=B * nq_pad * Nk,
        ),
    )(q, k, v)
    if nq_pad != Nq:
        out = out[:, :Nq, :]
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m

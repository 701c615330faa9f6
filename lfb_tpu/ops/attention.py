"""Batched scaled-softmax attention: the shared compute core of both the
in-backbone space-time non-local block (reference
``lib/models/nonlocal_helper.py:94-121``) and the FBO-NL cross-attention over
the long-term feature bank (reference ``lib/models/lfb_helper.py:222-234``).

Semantics (channels-last):
    affinity[b, i, j] = <q[b, i, :], k[b, j, :]>            (MXU batched matmul)
    p = softmax(affinity * scale, axis=-1)                   (optional scale)
    out[b, i, :] = sum_j p[b, i, j] * v[b, j, :]             (MXU batched matmul)

The reference keeps zero-padded bank rows *in* the softmax (zero-padding
convention at ``lib/datasets/ava.py:300-323``); parity mode therefore applies
no key mask.  An optional mask argument is provided for non-parity use.

A fused Pallas flash-attention kernel (``lfb_tpu.ops.pallas_attention``) is
selected automatically on TPU backends for the hot shapes; this file is the
XLA reference implementation and the fallback on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def scaled_softmax_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    mask: jax.Array | None = None,
    use_softmax: bool = True,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Attention over (B, Nq, C) queries and (B, Nk, C) keys/values.

    Args:
      q: (B, Nq, C); k, v: (B, Nk, C).
      scale: multiplier on logits (the reference uses ``C**-0.5`` when
        NONLOCAL.USE_SCALE / FBO_NL.SCALE).
      mask: optional (B, Nk) or (B, Nq, Nk) boolean; False keys get -inf.
      use_softmax: when False, reproduces the reference's
        NONLOCAL.USE_SOFTMAX=False path -- mean aggregation: p = affinity / Nk
        (``lib/models/nonlocal_helper.py:107-117``).
    """
    # A caller-passed flag expresses intent (the model layer owns the
    # mesh/shard_map gating); the backend gate always applies.  The default
    # (None) additionally requires a single-device program.
    if use_pallas is None:
        use_pallas = jax.device_count() == 1
    if use_pallas and _pallas_available() and use_softmax and mask is None:
        from lfb_tpu.ops.pallas_attention import fused_attention
        out = fused_attention(q, k, v, scale=scale)
        if out is not None:
            return out
    return _attention_xla(q, k, v, scale=scale, mask=mask,
                          use_softmax=use_softmax)


def _attention_xla(q, k, v, *, scale, mask, use_softmax):
    compute = jnp.promote_types(q.dtype, jnp.bfloat16)
    logits = jnp.einsum('bqc,bkc->bqk', q, k,
                        preferred_element_type=jnp.float32)
    if scale is not None:
        logits = logits * jnp.float32(scale)
    if use_softmax:
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[:, None, :]
            logits = jnp.where(mask, logits, jnp.float32(-1e30))
        p = jax.nn.softmax(logits, axis=-1)
    else:
        # Mean aggregation: divide raw affinities by the (static) key count.
        p = logits / jnp.float32(k.shape[1])
    p = p.astype(compute)
    out = jnp.einsum('bqk,bkc->bqc', p, v.astype(compute),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    """Backend gate only; callers own the mesh gate (see
    lfb_tpu.models.layers.pallas_ok): pallas_call does not partition under
    multi-device auto-sharded jit but is safe inside shard_map bodies."""
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False

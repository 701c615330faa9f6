"""Validate the Pallas fused-attention kernel logic in interpreter mode
(runs on CPU; the compiled path runs on real TPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def interpret_attention(q, k, v, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lfb_tpu.ops import pallas_attention as pa

    B, Nq, C = q.shape
    Nk = k.shape[1]
    tile = min(pa._Q_TILE, pa._round_up(Nq, 8))
    nq_pad = pa._round_up(Nq, tile)
    if nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - Nq), (0, 0)))
    kernel = functools.partial(pa._attn_kernel, scale=float(scale))
    out = pl.pallas_call(
        kernel,
        grid=(B, nq_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nq_pad, C), q.dtype),
        interpret=True,
    )(q, k, v)
    return out[:, :Nq, :]


@pytest.mark.parametrize('B,Nq,Nk,C', [
    (2, 8, 16, 128),     # tiny
    (1, 1, 12, 128),     # FBO shape: single query
    (2, 300, 100, 256),  # non-tile-aligned Nq
])
def test_pallas_kernel_matches_xla(B, Nq, Nk, C):
    from lfb_tpu.ops.attention import _attention_xla
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    k = jnp.asarray(rng.randn(B, Nk, C), jnp.float32)
    v = jnp.asarray(rng.randn(B, Nk, C), jnp.float32)
    scale = C ** -0.5
    ref = _attention_xla(q, k, v, scale=scale, mask=None, use_softmax=True)
    out = interpret_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)  # bf16-promoted ref

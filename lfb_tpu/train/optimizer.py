"""SGD with Caffe2 ``MomentumSGDUpdate`` semantics.

The reference's per-parameter update (``lib/models/model_builder_video.py:
348-389``) is, with weight decay folded into the gradient first:

    g    := grad + wd * param          (wd = WEIGHT_DECAY_BN for '_bn' params)
    V    := mu * V + lr * g            (lr lives INSIDE the momentum buffer)
    step := (1 + mu) * V - mu * V_prev   if nesterov else V
    param -= step

Because lr is inside V, a step-change in lr requires rescaling V by
new_lr/old_lr -- the reference's ``_CorrectMomentum``
(``model_builder_video.py:286-314``); :func:`correct_momentum` reproduces it.

Frozen parameters (affine scale/bias, BN running stats, frozen backbone) are
masked out entirely: no gradient, no decay, no momentum -- identical to the
reference where such blobs never enter ``param_to_grad``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    momentum: Dict[str, jax.Array]   # only trainable entries present


def init_state(params: Dict[str, jax.Array], frozen: set) -> SGDState:
    return SGDState(momentum={
        k: jnp.zeros_like(v) for k, v in params.items() if k not in frozen})


def apply_updates(
    params: Dict[str, jax.Array],
    grads: Dict[str, jax.Array],
    state: SGDState,
    *,
    lr: jax.Array,
    momentum: float,
    nesterov: bool,
    weight_decay: float,
    weight_decay_bn: float,
) -> tuple[Dict[str, jax.Array], SGDState]:
    new_params = dict(params)
    new_momentum = dict(state.momentum)
    for name, v_prev in state.momentum.items():
        g = grads[name].astype(jnp.float32)
        wd = weight_decay_bn if '_bn' in name else weight_decay
        if wd:
            g = g + wd * params[name]
        v = momentum * v_prev + lr * g
        step = (1.0 + momentum) * v - momentum * v_prev if nesterov else v
        new_params[name] = params[name] - step
        new_momentum[name] = v
    return new_params, SGDState(momentum=new_momentum)


def correct_momentum(state: SGDState, correction: jax.Array) -> SGDState:
    """Scale every momentum buffer by new_lr/old_lr on LR-step boundaries."""
    return SGDState(momentum={
        k: v * correction for k, v in state.momentum.items()})

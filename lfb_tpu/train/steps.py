"""Jitted train/eval steps over the data-parallel mesh.

The reference executes one Caffe2 graph per iteration (dequeue -> forward ->
backward -> NCCL allreduce -> MomentumSGDUpdate, driven by ``workspace.RunNet``
at ``tools/train_net.py:152``).  Here the whole iteration is ONE jitted XLA
program: forward + backward + (implicit psum over the mesh) + SGD update.
The learning rate enters as a traced scalar so LR steps never retrigger
compilation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lfb_tpu.models.model import forward, frozen_param_names
from lfb_tpu.models.spec import ModelSpec
from lfb_tpu.train import optimizer as opt


def split_params(spec: ModelSpec, params: Dict[str, jax.Array]):
    frozen_names = frozen_param_names(spec, params)
    trainable = {k: v for k, v in params.items() if k not in frozen_names}
    frozen = {k: v for k, v in params.items() if k in frozen_names}
    return trainable, frozen


def _inject_device_bank_lfb(spec: ModelSpec, bank, batch, rng):
    """Gather bank windows on-device when a DeviceBank is in play.

    AVA windows key off the metadata blob's (video_idx, sec) columns; the
    clip-level datasets emit explicit (lfb_video_idx, lfb_center) index
    pairs.  Returns a batch with the materialized 'lfb' blob.
    """
    if bank is None or not spec.fbo.enabled or 'lfb' in batch:
        return batch
    batch = dict(batch)
    if spec.head_type == 'roi':
        meta = batch['metadata']
        batch['lfb'] = bank.gather(meta[:, 0].astype(jnp.int32),
                                   meta[:, 1].astype(jnp.int32), rng)
    else:
        batch['lfb'] = bank.gather_centers(batch['lfb_video_idx'],
                                           batch['lfb_center'])
    return batch


def make_train_step(spec: ModelSpec, solver, mesh=None, bank=None):
    """Build the jitted train step.

    Signature of the returned fn:
      (trainable, frozen, mstate, batch, rng, lr) ->
          (trainable, frozen, mstate, aux)
    where aux carries 'loss' and 'prob' for host-side metrics.
    """
    momentum = float(solver.MOMENTUM)
    nesterov = bool(solver.NESTEROV)
    wd = float(solver.WEIGHT_DECAY)
    wd_bn = float(solver.WEIGHT_DECAY_BN)
    bn_momentum = float(spec.bn_momentum)

    def step(trainable, frozen, mstate, batch, rng, lr):
        bank_rng, rng = jax.random.split(rng)
        batch = _inject_device_bank_lfb(spec, bank, batch, bank_rng)

        def loss_fn(trainable):
            params = {**trainable, **frozen}
            out = forward(spec, params, batch, train=True, rng=rng)
            return out['loss'], out

        grads, out = jax.grad(loss_fn, has_aux=True)(trainable)
        new_trainable, new_mstate = opt.apply_updates(
            trainable, grads, mstate, lr=lr, momentum=momentum,
            nesterov=nesterov, weight_decay=wd, weight_decay_bn=wd_bn)

        new_frozen = frozen
        bn_updates = out.get('bn_updates')
        if bn_updates:
            new_frozen = dict(frozen)
            for name, (mean, var) in bn_updates.items():
                new_frozen[name + '_rm'] = (
                    bn_momentum * frozen[name + '_rm']
                    + (1.0 - bn_momentum) * mean)
                new_frozen[name + '_riv'] = (
                    bn_momentum * frozen[name + '_riv']
                    + (1.0 - bn_momentum) * var)

        aux = {'loss': out['loss'], 'prob': out['prob']}
        return new_trainable, new_frozen, new_mstate, aux

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, data, repl, repl),
        out_shardings=(repl, repl, repl,
                       {'loss': repl, 'prob': data}),
        donate_argnums=(0, 1, 2),
    )


def make_eval_step(spec: ModelSpec, mesh=None, with_loss: bool = False,
                   bank=None, bank_seed: int = 0):
    """Build the jitted eval/LFB-extraction step: params, batch -> outputs."""

    def step(params, batch):
        batch = _inject_device_bank_lfb(
            spec, bank, batch, jax.random.PRNGKey(bank_seed))
        out = forward(spec, params, batch, train=False, rng=None)
        keep = {}
        for key in ('prob', 'logits', 'pool5', 'box_pooled'):
            if key in out:
                keep[key] = out[key]
        if with_loss and 'loss' in out:
            keep['loss'] = out['loss']
        return keep

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    return jax.jit(step, in_shardings=(repl, data))

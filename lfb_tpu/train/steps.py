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


def _degenerate_mesh_to_none(mesh):
    """Collapse a 1-device mesh to ``None`` (plain jit, no shardings).

    Semantically identical -- a size-1 mesh partitions nothing, and the
    compiled HLO is byte-identical (verified via ``memory_analysis`` on
    v5e) -- but on the tunneled 'axon' PJRT backend mesh-ANNOTATED
    executables hit a pathological runtime path when a step's committed
    sharded outputs are fed back as the next step's arguments (the
    training-state feedback loop every trainer has): the ~1.3 GB of
    param/momentum buffers restage through the tunnel per execution.
    Measured on the flagship train step (r5 bisect, BENCHMARKS.md):
    identical program, 160 ms/step fed fresh uncommitted arrays vs
    9.5 s/step fed its own committed outputs; donation is NOT the
    trigger (no-donate variants measure the same).  Dropping the
    degenerate mesh keeps single-chip training at full speed everywhere
    and changes nothing on real multi-chip meshes (n > 1 keeps its
    shardings; the explicit shard_map path keeps its mesh at any size
    because the body needs the named axis).
    """
    if mesh is not None and getattr(mesh, 'size', 0) == 1:
        return None
    return mesh


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


def _localize_proposals(batch):
    """Inside a shard_map body the batch is the per-device shard but AVA
    proposal rows carry GLOBAL clip indices; shift them to shard-local."""
    if 'proposals' not in batch:
        return batch
    local_b = batch['data'].shape[0]
    offset = jax.lax.axis_index('data') * local_b
    batch = dict(batch)
    proposals = batch['proposals']
    batch['proposals'] = proposals.at[:, 0].add(
        -offset.astype(proposals.dtype))
    return batch


def make_train_step(spec: ModelSpec, solver, mesh=None, bank=None,
                    use_shard_map: bool = False):
    """Build the jitted train step.

    Signature of the returned fn:
      (trainable, frozen, mstate, batch, rng, lr) ->
          (trainable, frozen, mstate, aux)
    where aux carries 'loss' and 'prob' for host-side metrics.

    With ``use_shard_map`` the forward/backward runs as a per-device
    shard_map body (numerically equal: loss sums/counts are psum'd into the
    exact global mean), which lets the fused Pallas kernels run on
    multi-chip meshes.  Requires affine mode (no BN side statistics) and a
    mesh.
    """
    momentum = float(solver.MOMENTUM)
    nesterov = bool(solver.NESTEROV)
    wd = float(solver.WEIGHT_DECAY)
    wd_bn = float(solver.WEIGHT_DECAY_BN)
    bn_momentum = float(spec.bn_momentum)

    if not use_shard_map:
        mesh = _degenerate_mesh_to_none(mesh)

    from lfb_tpu.bank.device_bank import ShardedDeviceBank
    bank_sharded = isinstance(bank, ShardedDeviceBank)

    if use_shard_map and mesh is not None:
        assert spec.use_affine, 'shard_map step requires frozen-affine mode'
        import dataclasses
        from jax import shard_map
        spec_local = dataclasses.replace(spec, single_device_program=True,
                                         data_axis='data')
        from lfb_tpu.models.model import loss_parts

        def step(trainable, frozen, mstate, batch, rng, lr, feats):
            def shard_body(trainable, frozen, batch, rng, *bank_feats):
                # The feature table always enters as an OPERAND (sharded
                # P('data') or replicated P()), never as a closure capture:
                # captured device arrays become lowering constants, which
                # at real bank scale bakes a multi-GB constant into the
                # HLO module (see device_bank._BoundFeatsBank).
                if not bank_feats:
                    body_bank = None
                elif bank_sharded:
                    body_bank = bank.local_view(bank_feats[0])
                else:
                    body_bank = bank.bind_feats(bank_feats[0])
                rng = jax.random.fold_in(rng, jax.lax.axis_index('data'))
                bank_rng, rng = jax.random.split(rng)
                batch2 = _localize_proposals(batch)
                batch2 = _inject_device_bank_lfb(spec_local, body_bank,
                                                 batch2, bank_rng)

                # Differentiate the LOCAL loss numerator.  Params are
                # device-INVARIANT under shard_map's varying-axes typing,
                # so AD's transpose inserts the cross-device psum itself:
                # ``gnum`` is already the global sum of per-shard numerator
                # grads (valid under full check_vma=True checking; an extra
                # manual psum would double-count by the axis size).
                def local_num(trainable):
                    params = {**trainable, **frozen}
                    out = forward(spec_local, params, batch2, train=True,
                                  rng=rng)
                    num, den = loss_parts(
                        spec_local, out['logits'], batch2['labels'],
                        batch2.get('box_mask'))
                    return num, (den, out['prob'])

                (num, (den, prob)), gnum = jax.value_and_grad(
                    local_num, has_aux=True)(trainable)
                den_global = jnp.maximum(jax.lax.psum(den, 'data'), 1.0)
                loss = jax.lax.psum(num, 'data') / den_global
                # d(loss)/dp = sum_shards d(num_local)/dp / den_global.
                grads = jax.tree.map(lambda g: g / den_global, gnum)
                return grads, loss, prob

            repl_spec = P()
            in_specs = (repl_spec, repl_spec, P('data'), repl_spec)
            operands = (trainable, frozen, batch, rng)
            if feats is not None:
                in_specs += (P('data') if bank_sharded else repl_spec,)
                operands += (feats,)
            grads, loss, prob = shard_map(
                shard_body, mesh=mesh,
                in_specs=in_specs,
                out_specs=(repl_spec, repl_spec, P('data')),
            )(*operands)
            new_trainable, new_mstate = opt.apply_updates(
                trainable, grads, mstate, lr=lr, momentum=momentum,
                nesterov=nesterov, weight_decay=wd, weight_decay_bn=wd_bn)
            return new_trainable, frozen, new_mstate, {'loss': loss,
                                                       'prob': prob}

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P('data'))
        feats_sharding = (NamedSharding(mesh, P('data')) if bank_sharded
                          else repl)
        jitted = jax.jit(
            step,
            in_shardings=(repl, repl, repl, data, repl, repl,
                          feats_sharding),
            out_shardings=(repl, repl, repl, {'loss': repl, 'prob': data}),
            donate_argnums=(0, 1, 2),
        )
        feats_arg = bank.feats if bank is not None else None
        return lambda trainable, frozen, mstate, batch, rng, lr: jitted(
            trainable, frozen, mstate, batch, rng, lr, feats_arg)

    assert not bank_sharded, \
        'a ShardedDeviceBank requires the shard_map step (TPU.SHARD_MAP)'

    def step(trainable, frozen, mstate, batch, rng, lr, feats):
        bank_rng, rng = jax.random.split(rng)
        body_bank = bank.bind_feats(feats) if feats is not None else bank
        batch = _inject_device_bank_lfb(spec, body_bank, batch, bank_rng)

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

    feats_arg = bank.feats if bank is not None else None
    if mesh is None:
        jitted = jax.jit(step, donate_argnums=(0, 1, 2))
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P('data'))
        jitted = jax.jit(
            step,
            in_shardings=(repl, repl, repl, data, repl, repl, repl),
            out_shardings=(repl, repl, repl,
                           {'loss': repl, 'prob': data}),
            donate_argnums=(0, 1, 2),
        )
    return lambda trainable, frozen, mstate, batch, rng, lr: jitted(
        trainable, frozen, mstate, batch, rng, lr, feats_arg)


def make_eval_step(spec: ModelSpec, mesh=None, with_loss: bool = False,
                   bank=None, bank_seed: int = 0,
                   use_shard_map: bool = False):
    """Build the jitted eval/LFB-extraction step: params, batch -> outputs."""

    if not use_shard_map:
        mesh = _degenerate_mesh_to_none(mesh)

    def _outputs(out):
        keep = {}
        for key in ('prob', 'logits', 'pool5', 'box_pooled'):
            if key in out:
                keep[key] = out[key]
        if with_loss and 'loss' in out:
            keep['loss'] = out['loss']
        return keep

    from lfb_tpu.bank.device_bank import ShardedDeviceBank
    bank_sharded = isinstance(bank, ShardedDeviceBank)

    if use_shard_map and mesh is not None:
        import dataclasses
        from jax import shard_map
        from lfb_tpu.models.model import loss_parts
        spec_local = dataclasses.replace(spec, single_device_program=True,
                                         data_axis='data')

        def step(params, batch, feats):
            def shard_body(params, batch, *bank_feats):
                # Feature table enters as an operand, never a capture
                # (multi-GB lowering constant otherwise; see
                # device_bank._BoundFeatsBank).
                if not bank_feats:
                    body_bank = None
                elif bank_sharded:
                    body_bank = bank.local_view(bank_feats[0])
                else:
                    body_bank = bank.bind_feats(bank_feats[0])
                batch2 = _localize_proposals(batch)
                batch2 = _inject_device_bank_lfb(
                    spec_local, body_bank, batch2,
                    jax.random.PRNGKey(bank_seed))
                out = forward(spec_local, params, batch2, train=False,
                              rng=None)
                keep = _outputs({k: v for k, v in out.items()
                                 if k != 'loss'})
                if with_loss and 'labels' in batch2:
                    # Emit per-shard loss parts; the global mean is formed
                    # outside the shard_map (num.sum() / den.sum()).
                    num, den = loss_parts(
                        spec_local, out['logits'], batch2['labels'],
                        batch2.get('box_mask'))
                    keep['loss_num'] = jnp.reshape(num, (1,))
                    keep['loss_den'] = jnp.reshape(den, (1,))
                return keep

            in_specs = (P(), P('data'))
            operands = (params, batch)
            if feats is not None:
                in_specs += (P('data') if bank_sharded else P(),)
                operands += (feats,)
            out = shard_map(shard_body, mesh=mesh,
                            in_specs=in_specs,
                            out_specs=P('data'),
                            )(*operands)
            if 'loss_num' in out:
                out['loss'] = (out.pop('loss_num').sum()
                               / jnp.maximum(out.pop('loss_den').sum(), 1.0))
            return out

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P('data'))
        feats_sharding = (NamedSharding(mesh, P('data')) if bank_sharded
                          else repl)
        jitted = jax.jit(step, in_shardings=(repl, data, feats_sharding))
        feats_arg = bank.feats if bank is not None else None
        return lambda params, batch: jitted(params, batch, feats_arg)

    assert not bank_sharded, \
        'a ShardedDeviceBank requires the shard_map step (TPU.SHARD_MAP)'

    def step(params, batch, feats):
        body_bank = bank.bind_feats(feats) if feats is not None else bank
        batch = _inject_device_bank_lfb(
            spec, body_bank, batch, jax.random.PRNGKey(bank_seed))
        out = forward(spec, params, batch, train=False, rng=None)
        return _outputs(out)

    feats_arg = bank.feats if bank is not None else None
    if mesh is None:
        jitted = jax.jit(step)
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P('data'))
        jitted = jax.jit(step, in_shardings=(repl, data, repl))
    return lambda params, batch: jitted(params, batch, feats_arg)

#!/usr/bin/env python
"""On-TPU smoke validation: numerics + training checks that CPU CI cannot
cover (the compiled Pallas kernels only exist on real chips).

Run on a TPU host: ``python tools/tpu_smoke.py``.  Exits nonzero on any
failure.  Checks:

  1. Pallas fused attention == XLA attention (fwd, several shapes).
  2. Pallas attention custom-VJP grads == XLA autodiff grads.
  3. Pallas RoIAlign+maxpool == XLA roi_align + max_pool (bf16 tolerance).
  4. bf16 flagship train steps produce finite, decreasing loss.
  5. shard_map train step with the compiled Pallas kernels (stem fwd +
     dW, fused NL attention) under check_vma, and its updated conv1_w
     matches the all-XLA auto-sharded step.
  6. TPU.BANK_SHARDED eval on a real-chip mesh: the row-sharded device
     bank (index all_gather + psum_scatter window reassembly) matches the
     replicated-bank gather bit-for-bit.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(name, ok, detail=''):
    print('[{}] {} {}'.format('PASS' if ok else 'FAIL', name, detail))
    if not ok:
        sys.exit(1)


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == 'tpu', (
        'tpu_smoke must run on a TPU backend, got ' + jax.default_backend())
    rng = np.random.RandomState(0)

    # 1/2: attention fwd + grads.
    from lfb_tpu.ops.attention import _attention_xla
    from lfb_tpu.ops.pallas_attention import fused_attention
    for (B, Nq, Nk, C) in [(4, 784, 196, 512), (16, 1, 300, 512)]:
        q = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
        k = jnp.asarray(rng.randn(B, Nk, C), jnp.float32)
        v = jnp.asarray(rng.randn(B, Nk, C), jnp.float32)
        scale = C ** -0.5
        ref = _attention_xla(q, k, v, scale=scale, mask=None, use_softmax=True)
        out = fused_attention(q, k, v, scale=scale)
        d = float(jnp.abs(out - ref).max())
        check('attention fwd {}'.format((B, Nq, Nk, C)), d < 5e-3,
              'max diff %.2e' % d)

        gp = jax.grad(lambda q: jnp.sum(
            fused_attention(q, k, v, scale=scale) ** 2))(q)
        gx = jax.grad(lambda q: jnp.sum(_attention_xla(
            q, k, v, scale=scale, mask=None, use_softmax=True) ** 2))(q)
        d = float(jnp.abs(gp - gx).max() / (jnp.abs(gx).max() + 1e-6))
        check('attention dq {}'.format((B, Nq, Nk, C)), d < 5e-2,
              'rel diff %.2e' % d)

    # 3: RoIAlign.
    from lfb_tpu.ops.pallas_roi_align import roi_align_maxpool
    from lfb_tpu.ops.roi_align import roi_align
    from lfb_tpu.ops.pooling import max_pool_2d
    feats = jnp.asarray(rng.randn(8, 16, 16, 2048), jnp.float32)
    rois = jnp.asarray(np.stack(
        [np.repeat(np.arange(8), 4)] + [rng.uniform(0, 256, 32)
                                        for _ in range(4)], 1), jnp.float32)
    out = roi_align_maxpool(feats, rois)
    ref = max_pool_2d(roi_align(feats, rois), (7, 7), (1, 1)).reshape(32, 2048)
    d = float(jnp.abs(out - ref).max())
    check('pallas roi_align+maxpool', d < 5e-2, 'max abs diff %.3f' % d)

    # 4: bf16 training convergence on a tiny flagship-style model.
    from lfb_tpu.core import config as C
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.models.model import frozen_param_names
    from lfb_tpu.train import optimizer as opt
    from lfb_tpu.train.steps import make_train_step, split_params
    cfg = C.default_config()
    cfg.DATASET = 'epic'
    cfg.MODEL.NUM_CLASSES = 20
    cfg.MODEL.MULTI_LABEL = False
    cfg.MODEL.USE_AFFINE = True
    cfg.NONLOCAL.USE_BN = False
    cfg.NONLOCAL.USE_AFFINE = True
    cfg.TRAIN.VIDEO_LENGTH = cfg.TEST.VIDEO_LENGTH = 8
    cfg.TRAIN.CROP_SIZE = cfg.TEST.CROP_SIZE = 64
    cfg.NUM_GPUS = 1
    cfg.TRAIN.BATCH_SIZE = cfg.TEST.BATCH_SIZE = 8
    cfg.TRAIN.DROPOUT_RATE = 0.0
    cfg = C.finalize(cfg)
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    trainable, frozen = split_params(spec, params)
    mstate = opt.init_state(params, frozen_param_names(spec, params))
    step = make_train_step(spec, cfg.SOLVER, mesh=None)
    batch = {'data': jax.device_put(
        0.1 * rng.randn(8, 8, 64, 64, 3).astype(np.float32)),
        'labels': jax.device_put(rng.randint(0, 20, size=(8,)))}
    losses = []
    state = (trainable, frozen, mstate)
    for i in range(8):
        out = step(*state, batch, jax.random.PRNGKey(i), jnp.float32(3e-4))
        state = out[:3]
        losses.append(float(out[3]['loss']))
    check('bf16 training', np.isfinite(losses).all() and losses[-1] < losses[0],
          'losses %.2f -> %.2f' % (losses[0], losses[-1]))

    # 5: shard_map train step with the COMPILED Pallas kernels (stem +
    # fused NL attention) on a 1-device mesh.  Exercises the vma-typed
    # pallas_call outputs and the stem VJP's weight-cotangent psum under
    # check_vma=True with real Mosaic compilation -- the multi-chip
    # TPU.SHARD_MAP path that interpret-mode CPU CI approximates.
    from lfb_tpu.parallel import create_mesh, shard_batch
    mesh = create_mesh(1)
    spec_sm = build_spec(cfg, 'train')
    assert spec_sm.use_pallas and spec_sm.use_pallas_stem
    params = init_params(jax.random.PRNGKey(1), spec_sm)  # check 4 donated
    trainable, frozen = split_params(spec_sm, params)
    mstate = opt.init_state(params, frozen_param_names(spec_sm, params))
    def fresh(tree):
        return jax.tree.map(lambda a: jnp.array(np.asarray(a)), tree)

    step_sm = make_train_step(spec_sm, cfg.SOLVER, mesh, use_shard_map=True)
    sbatch = shard_batch(mesh, {
        'data': 0.1 * rng.randn(8, 8, 64, 64, 3).astype(np.float32),
        'labels': rng.randint(0, 20, size=(8,))})
    t_sm, _, _, aux = step_sm(fresh(trainable), fresh(frozen), fresh(mstate),
                              sbatch, jax.random.PRNGKey(0),
                              jnp.float32(3e-4))
    loss_sm = float(aux['loss'])
    check('shard_map + compiled Pallas kernels', np.isfinite(loss_sm),
          'loss %.2f' % loss_sm)

    # The Pallas stem dW (+ its shard_map psum) must produce the same
    # conv1_w update as the all-XLA auto-sharded step.
    import dataclasses
    spec_xla = dataclasses.replace(spec_sm, use_pallas=False,
                                   use_pallas_stem=False)
    step_auto = make_train_step(spec_xla, cfg.SOLVER, mesh)
    t_auto, _, _, _ = step_auto(fresh(trainable), fresh(frozen),
                                fresh(mstate), sbatch,
                                jax.random.PRNGKey(0), jnp.float32(3e-4))
    dmax = float(jnp.abs(t_sm['conv1_w'] - t_auto['conv1_w']).max())
    scale = float(jnp.abs(t_auto['conv1_w']).max())
    check('shard_map Pallas conv1_w update == XLA step',
          dmax < 2e-2 * max(scale, 1e-3),
          'max abs diff %.2e (scale %.2e)' % (dmax, scale))

    # 6: sharded device bank on the real-chip mesh (degenerate 1-device
    # shard: still compiles + runs the all_gather / psum_scatter window
    # reassembly on TPU, ``bank/device_bank.py:383-405``).
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from lfb_tpu.bank.device_bank import AvaDeviceBank, shard_bank
    host_bank = {v: {902 + s: [rng.randn(2048).astype(np.float32)
                               for _ in range(1 + (v + s) % 3)]
                     for s in range(0, 12, 2)} for v in range(4)}
    bank = AvaDeviceBank.build(host_bank, window_size=4, k=2)
    vid = jnp.asarray(rng.randint(0, 4, 8), jnp.int32)
    sec = jnp.full((8,), 906, jnp.int32)
    ref = bank.gather(vid, sec, jax.random.PRNGKey(3))
    sharded = shard_bank(bank, mesh)

    def body(vid, sec, feats):
        return sharded.local_view(feats).gather(vid, sec,
                                                jax.random.PRNGKey(3))

    out = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P('data'), P('data'), P('data')),
        out_specs=P('data')))(vid, sec, sharded.feats)
    d = float(jnp.abs(out - ref).max())
    check('sharded device bank on TPU mesh', d == 0.0, 'max diff %.1e' % d)

    print('TPU smoke: all checks passed')


if __name__ == '__main__':
    main()

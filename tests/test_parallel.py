import numpy as np

import jax
import jax.numpy as jnp

from lfb_tpu.core import config as C
from lfb_tpu.models import build_spec, init_params
from lfb_tpu.parallel import create_mesh, shard_batch
from lfb_tpu.train.steps import make_eval_step, make_train_step, split_params
from lfb_tpu.train import optimizer as opt
from lfb_tpu.models.model import frozen_param_names


def small_cfg():
    cfg = C.default_config()
    cfg.DATASET = 'charades'
    cfg.MODEL.NUM_CLASSES = 6
    cfg.MODEL.USE_AFFINE = True
    cfg.NONLOCAL.USE_BN = False
    cfg.NONLOCAL.USE_AFFINE = True
    cfg.MODEL.MULTI_LABEL = True
    cfg.TRAIN.VIDEO_LENGTH = 8
    cfg.TEST.VIDEO_LENGTH = 8
    cfg.TRAIN.CROP_SIZE = 32
    cfg.TEST.CROP_SIZE = 32
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.NUM_GPUS = 8
    cfg.TRAIN.DROPOUT_RATE = 0.0
    cfg.TPU.COMPUTE_DTYPE = 'float32'
    cfg.TPU.USE_PALLAS = False
    cfg.LFB.ENABLED = True
    cfg.LFB.FBO_TYPE = 'nl'
    cfg.LFB.WINDOW_SIZE = 4
    return C.finalize(cfg)


def test_degenerate_mesh_downgrades_to_plain_jit():
    """A SIZE-1 mesh must compile/run as plain jit with plainly-placed
    batches: committed sharded state fed back through a mesh-annotated
    executable restages ~1.3 GB through the tunneled backend per step
    (r5 bisect, BENCHMARKS.md).  Pins (a) shard_batch's plain placement
    at n=1, (b) numeric equality of the mesh(1) and mesh=None steps."""
    from jax.sharding import NamedSharding

    cfg = small_cfg()
    spec = build_spec(cfg, 'train')
    mesh1 = create_mesh(1)

    rng = np.random.RandomState(3)
    batch_np = {
        'data': 0.1 * rng.randn(8, 8, 32, 32, 3).astype(np.float32),
        'labels': (rng.rand(8, 6) > 0.5).astype(np.float32),
        'lfb': rng.randn(8, 4, 2048).astype(np.float32),
    }
    batch1 = shard_batch(mesh1, batch_np)
    # (a) no NamedSharding commitment on a 1-device "shard".
    for v in batch1.values():
        assert not isinstance(v.sharding, NamedSharding) \
            or not v.committed, v.sharding

    def run(mesh_arg, batch):
        params = init_params(jax.random.PRNGKey(0), spec)
        trainable, frozen = split_params(spec, params)
        mstate = opt.init_state(params, frozen_param_names(spec, params))
        step = make_train_step(spec, cfg.SOLVER, mesh_arg)
        t, f, m, aux = step(trainable, frozen, mstate, batch,
                            jax.random.PRNGKey(4), jnp.float32(1e-5))
        return float(aux['loss']), np.asarray(t['pred_w'])

    loss1, w1 = run(mesh1, batch1)
    loss0, w0 = run(None, {k: jnp.asarray(v) for k, v in batch_np.items()})
    # (b) identical program => identical numerics (same backend, same math).
    np.testing.assert_allclose(loss1, loss0, rtol=1e-6)
    np.testing.assert_allclose(w1, w0, rtol=1e-6, atol=1e-8)


def test_train_step_on_8dev_mesh(eight_devices):
    cfg = small_cfg()
    spec = build_spec(cfg, 'train')
    mesh = create_mesh(8)
    params = init_params(jax.random.PRNGKey(0), spec)
    trainable, frozen = split_params(spec, params)
    mstate = opt.init_state(params, frozen_param_names(spec, params))

    rng = np.random.RandomState(0)
    batch = {
        'data': 0.1 * rng.randn(8, 8, 32, 32, 3).astype(np.float32),
        'labels': (rng.rand(8, 6) > 0.5).astype(np.float32),
        'lfb': rng.randn(8, 4, 2048).astype(np.float32),
    }
    batch = shard_batch(mesh, batch)
    step = make_train_step(spec, cfg.SOLVER, mesh)

    loss0 = None
    for i in range(3):
        trainable, frozen, mstate, aux = step(
            trainable, frozen, mstate, batch, jax.random.PRNGKey(i),
            jnp.float32(1e-5))
        loss = float(aux['loss'])
        assert np.isfinite(loss)
        if loss0 is None:
            loss0 = loss
    assert loss < loss0, (loss0, loss)  # optimizing the same batch decreases loss


def test_dp_matches_single_device():
    """Global-batch-mean DP on the mesh == single-device full-batch step."""
    cfg = small_cfg()
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    trainable, frozen = split_params(spec, params)
    mstate = opt.init_state(params, frozen_param_names(spec, params))

    rng = np.random.RandomState(1)
    batch_np = {
        'data': 0.1 * rng.randn(8, 8, 32, 32, 3).astype(np.float32),
        'labels': (rng.rand(8, 6) > 0.5).astype(np.float32),
        'lfb': rng.randn(8, 4, 2048).astype(np.float32),
    }

    mesh = create_mesh(8)
    step_mesh = make_train_step(spec, cfg.SOLVER, mesh)
    t1, f1, m1, aux1 = step_mesh(
        dict(trainable), dict(frozen), mstate,
        shard_batch(mesh, batch_np), jax.random.PRNGKey(9), jnp.float32(1e-5))

    # The mesh step donates its inputs; rebuild identical params for the
    # single-device run.
    params2 = init_params(jax.random.PRNGKey(0), spec)
    trainable2, frozen2 = split_params(spec, params2)
    step_single = make_train_step(spec, cfg.SOLVER, mesh=None)
    batch_dev = {k: jnp.array(v) for k, v in batch_np.items()}
    mstate2 = opt.init_state(params2, frozen_param_names(spec, params2))
    t2, f2, m2, aux2 = step_single(
        trainable2, frozen2, mstate2, batch_dev,
        jax.random.PRNGKey(9), jnp.float32(1e-5))

    np.testing.assert_allclose(float(aux1['loss']), float(aux2['loss']),
                               rtol=1e-5)
    for k in ('pred_w', 'conv1_w', 'lfb_nl0_theta_w'):
        np.testing.assert_allclose(np.asarray(t1[k]), np.asarray(t2[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_eval_step_sharded(eight_devices):
    cfg = small_cfg()
    spec = build_spec(cfg, 'test', lfb_infer_only=True)
    mesh = create_mesh(8)
    params = init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        'data': rng.randn(8, 8, 32, 32, 3).astype(np.float32),
    })
    out = make_eval_step(spec, mesh)(params, batch)
    assert out['pool5'].shape == (8, 2048)


def test_shard_map_step_matches_auto_sharded(eight_devices):
    """shard_map-wrapped train step == auto-sharded mesh step (same params,
    batch; dropouts off so RNG streams don't diverge)."""
    cfg = small_cfg()
    cfg.FBO_NL.INPUT_DROPOUT_ON = False
    cfg.FBO_NL.LFB_DROPOUT_ON = False
    spec = build_spec(cfg, 'train')
    mesh = create_mesh(8)

    rng = np.random.RandomState(5)
    batch_np = {
        'data': 0.1 * rng.randn(8, 8, 32, 32, 3).astype(np.float32),
        'labels': (rng.rand(8, 6) > 0.5).astype(np.float32),
        'lfb': rng.randn(8, 4, 2048).astype(np.float32),
    }

    def run(use_shard_map):
        params = init_params(jax.random.PRNGKey(0), spec)
        trainable, frozen = split_params(spec, params)
        mstate = opt.init_state(params, frozen_param_names(spec, params))
        step = make_train_step(spec, cfg.SOLVER, mesh,
                               use_shard_map=use_shard_map)
        t, f, m, aux = step(trainable, frozen, mstate,
                            shard_batch(mesh, batch_np),
                            jax.random.PRNGKey(7), jnp.float32(1e-5))
        return float(aux['loss']), np.asarray(aux['prob']), \
            np.asarray(t['pred_w'])

    loss_a, prob_a, w_a = run(False)
    loss_s, prob_s, w_s = run(True)
    np.testing.assert_allclose(loss_s, loss_a, rtol=1e-5)
    np.testing.assert_allclose(prob_s, prob_a, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(w_s, w_a, rtol=1e-4, atol=1e-7)


def test_shard_map_eval_ava_localizes_proposals(eight_devices):
    """AVA proposals carry global clip indices; the shard_map eval body must
    shift them to shard-local so RoI pooling reads the right clips."""
    cfg = small_cfg()
    cfg.DATASET = 'ava'
    cfg.LFB.ENABLED = False
    spec = build_spec(cfg, 'val')
    mesh = create_mesh(8)
    rng = np.random.RandomState(0)
    B, bpc = 8, 2
    n = B * bpc
    batch = {
        'data': 0.1 * rng.randn(B, 8, 32, 32, 3).astype(np.float32),
        'labels': (rng.rand(n, 6) > 0.5).astype(np.float32),
        'proposals': np.stack(
            [np.repeat(np.arange(B), bpc)]
            + [rng.uniform(0, 32, n) for _ in range(4)], 1).astype(np.float32),
        'box_mask': np.ones(n, np.float32),
    }
    params = init_params(jax.random.PRNGKey(0), spec)
    out_auto = make_eval_step(spec, mesh)(params, shard_batch(mesh, batch))
    out_sm = make_eval_step(spec, mesh, use_shard_map=True)(
        params, shard_batch(mesh, batch))
    np.testing.assert_allclose(np.asarray(out_sm['logits']),
                               np.asarray(out_auto['logits']),
                               rtol=1e-4, atol=1e-5)


def test_shard_map_train_with_custom_vjp_stem(eight_devices, request):
    """Regression: the Pallas stem's custom VJP must psum its weight
    cotangent inside a shard_map body.  conv1_w is replicated
    (device-invariant); without the psum, shard_map's check_vma typing
    rejects the device-varying gradient at trace time ("out_specs which
    require replication which can't be statically inferred").  Pallas is
    TPU-gated in CI, so this runs the real custom-VJP path with the kernel
    in interpret mode (shared recipe: lfb_tpu.utils.pallas_interpret,
    which also documents the dW-kernel hlo-interpreter fallback)."""
    from lfb_tpu.utils.pallas_interpret import force_pallas_interpret
    import contextlib
    stack = contextlib.ExitStack()
    stack.enter_context(force_pallas_interpret())
    request.addfinalizer(stack.close)   # unpatch at test teardown

    cfg = small_cfg()
    # Stem-kernel envelope needs crop >= 64 (H/2 % 16 == 0); keep T tiny.
    cfg.TRAIN.CROP_SIZE = 64
    cfg.TRAIN.VIDEO_LENGTH = 4
    # Dropouts off so the two step types' RNG streams don't diverge.
    cfg.FBO_NL.INPUT_DROPOUT_ON = False
    cfg.FBO_NL.LFB_DROPOUT_ON = False
    cfg = C.finalize(cfg)
    spec = build_spec(cfg, 'train')
    assert spec.use_pallas_stem     # default on; the path under test
    mesh = create_mesh(8)
    params = init_params(jax.random.PRNGKey(0), spec)
    trainable, frozen = split_params(spec, params)
    mstate = opt.init_state(params, frozen_param_names(spec, params))

    rng = np.random.RandomState(5)
    batch = shard_batch(mesh, {
        'data': 0.1 * rng.randn(8, 4, 64, 64, 3).astype(np.float32),
        'labels': (rng.rand(8, 6) > 0.5).astype(np.float32),
        'lfb': rng.randn(8, 4, 2048).astype(np.float32),
    })

    # The steps donate their param/state args; give each its own copies.
    def fresh(tree):
        return jax.tree.map(lambda a: jnp.array(np.asarray(a)), tree)

    step_sm = make_train_step(spec, cfg.SOLVER, mesh, use_shard_map=True)
    t_sm, _, _, aux_sm = step_sm(fresh(trainable), fresh(frozen),
                                 fresh(mstate), batch,
                                 jax.random.PRNGKey(0), jnp.float32(1e-4))
    assert np.isfinite(float(aux_sm['loss']))

    # The psum'd stem gradient must equal the auto-sharded step's (which
    # differentiates the plain XLA conv under jit; AD inserts the psum).
    spec_xla = build_spec(C.clone(cfg, {'TPU.PALLAS_STEM': False}), 'train')
    step_auto = make_train_step(spec_xla, cfg.SOLVER, mesh)
    t_auto, _, _, aux_auto = step_auto(fresh(trainable), fresh(frozen),
                                       fresh(mstate), batch,
                                       jax.random.PRNGKey(0),
                                       jnp.float32(1e-4))
    np.testing.assert_allclose(float(aux_sm['loss']),
                               float(aux_auto['loss']), rtol=1e-4)
    # Compare the UPDATE DELTAS, not the updated weights: an extra or
    # missing psum scales the stem gradient by 8x, which a comparison of
    # w - lr*grad against w can absorb when lr*grad << w.  (This exact
    # masking hid a double-psum in the XLA-dW fallback until round 3.)
    w0 = np.asarray(trainable['conv1_w'])
    d_sm = np.asarray(t_sm['conv1_w']) - w0
    d_auto = np.asarray(t_auto['conv1_w']) - w0
    scale = np.abs(d_auto).max()
    assert scale > 0
    np.testing.assert_allclose(d_sm / scale, d_auto / scale, atol=5e-2)


def _charades_device_bank_fixture():
    """Small charades-style device bank + index batch for bank-path tests."""
    from lfb_tpu.bank.device_bank import FrameDeviceBank

    cfg = small_cfg()
    cfg.FBO_NL.INPUT_DROPOUT_ON = False
    cfg.FBO_NL.LFB_DROPOUT_ON = False
    rng = np.random.RandomState(7)
    host_bank = {v: {f: rng.randn(2048).astype(np.float32)
                     for f in range(0, 96, 12)} for v in range(4)}

    def build():
        return FrameDeviceBank.build(host_bank, window_size=cfg.LFB.WINDOW_SIZE,
                                     lfb_dim=2048)

    batch = {
        'data': 0.1 * rng.randn(8, 8, 32, 32, 3).astype(np.float32),
        'labels': (rng.rand(8, 6) > 0.5).astype(np.float32),
        'lfb_video_idx': np.arange(8, dtype=np.int32) % 4,
        'lfb_center': np.array([20, 5, 40, 0, 0, 90, 13, 27], np.int32),
    }
    return cfg, build, batch


def _ava_device_bank_fixture():
    """AVA-style device bank (random per-sec feature choice + RoI metadata
    wiring) + batch for sharded-vs-replicated parity tests."""
    from lfb_tpu.bank.device_bank import AvaDeviceBank

    cfg = small_cfg()
    cfg.DATASET = 'ava'
    cfg.FBO_NL.INPUT_DROPOUT_ON = False
    cfg.FBO_NL.LFB_DROPOUT_ON = False
    cfg.AVA.LFB_MAX_NUM_FEAT_PER_STEP = 2
    cfg = C.finalize(cfg)
    rng = np.random.RandomState(11)
    host_bank = {v: {sec: [rng.randn(2048).astype(np.float32)
                           for _ in range(1 + (v + sec) % 4)]
                     for sec in range(902, 918)} for v in range(4)}

    def build():
        return AvaDeviceBank.build(
            host_bank, window_size=cfg.LFB.WINDOW_SIZE,
            k=cfg.AVA.LFB_MAX_NUM_FEAT_PER_STEP, lfb_dim=2048)

    B, bpc = 8, 2
    n = B * bpc
    batch = {
        'data': 0.1 * rng.randn(B, 8, 32, 32, 3).astype(np.float32),
        'labels': (rng.rand(n, 6) > 0.5).astype(np.float32),
        'proposals': np.stack(
            [np.repeat(np.arange(B), bpc)]
            + [rng.uniform(0, 32, n) for _ in range(4)], 1).astype(np.float32),
        'box_mask': np.ones(n, np.float32),
        'metadata': np.stack([
            np.repeat(np.arange(B) % 4, bpc),          # video idx
            904 + (np.arange(n) * 3) % 12,              # keyframe sec
            np.full(n, 240), np.full(n, 320)], 1).astype(np.float32),
    }
    return cfg, build, batch


def test_ava_sharded_bank_train_step_matches_replicated(eight_devices):
    """AvaDeviceBank.choose_rows (random per-sec feature selection) routed
    through _ShardLocalBankView.gather: the sharded-table shard_map train
    step matches the replicated-bank step bit-for-bit given the same rng."""
    from lfb_tpu.bank.device_bank import shard_bank

    cfg, build_bank, batch_np = _ava_device_bank_fixture()
    spec = build_spec(cfg, 'train')
    mesh = create_mesh(8)

    def run(bank):
        params = init_params(jax.random.PRNGKey(0), spec)
        trainable, frozen = split_params(spec, params)
        mstate = opt.init_state(params, frozen_param_names(spec, params))
        step = make_train_step(spec, cfg.SOLVER, mesh, bank=bank,
                               use_shard_map=True)
        t, f, m, aux = step(trainable, frozen, mstate,
                            shard_batch(mesh, batch_np),
                            jax.random.PRNGKey(3), jnp.float32(1e-5))
        return float(aux['loss']), np.asarray(t['lfb_nl0_theta_w'])

    loss_r, w_r = run(build_bank())
    loss_s, w_s = run(shard_bank(build_bank(), mesh))
    np.testing.assert_allclose(loss_s, loss_r, rtol=1e-5)
    np.testing.assert_allclose(w_s, w_r, rtol=1e-4, atol=1e-7)


def test_ava_sharded_bank_eval_step_matches_replicated(eight_devices):
    from lfb_tpu.bank.device_bank import shard_bank

    cfg, build_bank, batch_np = _ava_device_bank_fixture()
    spec = build_spec(cfg, 'val')
    mesh = create_mesh(8)
    params = init_params(jax.random.PRNGKey(0), spec)
    batch = shard_batch(mesh, {k: v for k, v in batch_np.items()
                               if k != 'labels'})

    out_r = make_eval_step(spec, mesh, bank=build_bank(),
                           use_shard_map=True)(params, batch)
    out_s = make_eval_step(spec, mesh, bank=shard_bank(build_bank(), mesh),
                           use_shard_map=True)(params, batch)
    np.testing.assert_allclose(np.asarray(out_s['logits']),
                               np.asarray(out_r['logits']),
                               rtol=1e-5, atol=1e-6)


def test_sharded_bank_train_step_matches_replicated(eight_devices):
    """TPU.BANK_SHARDED: the shard_map train step with the bank's feature
    table row-sharded over the mesh (index all_gather + psum_scatter window
    reassembly) is numerically identical to the replicated-bank shard_map
    step; per-chip bank HBM is 1/8."""
    from lfb_tpu.bank.device_bank import shard_bank

    cfg, build_bank, batch_np = _charades_device_bank_fixture()
    spec = build_spec(cfg, 'train')
    mesh = create_mesh(8)

    def run(bank):
        params = init_params(jax.random.PRNGKey(0), spec)
        trainable, frozen = split_params(spec, params)
        mstate = opt.init_state(params, frozen_param_names(spec, params))
        step = make_train_step(spec, cfg.SOLVER, mesh, bank=bank,
                               use_shard_map=True)
        t, f, m, aux = step(trainable, frozen, mstate,
                            shard_batch(mesh, batch_np),
                            jax.random.PRNGKey(7), jnp.float32(1e-5))
        return float(aux['loss']), np.asarray(t['lfb_nl0_theta_w'])

    loss_r, w_r = run(build_bank())
    sharded = shard_bank(build_bank(), mesh)
    assert sharded.inner.feats is None
    loss_s, w_s = run(sharded)
    np.testing.assert_allclose(loss_s, loss_r, rtol=1e-5)
    np.testing.assert_allclose(w_s, w_r, rtol=1e-4, atol=1e-7)


def test_sharded_bank_eval_step_matches_replicated(eight_devices):
    from lfb_tpu.bank.device_bank import shard_bank

    cfg, build_bank, batch_np = _charades_device_bank_fixture()
    spec = build_spec(cfg, 'val')
    mesh = create_mesh(8)
    params = init_params(jax.random.PRNGKey(0), spec)
    batch = shard_batch(mesh, {k: v for k, v in batch_np.items()
                               if k != 'labels'})

    out_r = make_eval_step(spec, mesh, bank=build_bank(),
                           use_shard_map=True)(params, batch)
    out_s = make_eval_step(spec, mesh, bank=shard_bank(build_bank(), mesh),
                           use_shard_map=True)(params, batch)
    np.testing.assert_allclose(np.asarray(out_s['logits']),
                               np.asarray(out_r['logits']),
                               rtol=1e-5, atol=1e-6)

    # Without shard_map a sharded bank must be rejected loudly.
    import pytest
    with pytest.raises(AssertionError, match='SHARD_MAP'):
        make_eval_step(spec, mesh, bank=shard_bank(build_bank(), mesh),
                       use_shard_map=False)

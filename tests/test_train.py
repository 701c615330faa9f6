import numpy as np

import jax
import jax.numpy as jnp

from lfb_tpu.core import config as C
from lfb_tpu.train import lr_policy, optimizer as opt


def solver(**over):
    cfg = C.default_config()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.STEP_SIZES = [60, 20, 10]
    cfg.SOLVER.MAX_ITER = 90
    for k, v in over.items():
        cfg.SOLVER[k] = v
    C.finalize(cfg)
    return cfg.SOLVER


def test_steps_with_relative_lrs():
    s = solver(LRS=[1, 0.1, 0.01])
    assert lr_policy.get_lr_at_iter(s, 0) == 0.02
    assert lr_policy.get_lr_at_iter(s, 59) == 0.02
    assert abs(lr_policy.get_lr_at_iter(s, 60) - 0.002) < 1e-9
    assert abs(lr_policy.get_lr_at_iter(s, 80) - 0.0002) < 1e-9
    assert abs(lr_policy.get_lr_at_iter(s, 89) - 0.0002) < 1e-9


def test_warmup_linear():
    s = solver(LRS=[1, 0.1, 0.01])
    s.WARMUP.WARMUP_ON = True
    s.WARMUP.WARMUP_START_LR = 0.002
    s.WARMUP.WARMUP_END_ITER = 11
    assert abs(lr_policy.get_lr_at_iter(s, 0) - 0.002) < 1e-9
    # linear to lr(11) = 0.02 at it=10: start + 10*(0.02-0.002)/10
    assert abs(lr_policy.get_lr_at_iter(s, 10) - 0.02) < 1e-9
    assert abs(lr_policy.get_lr_at_iter(s, 11) - 0.02) < 1e-9


def test_steps_with_decay():
    s = solver(LR_POLICY='steps_with_decay', GAMMA=0.1)
    assert abs(lr_policy.get_lr_at_iter(s, 0) - 0.02) < 1e-12
    assert abs(lr_policy.get_lr_at_iter(s, 65) - 0.002) < 1e-12
    assert abs(lr_policy.get_lr_at_iter(s, 85) - 0.0002) < 1e-12


def test_momentum_sgd_matches_caffe2_semantics():
    """One step: V = mu*V + lr*(g + wd*p); nesterov step = (1+mu)*V - mu*V_prev."""
    p0 = jnp.array([1.0, -2.0])
    g = jnp.array([0.5, 0.25])
    v0 = jnp.array([0.1, -0.1])
    lr, mu, wd = 0.1, 0.9, 0.01
    params = {'w': p0}
    state = opt.SGDState(momentum={'w': v0})
    new_params, new_state = opt.apply_updates(
        params, {'w': g}, state, lr=lr, momentum=mu, nesterov=True,
        weight_decay=wd, weight_decay_bn=0.0)
    g_wd = np.asarray(g) + wd * np.asarray(p0)
    v1 = mu * np.asarray(v0) + lr * g_wd
    step = (1 + mu) * v1 - mu * np.asarray(v0)
    np.testing.assert_allclose(np.asarray(new_params['w']),
                               np.asarray(p0) - step, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.momentum['w']), v1,
                               rtol=1e-6)


def test_weight_decay_bn_rule():
    params = {'res2_0_branch2a_bn_s': jnp.array([1.0]),
              'conv1_w': jnp.array([1.0])}
    grads = {k: jnp.zeros_like(v) for k, v in params.items()}
    state = opt.init_state(params, frozen=set())
    new_params, _ = opt.apply_updates(
        params, grads, state, lr=1.0, momentum=0.0, nesterov=False,
        weight_decay=0.1, weight_decay_bn=0.0)
    # zero grad: only decay moves params; bn param must not move.
    np.testing.assert_allclose(np.asarray(new_params['res2_0_branch2a_bn_s']),
                               [1.0])
    np.testing.assert_allclose(np.asarray(new_params['conv1_w']), [0.9])


def test_momentum_correction():
    state = opt.SGDState(momentum={'w': jnp.array([2.0])})
    scaled = opt.correct_momentum(state, 0.1)
    np.testing.assert_allclose(np.asarray(scaled.momentum['w']), [0.2])


def test_frozen_excluded_from_state():
    params = {'a': jnp.zeros(3), 'b_bn_s': jnp.zeros(3)}
    state = opt.init_state(params, frozen={'b_bn_s'})
    assert set(state.momentum) == {'a'}


def test_json_stats_and_param_table():
    from lfb_tpu.utils.logging_utils import (describe_params,
                                             get_json_stats_dict)
    cfg = C.finalize(C.default_config())
    cfg.DATASET = 'epic'
    cfg.MODEL.MULTI_LABEL = False
    cfg.TRAIN.DATASET_SIZE = 100

    class FakeMeter:
        lr = 0.01
        aggr_loss = 10.0
        aggr_batch_size = 5
        aggr_err = 50.0
        aggr_err5 = 25.0
        avg_err = 10.0
        avg_err5 = 5.0
        best_top1 = 9.0
        best_top5 = 4.0
        full_map = 0.0
        best_map = 0.0

    stats = get_json_stats_dict(cfg, FakeMeter(), FakeMeter(), 99)
    assert stats['currentIter'] == 100
    assert abs(stats['train_loss'] - 2.0) < 1e-9
    assert stats['test_err'] == 10.0 and stats['best_err'] == 9.0
    assert abs(stats['epoch'] - 99 / (100 / 64)) < 1e-9

    table = describe_params({'conv1_w': np.zeros((5, 7, 7, 3, 64)),
                             'pred_b': np.zeros(10)})
    assert 'conv1_w' in table and 'TOTAL' in table and '47,050' in table


def test_read_pkl_retries_then_raises(tmp_path):
    from lfb_tpu.train.checkpoints import read_pkl
    import pytest
    with pytest.raises(FileNotFoundError):
        read_pkl(str(tmp_path / 'missing.pkl'))
    bad = tmp_path / 'trunc.pkl'
    bad.write_bytes(b'\x80\x02')  # truncated pickle
    with pytest.raises(Exception):
        read_pkl(str(bad), retry=2)


def test_precise_bn_stats():
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train.precise_bn import compute_precise_bn_stats
    cfg = C.default_config()
    cfg.DATASET = 'epic'
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.MULTI_LABEL = False
    cfg.MODEL.USE_AFFINE = False
    cfg.NONLOCAL.USE_BN = True
    cfg.TRAIN.VIDEO_LENGTH = cfg.TEST.VIDEO_LENGTH = 8
    cfg.TRAIN.CROP_SIZE = cfg.TEST.CROP_SIZE = 32
    cfg.NUM_GPUS = 1
    cfg.TRAIN.BATCH_SIZE = cfg.TEST.BATCH_SIZE = 2
    cfg.TPU.COMPUTE_DTYPE = 'float32'
    cfg.TPU.USE_PALLAS = False
    cfg = C.finalize(cfg)
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)

    rng = np.random.RandomState(0)
    batches = [{'data': jnp.array(
        0.1 * rng.randn(2, 8, 32, 32, 3).astype(np.float32)),
        'labels': jnp.array([0, 1])} for _ in range(2)]
    new = compute_precise_bn_stats(spec, params, iter(batches), 2)
    # running stats replaced and finite
    assert not np.allclose(np.asarray(new['res_conv1_bn_rm']),
                           np.asarray(params['res_conv1_bn_rm']))
    assert np.isfinite(np.asarray(new['res_conv1_bn_rm'])).all()
    assert (np.asarray(new['res_conv1_bn_riv']) >= 0).all()
    # non-BN params untouched
    np.testing.assert_array_equal(np.asarray(new['conv1_w']),
                                  np.asarray(params['conv1_w']))


def test_flops_cost_analysis_and_hlo_dump(tmp_path):
    from lfb_tpu.utils.flops import (cost_analysis, count_params,
                                     log_flops_params, save_hlo_text)

    def fn(params, x):
        return x @ params['w']

    params = {'w': jnp.ones((64, 32))}
    x = jnp.ones((16, 64))
    costs = cost_analysis(fn, params, x)
    # 2*M*N*K flops for the matmul
    assert abs(costs.get('flops', 0) - 2 * 16 * 64 * 32) < 1e3
    assert count_params(params) == 64 * 32
    log_flops_params(fn, params, x)

    path = save_hlo_text(fn, str(tmp_path / 'model.hlo'), params, x)
    text = open(path).read()
    assert 'HloModule' in text or 'ENTRY' in text


def test_remat_modes_are_numerics_preserving():
    """TPU.REMAT '', 'res2', and 'stage' run the same math -- jax.checkpoint
    only changes what is recomputed in the backward pass, so one train step
    must produce identical losses and updated params across modes."""
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.models.model import frozen_param_names
    from lfb_tpu.parallel import create_mesh, shard_batch
    from lfb_tpu.train import optimizer as opt
    from lfb_tpu.train.steps import make_train_step, split_params

    def make_cfg(remat):
        cfg = C.default_config()
        cfg.DATASET = 'epic'
        cfg.MODEL.NUM_CLASSES = 5
        cfg.MODEL.MULTI_LABEL = False
        cfg.MODEL.USE_AFFINE = True
        cfg.NONLOCAL.USE_BN = False
        cfg.NONLOCAL.USE_AFFINE = True
        cfg.TRAIN.VIDEO_LENGTH = cfg.TEST.VIDEO_LENGTH = 8
        cfg.TRAIN.CROP_SIZE = cfg.TEST.CROP_SIZE = 32
        cfg.NUM_GPUS = 1
        cfg.TRAIN.BATCH_SIZE = cfg.TEST.BATCH_SIZE = 2
        cfg.TRAIN.DROPOUT_RATE = 0.0
        cfg.TPU.COMPUTE_DTYPE = 'float32'
        cfg.TPU.USE_PALLAS = False
        cfg.TPU.REMAT = remat
        return C.finalize(cfg)

    rng = np.random.RandomState(0)
    batch = {
        'data': 0.1 * rng.randn(2, 8, 32, 32, 3).astype(np.float32),
        'labels': np.array([0, 1], np.int32),
    }
    mesh = create_mesh(1)

    results = {}
    for remat in ('', 'res2', 'stage'):
        cfg = make_cfg(remat)
        spec = build_spec(cfg, 'train')
        assert spec.remat == remat
        params = init_params(jax.random.PRNGKey(0), spec)
        trainable, frozen = split_params(spec, params)
        mstate = opt.init_state(params, frozen_param_names(spec, params))
        step = make_train_step(spec, cfg.SOLVER, mesh)
        trainable, frozen, mstate, aux = step(
            trainable, frozen, mstate, shard_batch(mesh, batch),
            jax.random.PRNGKey(0), jnp.float32(0.01))
        results[remat] = (float(aux['loss']),
                          np.asarray(trainable['conv1_w']),
                          np.asarray(trainable['pred_w']))

    ref_loss, ref_conv1, ref_pred = results['']
    for remat in ('res2', 'stage'):
        loss, conv1, pred = results[remat]
        assert abs(loss - ref_loss) <= 1e-6 * max(1.0, abs(ref_loss)), (
            remat, ref_loss, loss)
        np.testing.assert_allclose(conv1, ref_conv1, rtol=1e-6, atol=1e-7,
                                   err_msg=remat)
        np.testing.assert_allclose(pred, ref_pred, rtol=1e-6, atol=1e-7,
                                   err_msg=remat)

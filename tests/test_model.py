import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lfb_tpu.core import config as C
from lfb_tpu.models import build_spec, forward, init_params
from lfb_tpu.models.model import frozen_param_names


def make_cfg(dataset='epic', **over):
    cfg = C.default_config()
    cfg.DATASET = dataset
    cfg.MODEL.NUM_CLASSES = 7
    cfg.MODEL.MODEL_NAME = 'resnet_video'
    cfg.MODEL.USE_AFFINE = True
    cfg.MODEL.MULTI_LABEL = dataset != 'epic'
    cfg.NONLOCAL.USE_BN = False
    cfg.NONLOCAL.USE_AFFINE = True
    cfg.NONLOCAL.USE_ZERO_INIT_CONV = True
    cfg.TRAIN.VIDEO_LENGTH = 8
    cfg.TEST.VIDEO_LENGTH = 8
    cfg.TRAIN.CROP_SIZE = 64
    cfg.TEST.CROP_SIZE = 64
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TEST.BATCH_SIZE = 2
    cfg.NUM_GPUS = 1
    cfg.TRAIN.DROPOUT_RATE = 0.3
    cfg.TPU.COMPUTE_DTYPE = 'float32'
    cfg.TPU.USE_PALLAS = False
    for k, v in over.items():
        C.merge_cfg_from_list(cfg, [k, repr(v)])
    return C.finalize(cfg)


def epic_batch(spec, b=2, rng=np.random.RandomState(0)):
    batch = {
        'data': jnp.array(rng.randn(b, spec.video_length, spec.crop_size,
                                    spec.crop_size, 3).astype(np.float32)),
        'labels': jnp.array(rng.randint(0, 7, size=(b,))),
    }
    if spec.fbo.enabled:
        batch['lfb'] = jnp.array(rng.randn(
            b, spec.fbo.num_lfb_feat, spec.fbo.lfb_dim).astype(np.float32))
    return batch


def test_epic_baseline_forward_shapes():
    cfg = make_cfg('epic')
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    # Caffe2-compatible names exist.
    assert 'conv1_w' in params and params['conv1_w'].shape == (5, 7, 7, 3, 64)
    assert 'res_conv1_bn_s' in params
    assert 'res4_5_branch2a_w' in params
    assert 'nonlocal_conv3_1_theta_w' in params
    assert params['pred_w'].shape == (2048, 7)

    out = forward(spec, params, epic_batch(spec), train=True,
                  rng=jax.random.PRNGKey(1))
    assert out['logits'].shape == (2, 7)
    assert out['pool5'].shape == (2, 2048)
    assert np.isfinite(float(out['loss']))
    # softmax prob rows sum to 1
    np.testing.assert_allclose(np.asarray(out['prob']).sum(-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize('fbo_type,extra_dim', [('avg', 2048), ('max', 2048),
                                                ('nl', 512)])
def test_epic_lfb_forward(fbo_type, extra_dim):
    cfg = make_cfg('epic', **{'LFB.ENABLED': True, 'LFB.FBO_TYPE': fbo_type,
                              'LFB.WINDOW_SIZE': 6})
    spec = build_spec(cfg, 'train')
    assert spec.head_dim == 2048 + extra_dim
    params = init_params(jax.random.PRNGKey(0), spec)
    if fbo_type == 'nl':
        assert 'lfb_1x1_w' in params
        assert 'lfb_nl0_theta_w' in params
        assert 'res5_2_branch2c_bn_pooled_fbonl_reduc_w' in params
    out = forward(spec, params, epic_batch(spec), train=True,
                  rng=jax.random.PRNGKey(1))
    assert out['logits'].shape == (2, 7)


def test_charades_multilabel_and_post_act():
    cfg = make_cfg('charades', **{'LFB.ENABLED': True, 'LFB.FBO_TYPE': 'nl',
                                  'LFB.WINDOW_SIZE': 5,
                                  'FBO_NL.PRE_ACT': False})
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    batch = {
        'data': jnp.array(rng.randn(2, 8, 64, 64, 3).astype(np.float32)),
        'labels': jnp.array((rng.rand(2, 7) > 0.5).astype(np.float32)),
        'lfb': jnp.array(rng.randn(2, 5, 2048).astype(np.float32)),
    }
    out = forward(spec, params, batch, train=True, rng=jax.random.PRNGKey(1))
    assert out['prob'].shape == (2, 7)
    assert ((np.asarray(out['prob']) >= 0) & (np.asarray(out['prob']) <= 1)).all()


def test_ava_roi_head_and_lfb():
    cfg = make_cfg('ava', **{'LFB.ENABLED': True, 'LFB.FBO_TYPE': 'nl',
                             'LFB.WINDOW_SIZE': 3})
    spec = build_spec(cfg, 'train')
    assert spec.fbo.num_lfb_feat == 3 * 5
    params = init_params(jax.random.PRNGKey(0), spec)
    assert 'box_pooled_fbonl_reduc_w' in params
    rng = np.random.RandomState(0)
    n_boxes = 5
    batch = {
        'data': jnp.array(rng.randn(2, 8, 64, 64, 3).astype(np.float32)),
        'labels': jnp.array((rng.rand(n_boxes, 7) > 0.7).astype(np.float32)),
        'proposals': jnp.array(np.array(
            [[0, 0, 0, 63, 63], [0, 10, 10, 40, 40], [1, 5, 5, 30, 60],
             [1, 0, 0, 63, 63], [0, 0, 0, 0, 0]], np.float32)),
        'box_mask': jnp.array([1, 1, 1, 1, 0], jnp.float32),
        'lfb': jnp.array(rng.randn(n_boxes, 15, 2048).astype(np.float32)),
    }
    out = forward(spec, params, batch, train=True, rng=jax.random.PRNGKey(1))
    assert out['logits'].shape == (n_boxes, 7)
    assert out['box_pooled'].shape == (n_boxes, 2048)
    assert np.isfinite(float(out['loss']))


def test_lfb_infer_only_returns_features_only():
    cfg = make_cfg('epic', **{'LFB.ENABLED': True})
    spec = build_spec(cfg, 'test', lfb_infer_only=True)
    params = init_params(jax.random.PRNGKey(0), spec)
    assert 'pred_w' not in params and 'lfb_1x1_w' not in params
    out = forward(spec, params, epic_batch(spec), train=False)
    assert set(out.keys()) == {'pool5'}


def test_grouped_nonlocal_res3():
    # TRAIN.VIDEO_LENGTH=32 -> pool_stride 16 -> 4 temporal groups of 4 at res3.
    cfg = make_cfg('epic')
    cfg.TRAIN.VIDEO_LENGTH = 32
    cfg.TEST.VIDEO_LENGTH = 32
    cfg.TRAIN.CROP_SIZE = 32
    cfg.TEST.CROP_SIZE = 32
    cfg = C.finalize(cfg)
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    batch = {
        'data': jnp.array(rng.randn(1, 32, 32, 32, 3).astype(np.float32)),
        'labels': jnp.array([3]),
    }
    out = forward(spec, params, batch, train=False)
    assert out['logits'].shape == (1, 7)


def test_r101_arc_and_depth():
    cfg = make_cfg('epic')
    cfg.MODEL.DEPTH = 101
    cfg.MODEL.VIDEO_ARC_CHOICE = 4
    cfg = C.finalize(cfg)
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    assert 'res4_22_branch2a_w' in params
    # R101 NL placement: res3 mod 2 -> {1,3}; res4 mod 7 -> {6,13,20}.
    assert 'nonlocal_conv4_6_theta_w' in params
    assert 'nonlocal_conv4_13_theta_w' in params
    assert 'nonlocal_conv4_20_theta_w' in params
    assert 'nonlocal_conv4_1_theta_w' not in params
    # Alternating temporal convs through res4: kT = 3,1,3,1,...
    assert params['res4_0_branch2a_w'].shape[0] == 3
    assert params['res4_1_branch2a_w'].shape[0] == 1


def test_frozen_params_affine_mode():
    cfg = make_cfg('epic')
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    frozen = frozen_param_names(spec, params)
    assert 'res_conv1_bn_s' in frozen
    assert 'res2_0_branch2a_bn_b' in frozen
    assert 'nonlocal_conv3_1_bn_s' in frozen
    assert 'conv1_w' not in frozen
    assert 'pred_w' not in frozen


def test_frozen_params_freeze_backbone():
    cfg = make_cfg('charades', **{'MODEL.FREEZE_BACKBONE': True,
                                  'LFB.ENABLED': True, 'LFB.WINDOW_SIZE': 5})
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    frozen = frozen_param_names(spec, params)
    assert 'conv1_w' in frozen
    assert 'res5_2_branch2c_w' in frozen
    assert 'pred_w' not in frozen
    assert 'lfb_nl0_theta_w' not in frozen
    assert 'res5_2_branch2c_bn_pooled_fbonl_reduc_w' not in frozen


def test_bn_mode_updates_running_stats():
    cfg = make_cfg('epic')
    cfg.MODEL.USE_AFFINE = False
    cfg.NONLOCAL.USE_AFFINE = False
    cfg.NONLOCAL.USE_BN = True
    cfg = C.finalize(cfg)
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    assert 'res_conv1_bn_rm' in params
    out = forward(spec, params, epic_batch(spec), train=True,
                  rng=jax.random.PRNGKey(1))
    assert 'bn_updates' in out
    assert 'res_conv1_bn' in out['bn_updates']
    mean, var = out['bn_updates']['res_conv1_bn']
    assert mean.shape == (64,) and var.shape == (64,)


def test_c2d_arcs_forward():
    """C2D arcs (VIDEO_ARC_CHOICE 1/3): all temporal kernels are 1."""
    for choice, depth in ((1, 50), (3, 101)):
        cfg = make_cfg('epic')
        cfg.MODEL.VIDEO_ARC_CHOICE = choice
        cfg.MODEL.DEPTH = depth
        cfg = C.finalize(cfg)
        spec = build_spec(cfg, 'train')
        params = init_params(jax.random.PRNGKey(0), spec)
        assert params['conv1_w'].shape[0] == 1  # kT = 1
        assert params['res4_0_branch2a_w'].shape[0] == 1
        out = forward(spec, params, epic_batch(spec), train=False)
        assert out['logits'].shape == (2, 7)

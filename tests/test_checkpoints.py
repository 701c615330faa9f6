import numpy as np

import jax

from lfb_tpu.core import config as C
from lfb_tpu.models import build_spec, init_params
from lfb_tpu.train import checkpoints as ckpt


def tiny_spec():
    cfg = C.default_config()
    cfg.DATASET = 'epic'
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.USE_AFFINE = True
    cfg.NONLOCAL.USE_BN = False
    cfg.NONLOCAL.USE_AFFINE = True
    cfg.MODEL.MULTI_LABEL = False
    cfg.TRAIN.VIDEO_LENGTH = 8
    cfg.TEST.VIDEO_LENGTH = 8
    cfg.TRAIN.CROP_SIZE = 64
    cfg.TEST.CROP_SIZE = 64
    cfg.NUM_GPUS = 1
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TEST.BATCH_SIZE = 2
    return build_spec(C.finalize(cfg), 'train')


def test_roundtrip_identity(tmp_path):
    spec = tiny_spec()
    params = {k: np.asarray(v) for k, v in
              init_params(jax.random.PRNGKey(0), spec).items()}
    path = str(tmp_path / 'c2_model_iter100.pkl')
    ckpt.save_params(path, params, model_iter=100, lr=0.01)

    fresh = {k: np.zeros_like(v) for k, v in params.items()}
    loaded, _, it, lr = ckpt.load_params_into(path, fresh)
    assert it == 100 and abs(lr - 0.01) < 1e-8
    for k in params:
        np.testing.assert_array_equal(loaded[k], params[k], err_msg=k)


def test_caffe2_layout_import():
    # Simulate a Caffe2 blob dict: (Cout, Cin, kT, kH, kW) convs, (O, I) FC.
    rng = np.random.RandomState(0)
    c2 = {
        'conv1_w': rng.randn(64, 3, 5, 7, 7).astype(np.float32),
        'pred_w': rng.randn(5, 2048).astype(np.float32),
        'pred_b': rng.randn(5).astype(np.float32),
        'res_conv1_bn_s': rng.randn(64).astype(np.float32),
    }
    out = ckpt.c2_to_tpu('conv1_w', c2['conv1_w'], (5, 7, 7, 3, 64))
    assert out.shape == (5, 7, 7, 3, 64)
    np.testing.assert_array_equal(out[2, 3, 3, 1, 10],
                                  c2['conv1_w'][10, 1, 2, 3, 3])

    w = ckpt.c2_to_tpu('pred_w', c2['pred_w'], (2048, 5))
    np.testing.assert_array_equal(w, c2['pred_w'].T)

    s = ckpt.c2_to_tpu('res_conv1_bn_s', c2['res_conv1_bn_s'], (64,))
    np.testing.assert_array_equal(s, c2['res_conv1_bn_s'])


def test_2d_to_3d_inflation():
    rng = np.random.RandomState(0)
    w2d = rng.randn(64, 3, 7, 7).astype(np.float32)  # image-pretrained conv1
    out = ckpt.c2_to_tpu('conv1_w', w2d, (5, 7, 7, 3, 64))
    assert out.shape == (5, 7, 7, 3, 64)
    # Every temporal slice is the 2D kernel / kT -- so the temporal sum
    # reproduces the 2D response (reference checkpoints.py:336-362).
    for t in range(5):
        np.testing.assert_allclose(out[t, 4, 2, 2, 7],
                                   w2d[7, 2, 4, 2] / 5.0, rtol=1e-6)


def test_classifier_mismatch_skipped():
    w = np.zeros((400, 2048), np.float32)
    assert ckpt.c2_to_tpu('pred_w', w, (2048, 5)) is None


def test_bn_to_affine_folding():
    rng = np.random.RandomState(1)
    gamma = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.randn(8).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.1
    blobs = {
        'res2_0_branch2a_bn_s': gamma, 'res2_0_branch2a_bn_b': beta,
        'res2_0_branch2a_bn_rm': mean, 'res2_0_branch2a_bn_riv': var,
        'res2_0_branch2a_w': rng.randn(4).astype(np.float32),
    }
    folded = ckpt.fold_bn_to_affine(blobs)
    assert 'res2_0_branch2a_bn_rm' not in folded
    x = rng.randn(8).astype(np.float32)
    # BN(x) == folded affine(x)
    bn = (x - mean) / np.sqrt(var + 1e-5) * gamma + beta
    aff = x * folded['res2_0_branch2a_bn_s'] + folded['res2_0_branch2a_bn_b']
    np.testing.assert_allclose(bn, aff, rtol=1e-5, atol=1e-6)


def test_convert_pretrained_strips_pred_and_momentum():
    blobs = {
        'pred_w': np.zeros((5, 4), np.float32),
        'conv1_w_momentum': np.zeros(3, np.float32),
        'conv1_w': np.ones(3, np.float32),
        'lr': np.float32(0.1),
    }
    out = ckpt.convert_pretrained(blobs)
    assert set(out) == {'conv1_w'}


def test_latest_checkpoint_discovery(tmp_path):
    d = str(tmp_path)
    assert ckpt.latest_checkpoint(d) is None
    for it in (100, 2000, 350):
        open(tmp_path / 'c2_model_iter{}.pkl'.format(it), 'wb').close()
    open(tmp_path / 'other.pkl', 'wb').close()
    assert ckpt.latest_checkpoint(d).endswith('c2_model_iter2000.pkl')


def test_resume_iter_rescaling():
    assert ckpt.resume_iter_for_batch_size(1000, 64, 16) == 4000


def test_convert_model_pretrained_flow():
    """CONVERT_MODEL: a BN-mode pretrained checkpoint (with _bn_rm/_bn_riv)
    folds into the affine-mode model exactly (reference checkpoints.py:
    88-116,132-177,200-205)."""
    from lfb_tpu.core import config as C
    from lfb_tpu.models import build_spec, init_params

    # Source: BN-mode model (like a K400-pretrained checkpoint).
    cfg_bn = C.default_config()
    cfg_bn.DATASET = 'epic'
    cfg_bn.MODEL.NUM_CLASSES = 400       # K400 classifier, mismatched
    cfg_bn.MODEL.USE_AFFINE = False
    cfg_bn.NONLOCAL.USE_BN = True
    cfg_bn.MODEL.MULTI_LABEL = False
    cfg_bn.TRAIN.VIDEO_LENGTH = cfg_bn.TEST.VIDEO_LENGTH = 8
    cfg_bn.TRAIN.CROP_SIZE = cfg_bn.TEST.CROP_SIZE = 64
    cfg_bn.NUM_GPUS = 1
    cfg_bn.TRAIN.BATCH_SIZE = cfg_bn.TEST.BATCH_SIZE = 2
    spec_bn = build_spec(C.finalize(cfg_bn), 'train')
    rng = np.random.RandomState(0)
    src = {}
    for k, v in init_params(jax.random.PRNGKey(1), spec_bn).items():
        arr = rng.randn(*np.shape(v)).astype(np.float32)
        if k.endswith('_bn_riv'):
            arr = np.abs(arr) + 0.1
        src[k] = arr

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = d + '/k400.pkl'
        ckpt.save_params(path, src, model_iter=12345, lr=0.00125,
                         momentum={'conv1_w': src['conv1_w'] * 0})

        # Target: affine-mode model with a different classifier size.
        cfg_af = C.clone(C.finalize(cfg_bn))
        cfg_af.MODEL.USE_AFFINE = True
        cfg_af.MODEL.NUM_CLASSES = 5
        cfg_af.NONLOCAL.USE_BN = False
        cfg_af.NONLOCAL.USE_AFFINE = True
        spec_af = build_spec(cfg_af, 'train')
        target = {k: np.asarray(v) for k, v in
                  init_params(jax.random.PRNGKey(2), spec_af).items()}
        pred_init = target['pred_w'].copy()

        loaded, _, _, _ = ckpt.load_params_into(path, target,
                                                convert_model=True)

    # Affine scale/bias == folded BN.
    g, b = src['res2_0_branch2a_bn_s'], src['res2_0_branch2a_bn_b']
    rm, rv = src['res2_0_branch2a_bn_rm'], src['res2_0_branch2a_bn_riv']
    std = np.sqrt(rv + 1e-5)
    np.testing.assert_allclose(loaded['res2_0_branch2a_bn_s'], g / std,
                               rtol=1e-6)
    np.testing.assert_allclose(loaded['res2_0_branch2a_bn_b'],
                               b - rm * g / std, rtol=1e-5, atol=1e-6)
    # conv weights transferred (layout converted), classifier kept at init.
    np.testing.assert_allclose(
        loaded['conv1_w'],
        ckpt.c2_to_tpu('conv1_w', ckpt.tpu_to_c2('conv1_w', src['conv1_w']),
                       loaded['conv1_w'].shape))
    np.testing.assert_array_equal(loaded['pred_w'], pred_init)

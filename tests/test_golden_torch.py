"""Cross-framework golden tests: backbone building blocks vs an independent
PyTorch implementation of the reference semantics (channels-first NCTHW,
like Caffe2).  Catches layout/padding/attention mistakes that same-framework
tests cannot."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from lfb_tpu.models import build_spec
from lfb_tpu.models.backbone import _bottleneck, _spacetime_nonlocal
from lfb_tpu.models.fbo import _nl_core
from lfb_tpu.core import config as C


def spec_for(**over):
    cfg = C.default_config()
    cfg.DATASET = 'epic'
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.USE_AFFINE = True
    cfg.NONLOCAL.USE_AFFINE = True
    cfg.NONLOCAL.USE_BN = False
    cfg.MODEL.MULTI_LABEL = False
    cfg.TPU.COMPUTE_DTYPE = 'float32'
    cfg.TPU.USE_PALLAS = False
    cfg.NUM_GPUS = 1
    cfg.TRAIN.BATCH_SIZE = cfg.TEST.BATCH_SIZE = 2
    for k, v in over.items():
        C.merge_cfg_from_list(cfg, [k, repr(v)])
    return build_spec(C.finalize(cfg), 'val')


def t_conv(x, w, stride, pad, dilation=(1, 1, 1)):
    """torch conv3d on NCTHW with DHWIO jax weights."""
    tw = torch.tensor(np.transpose(np.asarray(w), (4, 3, 0, 1, 2)))
    return torch.nn.functional.conv3d(x, tw, stride=stride, padding=pad,
                                      dilation=dilation)


def t_affine(x, s, b):
    s = torch.tensor(np.asarray(s)).view(1, -1, 1, 1, 1)
    b = torch.tensor(np.asarray(b)).view(1, -1, 1, 1, 1)
    return x * s + b


def test_bottleneck_matches_torch_reference():
    spec = spec_for()
    rng = np.random.RandomState(0)
    dim_in, dim_inner, dim_out = 16, 8, 32
    params = {
        'res9_0_branch2a_w': rng.randn(3, 1, 1, dim_in, dim_inner).astype('f'),
        'res9_0_branch2a_bn_s': rng.rand(dim_inner).astype('f') + 0.5,
        'res9_0_branch2a_bn_b': rng.randn(dim_inner).astype('f'),
        'res9_0_branch2b_w': rng.randn(1, 3, 3, dim_inner, dim_inner).astype('f'),
        'res9_0_branch2b_bn_s': rng.rand(dim_inner).astype('f') + 0.5,
        'res9_0_branch2b_bn_b': rng.randn(dim_inner).astype('f'),
        'res9_0_branch2c_w': rng.randn(1, 1, 1, dim_inner, dim_out).astype('f'),
        'res9_0_branch2c_bn_s': rng.rand(dim_out).astype('f') + 0.5,
        'res9_0_branch2c_bn_b': rng.randn(dim_out).astype('f'),
        'res9_0_branch1_w': rng.randn(1, 1, 1, dim_in, dim_out).astype('f'),
        'res9_0_branch1_bn_s': rng.rand(dim_out).astype('f') + 0.5,
        'res9_0_branch1_bn_b': rng.randn(dim_out).astype('f'),
    }
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    x = rng.randn(2, 4, 8, 8, dim_in).astype('f')

    out = _bottleneck(spec, jparams, 'res9_0', jnp.asarray(x),
                      dim_out=dim_out, stride=2, temp_stride=1,
                      use_temp_conv=1, dilation=1, train=False,
                      bn_updates=None)

    # Independent torch reference (NCTHW).
    tx = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    h = t_conv(tx, params['res9_0_branch2a_w'], (1, 1, 1), (1, 0, 0))
    h = torch.relu(t_affine(h, params['res9_0_branch2a_bn_s'],
                            params['res9_0_branch2a_bn_b']))
    h = t_conv(h, params['res9_0_branch2b_w'], (1, 2, 2), (0, 1, 1))
    h = torch.relu(t_affine(h, params['res9_0_branch2b_bn_s'],
                            params['res9_0_branch2b_bn_b']))
    h = t_conv(h, params['res9_0_branch2c_w'], (1, 1, 1), (0, 0, 0))
    h = t_affine(h, params['res9_0_branch2c_bn_s'],
                 params['res9_0_branch2c_bn_b'])
    sc = t_conv(tx, params['res9_0_branch1_w'], (1, 2, 2), (0, 0, 0))
    sc = t_affine(sc, params['res9_0_branch1_bn_s'],
                  params['res9_0_branch1_bn_b'])
    ref = torch.relu(h + sc).permute(0, 2, 3, 4, 1).numpy()

    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_spacetime_nonlocal_matches_torch_reference():
    spec = spec_for()
    rng = np.random.RandomState(1)
    C_dim, Ci = 32, 16
    p = {}
    for name, cin, cout in [('theta', C_dim, Ci), ('phi', C_dim, Ci),
                            ('g', C_dim, Ci), ('out', Ci, C_dim)]:
        p['nl_{}_w'.format(name)] = rng.randn(1, 1, 1, cin, cout).astype('f')
        p['nl_{}_b'.format(name)] = rng.randn(cout).astype('f')
    p['nl_bn_s'] = rng.rand(C_dim).astype('f') + 0.5
    p['nl_bn_b'] = rng.randn(C_dim).astype('f')
    jp = {k: jnp.asarray(v) for k, v in p.items()}
    x = rng.randn(2, 4, 8, 8, C_dim).astype('f')

    out = _spacetime_nonlocal(spec, jp, 'nl', jnp.asarray(x), train=False,
                              bn_updates=None)

    # torch reference, following nonlocal_helper.py:29-160 exactly.
    tx = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))  # (B,C,T,H,W)

    def conv1(t, name):
        w = torch.tensor(p['nl_{}_w'.format(name)].reshape(
            1, 1, 1, -1, p['nl_{}_w'.format(name)].shape[-1]))
        w = w.squeeze(0).squeeze(0).squeeze(0)          # (cin, cout)
        b = torch.tensor(p['nl_{}_b'.format(name)])
        return torch.einsum('bcthw,cd->bdthw', t, w) + b.view(1, -1, 1, 1, 1)

    theta = conv1(tx, 'theta')
    pooled = torch.nn.functional.max_pool3d(tx, (1, 2, 2), (1, 2, 2))
    phi = conv1(pooled, 'phi')
    g = conv1(pooled, 'g')
    B = 2
    theta_f = theta.reshape(B, Ci, -1)
    phi_f = phi.reshape(B, Ci, -1)
    g_f = g.reshape(B, Ci, -1)
    aff = torch.einsum('bci,bcj->bij', theta_f, phi_f) * Ci ** -0.5
    prob = torch.softmax(aff, dim=2)
    t = torch.einsum('bcj,bij->bci', g_f, prob).reshape(theta.shape)
    y = conv1(t, 'out')
    ref = t_affine(y, p['nl_bn_s'], p['nl_bn_b'])
    ref = ref.permute(0, 2, 3, 4, 1).numpy()

    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_fbo_nl_core_matches_torch_reference():
    spec = spec_for(**{'LFB.ENABLED': True, 'LFB.WINDOW_SIZE': 6,
                       'FBO_NL.LATENT_DIM': 16})
    rng = np.random.RandomState(2)
    L = 16
    p = {}
    for name in ('theta', 'phi', 'g', 'out'):
        p['lfb_nl0_{}_w'.format(name)] = rng.randn(1, 1, 1, L, L).astype('f')
        p['lfb_nl0_{}_b'.format(name)] = rng.randn(L).astype('f')
    jp = {k: jnp.asarray(v) for k, v in p.items()}
    a = rng.randn(3, L).astype('f')          # clip features
    bank = rng.randn(3, 6, L).astype('f')    # bank window

    out = _nl_core(spec, jp, 'lfb_nl0', jnp.asarray(a), jnp.asarray(bank),
                   train=False, rng=None)

    def mm(x, name):
        w = torch.tensor(p['lfb_nl0_{}_w'.format(name)][0, 0, 0])
        b = torch.tensor(p['lfb_nl0_{}_b'.format(name)])
        return x @ w + b

    ta, tb = torch.tensor(a), torch.tensor(bank)
    theta = mm(ta, 'theta')[:, None, :]              # (N,1,L)
    phi = mm(tb, 'phi')                              # (N,W,L)
    g = mm(tb, 'g')
    aff = torch.einsum('bqc,bkc->bqk', theta, phi) * L ** -0.5
    prob = torch.softmax(aff, dim=-1)
    t = torch.einsum('bqk,bkc->bqc', prob, g)[:, 0]  # (N,L)
    # PRE_ACT (default): LayerNorm (no affine, eps 1e-3) then ReLU.
    mu = t.mean(-1, keepdim=True)
    var = t.var(-1, unbiased=False, keepdim=True)
    t = torch.relu((t - mu) / torch.sqrt(var + 1e-3))
    y = mm(t, 'out') + ta                            # residual
    np.testing.assert_allclose(np.asarray(out), y.numpy(),
                               rtol=2e-4, atol=2e-4)

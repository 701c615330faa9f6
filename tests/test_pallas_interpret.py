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
    out, _ = pl.pallas_call(
        kernel,
        grid=(B, nq_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0)),
                   pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, nq_pad, C), q.dtype),
                   jax.ShapeDtypeStruct((B, nq_pad, 1), jnp.float32)),
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


def test_pallas_roi_align_maxpool_matches_xla(monkeypatch):
    from lfb_tpu.ops import pallas_roi_align
    from lfb_tpu.ops.roi_align import roi_align
    from lfb_tpu.ops.pooling import max_pool_2d
    from jax.experimental import pallas as pl

    # interpret mode: wrap pallas_call
    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **k: orig(*a, interpret=True, **k))

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 14, 14, 128), jnp.float32)
    rois = jnp.asarray(np.array([
        [0, 0.0, 0.0, 224.0, 224.0],
        [1, 32.0, 48.0, 120.0, 200.0],
        [0, 5.5, 3.25, 60.75, 90.5],
        [1, 0.0, 0.0, 0.0, 0.0],
    ], np.float32))

    out = pallas_roi_align.roi_align_maxpool(feats, rois, pooled=7,
                                             spatial_scale=1 / 16.0)
    ref = roi_align(feats, rois, pooled_h=7, pooled_w=7,
                    spatial_scale=1 / 16.0)
    ref = max_pool_2d(ref, (7, 7), (1, 1)).reshape(4, 128)
    # Bin-pooled formulation keeps the whole gather in f32.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_roi_align_custom_vjp_matches_xla(monkeypatch):
    """Feature gradients of the fused kernel match XLA autodiff through
    roi_align + max_pool_2d (VERDICT r1 item 3)."""
    from lfb_tpu.ops import pallas_roi_align
    from lfb_tpu.ops.roi_align import roi_align
    from lfb_tpu.ops.pooling import max_pool_2d
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **k: orig(*a, interpret=True, **k))

    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(3, 14, 14, 128), jnp.float32)
    rois = jnp.asarray(np.array([
        [0, 0.0, 0.0, 224.0, 224.0],
        [2, 32.0, 48.0, 120.0, 200.0],      # batches out of order
        [0, 5.5, 3.25, 60.75, 90.5],
        [1, 10.0, 10.0, 100.0, 180.0],
        [2, 0.0, 0.0, 0.0, 0.0],            # degenerate (padded) box
    ], np.float32))
    dout = jnp.asarray(rng.randn(5, 128), jnp.float32)

    def loss_pallas(f):
        out = pallas_roi_align.roi_align_maxpool(f, rois, pooled=7,
                                                 spatial_scale=1 / 16.0)
        return jnp.sum(out * dout)

    def loss_xla(f):
        out = roi_align(f, rois, pooled_h=7, pooled_w=7,
                        spatial_scale=1 / 16.0)
        out = max_pool_2d(out, (7, 7), (1, 1)).reshape(5, 128)
        return jnp.sum(out * dout)

    lp, gp = jax.value_and_grad(loss_pallas)(feats)
    lx, gx = jax.value_and_grad(loss_xla)(feats)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-5)
    # Coordinate gradient is defined as zero (data, not parameters).
    groi = jax.grad(lambda r: jnp.sum(pallas_roi_align.roi_align_maxpool(
        feats, r, pooled=7, spatial_scale=1 / 16.0)))(rois)
    assert float(jnp.abs(groi).max()) == 0.0


def test_pallas_stem_conv_matches_conv3d(monkeypatch):
    from lfb_tpu.ops import pallas_stem
    from lfb_tpu.ops.conv3d import conv3d
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **k: orig(*a, interpret=True, **k))

    rng = np.random.RandomState(0)
    # (64, 96): pad lanes; (32, 256): wp = 128 fills the lanes exactly and
    # exercises the masked-roll row-boundary handling at full width.
    for H, W in ((64, 96), (32, 256)):
        x = jnp.asarray(rng.randn(2, 4, H, W, 3), jnp.float32)
        for kt, pad in ((5, 2), (1, 0)):
            w = jnp.asarray(rng.randn(kt, 7, 7, 3, 64), jnp.float32)
            ref = conv3d(x, w, strides=(1, 2, 2), padding=(pad, 3, 3))
            out = pallas_stem.stem_conv_s2d(x, w, temporal_pad=pad,
                                            compute_dtype=jnp.float32)
            assert out is not None
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=str((H, W, kt)))

    # unsupported envelope -> None
    assert pallas_stem.stem_conv_s2d(
        jnp.zeros((1, 2, 30, 30, 3)), jnp.zeros((5, 7, 7, 3, 64)),
        temporal_pad=2) is None


def test_pallas_attention_custom_vjp_matches_xla(monkeypatch):
    """Flash-style custom VJP gradients match XLA autodiff (interpret mode)."""
    from jax.experimental import pallas as pl
    from lfb_tpu.ops import pallas_attention as pa
    from lfb_tpu.ops.attention import _attention_xla

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **k: orig(*a, interpret=True, **k))
    monkeypatch.setattr(pa, '_HAS_PALLAS', True)
    monkeypatch.setattr(pa, '_supported', lambda q, k: True)

    rng = np.random.RandomState(0)
    B, Nq, Nk, C = 2, 12, 8, 128
    q = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    k = jnp.asarray(rng.randn(B, Nk, C), jnp.float32)
    v = jnp.asarray(rng.randn(B, Nk, C), jnp.float32)
    scale = C ** -0.5

    def loss_pallas(q, k, v):
        return jnp.sum(pa.fused_attention(q, k, v, scale=scale) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_attention_xla(q, k, v, scale=scale, mask=None,
                                      use_softmax=True) ** 2)

    out_p = pa.fused_attention(q, k, v, scale=scale)
    out_x = _attention_xla(q, k, v, scale=scale, mask=None, use_softmax=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-2, atol=2e-3)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


def test_pallas_stem_custom_vjp_matches_conv3d(monkeypatch):
    """stem_conv_s2d_diff: Pallas forward + XLA-conv backward must match
    the plain conv's value and weight gradient."""
    from lfb_tpu.ops import pallas_stem
    from lfb_tpu.ops.conv3d import conv3d
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **k: orig(*a, interpret=True, **k))

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 64, 96, 3), jnp.float32)
    w = jnp.asarray(0.1 * rng.randn(5, 7, 7, 3, 64), jnp.float32)
    g_out = jnp.asarray(rng.randn(2, 4, 32, 48, 64), jnp.float32)

    def loss_pallas(w):
        out = pallas_stem.stem_conv_s2d_diff(x, w, temporal_pad=2)
        return jnp.sum(out * g_out)

    def loss_xla(w):
        return jnp.sum(conv3d(x, w, strides=(1, 2, 2),
                              padding=(2, 3, 3)) * g_out)

    lp, gp = jax.value_and_grad(loss_pallas)(w)
    lx, gx = jax.value_and_grad(loss_xla)(w)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)

    # Input cotangent defined too (nothing consumes it in training, but
    # differentiating through the stem w.r.t. x must be correct).
    gx_in = jax.grad(lambda x_: jnp.sum(pallas_stem.stem_conv_s2d_diff(
        x_, w, temporal_pad=2) * g_out))(x)
    gref_in = jax.grad(lambda x_: jnp.sum(conv3d(
        x_, w, strides=(1, 2, 2), padding=(2, 3, 3)) * g_out))(x)
    np.testing.assert_allclose(np.asarray(gx_in), np.asarray(gref_in),
                               rtol=1e-4, atol=1e-4)

    # unsupported envelope -> None
    assert pallas_stem.stem_conv_s2d_diff(
        jnp.zeros((1, 2, 30, 30, 3)), jnp.zeros((5, 7, 7, 3, 64)),
        temporal_pad=2) is None


def test_pallas_bottleneck_matches_xla_block(monkeypatch):
    """Fused identity-bottleneck kernel == the XLA bottleneck composition
    (conv + frozen affine + relu chain, identity residual), incl. the
    temporal-pad masking, width-edge masks, and res5-style dilation."""
    from jax.experimental import pallas as pl
    from lfb_tpu.ops import pallas_bottleneck as pb
    from lfb_tpu.ops.conv3d import conv3d

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **k: orig(*a, interpret=True, **k))

    rng = np.random.RandomState(0)
    B, T, H, W, C, Ci = 2, 4, 8, 8, 128, 32

    def xla_block(x, p, kt, d):
        def aff_relu(h, s, b):
            return jax.nn.relu(h * s + b)
        h = conv3d(x, p['w2a'], padding=(kt // 2, 0, 0))
        h = aff_relu(h, p['s1'], p['b1'])
        h = conv3d(h, p['w2b'], padding=(0, d, d), dilation=(1, d, d))
        h = aff_relu(h, p['s2'], p['b2'])
        h = conv3d(h, p['w2c'])
        return jax.nn.relu(h * p['s3'] + p['b3'] + x)

    for kt, d in ((3, 1), (1, 1), (1, 2)):
        p = {
            'w2a': jnp.asarray(rng.randn(kt, 1, 1, C, Ci) * 0.1, jnp.float32),
            's1': jnp.asarray(rng.randn(Ci) * 0.5, jnp.float32),
            'b1': jnp.asarray(rng.randn(Ci) * 0.1, jnp.float32),
            'w2b': jnp.asarray(rng.randn(1, 3, 3, Ci, Ci) * 0.1, jnp.float32),
            's2': jnp.asarray(rng.randn(Ci) * 0.5, jnp.float32),
            'b2': jnp.asarray(rng.randn(Ci) * 0.1, jnp.float32),
            'w2c': jnp.asarray(rng.randn(1, 1, 1, Ci, C) * 0.1, jnp.float32),
            's3': jnp.asarray(rng.randn(C) * 0.5, jnp.float32),
            'b3': jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        }
        x = jnp.asarray(rng.randn(B, T, H, W, C), jnp.float32)
        ref = xla_block(x, p, kt, d)
        out = pb.fused_identity_bottleneck(
            x,
            p['w2a'].reshape(kt, C, Ci) * p['s1'], p['b1'],
            p['w2b'].reshape(9, Ci, Ci) * p['s2'], p['b2'],
            p['w2c'].reshape(Ci, C) * p['s3'], p['b3'],
            temporal_pad=kt // 2, dilation=d)
        assert out is not None, (kt, d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=str((kt, d)))

    # unsupported envelopes -> None (C not x128; HW not x16)
    assert pb.fused_identity_bottleneck(
        jnp.zeros((1, 2, 8, 8, 64)), jnp.zeros((1, 64, 16)), jnp.zeros(16),
        jnp.zeros((9, 16, 16)), jnp.zeros(16), jnp.zeros((16, 64)),
        jnp.zeros(64), temporal_pad=0) is None
    assert pb.fused_identity_bottleneck(
        jnp.zeros((1, 2, 4, 5, 128)), jnp.zeros((1, 128, 32)), jnp.zeros(32),
        jnp.zeros((9, 32, 32)), jnp.zeros(32), jnp.zeros((32, 128)),
        jnp.zeros(128), temporal_pad=0) is None


def test_fold_bottleneck_params_roundtrip():
    """fold_bottleneck_params folds affine scales into conv weights with the
    kernel's layouts."""
    from lfb_tpu.ops.pallas_bottleneck import fold_bottleneck_params

    rng = np.random.RandomState(1)
    C, Ci, kt = 128, 32, 3
    params = {
        'res4_1_branch2a_w': jnp.asarray(rng.randn(kt, 1, 1, C, Ci),
                                         jnp.float32),
        'res4_1_branch2a_bn_s': jnp.asarray(rng.randn(Ci), jnp.float32),
        'res4_1_branch2a_bn_b': jnp.asarray(rng.randn(Ci), jnp.float32),
        'res4_1_branch2b_w': jnp.asarray(rng.randn(1, 3, 3, Ci, Ci),
                                         jnp.float32),
        'res4_1_branch2b_bn_s': jnp.asarray(rng.randn(Ci), jnp.float32),
        'res4_1_branch2b_bn_b': jnp.asarray(rng.randn(Ci), jnp.float32),
        'res4_1_branch2c_w': jnp.asarray(rng.randn(1, 1, 1, Ci, C),
                                         jnp.float32),
        'res4_1_branch2c_bn_s': jnp.asarray(rng.randn(C), jnp.float32),
        'res4_1_branch2c_bn_b': jnp.asarray(rng.randn(C), jnp.float32),
    }
    folded = fold_bottleneck_params(params, 'res4_1')
    assert folded is not None
    w2a, b1, w2b, b2, w2c, b3 = folded
    assert w2a.shape == (kt, C, Ci) and w2b.shape == (9, Ci, Ci)
    assert w2c.shape == (Ci, C)
    np.testing.assert_allclose(
        np.asarray(w2a[1, 3]),
        np.asarray(params['res4_1_branch2a_w'][1, 0, 0, 3]
                   * params['res4_1_branch2a_bn_s']), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w2b[4]),  # center tap (dh=0, dw=0)
        np.asarray(params['res4_1_branch2b_w'][0, 1, 1]
                   * params['res4_1_branch2b_bn_s']), rtol=1e-6)
    assert fold_bottleneck_params({}, 'res4_1') is None


def test_pallas_stem_dw_matches_conv_grad(monkeypatch):
    """stem_conv_s2d_dw (fused weight-gradient kernel) == d/dw of the plain
    XLA conv, incl. the un-roll transpose, kt=1, and cropped-column zeros."""
    from jax.experimental import pallas as pl
    from lfb_tpu.ops import pallas_stem
    from lfb_tpu.ops.conv3d import conv3d

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call',
                        lambda *a, **k: orig(*a, interpret=True, **k))

    rng = np.random.RandomState(4)
    for H, W in ((64, 96), (32, 256)):
        x = jnp.asarray(rng.randn(2, 4, H, W, 3), jnp.float32)
        for kt, pad in ((5, 2), (1, 0)):
            w = jnp.asarray(rng.randn(kt, 7, 7, 3, 64), jnp.float32)
            dy = jnp.asarray(rng.randn(2, 4, H // 2, W // 2, 64), jnp.float32)

            def loss(w_):
                return jnp.sum(conv3d(x, w_, strides=(1, 2, 2),
                                      padding=(pad, 3, 3)) * dy)

            ref = jax.grad(loss)(w)
            got = pallas_stem.stem_conv_s2d_dw(
                x, dy, w.shape, temporal_pad=pad,
                compute_dtype=jnp.float32)
            assert got is not None, (H, W, kt)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-3,
                                       err_msg=str((H, W, kt)))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lfb_tpu.ops import (affine_nd, avg_pool_3d, conv3d, max_pool_2d,
                         max_pool_3d, roi_align, scaled_softmax_attention)


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


# --------------------------------------------------------------------------- #
# conv3d vs torch
# --------------------------------------------------------------------------- #

@pytest.mark.parametrize('kt,stride,pad,dil', [
    (5, (1, 2, 2), (2, 3, 3), (1, 1, 1)),   # conv1-style
    (3, (1, 1, 1), (1, 0, 0), (1, 1, 1)),   # branch2a temporal
    (1, (1, 2, 2), (0, 1, 1), (1, 1, 1)),   # branch2b stride-2
    (1, (1, 1, 1), (0, 2, 2), (1, 2, 2)),   # res5 dilated
])
def test_conv3d_matches_torch(kt, stride, pad, dil):
    torch = pytest.importorskip('torch')
    x = rand(2, 8, 12, 12, 3)
    kh = 3 if kt == 1 else (7 if kt == 5 else 1)
    w = rand(kt, kh, kh, 3, 4, seed=1)
    out = conv3d(jnp.array(x), jnp.array(w), strides=stride, padding=pad,
                 dilation=dil)
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    tw = torch.tensor(w).permute(4, 3, 0, 1, 2)
    ref = torch.nn.functional.conv3d(
        tx, tw, stride=stride, padding=pad, dilation=dil)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pooling_matches_torch():
    torch = pytest.importorskip('torch')
    x = rand(2, 8, 12, 12, 5)
    out = max_pool_3d(jnp.array(x), (1, 3, 3), (1, 2, 2), (0, 1, 1))
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    ref = torch.nn.functional.max_pool3d(
        tx, (1, 3, 3), (1, 2, 2), (0, 1, 1)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref)

    out2 = max_pool_3d(jnp.array(x), (2, 1, 1), (2, 1, 1))
    ref2 = torch.nn.functional.max_pool3d(
        tx, (2, 1, 1), (2, 1, 1)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out2), ref2)

    out3 = avg_pool_3d(jnp.array(x), (4, 6, 6), (1, 1, 1))
    ref3 = torch.nn.functional.avg_pool3d(
        tx, (4, 6, 6), (1, 1, 1)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out3), ref3, rtol=1e-5, atol=1e-6)


def test_affine_frozen_gradients():
    x = jnp.array(rand(4, 3))
    s = jnp.array([2.0, 3.0, 4.0])
    b = jnp.array([1.0, -1.0, 0.5])

    def f(x, s, b):
        return jnp.sum(affine_nd(x, s, b) ** 2)

    gx, gs, gb = jax.grad(f, argnums=(0, 1, 2))(x, s, b)
    # dX flows through scale; scale/bias grads are exactly zero (frozen).
    assert np.abs(np.asarray(gx)).sum() > 0
    np.testing.assert_array_equal(np.asarray(gs), 0)
    np.testing.assert_array_equal(np.asarray(gb), 0)


# --------------------------------------------------------------------------- #
# attention
# --------------------------------------------------------------------------- #

def test_attention_matches_numpy():
    q, k, v = rand(2, 5, 8), rand(2, 7, 8, seed=1), rand(2, 7, 8, seed=2)
    scale = 8 ** -0.5
    out = scaled_softmax_attention(jnp.array(q), jnp.array(k), jnp.array(v),
                                   scale=scale, use_pallas=False)
    logits = np.einsum('bqc,bkc->bqk', q, k) * scale
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum('bqk,bkc->bqc', p, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_attention_no_softmax_mean_aggregation():
    q, k, v = rand(1, 3, 4), rand(1, 6, 4, seed=1), rand(1, 6, 4, seed=2)
    out = scaled_softmax_attention(jnp.array(q), jnp.array(k), jnp.array(v),
                                   use_softmax=False, use_pallas=False)
    p = np.einsum('bqc,bkc->bqk', q, k) / 6.0
    ref = np.einsum('bqk,bkc->bqc', p, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------- #
# RoIAlign vs a scalar transcription of legacy Caffe2 semantics
# --------------------------------------------------------------------------- #

def _roi_align_scalar(feats, rois, pooled, scale):
    """Direct scalar implementation of legacy (aligned=False) RoIAlign with
    sampling_ratio=0 adaptive gridding."""
    B, H, W, C = feats.shape
    N = rois.shape[0]
    out = np.zeros((N, pooled, pooled, C), np.float32)

    def bilinear(img, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y, x = max(y, 0.0), max(x, 0.0)
        y_lo, x_lo = int(np.floor(y)), int(np.floor(x))
        if y_lo >= H - 1:
            y_lo = y_hi = H - 1
            y = float(y_lo)
        else:
            y_hi = y_lo + 1
        if x_lo >= W - 1:
            x_lo = x_hi = W - 1
            x = float(x_lo)
        else:
            x_hi = x_lo + 1
        ly, lx = y - y_lo, x - x_lo
        return ((1 - ly) * (1 - lx) * img[y_lo, x_lo]
                + (1 - ly) * lx * img[y_lo, x_hi]
                + ly * (1 - lx) * img[y_hi, x_lo]
                + ly * lx * img[y_hi, x_hi])

    for n in range(N):
        b, x1, y1, x2, y2 = rois[n]
        img = feats[int(b)]
        x1, y1, x2, y2 = x1 * scale, y1 * scale, x2 * scale, y2 * scale
        rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        bw, bh = rw / pooled, rh / pooled
        gw, gh = int(np.ceil(rw / pooled)), int(np.ceil(rh / pooled))
        for ph in range(pooled):
            for pw in range(pooled):
                acc = np.zeros(C, np.float32)
                for iy in range(gh):
                    yy = y1 + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        xx = x1 + pw * bw + (ix + 0.5) * bw / gw
                        acc += bilinear(img, yy, xx)
                out[n, ph, pw] = acc / (gh * gw)
    return out


def test_roi_align_matches_scalar_reference():
    feats = rand(2, 14, 14, 6)
    rois = np.array([
        [0, 0.0, 0.0, 224.0, 224.0],
        [0, 32.0, 48.0, 120.0, 200.0],
        [1, 5.5, 3.25, 60.75, 90.5],
        [1, 200.0, 200.0, 222.0, 222.0],
        [0, 0.0, 0.0, 0.0, 0.0],          # degenerate (padding) box
    ], np.float32)
    out = roi_align(jnp.array(feats), jnp.array(rois), pooled_h=7, pooled_w=7,
                    spatial_scale=1 / 16.0)
    ref = _roi_align_scalar(feats, rois, 7, 1 / 16.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_roi_align_fixed_sampling_ratio():
    feats = rand(1, 8, 8, 3)
    rois = np.array([[0, 10.0, 10.0, 100.0, 80.0]], np.float32)
    out = roi_align(jnp.array(feats), jnp.array(rois), pooled_h=4, pooled_w=4,
                    spatial_scale=1 / 16.0, sampling_ratio=2)
    assert out.shape == (1, 4, 4, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_conv1_space_to_depth_equivalence():
    from lfb_tpu.ops.conv3d import conv1_space_to_depth
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(2, 6, 16, 16, 3).astype(np.float32))
    w = jnp.array(rng.randn(5, 7, 7, 3, 8).astype(np.float32))
    ref = conv3d(x, w, strides=(1, 2, 2), padding=(2, 3, 3))
    out = conv1_space_to_depth(x, w, temporal_pad=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # C2D stem (kT=1, pad 0) must also match.
    w1 = jnp.array(rng.randn(1, 7, 7, 3, 8).astype(np.float32))
    ref1 = conv3d(x, w1, strides=(1, 2, 2), padding=(0, 3, 3))
    out1 = conv1_space_to_depth(x, w1, temporal_pad=0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               rtol=1e-4, atol=1e-4)

"""Certify the Caffe2 importer against released-checkpoint blob structure.

``released_blob_manifest`` transcribes the reference builder's blob
naming/shape rules (``lfb_tpu/train/c2_manifest.py``, citations inline).
These tests prove that for every shipped YAML config:

  * every blob a released ``model_final.pkl`` contains maps into the
    lfb_tpu parameter pytree (zero unknown names), and
  * every pytree parameter is covered by a released blob (zero missing
    names), and
  * ``c2_to_tpu`` / ``tpu_to_c2`` convert each blob's layout exactly.

If the importer's name map would fail to load any released blob, these
tests fail.
"""

import glob
import os

import numpy as np
import pytest

import jax

from lfb_tpu.core import config as C
from lfb_tpu.models import build_spec, init_params
from lfb_tpu.train.c2_manifest import released_blob_manifest
from lfb_tpu.train.checkpoints import (c2_to_tpu, convert_pretrained,
                                       tpu_to_c2)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')
ALL_CONFIGS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(CONFIG_DIR, '*.yaml')))


def load_cfg(name):
    cfg = C.load_config(os.path.join(CONFIG_DIR, name))
    return C.finalize(cfg)


def param_shapes(cfg):
    """Pytree name -> shape via eval_shape (no materialization)."""
    spec = build_spec(cfg, 'train')
    tree = jax.eval_shape(lambda k: init_params(k, spec),
                          jax.random.PRNGKey(0))
    return {k: tuple(v.shape) for k, v in tree.items()}


@pytest.mark.parametrize('name', ALL_CONFIGS)
def test_released_blobs_map_bidirectionally(name):
    cfg = load_cfg(name)
    manifest = released_blob_manifest(cfg)
    params = param_shapes(cfg)

    unknown = sorted(set(manifest) - set(params))
    missing = sorted(set(params) - set(manifest))
    assert not unknown, 'released blobs with no pytree target: %s' % unknown
    assert not missing, 'pytree params no released blob covers: %s' % missing

    for blob, c2_shape in manifest.items():
        got = c2_to_tpu(blob, np.zeros(c2_shape, np.float32), params[blob])
        assert got is not None and got.shape == params[blob], blob
        back = tpu_to_c2(blob, got)
        assert back.shape == tuple(c2_shape), blob


def test_bn_mode_manifest_covers_running_stats():
    """Pretrain-style checkpoints (USE_AFFINE=False) carry _bn_rm/_bn_riv."""
    cfg = load_cfg('charades_r50_baseline.yaml')
    cfg = C.clone(cfg, {'MODEL.USE_AFFINE': False,
                        'NONLOCAL.USE_AFFINE': False,
                        'NONLOCAL.USE_BN': True})
    manifest = released_blob_manifest(cfg)
    assert 'res2_0_branch2a_bn_rm' in manifest
    assert 'nonlocal_conv3_1_bn_riv' in manifest
    params = param_shapes(cfg)
    assert set(manifest) == set(params)
    for blob, c2_shape in manifest.items():
        got = c2_to_tpu(blob, np.zeros(c2_shape, np.float32), params[blob])
        assert got is not None and got.shape == params[blob], blob


def test_convert_pretrained_turns_bn_manifest_into_affine_manifest():
    """CONVERT_MODEL (BN->affine fold + classifier strip,
    reference ``checkpoints.py:88-177``) must map a BN-mode released
    checkpoint exactly onto the affine-mode pytree minus the classifier."""
    cfg_bn = C.clone(load_cfg('ava_r50_lfb_nl.yaml'),
                     {'MODEL.USE_AFFINE': False, 'NONLOCAL.USE_AFFINE': False,
                      'NONLOCAL.USE_BN': True})
    cfg_affine = load_cfg('ava_r50_lfb_nl.yaml')
    assert cfg_affine.MODEL.USE_AFFINE and cfg_affine.NONLOCAL.USE_AFFINE

    bn_blobs = {k: np.zeros(s, np.float32) + (1.0 if k.endswith('_bn_s')
                                              or k.endswith('_bn_riv') else 0.)
                for k, s in released_blob_manifest(cfg_bn).items()}
    folded = convert_pretrained(bn_blobs)
    affine = released_blob_manifest(cfg_affine)
    expect = {k for k in affine if not k.startswith('pred_')}
    assert set(folded) == expect


def test_2d_inflation_matches_reference_semantics():
    """ImageNet-style 2D kernels inflate over kT and divide by kT
    (reference ``checkpoints.py:336-362``)."""
    k2d = np.random.RandomState(0).randn(64, 3, 7, 7).astype(np.float32)
    out = c2_to_tpu('conv1_w', k2d, (5, 7, 7, 3, 64))
    assert out.shape == (5, 7, 7, 3, 64)
    want = np.transpose(k2d, (2, 3, 1, 0)) / 5.0
    for t in range(5):
        np.testing.assert_allclose(out[t], want, rtol=1e-6)

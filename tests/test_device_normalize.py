"""TPU.DEVICE_NORMALIZE parity: raw-uint8 host path + on-device
normalization must produce bit-identical model inputs (and therefore
identical logits) to the float host pipeline."""

import numpy as np
import pytest

import jax

from lfb_tpu.core import config as C
from lfb_tpu.data import transforms


def _cfg(device_normalize: bool):
    cfg = C.default_config()
    cfg.NUM_GPUS = 1
    cfg.TPU.DEVICE_NORMALIZE = device_normalize
    return C.finalize(cfg)


def test_uint8_path_matches_float_path_exactly():
    pytest.importorskip('cv2')
    cfg = _cfg(True)
    rng_img = np.random.RandomState(0)
    clip = rng_img.randint(0, 256, (4, 48, 64, 3), np.uint8)

    f32, _ = transforms.preprocess_clip(
        clip.copy(), is_train=True, crop_size=32, cfg=cfg,
        rng=np.random.default_rng(7))
    u8, _ = transforms.preprocess_clip(
        clip.copy(), is_train=True, crop_size=32, cfg=cfg,
        rng=np.random.default_rng(7), output_uint8=True)
    assert u8.dtype == np.uint8 and f32.dtype == np.float32

    # Device-side normalization (same math as model.forward).
    mean = np.asarray(cfg.DATA_MEAN[::-1], np.float32)   # RGB order
    std = np.asarray(cfg.DATA_STD[::-1], np.float32)
    dev = (u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_array_equal(dev, f32)


def test_color_augmentation_forces_float_path(tmp_path):
    pytest.importorskip('cv2')
    cfg = _cfg(True)
    clip = np.zeros((2, 40, 40, 3), np.uint8)
    with pytest.raises(AssertionError):
        cfg2 = C.clone(cfg, {'TRAIN.USE_COLOR_AUGMENTATION': True})
        transforms.preprocess_clip(clip, is_train=True, crop_size=32,
                                   cfg=cfg2, rng=np.random.default_rng(0),
                                   output_uint8=True)


def test_end_to_end_logits_match(tmp_path):
    pytest.importorskip('cv2')
    from tests import synthetic
    from lfb_tpu.data.loader import get_input_db
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train.steps import make_eval_step

    overrides = synthetic.build_charades(str(tmp_path))
    outs = {}
    for dev_norm in (False, True):
        cfg = C.default_config()
        synthetic.apply_overrides(cfg, overrides)
        cfg.TRAIN.VIDEO_LENGTH = cfg.TEST.VIDEO_LENGTH = 4
        cfg.TRAIN.SAMPLE_RATE = cfg.TEST.SAMPLE_RATE = 2
        cfg.TRAIN.CROP_SIZE = cfg.TEST.CROP_SIZE = 32
        cfg.TEST.SCALE = 36
        cfg.TRAIN.BATCH_SIZE = cfg.TEST.BATCH_SIZE = 2
        cfg.NUM_GPUS = 1
        cfg.TPU.COMPUTE_DTYPE = 'float32'
        cfg.TPU.USE_PALLAS = False
        cfg.TPU.DEVICE_NORMALIZE = dev_norm
        cfg = C.finalize(cfg)

        db = get_input_db(cfg, 'val')
        batch = db.minibatch([0, 1], np.random.default_rng(3))
        assert batch['data'].dtype == (np.uint8 if dev_norm else np.float32)

        spec = build_spec(cfg, 'val')
        params = init_params(jax.random.PRNGKey(0), spec)
        outs[dev_norm] = np.asarray(
            make_eval_step(spec)(params, batch)['logits'])

    # XLA may fuse the normalization as multiply-by-reciprocal; inputs agree
    # to the last ulp, logits to ~1e-5.
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4, atol=1e-4)

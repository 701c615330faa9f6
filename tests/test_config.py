import os

import pytest

from lfb_tpu.core import config as C

REF_CONFIGS = '/root/reference/configs'


def test_defaults_finalize():
    cfg = C.finalize(C.default_config())
    assert cfg.SOLVER.STEPS == [0, 100000, 120000, 140000]
    assert cfg.LFB.NUM_LFB_FEAT == 5 * 100


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS),
                    reason='reference configs unavailable')
def test_all_reference_yamls_load():
    for name in sorted(os.listdir(REF_CONFIGS)):
        if not name.endswith('.yaml'):
            continue
        cfg = C.load_config(os.path.join(REF_CONFIGS, name))
        assert cfg.MODEL.NUM_CLASSES > 0, name
        assert cfg.DATASET in ('ava', 'charades', 'epic'), name


def test_cli_overrides():
    cfg = C.default_config()
    C.merge_cfg_from_list(cfg, ['TRAIN.BATCH_SIZE', '16',
                                'LFB.FBO_TYPE', 'max',
                                'SOLVER.BASE_LR', '0.04',
                                'MODEL.USE_AFFINE', 'True'])
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.LFB.FBO_TYPE == 'max'
    assert cfg.SOLVER.BASE_LR == 0.04
    assert cfg.MODEL.USE_AFFINE is True


def test_unknown_key_rejected():
    cfg = C.default_config()
    with pytest.raises(KeyError):
        C.merge_dict_into(cfg, {'BOGUS': 1})


def test_type_mismatch_rejected():
    cfg = C.default_config()
    with pytest.raises(ValueError):
        C.merge_dict_into(cfg, {'TRAIN': {'BATCH_SIZE': 'not-a-number'}})


def test_clone_does_not_alias():
    cfg = C.finalize(C.default_config())
    new = C.clone(cfg, {'TEST.SCALE': 320, 'TEST.CROP_SIZE': 320})
    assert new.TEST.SCALE == 320 and cfg.TEST.SCALE == 256
    new.AVA.TRAIN_LISTS.append('x.csv')
    assert cfg.AVA.TRAIN_LISTS == ['train.csv']

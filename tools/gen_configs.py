#!/usr/bin/env python
"""Generate the full experiment-config matrix under configs/.

The reference ships 26 hand-written YAMLs (10 AVA, 8 Charades, 8 EPIC);
here they are generated from one experiment table so hyperparameters live
in a single audited place.  Values follow the reference configs and
BASELINE.md rows exactly.
"""

import copy
import os
import sys

import yaml

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs')


def base(dataset, num_classes, multi_label):
    return {
        'DATASET': dataset,
        'DATADIR': 'data/{}/frames'.format(dataset),
        'NUM_GPUS': 8,
        'LOG_PERIOD': 10,
        'MODEL': {
            'NUM_CLASSES': num_classes,
            'MODEL_NAME': 'resnet_video',
            'BN_MOMENTUM': 0.9,
            'BN_EPSILON': 1.0000001e-5,
            'BN_INIT_GAMMA': 0.0,
            'DEPTH': 50,
            'VIDEO_ARC_CHOICE': 2,
            'MULTI_LABEL': multi_label,
            'USE_AFFINE': True,
            'MEMONGER': True,
        },
        'RESNETS': {
            'NUM_GROUPS': 1,
            'WIDTH_PER_GROUP': 64,
            'TRANS_FUNC': 'bottleneck_transformation_3d',
        },
        'TRAIN': {
            'DATA_TYPE': 'train',
            'BATCH_SIZE': 16,
            'EVAL_PERIOD': 4000,
            'JITTER_SCALES': [256, 320],
            'COMPUTE_PRECISE_BN': False,
            'CROP_SIZE': 224,
            'VIDEO_LENGTH': 32,
            'SAMPLE_RATE': 2,
            'DROPOUT_RATE': 0.3,
            'PARAMS_FILE': 'pretrained_weights/r50_k400_pretrained.pkl',
            'RESET_START_ITER': True,
        },
        'TEST': {
            'DATA_TYPE': 'val',
            'BATCH_SIZE': 16,
            'CROP_SIZE': 256,
            'SCALE': 256,
            'VIDEO_LENGTH': 32,
            'SAMPLE_RATE': 2,
        },
        'SOLVER': {
            'LR_POLICY': 'steps_with_relative_lrs',
            'LRS': [1, 0.1, 0.01],
            'WEIGHT_DECAY_BN': 0.0,
            'MOMENTUM': 0.9,
            'NESTEROV': True,
            'SCALE_MOMENTUM': True,
        },
        'CHECKPOINT': {
            'DIR': '.',
            'CHECKPOINT_PERIOD': 4000,
            'CONVERT_MODEL': True,
        },
        'NONLOCAL': {
            'USE_ZERO_INIT_CONV': True,
            'USE_BN': False,
            'USE_AFFINE': True,
            'CONV3_NONLOCAL': True,
            'CONV4_NONLOCAL': True,
            'USE_SCALE': True,
        },
    }


def deep_update(d, u):
    for k, v in u.items():
        if isinstance(v, dict):
            d[k] = deep_update(d.get(k, {}), v)
        else:
            d[k] = v
    return d


def with_r101(c):
    deep_update(c, {'MODEL': {'DEPTH': 101, 'VIDEO_ARC_CHOICE': 4},
                    'TRAIN': {'PARAMS_FILE':
                              'pretrained_weights/r101_k400_pretrained.pkl'}})
    return c


def with_lfb(c, fbo_type, window, extra_lfb=None, extra_fbo=None):
    lfb = {'ENABLED': True, 'FBO_TYPE': fbo_type, 'WRITE_LFB': True,
           'LOAD_LFB': False, 'LOAD_LFB_PATH': '', 'WINDOW_SIZE': window,
           'MODEL_PARAMS_FILE': ''}
    if extra_lfb:
        lfb.update(extra_lfb)
    c['LFB'] = lfb
    if extra_fbo:
        c['FBO_NL'] = dict(c.get('FBO_NL', {}), **extra_fbo)
    return c


def ava_base():
    c = base('ava', 80, True)
    deep_update(c, {
        'TRAIN': {'EVAL_PERIOD': 8000, 'DATASET_SIZE': 235},
        'TEST': {'DATASET_SIZE': 64},
        'SOLVER': {'BASE_LR': 0.04, 'STEP_SIZES': [100000, 20000, 20000],
                   'LRS': [1, 0.1, 0.01, 0.001], 'MAX_ITER': 140000,
                   'WEIGHT_DECAY': 0.000001,
                   'WARMUP': {'WARMUP_ON': True, 'WARMUP_START_LR': 0.01,
                              'WARMUP_END_ITER': 2000}},
        'AVA': {'ANNOTATION_DIR': 'data/ava/annotations',
                'DETECTION_SCORE_THRESH_TRAIN': 0.9,
                'DETECTION_SCORE_THRESH_EVAL': [0.85],
                'LFB_DETECTION_SCORE_THRESH': 0.9,
                'TEST_MULTI_CROP': False,
                'TEST_MULTI_CROP_SCALES': [224, 256, 320]},
    })
    return c


def epic_base(class_type):
    num_classes = 125 if class_type == 'verb' else 352
    c = base('epic', num_classes, False)
    deep_update(c, {
        'MODEL': {'DILATIONS_AFTER_CONV5': False},
        'TRAIN': {'DATASET_SIZE': 23191},
        'TEST': {'DATASET_SIZE': 5281},
        'SOLVER': {'BASE_LR': 0.001, 'STEP_SIZES': [28000, 4000, 4000],
                   'MAX_ITER': 36000, 'WEIGHT_DECAY': 0.000001},
        'EPIC': {'FRAME_LIST_DIR': 'data/epic/frame_lists',
                 'ANNOTATION_DIR': 'data/epic/annotations',
                 'CLASS_TYPE': class_type},
    })
    if class_type == 'noun':
        deep_update(c, {
            'TRAIN': {'EVAL_PERIOD': 5000},
            'SOLVER': {'BASE_LR': 0.0003, 'STEP_SIZES': [40000, 5000, 5000],
                       'MAX_ITER': 50000, 'WEIGHT_DECAY': 0.00001},
        })
    return c


def charades_base(stage2):
    c = base('charades', 157, True)
    deep_update(c, {
        'TRAIN': {'SAMPLE_RATE': 4, 'DATASET_SIZE': 7811},
        'TEST': {'SAMPLE_RATE': 4, 'DATASET_SIZE': 1814},
        'SOLVER': {'BASE_LR': 0.02, 'WEIGHT_DECAY': 0.0000125,
                   'LRS': [1, 0.1]},
        'CHARADES': {'LFB_CLIPS_PER_SECOND': 2},
    })
    if stage2:
        # Stage-2 (LFB) training: frozen backbone fine-tune from stage-1.
        deep_update(c, {
            'MODEL': {'FREEZE_BACKBONE': True},
            'TRAIN': {'PARAMS_FILE': ''},
            'SOLVER': {'STEP_SIZES': [10000, 2000], 'MAX_ITER': 12000},
            'CHECKPOINT': {'CONVERT_MODEL': False},
        })
    else:
        deep_update(c, {
            'SOLVER': {'STEP_SIZES': [20000, 4000], 'MAX_ITER': 24000},
        })
    return c


def build_all():
    configs = {}

    # AVA: baseline + avg/max/nl/nl_3l, R50 and R101.
    for depth in (50, 101):
        tag = 'r{}'.format(depth)
        for variant in ('baseline', 'lfb_avg', 'lfb_max', 'lfb_nl',
                        'lfb_nl_3l'):
            c = ava_base()
            if depth == 101:
                with_r101(c)
            if variant != 'baseline':
                fbo = {'lfb_avg': 'avg', 'lfb_max': 'max',
                       'lfb_nl': 'nl', 'lfb_nl_3l': 'nl'}[variant]
                extra_fbo = {'NUM_LAYERS': 3} if variant == 'lfb_nl_3l' else None
                with_lfb(c, fbo, 60, extra_fbo=extra_fbo)
            configs['ava_{}_{}'.format(tag, variant)] = c

    # EPIC verb/noun x baseline/avg/max/nl.
    for class_type in ('verb', 'noun'):
        for variant in ('baseline', 'lfb_avg', 'lfb_max', 'lfb_nl'):
            c = epic_base(class_type)
            if variant != 'baseline':
                fbo = variant.replace('lfb_', '')
                if class_type == 'noun':
                    # Noun banks come from the released object detector
                    # features and are loaded, not inferred.
                    deep_update(c, {'EPIC': {
                        'MAX_NUM_FEATS_PER_NOUN_LFB_FRAME': 10,
                        'NOUN_LFB_FRAMES_PER_SECOND': 1}})
                    with_lfb(c, fbo, 120,
                             extra_lfb={'LOAD_LFB': True, 'WRITE_LFB': False,
                                        'LOAD_LFB_PATH': 'data/epic/noun_lfb'})
                else:
                    with_lfb(c, fbo, 40)
            configs['epic_{}_r50_{}'.format(class_type, variant)] = c

    # Charades R50/R101 x baseline/avg/max/nl.
    for depth in (50, 101):
        tag = 'r{}'.format(depth)
        for variant in ('baseline', 'lfb_avg', 'lfb_max', 'lfb_nl'):
            c = charades_base(stage2=variant != 'baseline')
            if depth == 101:
                with_r101(c)
                deep_update(c, {'MODEL': {'DILATIONS_AFTER_CONV5': False}})
            if variant != 'baseline':
                with_lfb(c, variant.replace('lfb_', ''), 20,
                         extra_fbo={'PRE_ACT': False})
            configs['charades_{}_{}'.format(tag, variant)] = c

    return configs


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    configs = build_all()
    for name, cfg in sorted(configs.items()):
        path = os.path.join(OUT_DIR, name + '.yaml')
        with open(path, 'w') as f:
            yaml.safe_dump(cfg, f, sort_keys=True, default_flow_style=None)
    print('Wrote {} configs to {}'.format(len(configs), OUT_DIR))


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Parity harness: evaluate released reference weights and compare against
the published BASELINE.md numbers.

Usage (with datasets prepared per DATASET.md and the reference's released
``model_final.pkl`` / ``lfb_model.pkl`` downloaded):

  python tools/parity_eval.py --config ava_r50_baseline \\
      --params runs/ava_r50_baseline/model_final.pkl
  python tools/parity_eval.py --config epic_verb_r50_lfb_nl \\
      --params model_final.pkl --lfb_params lfb_model.pkl

Runs the full test flow (incl. bank inference for LFB configs and
multi-crop when the config requests it), prints the achieved metric next to
the expected value, and exits nonzero when outside tolerance.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORMAT = '[%(levelname)s: %(filename)s: %(lineno)4d]: %(message)s'
logging.basicConfig(level=logging.INFO, format=FORMAT, stream=sys.stdout)
logger = logging.getLogger(__name__)

# Published validation results (BASELINE.md; reference README.md:38-98).
EXPECTED = {
    'ava_r50_baseline': ('full_map', 22.2),
    'ava_r50_lfb_avg': ('full_map', 23.3),
    'ava_r50_lfb_max': ('full_map', 23.9),
    'ava_r50_lfb_nl': ('full_map', 25.8),
    'ava_r50_lfb_nl_3l': ('full_map', 25.9),
    'ava_r101_baseline': ('full_map', 23.2),
    'ava_r101_lfb_nl_3l': ('full_map', 26.9),
    'epic_verb_r50_baseline': ('top1', 50.7),
    'epic_verb_r50_lfb_avg': ('top1', 52.9),
    'epic_verb_r50_lfb_max': ('top1', 53.3),
    'epic_verb_r50_lfb_nl': ('top1', 52.3),
    'epic_noun_r50_baseline': ('top1', 26.2),
    'epic_noun_r50_lfb_avg': ('top1', 29.1),
    'epic_noun_r50_lfb_max': ('top1', 32.0),
    'epic_noun_r50_lfb_nl': ('top1', 29.5),
    'charades_r50_baseline': ('full_map', 38.3),
    'charades_r50_lfb_avg': ('full_map', 38.4),
    'charades_r50_lfb_max': ('full_map', 38.6),
    'charades_r50_lfb_nl': ('full_map', 40.3),
    'charades_r101_baseline': ('full_map', 40.4),
    'charades_r101_lfb_avg': ('full_map', 40.8),
    'charades_r101_lfb_max': ('full_map', 41.0),
    'charades_r101_lfb_nl': ('full_map', 42.5),
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config', required=True,
                        help='config name (e.g. ava_r50_baseline) or path')
    parser.add_argument('--params', required=True,
                        help='released model_final.pkl')
    parser.add_argument('--lfb_params', default='',
                        help='released lfb_model.pkl (LFB configs)')
    parser.add_argument('--tolerance', type=float, default=0.5,
                        help='allowed absolute metric gap (default 0.5)')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    name = os.path.splitext(os.path.basename(args.config))[0]
    config_path = (args.config if os.path.isfile(args.config)
                   else os.path.join(os.path.dirname(__file__), '..',
                                     'configs', name + '.yaml'))

    from lfb_tpu.core.config import load_config
    from test_net import test_net

    overrides = ['TEST.PARAMS_FILE', args.params]
    if args.lfb_params:
        overrides += ['LFB.MODEL_PARAMS_FILE', args.lfb_params]
    cfg = load_config(config_path, overrides + (args.opts or []))

    metrics = test_net(cfg)
    if isinstance(metrics, float):   # AVA multi-crop returns the final mAP
        metrics = {'full_map': metrics}

    kind, expected = EXPECTED.get(name, (None, None))
    if kind is None:
        logger.info('No published number for %s; metrics: %s', name, metrics)
        return
    if kind == 'top1':
        achieved = 100.0 - metrics['err']
    else:
        achieved = metrics['full_map'] * (100.0 if metrics['full_map'] <= 1.0
                                          else 1.0)
    gap = achieved - expected
    status = 'OK' if gap >= -args.tolerance else 'BELOW'
    print('PARITY[{}] {}: achieved {:.2f} vs published {:.2f} ({}{:.2f}) {}'
          .format(status, name, achieved, expected,
                  '+' if gap >= 0 else '', gap,
                  '' if status == 'OK' else '(outside tolerance)'))
    if status != 'OK':
        sys.exit(1)


if __name__ == '__main__':
    main()

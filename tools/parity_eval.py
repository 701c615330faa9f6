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


def run_one(name: str, config_path: str, params: str, lfb_params: str,
            tolerance: float, opts=None) -> bool:
    """Evaluate one config against its published number.  True = within
    tolerance (or no published number)."""
    from lfb_tpu.core.config import load_config
    from test_net import test_net

    overrides = ['TEST.PARAMS_FILE', params]
    if lfb_params:
        overrides += ['LFB.MODEL_PARAMS_FILE', lfb_params]
    cfg = load_config(config_path, overrides + (opts or []))

    metrics = test_net(cfg)
    if isinstance(metrics, float):   # AVA multi-crop returns the final mAP
        metrics = {'full_map': metrics}

    kind, expected = EXPECTED.get(name, (None, None))
    if kind is None:
        logger.info('No published number for %s; metrics: %s', name, metrics)
        return True
    if kind == 'top1':
        achieved = 100.0 - metrics['err']
    else:
        achieved = metrics['full_map'] * (100.0 if metrics['full_map'] <= 1.0
                                          else 1.0)
    gap = achieved - expected
    status = 'OK' if gap >= -tolerance else 'BELOW'
    print('PARITY[{}] {}: achieved {:.2f} vs published {:.2f} ({}{:.2f}) {}'
          .format(status, name, achieved, expected,
                  '+' if gap >= 0 else '', gap,
                  '' if status == 'OK' else '(outside tolerance)'))
    return status == 'OK'


def auto_discover(weights_dir: str):
    """Yield (name, params, lfb_params) for every EXPECTED config whose
    released weights exist under ``weights_dir/{name}/`` and whose dataset
    is prepared (config DATADIR present)."""
    from lfb_tpu.core.config import load_config
    config_dir = os.path.join(os.path.dirname(__file__), '..', 'configs')
    for name in sorted(EXPECTED):
        params = os.path.join(weights_dir, name, 'model_final.pkl')
        if not os.path.isfile(params):
            continue
        cfg = load_config(os.path.join(config_dir, name + '.yaml'))
        if not os.path.isdir(cfg.DATADIR):
            logger.info('%s: weights present but DATADIR %s missing; skipped',
                        name, cfg.DATADIR)
            continue
        lfb_params = os.path.join(weights_dir, name, 'lfb_model.pkl')
        if cfg.LFB.ENABLED and not os.path.isfile(lfb_params):
            logger.info('%s: LFB config but no lfb_model.pkl; skipped', name)
            continue
        yield name, params, (lfb_params if cfg.LFB.ENABLED else '')


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config',
                        help='config name (e.g. ava_r50_baseline) or path')
    parser.add_argument('--params',
                        help='released model_final.pkl')
    parser.add_argument('--lfb_params', default='',
                        help='released lfb_model.pkl (LFB configs)')
    parser.add_argument('--auto', default='',
                        help='weights root: run every config with '
                             '{auto}/{name}/model_final.pkl + prepared data')
    parser.add_argument('--tolerance', type=float, default=0.5,
                        help='allowed absolute metric gap (default 0.5)')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if args.auto:
        found = list(auto_discover(args.auto))
        if not found:
            logger.info('auto mode: no (weights, data) pairs under %s',
                        args.auto)
            return
        config_dir = os.path.join(os.path.dirname(__file__), '..', 'configs')
        results = [run_one(name, os.path.join(config_dir, name + '.yaml'),
                           params, lfb, args.tolerance, args.opts)
                   for name, params, lfb in found]
        print('PARITY SUMMARY: {}/{} within tolerance'.format(
            sum(results), len(results)))
        if not all(results):
            sys.exit(1)
        return

    assert args.config and args.params, '--config/--params (or --auto) required'
    name = os.path.splitext(os.path.basename(args.config))[0]
    config_path = (args.config if os.path.isfile(args.config)
                   else os.path.join(os.path.dirname(__file__), '..',
                                     'configs', name + '.yaml'))
    if not run_one(name, config_path, args.params, args.lfb_params,
                   args.tolerance, args.opts):
        sys.exit(1)


if __name__ == '__main__':
    main()

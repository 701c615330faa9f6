#!/usr/bin/env python
"""Construct / write / load a long-term feature bank (CLI-compatible with
the reference ``tools/lfb_loader.py``).

Usage:
  python tools/lfb_loader.py --config_file configs/X.yaml \
      LFB.MODEL_PARAMS_FILE baseline.pkl LFB.WRITE_LFB True [KEY VALUE ...]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORMAT = '[%(levelname)s: %(filename)s: %(lineno)4d]: %(message)s'
logging.basicConfig(level=logging.INFO, format=FORMAT, stream=sys.stdout)
logger = logging.getLogger(__name__)


def main():
    parser = argparse.ArgumentParser(description='LFB construction')
    parser.add_argument('--config_file', type=str, required=True)
    parser.add_argument('--splits', type=str, default='train,val',
                        help='comma-separated: train, val')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from lfb_tpu.bank import get_lfb
    from lfb_tpu.core.config import load_config
    cfg = load_config(args.config_file, args.opts or [])

    for split in args.splits.split(','):
        is_train = split.strip() == 'train'
        lfb = get_lfb(cfg, cfg.LFB.MODEL_PARAMS_FILE, is_train=is_train)
        logger.info('%s bank: %d videos', split, len(lfb))


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Train a video model (CLI-compatible with the reference ``tools/train_net.py``).

Usage:
  python tools/train_net.py --config_file configs/X.yaml [KEY VALUE ...]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORMAT = '[%(levelname)s: %(filename)s: %(lineno)4d]: %(message)s'
logging.basicConfig(level=logging.INFO, format=FORMAT, stream=sys.stdout)
logger = logging.getLogger(__name__)


def train(cfg):
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.train.trainer import Trainer
    from test_net import test_net

    train_lfb = test_lfb = None
    if cfg.LFB.ENABLED:
        test_lfb = get_lfb(cfg, cfg.LFB.MODEL_PARAMS_FILE, is_train=False)
        train_lfb = get_lfb(cfg, cfg.LFB.MODEL_PARAMS_FILE, is_train=True)
        # With cfg.TPU.DEVICE_BANK the datasets convert these host banks
        # into HBM-resident device banks themselves (they own the
        # video-index mapping).

    trainer = Trainer(cfg, train_lfb=train_lfb, test_lfb=test_lfb)
    last_checkpoint = trainer.train()

    if cfg.TRAIN.TEST_AFTER_TRAIN and last_checkpoint:
        from lfb_tpu.core.config import clone
        test_cfg = clone(cfg, {'TEST.PARAMS_FILE': last_checkpoint})
        # Artifacts go next to the checkpoints (reference behavior).
        test_net(test_cfg, lfb=test_lfb, output_dir=cfg.CHECKPOINT.DIR or '.')


def main():
    parser = argparse.ArgumentParser(description='Video model training')
    parser.add_argument('--node_id', type=int, default=0)
    parser.add_argument('--config_file', type=str, required=True)
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    args = parser.parse_args()

    from lfb_tpu.core.config import load_config
    cfg = load_config(args.config_file, args.opts or [])
    train(cfg)


if __name__ == '__main__':
    main()

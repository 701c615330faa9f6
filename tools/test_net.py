#!/usr/bin/env python
"""Test a video model (CLI-compatible with the reference ``tools/test_net.py``),
including AVA multi-crop testing (2 flips x 3 scales x 3 spatial shifts).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORMAT = '[%(levelname)s: %(filename)s: %(lineno)4d]: %(message)s'
logging.basicConfig(level=logging.INFO, format=FORMAT, stream=sys.stdout)
logger = logging.getLogger(__name__)


def get_test_name(cfg, shift):
    if cfg.DATASET != 'ava':
        return 'final'
    return 'final_%d%s_shift%d_%.03f' % (
        cfg.TEST.SCALE, '_flip' if cfg.AVA.FORCE_TEST_FLIP else '',
        shift, cfg.AVA.DETECTION_SCORE_THRESH)


def test_one_crop(cfg, lfb=None, shift=None, output_dir='.'):
    """One full sweep at one (scale, flip, shift) (reference
    ``test_net.py:96-168``)."""
    import numpy as np
    import jax

    from lfb_tpu.bank import get_lfb
    from lfb_tpu.core.config import clone
    from lfb_tpu.data.loader import DataLoader, get_input_db
    from lfb_tpu.eval.metrics import MetricsCalculator
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.parallel import create_mesh, shard_batch
    from lfb_tpu.train import checkpoints as ckpt
    from lfb_tpu.train.steps import make_eval_step

    cfg = clone(cfg)
    if 'FULL_EVAL' not in cfg.AVA or not cfg.AVA.FULL_EVAL:
        cfg.AVA.FULL_EVAL = True
    if cfg.LFB.ENABLED and lfb is None:
        lfb = get_lfb(cfg, cfg.LFB.MODEL_PARAMS_FILE, is_train=False)

    if shift is None:
        shift = cfg.TEST.CROP_SHIFT
    split = cfg.TEST.DATA_TYPE or 'val'
    spec = build_spec(cfg, split)

    mesh = create_mesh(min(cfg.NUM_GPUS, len(jax.devices())))
    assert cfg.TEST.PARAMS_FILE, 'No params files specified for testing model.'
    init = {k: np.asarray(v) for k, v in
            init_params(jax.random.PRNGKey(cfg.RNG_SEED), spec).items()}
    params, _, _, _ = ckpt.load_params_into(cfg.TEST.PARAMS_FILE, init)
    params = jax.device_put(params)

    db = get_input_db(cfg, split, shift=shift, lfb=lfb)
    loader = DataLoader(db, cfg.TEST.BATCH_SIZE,
                        num_workers=cfg.DATALOADER.NUM_WORKERS,
                        prefetch=cfg.DATALOADER.PREFETCH_BATCHES,
                        seed=cfg.RNG_SEED, is_train=False)
    meter = MetricsCalculator(
        cfg, split, video_idx_to_name=db.video_idx_to_name,
        total_num_boxes=getattr(db, 'num_boxes_used', None),
        num_test_clips=(db.num_test_clips if cfg.DATASET == 'charades' else 1),
        full_eval=True, output_dir=output_dir)
    # Under TPU.DEVICE_BANK the dataset converts the host bank to an
    # HBM-resident DeviceBank and emits no per-example 'lfb' blob; the
    # eval step then gathers windows on device (same wiring as Trainer).
    bank = getattr(db, 'lfb', None)
    if not hasattr(bank, 'gather'):
        bank = None
    if cfg.TPU.BANK_SHARDED and mesh is not None:
        from lfb_tpu.bank.device_bank import shard_bank
        bank = shard_bank(bank, mesh)
    step = make_eval_step(spec, mesh, bank=bank, bank_seed=cfg.RNG_SEED,
                          use_shard_map=bool(cfg.TPU.SHARD_MAP))

    total = loader.num_batches()
    for i, batch in enumerate(loader.batches()):
        out = step(params, shard_batch(mesh, batch))
        meter.update_test(np.asarray(out['logits']), batch['labels'],
                          original_boxes=batch.get('original_boxes'),
                          metadata=batch.get('metadata'),
                          box_mask=batch.get('box_mask'))
        if (i + 1) % cfg.LOG_PERIOD == 0 or i + 1 == total:
            logger.info('| Test: [%d/%d]', i + 1, total)
    loader.shutdown()

    metrics = meter.finalize_metrics(name=get_test_name(cfg, shift))
    logger.info('Test results: %s', metrics)
    return metrics


def test_net(cfg, lfb=None, output_dir='.'):
    """Full test flow incl. AVA multi-crop (reference ``test_net.py:48-93``)."""
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.core.config import clone
    from lfb_tpu.eval.multicrop import combine_ava_multi_crops

    if cfg.DATASET == 'ava':
        results = None
        for threshold in cfg.AVA.DETECTION_SCORE_THRESH_EVAL:
            cfg_t = clone(cfg)
            cfg_t.AVA.DETECTION_SCORE_THRESH = threshold
            if cfg.AVA.TEST_MULTI_CROP:
                cfg_t.LFB.WRITE_LFB = False
                cfg_t.LFB.LOAD_LFB = False
                for flip in (False, True):
                    for scale in cfg.AVA.TEST_MULTI_CROP_SCALES:
                        cfg_c = clone(cfg_t, {
                            'AVA.FORCE_TEST_FLIP': flip,
                            'TEST.SCALE': scale,
                            'TEST.CROP_SIZE': min(256, scale)})
                        crop_lfb = None
                        for shift in range(3):
                            out_name = os.path.join(
                                output_dir, 'detections_%s.csv'
                                % get_test_name(cfg_c, shift))
                            if os.path.isfile(out_name):
                                logger.info('%s already exists.', out_name)
                                continue
                            if cfg_c.LFB.ENABLED and crop_lfb is None:
                                # Bank features are crop-dependent: re-infer
                                # per (flip, scale) (reference
                                # ``test_net.py:80-82``).
                                crop_lfb = get_lfb(
                                    cfg_c, cfg_c.LFB.MODEL_PARAMS_FILE,
                                    is_train=False)
                            test_one_crop(cfg_c, lfb=crop_lfb, shift=shift,
                                          output_dir=output_dir)
                results = combine_ava_multi_crops(cfg_t, output_dir)
                logger.info('Multi-crop mAP: %s', results)
            else:
                results = test_one_crop(cfg_t, lfb=lfb,
                                        output_dir=output_dir)
        return results
    if cfg.DATASET == 'charades':
        cfg = clone(cfg)
        cfg.CHARADES.NUM_TEST_CLIPS = cfg.CHARADES.NUM_TEST_CLIPS_FINAL_EVAL
    return test_one_crop(cfg, lfb=lfb, output_dir=output_dir)


def main():
    parser = argparse.ArgumentParser(description='Video model testing')
    parser.add_argument('--config_file', type=str, default=None)
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    args = parser.parse_args()

    from lfb_tpu.core.config import load_config
    cfg = load_config(args.config_file, args.opts or [])
    # Artifacts (detections CSVs, prediction pickles) go next to the
    # checkpoints, like the reference's train-time eval outputs.
    output_dir = cfg.CHECKPOINT.DIR or '.'
    os.makedirs(output_dir, exist_ok=True)
    test_net(cfg, output_dir=output_dir)


if __name__ == '__main__':
    main()

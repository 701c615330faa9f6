"""Long-term feature bank construction (the capability that defines LFB).

Reference: ``tools/lfb_loader.py``.  ``get_lfb`` either loads a pickled bank
or sweeps the entire split with a forward-only model (lfb_infer_only=True):
AVA collects per-box ``box_pooled`` features keyed {video_idx: {sec: [feat]}},
EPIC/Charades collect clip ``pool5`` features keyed {video: {frame: feat}}.

Bank pickles are format-compatible with the reference
({video: {sec_or_frame: feat|[feats]}}, files ``train_lfb.pkl`` /
``val_lfb.pkl``), so banks produced by either implementation interchange.
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------- #
# Bank assembly from swept features
# --------------------------------------------------------------------------- #

def construct_ava_lfb(features: List[np.ndarray],
                      metadata: List[np.ndarray],
                      masks: List[np.ndarray]) -> Dict[int, Dict[int, list]]:
    """{video_idx: {sec: [2048-d feats]}} (reference ``lfb_loader.py:81-112``).
    ``masks`` excludes the fixed-shape padding rows the reference never has."""
    lfb: Dict[int, Dict[int, list]] = {}
    total_sec = num_boxes = 0
    for feats, meta, mask in zip(features, metadata, masks):
        for i in range(feats.shape[0]):
            if mask[i] == 0:
                continue
            video_id = int(np.round(meta[i, 0]))
            sec = int(np.round(meta[i, 1]))
            video = lfb.setdefault(video_id, {})
            if sec not in video:
                video[sec] = []
                total_sec += 1
            video[sec].append(np.squeeze(feats[i]))
            num_boxes += 1
    logger.info('AVA LFB: %d secs, %d boxes in %d videos',
                total_sec, num_boxes, len(lfb))
    return lfb


def construct_frame_level_lfb(features: List[np.ndarray], clip_metadata,
                              dataset: str) -> Dict:
    """{video: {frame: feat}} for EPIC (keyed by video name) / Charades
    (keyed by video idx); ``clip_metadata`` is the dataset's sweep list so
    trailing padded duplicates are dropped (reference ``lfb_loader.py:51-78``)."""
    lfb: Dict = {}
    global_idx = 0
    for feats in features:
        for i in range(feats.shape[0]):
            if global_idx >= len(clip_metadata):
                break
            if dataset == 'epic':
                _, video_id, frame_id = clip_metadata[global_idx][:3]
            else:
                video_id, frame_id = clip_metadata[global_idx]
            global_idx += 1
            lfb.setdefault(video_id, {})[frame_id] = np.squeeze(feats[i])
    logger.info('Frame-level LFB: %d frames in %d videos', global_idx, len(lfb))
    return lfb


# --------------------------------------------------------------------------- #
# Pickle I/O (reference-compatible)
# --------------------------------------------------------------------------- #

def load_lfb(cfg, is_train: bool) -> Dict:
    path = os.path.join(cfg.LFB.LOAD_LFB_PATH,
                        'train_lfb.pkl' if is_train else 'val_lfb.pkl')
    logger.info('Loading LFB from %s', path)
    from lfb_tpu.train.checkpoints import read_pkl
    return read_pkl(path)


def write_lfb(cfg, lfb: Dict, is_train: bool) -> str:
    path = os.path.join(cfg.CHECKPOINT.DIR,
                        'train_lfb.pkl' if is_train else 'val_lfb.pkl')
    with open(path, 'wb') as f:
        pickle.dump(lfb, f, protocol=2)
    logger.info('Inferred LFB saved as %s', path)
    return path


# --------------------------------------------------------------------------- #
# Full-split inference sweep
# --------------------------------------------------------------------------- #

def get_lfb(cfg, params_file: str, is_train: bool, *, mesh=None,
            params: Optional[dict] = None) -> Dict:
    """Build (or load) the bank for one split.

    Unlike the reference -- which communicates 'use the TRAIN lists' by
    mutating ``cfg.GET_TRAIN_LFB`` (``lfb_loader.py:167``) -- the flag is
    passed explicitly to the dataset.

    With no explicit ``mesh``, the sweep runs data-parallel over the same
    default mesh the Trainer and test_net build from ``cfg.NUM_GPUS``
    (the reference's extraction sweep was 8-GPU,
    ``tools/lfb_loader.py:203-220``); mesh-vs-single bank parity is
    pinned by ``tests/test_integration.py::test_*_get_lfb_multi_device*``.
    """
    if cfg.LFB.LOAD_LFB:
        return load_lfb(cfg, is_train)

    import jax
    from lfb_tpu.data.loader import DataLoader, get_input_db
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.parallel import create_mesh, shard_batch
    from lfb_tpu.train import checkpoints as ckpt
    from lfb_tpu.train.steps import make_eval_step

    if mesh is None:
        # Clamp to the largest device count that divides the sweep batch:
        # finalize() only asserts divisibility by cfg.NUM_GPUS, so a host
        # exposing fewer visible devices (e.g. 3 of a configured 8) must
        # not produce a mesh that can't shard the batch's leading axis.
        n = min(cfg.NUM_GPUS, len(jax.devices()))
        while cfg.TEST.BATCH_SIZE % n:
            n -= 1
        mesh = create_mesh(n)

    spec = build_spec(cfg, cfg.TEST.DATA_TYPE or 'val', lfb_infer_only=True)

    if params is None:
        assert params_file, 'LFB.MODEL_PARAMS_FILE is not specified.'
        logger.info('Inferring LFB from %s', params_file)
        init = {k: np.asarray(v) for k, v in
                init_params(jax.random.PRNGKey(cfg.RNG_SEED), spec).items()}
        params, _, _, _ = ckpt.load_params_into(params_file, init)
    params = jax.device_put({k: np.asarray(v) for k, v in params.items()})

    db = get_input_db(cfg, cfg.TEST.DATA_TYPE or 'val', lfb_infer_only=True,
                      shift=1, get_train_lfb=is_train)
    loader = DataLoader(db, cfg.TEST.BATCH_SIZE,
                        num_workers=cfg.DATALOADER.NUM_WORKERS,
                        prefetch=cfg.DATALOADER.PREFETCH_BATCHES,
                        seed=cfg.RNG_SEED, is_train=False)
    step = make_eval_step(spec, mesh,
                          use_shard_map=bool(cfg.TPU.SHARD_MAP))

    features, metadata, masks = [], [], []
    total = loader.num_batches()
    t0 = time.time()
    for i, batch in enumerate(loader.batches()):
        dev_batch = (shard_batch(mesh, batch) if mesh is not None else batch)
        out = step(params, dev_batch)
        if spec.head_type == 'roi':
            features.append(np.asarray(out['box_pooled']))
            metadata.append(batch['metadata'])
            masks.append(batch['box_mask'])
        else:
            features.append(np.asarray(out['pool5']))
        if i % 10 == 0:
            logger.info('LFB sweep %d/%d (%.2fs/iter)', i, total,
                        (time.time() - t0) / (i + 1))
    loader.shutdown()

    if cfg.DATASET == 'ava':
        lfb = construct_ava_lfb(features, metadata, masks)
    elif cfg.DATASET == 'charades':
        lfb = construct_frame_level_lfb(features, db.lfb_frames, 'charades')
    elif cfg.DATASET == 'epic':
        lfb = construct_frame_level_lfb(features, db.annotations, 'epic')
    else:
        raise ValueError('Dataset {} not recognized'.format(cfg.DATASET))

    if cfg.LFB.WRITE_LFB:
        write_lfb(cfg, lfb, is_train)
    return lfb

"""End-to-end integration on tiny synthetic datasets (decode -> train ->
eval -> checkpoint; LFB extraction -> bank -> FBO training)."""

import os

import numpy as np
import pytest

import jax

from lfb_tpu.core import config as C
from tests import synthetic

cv2 = pytest.importorskip('cv2')


def tiny_cfg(overrides, **extra):
    cfg = C.default_config()
    synthetic.apply_overrides(cfg, overrides)
    cfg.MODEL.MODEL_NAME = 'resnet_video'
    cfg.MODEL.USE_AFFINE = True
    cfg.NONLOCAL.USE_BN = False
    cfg.NONLOCAL.USE_AFFINE = True
    cfg.NONLOCAL.USE_ZERO_INIT_CONV = True
    cfg.TRAIN.VIDEO_LENGTH = 4
    cfg.TEST.VIDEO_LENGTH = 4
    cfg.TRAIN.SAMPLE_RATE = 2
    cfg.TEST.SAMPLE_RATE = 2
    cfg.TRAIN.CROP_SIZE = 32
    cfg.TEST.CROP_SIZE = 32
    cfg.TEST.SCALE = 36
    cfg.TRAIN.JITTER_SCALES = [36, 40]
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TEST.BATCH_SIZE = 2
    cfg.NUM_GPUS = 2
    cfg.TRAIN.DROPOUT_RATE = 0.0
    cfg.TRAIN.COMPUTE_PRECISE_BN = False
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.STEP_SIZES = [2, 1]
    cfg.SOLVER.LRS = [1, 0.1]
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.SCALE_MOMENTUM = True
    cfg.TRAIN.EVAL_PERIOD = 1000
    cfg.CHECKPOINT.CHECKPOINT_PERIOD = 2
    cfg.LOG_PERIOD = 1
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.DATALOADER.PREFETCH_BATCHES = 2
    cfg.TPU.COMPUTE_DTYPE = 'float32'
    cfg.TPU.USE_PALLAS = False
    cfg.TPU.MAX_BOXES_PER_CLIP = 4
    for k, v in extra.items():
        C.merge_cfg_from_list(cfg, [k, repr(v)])
    return C.finalize(cfg)


def test_epic_train_eval_checkpoint_resume(tmp_path):
    from lfb_tpu.train.trainer import Trainer
    from lfb_tpu.train import checkpoints as ckpt

    cfg = tiny_cfg(synthetic.build_epic(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    cfg.TEST.DATASET_SIZE = 2

    trainer = Trainer(cfg)
    last = trainer.train()
    assert last and os.path.isfile(last)
    assert last.endswith('c2_model_iter3.pkl')

    metrics = trainer.evaluate(name='final')
    assert 'err' in metrics and 0 <= metrics['err'] <= 100
    assert os.path.isfile(str(tmp_path / 'out' / 'epic_predictions_final.pkl'))

    # Resume: a fresh Trainer picks up the checkpoint.
    trainer2 = Trainer(cfg)
    assert trainer2.start_iter == 3
    np.testing.assert_allclose(
        np.asarray(trainer2.trainable['pred_w']),
        np.asarray(trainer.trainable['pred_w']), rtol=1e-6)


def test_charades_lfb_extraction_and_fbo_training(tmp_path):
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.train.trainer import Trainer

    overrides = synthetic.build_charades(str(tmp_path))
    cfg = tiny_cfg(overrides)
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    os.makedirs(cfg.CHECKPOINT.DIR, exist_ok=True)
    cfg.TEST.DATA_TYPE = 'val'
    cfg.LFB.ENABLED = True
    cfg.LFB.FBO_TYPE = 'nl'
    cfg.LFB.WINDOW_SIZE = 4
    cfg.LFB.WRITE_LFB = True
    C.finalize(cfg)

    # Build a baseline checkpoint to infer the bank from.
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train import checkpoints as ckpt
    base_spec = build_spec(cfg, 'val', lfb_infer_only=True)
    base_params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(0), base_spec).items()}
    base_file = str(tmp_path / 'baseline.pkl')
    ckpt.save_params(base_file, base_params, model_iter=0, lr=0.01)

    val_lfb = get_lfb(cfg, base_file, is_train=False)
    train_lfb = get_lfb(cfg, base_file, is_train=True)
    # 3 bank clips per video (freq 12 over 40 frames), 2048-d features.
    assert len(val_lfb) == 2
    some_video = next(iter(val_lfb.values()))
    assert len(some_video) == 3
    assert next(iter(some_video.values())).shape == (2048,)
    # WRITE_LFB produced reference-format pickles.
    assert os.path.isfile(str(tmp_path / 'out' / 'val_lfb.pkl'))

    # Train 2 iters with the bank through the FBO-NL head.
    cfg.SOLVER.MAX_ITER = 2
    trainer = Trainer(cfg, train_lfb=train_lfb, test_lfb=val_lfb)
    last = trainer.train()
    assert last and os.path.isfile(last)


def test_ava_train_and_pascal_eval(tmp_path):
    from lfb_tpu.train.trainer import Trainer

    cfg = tiny_cfg(synthetic.build_ava(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    cfg.SOLVER.MAX_ITER = 2
    cfg.CHECKPOINT.CHECKPOINT_PERIOD = 1000
    cfg.AVA.FULL_EVAL_DURING_TRAINING = True
    C.finalize(cfg)

    trainer = Trainer(cfg)
    trainer.train()
    metrics = trainer.evaluate(name='ava_final')
    # Synthetic GT == predicted boxes, so the evaluator must run and emit a
    # detections CSV + a valid mAP in [0, 1].
    assert 0.0 <= metrics['full_map'] <= 1.0
    assert os.path.isfile(str(tmp_path / 'out' / 'detections_ava_final.csv'))


def test_ava_multicrop_orchestration(tmp_path):
    """Full multi-crop flow: 2 flips x 1 scale x 3 shifts -> per-crop
    detections CSVs -> visibility-gated merge -> final combined mAP."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    import test_net as test_net_mod

    cfg = tiny_cfg(synthetic.build_ava(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    cfg.AVA.TEST_MULTI_CROP = True
    cfg.AVA.TEST_MULTI_CROP_SCALES = [36]
    cfg.TEST.SCALE = 36
    cfg.TEST.CROP_SIZE = 32
    C.finalize(cfg)

    # Save a model checkpoint to test.
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train import checkpoints as ckpt
    spec = build_spec(cfg, 'val')
    params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(0), spec).items()}
    model_file = str(tmp_path / 'model.pkl')
    ckpt.save_params(model_file, params, model_iter=0, lr=0.01)
    cfg.TEST.PARAMS_FILE = model_file

    out_dir = str(tmp_path / 'mc')
    os.makedirs(out_dir, exist_ok=True)
    # crop = min(256, 36) = 36 > short side? frames are 48x64 -> scale 36
    # gives 36x48; crop 36 fits.
    final_map = test_net_mod.test_net(cfg, output_dir=out_dir)

    files = sorted(os.listdir(out_dir))
    # 6 per-crop CSVs + 2 combined (flip/noflip) + final
    shifts = [f for f in files if 'shift' in f]
    combined = [f for f in files if 'combined' in f]
    assert len(shifts) == 6, files
    assert len(combined) == 2, files
    assert 'final_multi_crop_testing_results.csv' in files
    assert 0.0 <= final_map <= 1.0


def test_freeze_backbone_updates_head_only(tmp_path):
    from lfb_tpu.train.trainer import Trainer

    cfg = tiny_cfg(synthetic.build_charades(str(tmp_path)),
                   **{'MODEL.FREEZE_BACKBONE': True, 'LFB.ENABLED': True,
                      'LFB.FBO_TYPE': 'nl', 'LFB.WINDOW_SIZE': 4})
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    cfg.SOLVER.MAX_ITER = 1
    cfg.SOLVER.BASE_LR = 0.1  # large lr so any update is visible
    C.finalize(cfg)

    from lfb_tpu.data.frame_lists import load_image_lists
    paths, _, _, _ = load_image_lists(
        [os.path.join(cfg.CHARADES.FRAME_LIST_DIR, 'train.csv')], cfg.DATADIR)
    bank = synthetic.make_fake_frame_lfb(paths, dim=cfg.LFB.LFB_DIM)

    trainer = Trainer(cfg, train_lfb=bank, test_lfb=bank)
    conv1_before = np.asarray(trainer.params()['conv1_w']).copy()
    pred_before = np.asarray(trainer.params()['pred_w']).copy()
    trainer.train()
    params = trainer.params()
    np.testing.assert_array_equal(np.asarray(params['conv1_w']),
                                  conv1_before)  # backbone frozen
    assert not np.allclose(np.asarray(params['pred_w']), pred_before)
    # FBO params train
    assert 'lfb_nl0_theta_w' in trainer.trainable


def test_epic_noun_load_lfb_flow(tmp_path):
    """EPIC noun: detector-feature bank loaded from reference-format pickle
    (LFB.LOAD_LFB), FBO-max head."""
    import pickle
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.train.trainer import Trainer

    overrides = synthetic.build_epic(str(tmp_path), class_type='noun')
    cfg = tiny_cfg(overrides)
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    os.makedirs(cfg.CHECKPOINT.DIR, exist_ok=True)
    cfg.LFB.ENABLED = True
    cfg.LFB.FBO_TYPE = 'max'
    cfg.LFB.WINDOW_SIZE = 6
    cfg.LFB.LOAD_LFB = True
    cfg.LFB.LOAD_LFB_PATH = str(tmp_path / 'noun_lfb')
    cfg.EPIC.MAX_NUM_FEATS_PER_NOUN_LFB_FRAME = 3
    cfg.SOLVER.MAX_ITER = 1
    C.finalize(cfg)

    # Noun banks are keyed by video INDEX: {idx: {frame: (n, D) array}}.
    rng = np.random.RandomState(0)
    os.makedirs(cfg.LFB.LOAD_LFB_PATH, exist_ok=True)
    for name in ('train_lfb.pkl', 'val_lfb.pkl'):
        bank = {v: {f: rng.randn(4, cfg.LFB.LFB_DIM).astype(np.float32)
                    for f in range(0, 60, 15)} for v in range(2)}
        with open(os.path.join(cfg.LFB.LOAD_LFB_PATH, name), 'wb') as fh:
            pickle.dump(bank, fh, protocol=2)

    val_lfb = get_lfb(cfg, '', is_train=False)
    train_lfb = get_lfb(cfg, '', is_train=True)
    assert len(val_lfb) == 2

    trainer = Trainer(cfg, train_lfb=train_lfb, test_lfb=val_lfb)
    last = trainer.train()
    assert last and os.path.isfile(last)


def test_trainer_ava_mini_eval_phase_injection(tmp_path):
    """During training, the val DB uses the TRAIN detection threshold and
    the mini (sec%4==0) subset (reference train_net.py:107-108)."""
    from lfb_tpu.train.trainer import Trainer
    cfg = tiny_cfg(synthetic.build_ava(str(tmp_path), num_secs=8))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    cfg.AVA.FULL_EVAL_DURING_TRAINING = False
    C.finalize(cfg)
    trainer = Trainer(cfg)
    secs = {sec for _, sec, _ in trainer.test_db.keyframe_indices}
    assert secs and all(s % 4 == 0 for s in secs)
    assert trainer.test_db.detect_thresh == cfg.AVA.DETECTION_SCORE_THRESH_TRAIN
    trainer.train_loader.shutdown()
    trainer.test_loader.shutdown()


def test_ava_lfb_extraction_and_device_bank_training(tmp_path):
    """Full AVA bank flow: box_pooled sweep -> {video:{sec:[feats]}} bank ->
    HBM device bank -> FBO-NL training step."""
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.train.trainer import Trainer

    cfg = tiny_cfg(synthetic.build_ava(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    os.makedirs(cfg.CHECKPOINT.DIR, exist_ok=True)
    cfg.TEST.DATA_TYPE = 'val'
    cfg.LFB.ENABLED = True
    cfg.LFB.FBO_TYPE = 'nl'
    cfg.LFB.WINDOW_SIZE = 3
    cfg.SOLVER.MAX_ITER = 1
    C.finalize(cfg)

    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train import checkpoints as ckpt
    base_spec = build_spec(cfg, 'val', lfb_infer_only=True)
    base_params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(0), base_spec).items()}
    base_file = str(tmp_path / 'baseline.pkl')
    ckpt.save_params(base_file, base_params, model_iter=0, lr=0.01)

    val_lfb = get_lfb(cfg, base_file, is_train=False)
    train_lfb = get_lfb(cfg, base_file, is_train=True)
    # Synthetic AVA: 2 videos x 4 annotated secs, 2 boxes each.
    assert set(val_lfb) == {0, 1}
    secs = next(iter(val_lfb.values()))
    assert all(len(feats) >= 1 for feats in secs.values())
    assert next(iter(secs.values()))[0].shape == (2048,)

    cfg2 = C.clone(cfg, {'TPU.DEVICE_BANK': True})
    trainer = Trainer(cfg2, train_lfb=train_lfb, test_lfb=val_lfb)
    assert trainer.train_db.device_bank
    last = trainer.train()
    assert last and os.path.isfile(last)


def test_test_net_with_device_bank(tmp_path):
    """Regression: test_net's eval step must receive the HBM DeviceBank --
    under TPU.DEVICE_BANK the dataset emits no per-example 'lfb' blob, and
    an eval step built without the bank KeyErrors on batch['lfb']."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    import test_net as test_net_mod

    cfg = tiny_cfg(synthetic.build_ava(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    os.makedirs(cfg.CHECKPOINT.DIR, exist_ok=True)
    cfg.LFB.ENABLED = True
    cfg.LFB.WINDOW_SIZE = 3
    cfg.TPU.DEVICE_BANK = True
    C.finalize(cfg)

    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train import checkpoints as ckpt
    spec = build_spec(cfg, 'val')
    params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(0), spec).items()}
    model_file = str(tmp_path / 'model.pkl')
    ckpt.save_params(model_file, params, model_iter=0, lr=0.01)
    cfg.TEST.PARAMS_FILE = model_file

    # Host-format AVA bank {video_idx: {sec: [2048-d feats]}}; the dataset
    # converts it to a DeviceBank under TPU.DEVICE_BANK.
    rng = np.random.RandomState(0)
    bank = {v: {sec: [rng.randn(2048).astype('f') for _ in range(2)]
                for sec in range(902, 906)} for v in range(2)}

    metrics = test_net_mod.test_net(
        cfg, lfb=bank, output_dir=cfg.CHECKPOINT.DIR)
    assert 0.0 <= metrics['full_map'] <= 1.0


def test_charades_two_stage_training(tmp_path):
    """The reference's Charades recipe chained end-to-end
    (``GETTING_STARTED.md`` + ``configs/charades_r50_lfb_nl.yaml``):
    stage 1 trains a baseline; stage 2 extracts the LFB from the stage-1
    checkpoint and finetunes with FREEZE_BACKBONE from TRAIN.PARAMS_FILE
    (RESET_START_ITER; classifier skipped on the 2048 -> 2048+512 head-dim
    change)."""
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.train.trainer import Trainer

    overrides = synthetic.build_charades(str(tmp_path))

    # Stage 1: baseline (no LFB).
    cfg1 = tiny_cfg(overrides)
    cfg1.CHECKPOINT.DIR = str(tmp_path / 'stage1')
    cfg1.SOLVER.MAX_ITER = 2
    cfg1.CHECKPOINT.CHECKPOINT_PERIOD = 1000   # only the final ckpt
    C.finalize(cfg1)
    trainer1 = Trainer(cfg1)
    stage1_ckpt = trainer1.train()
    assert stage1_ckpt and os.path.isfile(stage1_ckpt)
    conv1_stage1 = np.asarray(trainer1.params()['conv1_w']).copy()

    # Stage 2: LFB from the stage-1 model, frozen-backbone finetune.
    cfg2 = tiny_cfg(overrides)
    cfg2.CHECKPOINT.DIR = str(tmp_path / 'stage2')
    os.makedirs(cfg2.CHECKPOINT.DIR, exist_ok=True)
    cfg2.LFB.ENABLED = True
    cfg2.LFB.FBO_TYPE = 'nl'
    cfg2.LFB.WINDOW_SIZE = 4
    cfg2.MODEL.FREEZE_BACKBONE = True
    cfg2.TRAIN.PARAMS_FILE = stage1_ckpt
    cfg2.TRAIN.RESET_START_ITER = True
    cfg2.SOLVER.MAX_ITER = 2
    cfg2.SOLVER.BASE_LR = 0.05
    C.finalize(cfg2)

    val_lfb = get_lfb(cfg2, stage1_ckpt, is_train=False)
    train_lfb = get_lfb(cfg2, stage1_ckpt, is_train=True)
    assert len(val_lfb) == 2

    trainer2 = Trainer(cfg2, train_lfb=train_lfb, test_lfb=val_lfb)
    # PARAMS_FILE loaded with start-iter reset; backbone carries stage-1
    # weights; the classifier (head dim 2048 -> 2560) was skipped.
    assert trainer2.start_iter == 0
    np.testing.assert_array_equal(np.asarray(trainer2.params()['conv1_w']),
                                  conv1_stage1)
    assert trainer2.params()['pred_w'].shape[0] == 2048 + cfg2.FBO_NL.LATENT_DIM

    last = trainer2.train()
    assert last and os.path.isfile(last)
    params2 = trainer2.params()
    # Backbone stays frozen at stage-1 values; the FBO trains (zero-init
    # out conv becomes nonzero after its first update).
    np.testing.assert_array_equal(np.asarray(params2['conv1_w']),
                                  conv1_stage1)
    assert np.any(np.asarray(params2['lfb_nl0_out_w']) != 0)


def test_epic_noun_device_bank_and_action_combination(tmp_path):
    """EPIC noun with an externally-supplied detector-feature bank through
    FrameDeviceBank.build_noun (TPU.DEVICE_BANK), then the verb (x) noun
    action combination through tools/evaluate_actions.py semantics
    (reference ``GETTING_STARTED.md:89-100`` + ``tools/evaluate_actions.py``)."""
    import pickle
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.eval.epic_actions import evaluate_actions
    from lfb_tpu.train.trainer import Trainer

    root_n = str(tmp_path / 'noun')
    overrides_n = synthetic.build_epic(root_n, class_type='noun')

    cfg_n = tiny_cfg(overrides_n)
    cfg_n.CHECKPOINT.DIR = str(tmp_path / 'out_noun')
    os.makedirs(cfg_n.CHECKPOINT.DIR, exist_ok=True)
    cfg_n.LFB.ENABLED = True
    cfg_n.LFB.FBO_TYPE = 'max'
    cfg_n.LFB.WINDOW_SIZE = 6
    cfg_n.LFB.LOAD_LFB = True
    cfg_n.LFB.LOAD_LFB_PATH = str(tmp_path / 'noun_lfb')
    cfg_n.EPIC.MAX_NUM_FEATS_PER_NOUN_LFB_FRAME = 3
    cfg_n.TPU.DEVICE_BANK = True
    cfg_n.SOLVER.MAX_ITER = 1
    cfg_n.TEST.DATASET_SIZE = 2
    C.finalize(cfg_n)

    # External (detector-produced) noun bank: {video_idx: {frame: (n, D)}}.
    rng = np.random.RandomState(0)
    os.makedirs(cfg_n.LFB.LOAD_LFB_PATH, exist_ok=True)
    for name in ('train_lfb.pkl', 'val_lfb.pkl'):
        bank = {v: {f: rng.randn(4, cfg_n.LFB.LFB_DIM).astype(np.float32)
                    for f in range(0, 60, 15)} for v in range(2)}
        with open(os.path.join(cfg_n.LFB.LOAD_LFB_PATH, name), 'wb') as fh:
            pickle.dump(bank, fh, protocol=2)

    val_lfb = get_lfb(cfg_n, '', is_train=False)
    train_lfb = get_lfb(cfg_n, '', is_train=True)

    trainer_n = Trainer(cfg_n, train_lfb=train_lfb, test_lfb=val_lfb)
    # The dataset must have converted the host pickle to an HBM-resident
    # FrameDeviceBank (noun layout: repeated frame ids, per-frame cap).
    from lfb_tpu.bank.device_bank import FrameDeviceBank
    assert isinstance(trainer_n.train_db.lfb, FrameDeviceBank)
    trainer_n.train()
    trainer_n.evaluate(name='final')
    noun_file = os.path.join(cfg_n.CHECKPOINT.DIR,
                             'epic_predictions_final.pkl')
    assert os.path.isfile(noun_file)

    # Verb model: baseline (no LFB) on its own copy of the dataset.
    root_v = str(tmp_path / 'verb')
    overrides_v = synthetic.build_epic(root_v, class_type='verb')
    cfg_v = tiny_cfg(overrides_v)
    cfg_v.CHECKPOINT.DIR = str(tmp_path / 'out_verb')
    os.makedirs(cfg_v.CHECKPOINT.DIR, exist_ok=True)
    cfg_v.SOLVER.MAX_ITER = 1
    cfg_v.TEST.DATASET_SIZE = 2
    C.finalize(cfg_v)
    trainer_v = Trainer(cfg_v)
    trainer_v.train()
    trainer_v.evaluate(name='final')
    verb_file = os.path.join(cfg_v.CHECKPOINT.DIR,
                             'epic_predictions_final.pkl')
    assert os.path.isfile(verb_file)

    # Action combination: softmax outer product weighted by the train-set
    # P(verb|noun) prior from the annotation CSV.
    results = evaluate_actions(
        verb_file, noun_file,
        annotation_root=cfg_v.EPIC.ANNOTATION_DIR, num_seg=2)
    for key in ('verb_top1', 'noun_top1', 'action_top1', 'action_top5'):
        assert 0.0 <= results[key] <= 100.0, (key, results)


def _assert_banks_equal(a, b):
    """Same key structure, same per-sec feature ordering; values allclose.

    Tolerance is loose-ish (5e-3 rel) because the sharded layout changes
    XLA's fusion choices on CPU -- an ORDERING bug (the actual risk) would
    swap whole 2048-d features and blow past any tolerance."""
    assert set(a) == set(b)
    for v in a:
        assert set(a[v]) == set(b[v]), v
        for k in a[v]:
            fa, fb = a[v][k], b[v][k]
            if isinstance(fa, list):
                assert len(fa) == len(fb), (v, k)
                for x, y in zip(fa, fb):
                    np.testing.assert_allclose(x, y, rtol=5e-3, atol=1e-4)
            else:
                np.testing.assert_allclose(fa, fb, rtol=5e-3, atol=1e-4)


@pytest.mark.parametrize('use_shard_map', [False, True])
def test_ava_get_lfb_multi_device_matches_single(tmp_path, use_shard_map):
    """Bank extraction under an 8-device mesh == single-device bank.

    The reference's bank sweep was 8-GPU (``tools/lfb_loader.py:203-220``);
    the risk in the mesh path is sharded `box_pooled` output ordering and
    padded-row mask handling during `construct_ava_lfb` reassembly --
    an ordering bug would silently corrupt every downstream bank.
    B=8 over 2 videos x 4 secs = exactly one full global batch, with
    the per-box rows (B*4) sharded 4-per-device.
    """
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.parallel import create_mesh

    cfg = tiny_cfg(synthetic.build_ava(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    os.makedirs(cfg.CHECKPOINT.DIR, exist_ok=True)
    cfg.TEST.DATA_TYPE = 'val'
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.NUM_GPUS = 8
    cfg.LFB.ENABLED = True
    cfg.LFB.WINDOW_SIZE = 3
    cfg.TPU.SHARD_MAP = use_shard_map
    C.finalize(cfg)

    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train import checkpoints as ckpt
    base_spec = build_spec(cfg, 'val', lfb_infer_only=True)
    base_params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(0), base_spec).items()}
    base_file = str(tmp_path / 'baseline.pkl')
    ckpt.save_params(base_file, base_params, model_iter=0, lr=0.01)

    # The single-device reference must NOT use get_lfb's default mesh
    # (cfg.NUM_GPUS=8 on the 8-virtual-device suite would silently run the
    # same 8-way sweep twice and compare a code path against itself).
    cfg_single = C.clone(cfg, {'NUM_GPUS': 1, 'TPU.SHARD_MAP': False})
    bank_single = get_lfb(cfg_single, base_file, is_train=False)
    bank_mesh = get_lfb(cfg, base_file, is_train=False, mesh=create_mesh(8))
    assert bank_single, 'empty bank -- sweep produced nothing'
    _assert_banks_equal(bank_single, bank_mesh)


def test_charades_get_lfb_multi_device_matches_single(tmp_path):
    """Frame-level bank sweep under the mesh: 2 videos x 3 bank clips = 6
    real clips padded to one global batch of 8; the padded duplicate rows
    must be dropped by `construct_frame_level_lfb` identically to the
    single-device sweep (reference ``lfb_loader.py:51-78``)."""
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.parallel import create_mesh

    cfg = tiny_cfg(synthetic.build_charades(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    os.makedirs(cfg.CHECKPOINT.DIR, exist_ok=True)
    cfg.TEST.DATA_TYPE = 'val'
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.NUM_GPUS = 8
    cfg.LFB.ENABLED = True
    cfg.LFB.FBO_TYPE = 'nl'
    cfg.LFB.WINDOW_SIZE = 4
    C.finalize(cfg)

    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train import checkpoints as ckpt
    base_spec = build_spec(cfg, 'val', lfb_infer_only=True)
    base_params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(0), base_spec).items()}
    base_file = str(tmp_path / 'baseline.pkl')
    ckpt.save_params(base_file, base_params, model_iter=0, lr=0.01)

    bank_single = get_lfb(C.clone(cfg, {'NUM_GPUS': 1}), base_file,
                          is_train=False)
    bank_mesh = get_lfb(cfg, base_file, is_train=False, mesh=create_mesh(8))
    assert len(bank_single) == 2
    assert all(len(v) == 3 for v in bank_single.values())
    _assert_banks_equal(bank_single, bank_mesh)


def test_epic_get_lfb_multi_device_matches_single(tmp_path):
    """EPIC frame-level sweep under the mesh: the bank is keyed by VIDEO
    NAME via db.annotations (unlike Charades' index keying), so padded-row
    dedup walks a different metadata list (reference
    ``lfb_loader.py:51-78``)."""
    from lfb_tpu.bank import get_lfb
    from lfb_tpu.parallel import create_mesh

    cfg = tiny_cfg(synthetic.build_epic(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    os.makedirs(cfg.CHECKPOINT.DIR, exist_ok=True)
    cfg.TEST.DATA_TYPE = 'val'
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.NUM_GPUS = 8
    cfg.LFB.ENABLED = True
    cfg.LFB.FBO_TYPE = 'nl'
    cfg.LFB.WINDOW_SIZE = 4
    C.finalize(cfg)

    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train import checkpoints as ckpt
    base_spec = build_spec(cfg, 'val', lfb_infer_only=True)
    base_params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(0), base_spec).items()}
    base_file = str(tmp_path / 'baseline.pkl')
    ckpt.save_params(base_file, base_params, model_iter=0, lr=0.01)

    bank_single = get_lfb(C.clone(cfg, {'NUM_GPUS': 1}), base_file,
                          is_train=False)
    bank_mesh = get_lfb(cfg, base_file, is_train=False, mesh=create_mesh(8))
    assert bank_single, 'empty bank -- sweep produced nothing'
    _assert_banks_equal(bank_single, bank_mesh)


def test_ava_multicrop_with_device_bank(tmp_path):
    """The combined protocol: multi-crop orchestration (2 flips x 1 scale x
    3 shifts) with per-(flip,scale) bank re-inference AND the HBM-resident
    device bank (TPU.DEVICE_BANK) -- the CPU mirror of the on-TPU probe
    recorded in PARITY.md (reference ``test_net.py:61-87``)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    import test_net as test_net_mod

    cfg = tiny_cfg(synthetic.build_ava(str(tmp_path)))
    cfg.CHECKPOINT.DIR = str(tmp_path / 'out')
    os.makedirs(cfg.CHECKPOINT.DIR, exist_ok=True)
    cfg.AVA.TEST_MULTI_CROP = True
    cfg.AVA.TEST_MULTI_CROP_SCALES = [36]
    cfg.TEST.SCALE = 36
    cfg.TEST.CROP_SIZE = 32
    cfg.LFB.ENABLED = True
    cfg.LFB.FBO_TYPE = 'nl'
    cfg.LFB.WINDOW_SIZE = 3
    cfg.TPU.DEVICE_BANK = True
    C.finalize(cfg)

    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train import checkpoints as ckpt
    base_spec = build_spec(cfg, 'val', lfb_infer_only=True)
    base_params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(0), base_spec).items()}
    base_file = str(tmp_path / 'baseline.pkl')
    ckpt.save_params(base_file, base_params, model_iter=0, lr=0.01)
    cfg.LFB.MODEL_PARAMS_FILE = base_file

    spec = build_spec(cfg, 'val')
    params = {k: np.asarray(v) for k, v in init_params(
        jax.random.PRNGKey(1), spec).items()}
    model_file = str(tmp_path / 'model.pkl')
    ckpt.save_params(model_file, params, model_iter=0, lr=0.01)
    cfg.TEST.PARAMS_FILE = model_file

    out_dir = str(tmp_path / 'mc')
    os.makedirs(out_dir, exist_ok=True)
    final_map = test_net_mod.test_net(cfg, output_dir=out_dir)

    files = sorted(os.listdir(out_dir))
    shifts = [f for f in files if 'shift' in f]
    assert len(shifts) == 6, files
    assert 'final_multi_crop_testing_results.csv' in files
    assert final_map is not None and 0.0 <= final_map <= 1.0

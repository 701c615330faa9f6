import numpy as np
import pytest

from lfb_tpu.core import config as C
from lfb_tpu.data.frame_lists import get_sequence, load_image_lists
from lfb_tpu.data.loader import DataLoader, get_input_db
from lfb_tpu.data import transforms

from tests import synthetic

cv2 = pytest.importorskip('cv2')


def small_cfg(overrides):
    cfg = C.default_config()
    synthetic.apply_overrides(cfg, overrides)
    cfg.TRAIN.VIDEO_LENGTH = 4
    cfg.TEST.VIDEO_LENGTH = 4
    cfg.TRAIN.SAMPLE_RATE = 2
    cfg.TEST.SAMPLE_RATE = 2
    cfg.TRAIN.CROP_SIZE = 32
    cfg.TEST.CROP_SIZE = 32
    cfg.TEST.SCALE = 36
    cfg.TRAIN.JITTER_SCALES = [36, 40]
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TEST.BATCH_SIZE = 4
    cfg.NUM_GPUS = 1
    cfg.TPU.MAX_BOXES_PER_CLIP = 4
    return C.finalize(cfg)


# ----------------------------------------------------------------------- #
# frame lists / sequences
# ----------------------------------------------------------------------- #

def test_get_sequence_clamps():
    assert get_sequence(2, 4, 2, 100) == [0, 0, 2, 4]
    assert get_sequence(98, 4, 2, 100) == [94, 96, 98, 99]


def test_load_image_lists(tmp_path):
    ov = synthetic.build_charades(str(tmp_path), num_videos=2, num_frames=6)
    paths, labels, idx2name, name2idx = load_image_lists(
        [str(tmp_path / 'frame_lists' / 'train.csv')],
        ov['DATADIR'])
    assert len(paths) == 2 and len(paths[0]) == 6
    assert idx2name[0] == 'CHAR00' and name2idx['CHAR01'] == 1
    assert all(isinstance(l, list) for l in labels[0])


# ----------------------------------------------------------------------- #
# transforms
# ----------------------------------------------------------------------- #

def test_preprocess_test_path_shapes_and_rgb():
    cfg = C.finalize(C.default_config())
    cfg.TEST.SCALE = 36
    clip = np.zeros((2, 48, 64, 3), np.float32)
    clip[..., 0] = 255.0  # blue channel (BGR input)
    out, _ = transforms.preprocess_clip(
        clip, is_train=False, crop_size=32, cfg=cfg, spatial_shift=1)
    assert out.shape == (2, 32, 32, 3)
    # BGR->RGB: blue must now be the LAST channel; value (1-mean)/std
    expected = (1.0 - 0.45) / 0.225
    np.testing.assert_allclose(out[..., 2], expected, rtol=1e-5)
    np.testing.assert_allclose(out[..., 0], -2.0, rtol=1e-5)  # (0-.45)/.225


def test_spatial_shift_crops_differ():
    clip = np.arange(2 * 10 * 20 * 3, dtype=np.float32).reshape(2, 10, 20, 3)
    left, _ = transforms.spatial_shift_crop(clip, 10, 0)
    center, _ = transforms.spatial_shift_crop(clip, 10, 1)
    right, _ = transforms.spatial_shift_crop(clip, 10, 2)
    assert left.shape == (2, 10, 10, 3)
    assert not np.array_equal(left, center)
    np.testing.assert_array_equal(right, clip[:, :, 10:])
    np.testing.assert_array_equal(center, clip[:, :, 5:15])  # ceil((20-10)/2)=5


def test_flip_boxes():
    clip = np.zeros((1, 8, 10, 3), np.float32)
    boxes = np.array([[1.0, 2.0, 4.0, 5.0]])
    out, fb = transforms.horizontal_flip(None, clip, boxes=boxes, force=True)
    np.testing.assert_allclose(fb, [[10 - 4 - 1, 2, 10 - 1 - 1, 5]])


def test_jitter_scale_range():
    rng = np.random.default_rng(0)
    sizes = {transforms.jitter_scale(rng, 256, 320) for _ in range(200)}
    assert min(sizes) >= 256 and max(sizes) <= 320 and len(sizes) > 10


# ----------------------------------------------------------------------- #
# dataset DBs
# ----------------------------------------------------------------------- #

def test_charades_db_and_batches(tmp_path):
    cfg = small_cfg(synthetic.build_charades(str(tmp_path)))
    db = get_input_db(cfg, 'train')
    assert db.db_size() == 2
    rng = np.random.default_rng(0)
    batch = db.minibatch([0, 1], rng)
    assert batch['data'].shape == (2, 4, 32, 32, 3)
    assert batch['labels'].shape == (2, 6)
    assert batch['labels'].sum() > 0

    # test split: videos * NUM_TEST_CLIPS (training-time default 9)
    db_test = get_input_db(cfg, 'val')
    assert db_test.db_size() == 2 * 9


def test_charades_lfb_infer_db(tmp_path):
    cfg = small_cfg(synthetic.build_charades(str(tmp_path)))
    db = get_input_db(cfg, 'val', lfb_infer_only=True)
    # 40 frames per video, freq = 24//2=12 -> frames 11,23,35 -> 3/video
    assert db.db_size() == 6
    batch = db.minibatch([0, 1, 2], np.random.default_rng(0))
    assert batch['data'].shape == (3, 4, 32, 32, 3)


def test_charades_lfb_window(tmp_path):
    cfg = small_cfg(synthetic.build_charades(str(tmp_path)))
    cfg.LFB.ENABLED = True
    cfg.LFB.WINDOW_SIZE = 4
    cfg.LFB.LFB_DIM = 16
    paths, _, _, _ = load_image_lists(
        [str(tmp_path / 'frame_lists' / 'train.csv')], cfg.DATADIR)
    bank = synthetic.make_fake_frame_lfb(paths, dim=16)
    db = get_input_db(cfg, 'train', lfb=bank)
    batch = db.minibatch([0, 1], np.random.default_rng(0))
    assert batch['lfb'].shape == (2, 4, 16)
    assert np.abs(batch['lfb']).sum() > 0


def test_epic_db(tmp_path):
    cfg = small_cfg(synthetic.build_epic(str(tmp_path)))
    db_train = get_input_db(cfg, 'train')
    db_val = get_input_db(cfg, 'val')
    # 2 segments in P01 video (train), 2 in P26 video (val)
    assert db_train.db_size() == 2
    assert db_val.db_size() == 2
    batch = db_val.minibatch([0, 1], np.random.default_rng(0))
    assert batch['data'].shape == (2, 4, 32, 32, 3)
    assert batch['labels'].dtype == np.int32
    assert (batch['labels'] < 5).all()


def test_epic_lfb_infer_annotations(tmp_path):
    cfg = small_cfg(synthetic.build_epic(str(tmp_path)))
    db = get_input_db(cfg, 'val', lfb_infer_only=True, get_train_lfb=False)
    # 60 frames 1-based, freq 30 -> frames 30, 60 -> 2 clips/video * 2 videos
    assert db.db_size() == 4


def test_ava_db_batch(tmp_path):
    cfg = small_cfg(synthetic.build_ava(str(tmp_path)))
    db = get_input_db(cfg, 'train')
    assert db.db_size() == 2 * 4  # videos * annotated secs
    rng = np.random.default_rng(0)
    batch = db.minibatch([0, 1], rng)
    n_max = 2 * cfg.TPU.MAX_BOXES_PER_CLIP
    assert batch['data'].shape == (2, 4, 32, 32, 3)
    assert batch['labels'].shape == (n_max, 80)
    assert batch['proposals'].shape == (n_max, 5)
    assert batch['box_mask'].sum() >= 2  # >=1 box per clip
    # Padded rows have zero labels.
    pad = batch['box_mask'] == 0
    assert batch['labels'][pad].sum() == 0
    # proposals lie within the crop
    real = batch['box_mask'] == 1
    assert (batch['proposals'][real][:, 1:] <= 32).all()
    # original boxes stay normalized
    assert (batch['original_boxes'][real][:, 1:] <= 1.0 + 1e-6).all()
    # metadata carries original frame size (48, 64)
    assert (batch['metadata'][real][:, 2] == 48).all()
    assert (batch['metadata'][real][:, 3] == 64).all()


def test_ava_val_subset_rule(tmp_path):
    # val keyframes keep only sec % 4 == 0 when not full_eval
    cfg = small_cfg(synthetic.build_ava(str(tmp_path), num_secs=8))
    cfg.AVA.FULL_EVAL = False
    cfg.AVA.DETECTION_SCORE_THRESH = 0.85
    db = get_input_db(cfg, 'val')
    secs = {sec for _, sec, _ in db.keyframe_indices}
    assert all(s % 4 == 0 for s in secs)
    cfg2 = small_cfg(synthetic.build_ava(str(tmp_path), num_secs=8))
    cfg2.AVA.FULL_EVAL = True
    cfg2.AVA.DETECTION_SCORE_THRESH = 0.85
    db_full = get_input_db(cfg2, 'val')
    assert db_full.db_size() > db.db_size()


def test_ava_lfb_window_sampling():
    from lfb_tpu.data.ava import sample_lfb_window
    bank = {900: [np.full(8, 1.0), np.full(8, 2.0), np.full(8, 3.0)],
            901: [np.full(8, 4.0)]}
    rng = np.random.default_rng(0)
    out = sample_lfb_window(bank, 901, window_size=4, k=2, lfb_dim=8, rng=rng)
    assert out.shape == (8, 8)
    # window covers secs 899..902; sec 900 (slot 1) has 2 of 3 feats,
    # sec 901 (slot 2) has 1 feat then zero pad.
    assert np.abs(out[2 * 2]).sum() > 0 and np.abs(out[2 * 2 + 1]).sum() == 0
    assert np.abs(out[0:2]).sum() == 0  # sec 899 empty


# ----------------------------------------------------------------------- #
# loader
# ----------------------------------------------------------------------- #

def test_loader_ordering_and_determinism(tmp_path):
    cfg = small_cfg(synthetic.build_charades(str(tmp_path)))
    db = get_input_db(cfg, 'val')
    loader = DataLoader(db, batch_size=4, num_workers=4, prefetch=2, seed=7)
    batches1 = [b['data'].copy() for b in loader.batches(3)]
    loader2 = DataLoader(db, batch_size=4, num_workers=2, prefetch=3, seed=7)
    batches2 = [b['data'].copy() for b in loader2.batches(3)]
    for a, b in zip(batches1, batches2):
        np.testing.assert_array_equal(a, b)
    loader.shutdown()
    loader2.shutdown()


def test_loader_covers_db(tmp_path):
    cfg = small_cfg(synthetic.build_charades(str(tmp_path)))
    db = get_input_db(cfg, 'val')   # size 18
    loader = DataLoader(db, batch_size=4, seed=0)
    assert loader.num_batches() == 5  # ceil(18/4)
    n = sum(1 for _ in loader.batches())
    assert n == 5
    loader.shutdown()


def test_epic_noun_lfb_sampler():
    from lfb_tpu.data.epic import sample_noun_lfb
    rng = np.random.RandomState(0)
    # detector bank: frame -> (n_i, D) arrays
    bank = {30: rng.randn(4, 8).astype(np.float32),
            60: rng.randn(12, 8).astype(np.float32),
            2000: rng.randn(2, 8).astype(np.float32)}
    out = sample_noun_lfb(bank, center_idx=45, window_size=10,
                          max_per_frame=3, frames_per_second=1, fps=30,
                          lfb_dim=8)
    assert out.shape == (10, 8)
    # window = 10/3 secs around 45 -> frames ~[-5, 95]: frames 30, 60 hit.
    np.testing.assert_allclose(out[:3], bank[30][:3])
    np.testing.assert_allclose(out[3:6], bank[60][:3])
    assert np.abs(out[6:]).sum() == 0  # zero pad

    empty = sample_noun_lfb({}, center_idx=45, window_size=10,
                            max_per_frame=3, frames_per_second=1, fps=30,
                            lfb_dim=8)
    assert empty.shape == (10, 8) and np.abs(empty).sum() == 0


def test_noun_lfb_early_exit_at_window():
    from lfb_tpu.data.epic import sample_noun_lfb
    rng = np.random.RandomState(1)
    bank = {i: rng.randn(10, 4).astype(np.float32) for i in range(0, 300, 10)}
    out = sample_noun_lfb(bank, center_idx=150, window_size=5,
                          max_per_frame=10, frames_per_second=1, fps=30,
                          lfb_dim=4)
    assert out.shape == (5, 4)
    assert np.abs(out).sum() > 0


def test_ava_force_test_flip(tmp_path):
    cfg = small_cfg(synthetic.build_ava(str(tmp_path)))
    db = get_input_db(cfg, 'val')
    batch_plain = db.minibatch([0], np.random.default_rng(0))

    cfg2 = small_cfg(synthetic.build_ava(str(tmp_path)))
    cfg2.AVA.FORCE_TEST_FLIP = True
    db2 = get_input_db(cfg2, 'val')
    batch_flip = db2.minibatch([0], np.random.default_rng(0))

    # data is horizontally mirrored
    np.testing.assert_allclose(batch_flip['data'],
                               batch_plain['data'][:, :, :, ::-1, :],
                               rtol=1e-5)
    # boxes flipped: x1' = W - x2 - 1 in crop coords (before final clip)
    real = batch_plain['box_mask'] > 0
    p, f = batch_plain['proposals'][real], batch_flip['proposals'][real]
    np.testing.assert_allclose(f[:, 1], np.clip(32 - p[:, 3] - 1, 0, 31),
                               atol=1e-4)


def test_color_augmentation_path(tmp_path):
    cfg = C.finalize(C.default_config())
    cfg.TRAIN.USE_COLOR_AUGMENTATION = True
    cfg.TRAIN.PCA_JITTER_ONLY = True
    cfg.TRAIN.JITTER_SCALES = [36, 40]
    rng = np.random.default_rng(0)
    clip = np.random.RandomState(0).randint(
        0, 255, size=(2, 48, 64, 3)).astype(np.float32)
    out, _ = transforms.preprocess_clip(clip, is_train=True, crop_size=32,
                                        cfg=cfg, rng=rng)
    assert out.shape == (2, 32, 32, 3) and np.isfinite(out).all()

    cfg.TRAIN.PCA_JITTER_ONLY = False  # also exercise brightness/contrast/sat
    out2, _ = transforms.preprocess_clip(clip, is_train=True, crop_size=32,
                                         cfg=cfg, rng=np.random.default_rng(1))
    assert np.isfinite(out2).all()


def test_charades_test_enumeration_matches_aggregation_layout(tmp_path):
    """Test clip (video v, multi_clip c) must be db index v + c*num_videos,
    matching the metric aggregation (reference metrics.py:165-186)."""
    cfg = small_cfg(synthetic.build_charades(str(tmp_path)))
    db = get_input_db(cfg, 'val')
    rng = np.random.default_rng(0)
    # index 0 -> video 0 clip 0; index 2 -> video 0, multi_clip 1
    assert db.num_videos == 2
    b0 = db.minibatch([0], rng)
    b2 = db.minibatch([2], rng)
    # same video (identical video-level labels), different clip/shift
    np.testing.assert_array_equal(b0['labels'], b2['labels'])


def test_loader_propagates_worker_exceptions(tmp_path):
    """A failing minibatch build must surface loudly (the reference's
    Coordinator kills the process on worker exceptions; here the exception
    propagates from the prefetch future)."""
    cfg = small_cfg(synthetic.build_charades(str(tmp_path)))
    db = get_input_db(cfg, 'val')

    class BrokenDB:
        def db_size(self):
            return db.db_size()

        def minibatch(self, indices, rng):
            raise RuntimeError('decode exploded')

    loader = DataLoader(BrokenDB(), batch_size=4, num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match='decode exploded'):
        next(iter(loader.batches(1)))
    loader.shutdown()


def test_train_indices_cover_all_videos(tmp_path):
    """Regression: Charades training consumes loader indices directly; the
    train loader must traverse an epoch-shuffled permutation of the whole
    DB, not constant placeholder indices."""
    cfg = small_cfg(synthetic.build_charades(str(tmp_path), num_videos=2))
    db = get_input_db(cfg, 'train')

    class CountingDB:
        def db_size(self):
            return 10

        def minibatch(self, indices, rng):
            return {'indices': np.array(indices)}

    loader = DataLoader(CountingDB(), batch_size=4, is_train=True, seed=3)
    seen = []
    for i, b in enumerate(loader.batches(5)):
        seen.extend(b['indices'].tolist())
    loader.shutdown()
    # Two epochs of size 10: each index appears exactly twice.
    assert sorted(seen) == sorted(list(range(10)) * 2)
    # Shuffled, not sequential.
    assert seen[:10] != list(range(10))

    # Determinism across loader instances.
    loader2 = DataLoader(CountingDB(), batch_size=4, is_train=True, seed=3)
    seen2 = []
    for b in loader2.batches(5):
        seen2.extend(b['indices'].tolist())
    loader2.shutdown()
    assert seen == seen2

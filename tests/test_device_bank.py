import numpy as np

import jax
import jax.numpy as jnp

from lfb_tpu.bank.device_bank import (AvaDeviceBank, FrameDeviceBank,
                                      charades_window, epic_verb_window)
from lfb_tpu.data.ava import sample_lfb_window as host_ava_sample
from lfb_tpu.data.charades import sample_lfb_window as host_charades_sample
from lfb_tpu.data.epic import sample_verb_lfb as host_epic_sample


def make_ava_bank(dim=8, seed=0):
    rng = np.random.RandomState(seed)
    bank = {0: {}, 1: {}}
    for sec in range(902, 912):
        n = rng.randint(0, 4)
        if n:
            bank[0][sec] = [rng.randn(dim).astype(np.float32)
                            for _ in range(n)]
    bank[1][905] = [rng.randn(dim).astype(np.float32) for _ in range(7)]
    return bank


def test_ava_device_bank_matches_host_sets():
    dim, W, K = 8, 6, 2
    bank = make_ava_bank(dim)
    dev = AvaDeviceBank.build(bank, window_size=W, k=K, lfb_dim=dim)
    out = dev.gather(jnp.array([0, 1]), jnp.array([905, 905]),
                     jax.random.PRNGKey(0))
    assert out.shape == (2, W * K, dim)
    out = np.asarray(out)

    for b, video in enumerate((0, 1)):
        host = host_ava_sample(bank[video], 905, window_size=W, k=K,
                               lfb_dim=dim, rng=np.random.default_rng(0))
        for j, sec in enumerate(range(905 - W // 2, 905 - W // 2 + W)):
            feats = bank[video].get(sec, [])
            n_used = min(len(feats), K)
            block = out[b, j * K:(j + 1) * K]
            # first n_used rows are distinct bank features of this sec
            bank_set = {tuple(np.round(f, 5)) for f in feats}
            got = [tuple(np.round(r, 5)) for r in block[:n_used]]
            assert set(got) <= bank_set and len(set(got)) == n_used
            # remaining rows zero
            assert np.abs(block[n_used:]).sum() == 0
            # host block has the same structure
            hblock = host[j * K:(j + 1) * K]
            assert np.abs(hblock[n_used:]).sum() == 0


def test_frame_device_bank_matches_host_charades():
    dim, W = 8, 4
    rng = np.random.RandomState(0)
    bank = {0: {11: rng.randn(dim).astype(np.float32),
                23: rng.randn(dim).astype(np.float32),
                35: rng.randn(dim).astype(np.float32)},
            1: {5: rng.randn(dim).astype(np.float32)}}
    dev = FrameDeviceBank.build(bank, window_size=W, lfb_dim=dim)

    for video, center in [(0, 20), (0, 0), (1, 5), (1, 300)]:
        host = host_charades_sample(bank[video], center, window_size=W,
                                    clips_per_second=2, fps=24, lfb_dim=dim)
        begin, end = charades_window(jnp.array([center]), window_size=W,
                                     clips_per_second=2, fps=24)
        out = np.asarray(dev.gather(jnp.array([video]), begin, end))[0]
        np.testing.assert_allclose(out, host, rtol=1e-6, err_msg=str((video, center)))


def test_frame_device_bank_matches_host_epic_verb():
    dim, W = 8, 3
    rng = np.random.RandomState(1)
    bank = {'P01_00': {30 * i: rng.randn(dim).astype(np.float32)
                       for i in range(6)}}
    key_to_idx = {'P01_00': 0}
    dev = FrameDeviceBank.build(bank, key_to_idx, window_size=W, lfb_dim=dim)
    for center in (45, 0, 500):
        host = host_epic_sample(bank['P01_00'], center, window_size=W,
                                fps=30, lfb_dim=dim)
        lo, hi = epic_verb_window(jnp.array([center]), window_size=W, fps=30)
        out = np.asarray(dev.gather(jnp.array([0]), lo, hi))[0]
        np.testing.assert_allclose(out, host, rtol=1e-6, err_msg=str(center))


def test_gather_is_jittable():
    dim, W, K = 8, 4, 2
    bank = make_ava_bank(dim)
    dev = AvaDeviceBank.build(bank, window_size=W, k=K, lfb_dim=dim)
    fn = jax.jit(lambda v, s, r: dev.gather(v, s, r))
    out = fn(jnp.array([0]), jnp.array([905]), jax.random.PRNGKey(1))
    assert out.shape == (1, W * K, dim)


def test_charades_device_bank_end_to_end_matches_host(tmp_path):
    """Eval logits with TPU.DEVICE_BANK must equal the host-window path
    (Charades gathers are deterministic)."""
    import pytest
    pytest.importorskip('cv2')
    from tests import synthetic
    from lfb_tpu.core import config as C
    from lfb_tpu.data.loader import get_input_db
    from lfb_tpu.data.frame_lists import load_image_lists
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train.steps import make_eval_step

    overrides = synthetic.build_charades(str(tmp_path))
    cfg = C.default_config()
    synthetic.apply_overrides(cfg, overrides)
    cfg.TRAIN.VIDEO_LENGTH = cfg.TEST.VIDEO_LENGTH = 4
    cfg.TRAIN.SAMPLE_RATE = cfg.TEST.SAMPLE_RATE = 2
    cfg.TRAIN.CROP_SIZE = cfg.TEST.CROP_SIZE = 32
    cfg.TEST.SCALE = 36
    cfg.TRAIN.BATCH_SIZE = cfg.TEST.BATCH_SIZE = 2
    cfg.NUM_GPUS = 1
    cfg.LFB.ENABLED = True
    cfg.LFB.FBO_TYPE = 'nl'
    cfg.LFB.WINDOW_SIZE = 4
    cfg.TPU.COMPUTE_DTYPE = 'float32'
    cfg.TPU.USE_PALLAS = False
    cfg = C.finalize(cfg)

    paths, _, _, _ = load_image_lists(
        [str(tmp_path / 'frame_lists' / 'val.csv')], cfg.DATADIR)
    bank = synthetic.make_fake_frame_lfb(paths, dim=cfg.LFB.LFB_DIM)

    spec = build_spec(cfg, 'val')
    params = init_params(jax.random.PRNGKey(0), spec)

    # Host path.
    db_host = get_input_db(cfg, 'val', lfb=bank)
    batch_host = db_host.minibatch([0, 1], np.random.default_rng(3))
    out_host = make_eval_step(spec)(params, batch_host)

    # Device-bank path.
    cfg2 = C.clone(cfg, {'TPU.DEVICE_BANK': True})
    db_dev = get_input_db(cfg2, 'val', lfb=bank)
    assert db_dev.device_bank
    batch_dev = db_dev.minibatch([0, 1], np.random.default_rng(3))
    assert 'lfb' not in batch_dev and 'lfb_center' in batch_dev
    out_dev = make_eval_step(spec, bank=db_dev.lfb)(params, batch_dev)

    np.testing.assert_allclose(np.asarray(out_dev['logits']),
                               np.asarray(out_host['logits']),
                               rtol=1e-5, atol=1e-5)

def test_frame_device_bank_matches_host_epic_noun():
    """Noun banks: several detector feats per frame, per-frame cap, early-exit
    fill; flattened device gather must match the host sampler exactly."""
    from lfb_tpu.bank.device_bank import epic_noun_window
    from lfb_tpu.data.epic import sample_noun_lfb

    dim, W, mpf, nfs, fps = 8, 5, 2, 1, 30
    rng = np.random.RandomState(2)
    # Ragged: frames with 1..4 feats, one empty-list frame, sparse spacing.
    bank = {0: {10: rng.randn(3, dim).astype(np.float32),
                40: rng.randn(1, dim).astype(np.float32),
                70: [],
                75: rng.randn(4, dim).astype(np.float32),
                200: rng.randn(2, dim).astype(np.float32)},
            1: {0: rng.randn(2, dim).astype(np.float32)}}
    dev = FrameDeviceBank.build_noun(bank, window_size=W, max_per_frame=mpf,
                                     frames_per_second=nfs, fps=fps,
                                     lfb_dim=dim)
    for video, center in [(0, 50), (0, 10), (0, 75), (0, 1000), (1, 0),
                          (1, -5), (0, 201)]:
        host = sample_noun_lfb(bank[video], center, window_size=W,
                               max_per_frame=mpf, frames_per_second=nfs,
                               fps=fps, lfb_dim=dim)
        out = np.asarray(dev.gather_centers(jnp.array([video]),
                                            jnp.array([center])))[0]
        np.testing.assert_allclose(out, host, rtol=1e-6,
                                   err_msg=str((video, center)))
    # Window arithmetic == Python int() truncation, incl. negative lowers.
    for center in (-7, -1, 0, 3, 50):
        secs = float(W) / (mpf * nfs)
        lo_py = int(center - (secs / 2) * fps)
        hi_py = int(lo_py + secs * fps)
        lo, hi = epic_noun_window(jnp.array([center]), window_size=W,
                                  max_per_frame=mpf, frames_per_second=nfs,
                                  fps=fps)
        assert (int(lo[0]), int(hi[0])) == (lo_py, hi_py), center


def test_build_device_bank_epic_noun_route():
    from lfb_tpu.core import config as C
    from lfb_tpu.bank.device_bank import build_device_bank
    cfg = C.default_config()
    cfg.DATASET = 'epic'
    cfg.EPIC.CLASS_TYPE = 'noun'
    cfg.LFB.WINDOW_SIZE = 4
    cfg.LFB.LFB_DIM = 8
    cfg = C.finalize(cfg)
    rng = np.random.RandomState(0)
    bank = {0: {5: rng.randn(2, 8).astype(np.float32)}}
    dev = build_device_bank(cfg, bank)
    assert dev is not None and dev.window_mode == 'epic_noun'
    out = dev.gather_centers(jnp.array([0]), jnp.array([5]))
    assert out.shape == (1, 4, 8)


def test_ava_device_bank_stores_all_feats_by_default():
    """k_store=0 auto-sizes to the largest per-sec feature count, so gather
    samples from ALL features like the host sampler (reference
    ``ava.py:300-323``)."""
    dim, W, K, n = 4, 1, 3, 12
    feats = [np.full((dim,), float(i + 1), np.float32) for i in range(n)]
    bank = {0: {902: list(feats)}}
    dev = AvaDeviceBank.build(bank, window_size=W, k=K, lfb_dim=dim)
    assert dev.table.shape[-1] == n
    assert int(dev.counts[0, 0]) == n

    hits = np.zeros(n + 1)
    trials = 400
    for t in range(trials):
        out = np.asarray(dev.gather(jnp.array([0]), jnp.array([902]),
                                    jax.random.PRNGKey(t)))[0]
        ids = out[:, 0].astype(np.int64)          # K distinct tags in 1..n
        assert len(set(ids.tolist())) == K and ids.min() >= 1
        np.add.at(hits, ids, 1)
    # Marginal P(feature drawn) = K/n for every feature, same as the host
    # sampler; binomial(400, .25) stays within [60, 140] w.h.p.
    expected = trials * K / n
    assert hits[1:].min() > expected * 0.6, hits
    assert hits[1:].max() < expected * 1.4, hits

    host_hits = np.zeros(n + 1)
    for t in range(trials):
        out = host_ava_sample(bank[0], 902, window_size=W, k=K, lfb_dim=dim,
                              rng=np.random.default_rng(t))
        np.add.at(host_hits, out[:K, 0].astype(np.int64), 1)
    assert host_hits[1:].min() > expected * 0.6, host_hits
    assert host_hits[1:].max() < expected * 1.4, host_hits


def test_ava_device_bank_explicit_k_store_subsamples_uniformly():
    dim, W, K, n, ks = 4, 1, 2, 10, 6
    feats = [np.full((dim,), float(i + 1), np.float32) for i in range(n)]
    bank = {0: {902: list(feats)}}
    dev = AvaDeviceBank.build(bank, window_size=W, k=K, lfb_dim=dim,
                              k_store=ks)
    assert dev.table.shape[-1] == ks
    assert int(dev.counts[0, 0]) == ks
    stored = {int(v) for v in np.asarray(dev.feats)[:-1, 0]}
    assert len(stored) == ks and stored <= set(range(1, n + 1))


def test_frame_device_bank_explicit_max_per_video_subsamples_uniformly():
    """TPU.BANK_MAX_PER_VIDEO caps the per-video index-table width (auto
    width follows the single longest video); over-length videos keep a
    uniform, frame-ordered subsample."""
    dim, W, n, cap = 4, 6, 12, 6
    bank = {0: {f: np.full(dim, float(f + 1), np.float32) for f in range(n)},
            1: {f: np.full(dim, 100.0 + f, np.float32) for f in range(3)}}
    dev = FrameDeviceBank.build(bank, window_size=W, lfb_dim=dim,
                                max_per_video=cap)
    assert dev.frame_ids.shape[-1] == cap
    kept = np.asarray(dev.frame_ids[0])
    kept = kept[kept >= 0]
    assert len(kept) == cap and list(kept) == sorted(kept)  # frame order
    # Short videos are untouched.
    kept1 = np.asarray(dev.frame_ids[1])
    assert list(kept1[kept1 >= 0]) == [0, 1, 2]
    # A gather over the full window returns exactly the stored subsample.
    out = np.asarray(dev.gather(jnp.array([0]), jnp.array([0]),
                                jnp.array([n])))
    vals = {int(v) for v in out[0, :, 0] if v > 0}
    assert vals == {int(f) + 1 for f in kept}
    # Auto mode (0) stores everything.
    auto = FrameDeviceBank.build(bank, window_size=W, lfb_dim=dim)
    assert auto.frame_ids.shape[-1] == n


def test_bank_dtype_bfloat16_halves_storage_and_preserves_gather():
    """TPU.BANK_DTYPE 'bfloat16' stores feature rows in bf16 (index tables
    stay int32); gathers match the float32 bank to bf16 rounding."""
    from lfb_tpu.core import config as C
    from lfb_tpu.bank.device_bank import build_device_bank

    def cfg_for(dtype):
        cfg = C.default_config()
        cfg.DATASET = 'ava'
        cfg.LFB.WINDOW_SIZE = 3
        cfg.LFB.LFB_DIM = 8
        cfg.AVA.LFB_MAX_NUM_FEAT_PER_STEP = 2
        cfg.TPU.BANK_DTYPE = dtype
        return C.finalize(cfg)

    bank = make_ava_bank()
    dev32 = build_device_bank(cfg_for('float32'), bank)
    dev16 = build_device_bank(cfg_for('bfloat16'), bank)
    assert dev32.feats.dtype == jnp.float32
    assert dev16.feats.dtype == jnp.bfloat16
    assert dev16.table.dtype == jnp.int32
    assert dev16.feats.nbytes * 2 == dev32.feats.nbytes

    video = jnp.array([0, 1])
    sec = jnp.array([905, 905])
    key = jax.random.PRNGKey(0)
    out32 = dev32.gather(video, sec, key)
    out16 = dev16.gather(video, sec, key)
    assert out16.dtype == jnp.bfloat16
    # Same rows drawn (same seed/table); values equal to bf16 rounding.
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), rtol=1e-2, atol=1e-2)

    # Frame-level route too (charades): dtype flows through.
    cfg_c = C.default_config()
    cfg_c.DATASET = 'charades'
    cfg_c.LFB.WINDOW_SIZE = 4
    cfg_c.LFB.LFB_DIM = 8
    cfg_c.TPU.BANK_DTYPE = 'bfloat16'
    cfg_c = C.finalize(cfg_c)
    rng = np.random.RandomState(1)
    fbank = {0: {f: rng.randn(8).astype(np.float32) for f in range(0, 48, 12)}}
    devc = build_device_bank(cfg_c, fbank)
    assert devc.feats.dtype == jnp.bfloat16


def test_sharded_rows_lookup_matches_direct(eight_devices):
    """Row lookup from a mesh-sharded feature table (index all_gather +
    masked local gather + psum_scatter) == direct feats[rows]."""
    from jax.sharding import PartitionSpec as P
    from lfb_tpu.bank.device_bank import sharded_rows_lookup
    from lfb_tpu.parallel import create_mesh

    mesh = create_mesh(8)
    rng = np.random.RandomState(0)
    R, D, N, M = 37, 8, 16, 5                      # R not divisible by 8
    feats = rng.randn(R, D).astype(np.float32)
    rows = rng.randint(0, R, size=(N, M)).astype(np.int32)
    expected = feats[rows]

    pad = (-R) % 8
    feats_padded = np.concatenate([feats, np.zeros((pad, D), np.float32)])

    out = jax.jit(jax.shard_map(
        lambda f, r: sharded_rows_lookup(f, r, 'data'),
        mesh=mesh, in_specs=(P('data'), P('data')), out_specs=P('data'),
    ))(jnp.asarray(feats_padded), jnp.asarray(rows))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_sharded_frame_bank_matches_replicated(eight_devices):
    """ShardedDeviceBank.local_view window gathers == the replicated bank
    (frame-bank gathers are deterministic), with per-chip feature storage
    1/8 of the table."""
    from jax.sharding import PartitionSpec as P
    from lfb_tpu.bank.device_bank import shard_bank
    from lfb_tpu.parallel import create_mesh

    dim, W = 8, 4
    rng = np.random.RandomState(3)
    bank = {v: {f: rng.randn(dim).astype(np.float32)
                for f in range(0, 24 * (v + 3), 12)} for v in range(4)}
    dev = FrameDeviceBank.build(bank, window_size=W, lfb_dim=dim)
    videos = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int32)
    centers = np.array([20, 5, 40, 0, 0, 300, 13, 27], np.int32)
    expected = np.asarray(dev.gather_centers(jnp.asarray(videos),
                                             jnp.asarray(centers)))

    mesh = create_mesh(8)
    sharded = shard_bank(FrameDeviceBank.build(bank, window_size=W,
                                               lfb_dim=dim), mesh)
    assert sharded.inner.feats is None              # replicated copy dropped
    # Each device addresses only its 1/8 row shard.
    shard_rows = {s.data.shape[0] for s in sharded.feats.addressable_shards}
    assert shard_rows == {sharded.feats.shape[0] // 8}

    out = jax.jit(jax.shard_map(
        lambda f, v, c: sharded.local_view(f).gather_centers(v, c),
        mesh=mesh, in_specs=(P('data'), P('data'), P('data')),
        out_specs=P('data'),
    ))(sharded.feats, jnp.asarray(videos), jnp.asarray(centers))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_bank_sharded_requires_shard_map_config():
    import pytest
    from lfb_tpu.core import config as C
    cfg = C.default_config()
    cfg.TPU.BANK_SHARDED = True
    cfg.TPU.DEVICE_BANK = True
    with pytest.raises(AssertionError, match='SHARD_MAP'):
        C.finalize(cfg)
    cfg.TPU.SHARD_MAP = True
    C.finalize(cfg)    # valid together
    # ... and a device bank: with DEVICE_BANK off the dataset keeps a host
    # bank and BANK_SHARDED would silently do nothing.
    cfg.TPU.DEVICE_BANK = False
    with pytest.raises(AssertionError, match='DEVICE_BANK'):
        C.finalize(cfg)


def test_shard_bank_rewrap_reuses_wrapper(eight_devices):
    """Wrapping the same inner bank twice (one pre-built device bank used as
    both train and test bank) returns the cached wrapper instead of dying on
    the dropped feature table; a direct second ShardedDeviceBank() raises a
    clear error."""
    import pytest
    from lfb_tpu.bank.device_bank import (FrameDeviceBank, ShardedDeviceBank,
                                          shard_bank)
    from lfb_tpu.parallel import create_mesh

    bank = {0: {f: np.full(4, f, np.float32) for f in range(0, 32, 4)}}
    inner = FrameDeviceBank.build(bank, window_size=4, lfb_dim=4)
    mesh = create_mesh(8)
    first = shard_bank(inner, mesh)
    assert shard_bank(inner, mesh) is first          # idempotent on inner
    assert shard_bank(first, mesh) is first          # idempotent on wrapper
    with pytest.raises(ValueError, match='already sharded'):
        ShardedDeviceBank(inner, mesh)

"""Real-scale LFB resource rehearsal on the TPU chip.

Every prior on-chip probe used toy banks (a 300-row window); the reference
operates at 3.3 GB (AVA) / 4.4 GB (Charades) bank scale
(``/root/reference/GETTING_STARTED.md:45``) with 235-video x 897-second
index spans.  This tool synthesizes a bank at REAL scale, loads it into
HBM through the full ``AvaDeviceBank``/``FrameDeviceBank`` build path, and
measures what actually fits next to the flagship model:

  * bank build + host->device transfer time for the multi-GB feature table,
  * index-table HBM footprint,
  * device-bank FBO inference (R101-I3D LFB-NL-3L, 32x224x224, 4 boxes/clip)
    at a descending batch ladder -- largest batch that fits + throughput,
  * the same with ``--bank-dtype bfloat16`` (half the bank HBM),
  * ``--sharded``: the TPU.BANK_SHARDED path (all_gather + psum_scatter
    window reassembly) on a real-chip mesh,
  * ``--extract``: phase-A bank-extraction throughput + an estimate of the
    full-split sweep time at real keyframe counts.

Usage:
  python tools/bank_rehearsal.py [--dataset ava|charades]
      [--bank-dtype float32,bfloat16] [--batches 48,32,16,8]
      [--videos N] [--sharded] [--extract] [--iters 10]

Results land in BENCHMARKS.md (round 4) -- this replaces the sizing
arithmetic with measurement.
"""

import argparse
import contextlib
import json
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
logging.basicConfig(level=logging.INFO,
                    format='%(asctime)s %(name)s: %(message)s')
logger = logging.getLogger('bank_rehearsal')

GB = float(2 ** 30)


def synthesize_ava_host_bank(num_videos: int, seed: int = 0,
                             fast_fill: bool = False):
    """AVA-realistic host bank: {video: {sec: [feat, ...]}}.

    Real AVA train banks hold detector-box features for ~235 videos over
    seconds 902..1798 (``lib/datasets/ava.py:106-124``), averaging ~2
    person boxes per second with crowded-scene outliers.  Count model:
    Poisson(2) clipped to 25 (the reference caps nothing; 25 exercises the
    auto-``k_store`` table sizing), features ReLU-like half-normals --
    ~420k x 2048 f32 ~= 3.3 GB, matching the published bank size
    (``GETTING_STARTED.md:45``).

    ``fast_fill`` tiles one 4096-row random block instead of drawing 860M
    normals (which took 300s under co-tenant CPU steal on the 1-vCPU
    container) -- identical shapes/footprint, repeated content; used by
    ``bench.py``'s real-bank headline phase where only throughput matters.
    """
    from lfb_tpu.bank.device_bank import AVA_NUM_SECS, AVA_SEC_BASE
    rng = np.random.default_rng(seed)
    counts = rng.poisson(2.0, size=(num_videos, AVA_NUM_SECS)).clip(0, 25)
    total = int(counts.sum())
    t0 = time.perf_counter()
    # One bulk draw, then views: per-feature draws would dominate runtime.
    if fast_fill:
        block = np.abs(rng.standard_normal((4096, 2048), np.float32)) * 0.5
        feats = np.tile(block, (-(-total // 4096), 1))[:total]
    else:
        feats = np.abs(rng.standard_normal((total, 2048), np.float32)) * 0.5
    bank = {}
    pos = 0
    for v in range(num_videos):
        secs = {}
        for si in np.nonzero(counts[v])[0]:
            n = int(counts[v, si])
            secs[int(si) + AVA_SEC_BASE] = list(feats[pos:pos + n])
            pos += n
        bank[v] = secs
    logger.info('synthesized AVA host bank: %d videos, %d feats (%.2f GB '
                'f32) in %.1fs', num_videos, total, total * 2048 * 4 / GB,
                time.perf_counter() - t0)
    return bank, total


def synthesize_charades_host_bank(num_videos: int, seed: int = 0):
    """Charades-realistic host bank: {video: {frame: feat}}.

    Real Charades banks are 4.4 GB over ~9.8k train videos, one 2048-d
    feature per LFB clip (every FPS/2=12 frames, ~30 s average video ->
    ~60 entries/video; ``lib/datasets/charades.py:235-248``).
    """
    rng = np.random.default_rng(seed)
    per_video = rng.integers(20, 90, size=num_videos)   # ~55 avg -> ~4.4 GB
    per_video[0] = 600   # one outlier-length video (the table-sizing case)
    total = int(per_video.sum())
    feats = np.abs(rng.standard_normal((total, 2048), np.float32)) * 0.5
    bank = {}
    pos = 0
    for v in range(num_videos):
        n = int(per_video[v])
        bank[v] = {int(12 * (j + 1)): feats[pos + j] for j in range(n)}
        pos += n
    logger.info('synthesized Charades host bank: %d videos, %d feats '
                '(%.2f GB f32)', num_videos, total, total * 2048 * 4 / GB)
    return bank, total


def build_device_bank_timed(cfg, host_bank):
    import jax
    from lfb_tpu.bank.device_bank import build_device_bank
    t0 = time.perf_counter()
    with phase_deadline('bank build/transfer'):
        bank = build_device_bank(cfg, host_bank)
        jax.block_until_ready(bank.feats)
    dt = time.perf_counter() - t0
    feat_gb = bank.feats.size * bank.feats.dtype.itemsize / GB
    if hasattr(bank, 'table'):
        idx_bytes = bank.table.size * 4 + bank.counts.size * 4
        k_store = bank.table.shape[-1]
    else:
        idx_bytes = bank.frame_ids.size * 4 + bank.rows.size * 4
        k_store = bank.frame_ids.shape[-1]
    logger.info('device bank built+resident in %.1fs: feats %s %s = %.2f GB '
                '(%.0f MB/s into HBM), index tables %.1f MiB (width %d)',
                dt, bank.feats.shape, bank.feats.dtype, feat_gb,
                feat_gb * 1024 / max(dt, 1e-9), idx_bytes / 2 ** 20, k_store)
    return bank, {'build_s': round(dt, 1), 'feat_gb': round(feat_gb, 2),
                  'index_mib': round(idx_bytes / 2 ** 20, 1),
                  'table_width': k_store}


def flagship_cfg(dataset: str, bank_dtype: str, sharded: bool):
    from __graft_entry__ import _flagship_cfg
    from lfb_tpu.core.config import clone
    over = {'TPU.DEVICE_BANK': True, 'TPU.BANK_DTYPE': bank_dtype}
    if sharded:
        over.update({'TPU.SHARD_MAP': True, 'TPU.BANK_SHARDED': True})
    cfg = clone(_flagship_cfg(tiny=False), over)
    if dataset == 'charades':
        cfg = clone(cfg, {
            'DATASET': 'charades', 'MODEL.NUM_CLASSES': 157,
            'LFB.WINDOW_SIZE': 20, 'CHARADES.FPS': 24,
            'CHARADES.LFB_CLIPS_PER_SECOND': 2})
    return cfg


def make_batch(cfg, spec, batch_clips: int, num_videos: int, seed: int = 0):
    """Synthetic eval batch; LFB windows come from the device bank (no
    'lfb' blob), keyed by metadata (AVA) / center indices (Charades)."""
    import jax
    rng = np.random.RandomState(seed)
    t, crop = cfg.TEST.VIDEO_LENGTH, cfg.TEST.CROP_SIZE
    batch = {'data': jax.device_put(
        rng.randn(batch_clips, t, crop, crop, 3).astype(np.float32))}
    if cfg.DATASET == 'ava':
        boxes_per_clip = 4
        n = batch_clips * boxes_per_clip
        batch['proposals'] = jax.device_put(np.stack([
            np.repeat(np.arange(batch_clips), boxes_per_clip).astype(
                np.float32),
            rng.uniform(0, crop / 2, n).astype(np.float32),
            rng.uniform(0, crop / 2, n).astype(np.float32),
            rng.uniform(crop / 2, crop, n).astype(np.float32),
            rng.uniform(crop / 2, crop, n).astype(np.float32)], axis=1))
        batch['metadata'] = jax.device_put(np.stack([
            rng.randint(0, num_videos, n).astype(np.float32),
            rng.randint(902, 1799, n).astype(np.float32),
            np.full(n, 400.0, np.float32),
            np.full(n, 600.0, np.float32)], axis=1))
    else:
        batch['lfb_video_idx'] = jax.device_put(
            rng.randint(0, num_videos, batch_clips).astype(np.int32))
        batch['lfb_center'] = jax.device_put(
            rng.randint(24, 24 * 60, batch_clips).astype(np.int32))
    return batch


PHASE_TIMEOUT_S = int(os.environ.get('LFB_BENCH_TIMEOUT_S', '900'))


@contextlib.contextmanager
def phase_deadline(label: str):
    """Bound one compile+measure phase: the remote compile service has
    observed outage windows (BENCH_r01; a 40+ min stall on this very tool's
    first run), and a stalled phase must fail loudly instead of eating the
    whole rehearsal."""
    def on_alarm(signum, frame):
        raise TimeoutError('{} exceeded {}s (remote compile stall?)'.format(
            label, PHASE_TIMEOUT_S))
    prev = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(PHASE_TIMEOUT_S)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


def _is_oom(exc) -> bool:
    msg = '{}: {}'.format(type(exc).__name__, exc).lower()
    return 'resource_exhausted' in msg or 'out of memory' in msg or \
        'allocat' in msg and 'fail' in msg


def time_step(step, params, batch, iters: int) -> float:
    """Sequential timed calls with a host sync per iter (conservative; the
    multi-GB resident bank rules out the fori_loop wrapper's extra copy)."""
    import jax
    out = step(params, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(params, batch)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run_inference_ladder(cfg, bank, num_videos, batches, iters, sharded):
    import jax
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.train.steps import make_eval_step

    spec = build_spec(cfg, 'test')
    params = jax.device_put(init_params(jax.random.PRNGKey(0), spec))
    mesh = None
    if sharded:
        from lfb_tpu.bank.device_bank import shard_bank
        from lfb_tpu.parallel import create_mesh
        mesh = create_mesh(jax.local_device_count())
        bank = shard_bank(bank, mesh)

    results = []
    for b in batches:
        step = make_eval_step(spec, mesh=mesh, bank=bank,
                              use_shard_map=sharded)
        batch = make_batch(cfg, spec, b, num_videos)
        try:
            with phase_deadline('inference B={}'.format(b)):
                t0 = time.perf_counter()
                dt = time_step(step, params, batch, iters)
                compile_s = time.perf_counter() - t0 - dt * iters
            cps = b / dt
            logger.info('B=%d: %.1f clips/sec/chip (%.0f ms/step, compile '
                        '%.0fs)', b, cps, dt * 1e3, compile_s)
            results.append({'batch': b, 'clips_per_sec': round(cps, 2),
                            'ms_per_step': round(dt * 1e3, 1)})
            break   # descending ladder: first fit is the answer
        except TimeoutError as e:
            logger.warning('%s; aborting this ladder', e)
            results.append({'batch': b, 'stall': True})
            break
        except Exception as e:
            if not _is_oom(e):
                raise
            logger.info('B=%d: OOM (%s)', b, str(e).split('\n')[0][:140])
            results.append({'batch': b, 'oom': True})
    return results


def run_train_ladder(cfg, bank, num_videos, batches, iters, sharded=False):
    """FBO-NL TRAINING with the real-scale bank resident -- the reference's
    main LFB workflow (train the bank-attending model against a frozen
    baseline's bank, ``GETTING_STARTED.md`` stage 2).  The r4 rehearsal
    covered eval only; this measures whether the full train step
    (fwd+bwd+SGD at train shapes, 32x224x224) fits HBM NEXT TO the bank
    and at what clips/sec.  With ``sharded``, the TPU.BANK_SHARDED
    shard_map train step runs instead (row-sharded feature table +
    all_gather/psum_scatter window reassembly) on the real-chip mesh."""
    import jax
    import jax.numpy as jnp
    from lfb_tpu.core.config import clone
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.models.model import frozen_param_names
    from lfb_tpu.train import optimizer as opt
    from lfb_tpu.train.steps import make_train_step, split_params

    cfg = clone(cfg, {'TPU.REMAT': ''})
    spec = build_spec(cfg, 'train')
    from lfb_tpu.parallel import shard_batch
    mesh = None
    if sharded:
        from lfb_tpu.bank.device_bank import shard_bank
        from lfb_tpu.parallel import create_mesh
        mesh = create_mesh(jax.local_device_count())
        bank = shard_bank(bank, mesh)
    results = []
    for b in batches:
        params = init_params(jax.random.PRNGKey(0), spec)
        trainable, frozen = split_params(spec, params)
        mstate = opt.init_state(params, frozen_param_names(spec, params))
        step = make_train_step(spec, cfg.SOLVER, mesh=mesh, bank=bank,
                               use_shard_map=sharded)

        rng = np.random.RandomState(0)
        t, crop = cfg.TRAIN.VIDEO_LENGTH, cfg.TRAIN.CROP_SIZE
        batch = make_batch(cfg, spec, b, num_videos)
        # Train shapes override the eval-sized data/proposal blobs (train
        # crop 224 vs test 256), plus the labels the train step needs.
        batch['data'] = jax.device_put(
            0.1 * rng.randn(b, t, crop, crop, 3).astype(np.float32))
        if cfg.DATASET == 'ava':
            # Per-box rows (clip-aligned) for the RoI head.
            bpc = 4
            n = b * bpc
            batch['proposals'] = jax.device_put(np.stack([
                np.repeat(np.arange(b), bpc).astype(np.float32),
                rng.uniform(0, crop / 2, n).astype(np.float32),
                rng.uniform(0, crop / 2, n).astype(np.float32),
                rng.uniform(crop / 2, crop, n).astype(np.float32),
                rng.uniform(crop / 2, crop, n).astype(np.float32)], axis=1))
            batch['box_mask'] = jax.device_put(np.ones(n, np.float32))
        else:
            # Clip-level (basic head): one label row per clip, no boxes.
            n = b
        batch['labels'] = jax.device_put(
            (rng.rand(n, cfg.MODEL.NUM_CLASSES) > 0.95).astype(np.float32))
        if mesh is not None:
            batch = shard_batch(mesh, {k: np.asarray(v)
                                       for k, v in batch.items()})
        try:
            with phase_deadline('train B={}'.format(b)):
                state = (trainable, frozen, mstate)
                out = step(*state, batch, jax.random.PRNGKey(0),
                           jnp.float32(1e-4))
                state = out[:3]
                float(out[3]['loss'])
                t0 = time.perf_counter()
                for i in range(iters):
                    out = step(*state, batch, jax.random.PRNGKey(i),
                               jnp.float32(1e-4))
                    state = out[:3]
                float(out[3]['loss'])
                dt = (time.perf_counter() - t0) / iters
            cps = b / dt
            logger.info('train B=%d with resident bank: %.1f clips/sec/chip '
                        '(%.0f ms/step)', b, cps, dt * 1e3)
            results.append({'batch': b, 'clips_per_sec': round(cps, 2),
                            'ms_per_step': round(dt * 1e3, 1)})
            break
        except TimeoutError as e:
            logger.warning('%s; aborting train ladder', e)
            results.append({'batch': b, 'stall': True})
            break
        except Exception as e:
            if not _is_oom(e):
                raise
            logger.info('train B=%d: OOM', b)
            results.append({'batch': b, 'oom': True})
    return results


def run_extract(cfg, num_videos, batches, iters):
    """Phase-A rehearsal: lfb_infer_only sweep throughput + full-split
    estimate at real AVA keyframe counts (one clip per annotated second,
    ``tools/lfb_loader.py:203-220``)."""
    import jax
    from lfb_tpu.models import build_spec, forward, init_params
    from lfb_tpu.train.steps import make_eval_step

    spec = build_spec(cfg, 'test', lfb_infer_only=True)
    params = jax.device_put(init_params(jax.random.PRNGKey(0), spec))
    step = make_eval_step(spec)
    out = []
    for b in batches:
        batch = make_batch(cfg, spec, b, num_videos)
        batch.pop('metadata', None)
        try:
            with phase_deadline('extract B={}'.format(b)):
                dt = time_step(step, params, batch, iters)
        except TimeoutError as e:
            logger.warning('%s; aborting extraction ladder', e)
            out.append({'batch': b, 'stall': True})
            break
        except Exception as e:
            if not _is_oom(e):
                raise
            logger.info('extract B=%d: OOM', b)
            out.append({'batch': b, 'oom': True})
            continue
        cps = b / dt
        total_clips = num_videos * 897      # every annotated second
        est_min = total_clips / cps / 60.0
        logger.info('extract B=%d: %.1f clips/sec/chip; full %d-video split '
                    '(%d clips) ~= %.1f min/sweep', b, cps, num_videos,
                    total_clips, est_min)
        out.append({'batch': b, 'clips_per_sec': round(cps, 2),
                    'full_split_min': round(est_min, 1)})
        break
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dataset', default='ava', choices=['ava', 'charades'])
    p.add_argument('--bank-dtype', default='float32,bfloat16')
    p.add_argument('--batches', default='48,32,16,8')
    p.add_argument('--videos', type=int, default=0,
                   help='0 = real scale (235 AVA / 9800 Charades)')
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--sharded', action='store_true')
    p.add_argument('--extract', action='store_true')
    p.add_argument('--train', action='store_true',
                   help='also rehearse the FBO-NL TRAIN step next to the '
                        'resident bank (descending --train-batches ladder)')
    p.add_argument('--train-batches', default='8,4')
    args = p.parse_args()

    num_videos = args.videos or (235 if args.dataset == 'ava' else 9800)
    batches = [int(b) for b in args.batches.split(',')]

    if args.dataset == 'ava':
        host_bank, total = synthesize_ava_host_bank(num_videos)
    else:
        host_bank, total = synthesize_charades_host_bank(num_videos)

    report = {'dataset': args.dataset, 'videos': num_videos,
              'bank_rows': total, 'sharded': args.sharded, 'runs': []}
    for dtype in args.bank_dtype.split(','):
        cfg = flagship_cfg(args.dataset, dtype, args.sharded)
        bank, build_stats = build_device_bank_timed(cfg, host_bank)
        ladder = run_inference_ladder(cfg, bank, num_videos, batches,
                                      args.iters, args.sharded)
        run = {'bank_dtype': dtype, **build_stats, 'inference': ladder}
        if args.extract and dtype == args.bank_dtype.split(',')[0]:
            run['extract'] = run_extract(cfg, num_videos, batches, args.iters)
        if args.train and dtype == args.bank_dtype.split(',')[0]:
            run['train'] = run_train_ladder(
                cfg, bank, num_videos,
                [int(b) for b in args.train_batches.split(',')], args.iters,
                sharded=args.sharded)
        report['runs'].append(run)
        # Free the bank before the next dtype variant claims HBM.
        del bank
        import gc
        gc.collect()

    print(json.dumps(report))


if __name__ == '__main__':
    main()

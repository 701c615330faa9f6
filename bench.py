"""Benchmark: flagship-model inference throughput on the real TPU chip.

Measures the two-phase LFB inference flow of the reference's headline config
(ava_r101_lfb_nl_3l, ``BASELINE.md``):

  phase A -- bank extraction: lfb_infer_only forward sweeps (box_pooled
             features), reference ``tools/lfb_loader.py:203-220``.
  phase B -- FBO inference: full model, RoIAlign head + 3-layer FBO-NL over
             a 300-row HBM-resident bank window.

Timing runs the jitted step inside an on-device ``lax.fori_loop`` with a
data dependency between iterations and a single scalar host fetch -- the
only reliable wall-clock method on tunneled TPU backends where
``block_until_ready`` can return early.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": R}

The reference publishes no throughput numbers (SURVEY.md §6).  ``vs_baseline``
is computed against a documented nominal estimate of the reference's per-GPU
inference throughput on its 2019-era 8x V100 setup: ~8 clips/sec/GPU for
R101-I3D-NL at 32x224x224 including the Python/BlobsQueue host loop.  The
>=10x north-star in BASELINE.md therefore corresponds to vs_baseline >= 10.
"""

import json
import os
import signal
import sys
import time

import numpy as np

REFERENCE_CLIPS_PER_SEC_PER_GPU = 8.0
# Compile watchdog: the remote-compile service can stall indefinitely; emit
# an explicit failure line rather than hanging the harness.
BENCH_TIMEOUT_S = int(os.environ.get('LFB_BENCH_TIMEOUT_S', '900'))


# Explicit armed-state flag, set only by main().  Inferring armedness from
# ``signal.alarm(0)``'s return value silently disarms the watchdog when the
# remaining time rounds to 0 (or the alarm just fired), and arms a stray
# alarm in importers of this module (the SIGALRM leak that once killed the
# test suite mid-run).
_WATCHDOG_ARMED = False


def _rearm_watchdog():
    """Reset the stall watchdog after a completed milestone (compile, timed
    loop).  The alarm bounds time WITHOUT PROGRESS, not total runtime: a
    cold remote-compile service can legitimately take several minutes per
    program, and the run must not be declared hung while it is advancing."""
    if _WATCHDOG_ARMED:
        signal.alarm(BENCH_TIMEOUT_S)


# Substrings identifying transient tunnel/backend failures worth retrying
# (the axon TPU tunnel drops connections and the remote compile service has
# nondeterministic outages -- see BENCH_r01: a device_put FailedPrecondition).
_TRANSIENT_MARKERS = (
    'failed_precondition', 'failed precondition', 'unavailable',
    'deadline', 'connection', 'socket', 'reset by peer', 'broken pipe',
    'internal: ', 'aborted', 'transport', 'http', 'stream removed',
)


# Deterministic failures that can arrive wrapped in transient-looking
# transport errors (the remote compile service reports compiler errors as
# HTTP 500s): never retry these.
_PERMANENT_MARKERS = (
    'out of memory', 'resource_exhausted', 'mosaic', 'invalid_argument',
    'permanent error', 'unimplemented',
)


def _is_transient(exc) -> bool:
    msg = '{}: {}'.format(type(exc).__name__, exc).lower()
    if any(m in msg for m in _PERMANENT_MARKERS):
        return False
    return any(m in msg for m in _TRANSIENT_MARKERS)


def run_with_retries(fn, attempts=3, backoff_s=20):
    """Run ``fn()`` retrying transient tunnel/backend failures.

    Each retry re-invokes ``fn`` from scratch, so device arrays and compiled
    executables are rebuilt against a fresh backend connection.
    """
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - classify then re-raise
            if attempt + 1 >= attempts or not _is_transient(e):
                raise
            print('# transient backend error (attempt {}/{}): {}; retrying '
                  'in {}s'.format(attempt + 1, attempts, e, backoff_s),
                  file=sys.stderr)
            # Reset the watchdog for the retry.  _rearm_watchdog only arms
            # when main() flagged the watchdog on: unconditionally arming
            # here would leave a stray SIGALRM in importers of this module
            # (e.g. the test suite), which the default handler later kills.
            _rearm_watchdog()
            time.sleep(backoff_s)


def _timeout_handler(signum, frame):
    mode = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].isdigit() \
        else 'inference'
    metric, unit, why = {
        'train': ('train clips/sec/chip (fwd+bwd+SGD, R101 LFB-NL-3L)',
                  'clips/sec/chip', 'TPU compile service stall'),
        'data': ('data clips/sec (JPEG decode + train preprocess + '
                 'device_put)', 'clips/sec', 'host pipeline stall'),
        'e2e': ('e2e train clips/sec (Trainer.train)', 'clips/sec',
                'TPU compile service stall'),
    }.get(mode, ('clips/sec/chip (bank extraction + FBO inference)',
                 'clips/sec/chip', 'TPU compile service stall'))
    print(json.dumps({
        'metric': metric,
        'value': 0.0, 'unit': unit, 'vs_baseline': 0.0,
        'error': 'timeout after {}s without progress ({})'.format(
            BENCH_TIMEOUT_S, why)}))
    sys.stdout.flush()
    os._exit(1)


def timed_device_loop(step_fn, args, iters):
    """Run step_fn(args) -> pytree, `iters` times with an inter-iteration
    dependency, entirely on device; returns seconds/iter."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(i, carry):
            args, acc = carry
            out = step_fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            dep = jnp.sum(leaf).astype(jnp.float32)
            # Perturb the first arg tensor by 0*dep to serialize iterations.
            first, *rest = args
            first = first + (0.0 * dep).astype(first.dtype)
            return ((first, *rest), acc + dep)
        return jax.lax.fori_loop(0, iters, body, (args, jnp.float32(0)))[1]

    float(loop(args))  # compile + warm
    _rearm_watchdog()
    t0 = time.perf_counter()
    float(loop(args))
    _rearm_watchdog()
    return (time.perf_counter() - t0) / iters


def bench_train(batch_clips: int, iters: int):
    """Optional mode (``python bench.py train [B] [iters]``): flagship
    training-step throughput (fwd+bwd+SGD)."""
    import jax
    import jax.numpy as jnp
    from lfb_tpu.models import build_spec, init_params
    from lfb_tpu.models.model import frozen_param_names
    from lfb_tpu.train import optimizer as opt
    from lfb_tpu.train.steps import make_train_step, split_params
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(tiny=False)
    cfg.TRAIN.VIDEO_LENGTH = 32
    cfg.TRAIN.CROP_SIZE = 224
    # The flagship at B<=8 fits HBM without rematerialization (+15% step
    # speed); TPU.REMAT='stage' remains the default for larger configs.
    cfg.TPU.REMAT = ''
    spec = build_spec(cfg, 'train')
    params = init_params(jax.random.PRNGKey(0), spec)
    trainable, frozen = split_params(spec, params)
    mstate = opt.init_state(params, frozen_param_names(spec, params))
    step = make_train_step(spec, cfg.SOLVER, mesh=None)

    rng = np.random.RandomState(0)
    boxes_per_clip = 4
    n = batch_clips * boxes_per_clip
    t, crop = cfg.TRAIN.VIDEO_LENGTH, cfg.TRAIN.CROP_SIZE
    batch = {
        'data': jax.device_put(
            0.1 * rng.randn(batch_clips, t, crop, crop, 3).astype(np.float32)),
        'labels': jax.device_put(
            (rng.rand(n, 80) > 0.95).astype(np.float32)),
        'proposals': jax.device_put(np.stack(
            [np.repeat(np.arange(batch_clips), boxes_per_clip)]
            + [rng.uniform(0, crop, n) for _ in range(4)], 1).astype(np.float32)),
        'box_mask': jax.device_put(np.ones(n, np.float32)),
        'lfb': jax.device_put(
            rng.randn(n, spec.fbo.num_lfb_feat, 2048).astype(np.float32)),
    }

    # Warm (compiles), then time sequential steps with a host sync each.
    state = (trainable, frozen, mstate)
    state = step(*state, batch, jax.random.PRNGKey(0), jnp.float32(1e-4))[:3]
    float(state[2].momentum['pred_w'].sum())
    _rearm_watchdog()
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(*state, batch, jax.random.PRNGKey(i), jnp.float32(1e-4))
        state = out[:3]
    float(out[3]['loss'])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        'metric': 'train clips/sec/chip (fwd+bwd+SGD, R101 LFB-NL-3L)',
        'value': round(batch_clips / dt, 2), 'unit': 'clips/sec/chip',
        'vs_baseline': None}))


def _write_bench_frames(root: str, num_frames: int, h: int, w: int) -> str:
    """Synthetic video-like JPEGs (smooth content + sensor noise, quality 90
    -- decode cost comparable to real AVA frames).  Returns frame-list dir."""
    import cv2
    vdir = os.path.join(root, 'frames', 'BENCH00')
    done_marker = os.path.join(root, '.done_{}_{}x{}'.format(
        num_frames, h, w))
    os.makedirs(vdir, exist_ok=True)
    if not os.path.isfile(done_marker):
        rng = np.random.RandomState(0)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        for i in range(num_frames):
            base = (127 + 60 * np.sin(xx / 40.0 + i * 0.3)
                    * np.cos(yy / 30.0 - i * 0.2))
            img = np.stack([base + c * 20 for c in range(3)], -1)
            img = img + rng.randn(h, w, 3) * 12
            cv2.imwrite(os.path.join(vdir, 'frame_{:010d}.jpg'.format(i + 1)),
                        np.clip(img, 0, 255).astype(np.uint8),
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
        open(done_marker, 'w').close()
    list_dir = os.path.join(root, 'frame_lists')
    os.makedirs(list_dir, exist_ok=True)
    for split in ('train', 'val'):    # val list: Trainer builds both DBs
        with open(os.path.join(list_dir, split + '.csv'), 'w') as f:
            f.write('original_vido_id video_id frame_id path labels\n')
            for i in range(num_frames):
                f.write('BENCH00 0 {} BENCH00/frame_{:010d}.jpg ""\n'.format(
                    i, i + 1))
    return list_dir


def bench_data(batch_clips: int, iters: int, worker_counts=None):
    """``python bench.py data [B] [iters]``: host input-pipeline throughput.

    Synthetic 256x340 JPEGs on disk -> clip decode (native C++ threads vs
    cv2) -> full train preprocessing (scale jitter, crop, flip, normalize)
    -> jax.device_put.  The replaced reference pipeline is
    ``lib/datasets/dataloader.py:241-318`` (4 threads x 12-process pools).

    ``python bench.py data --workers 1,2,4,8 [B] [iters]`` measures the
    same pipeline at each loader worker count instead (scaling curve).
    """
    import jax
    from lfb_tpu.core.config import default_config, finalize
    from lfb_tpu.data import native_loader
    from lfb_tpu.data.loader import DataLoader, get_input_db

    root = '/tmp/lfb_data_bench'
    t_len, rate = 32, 2
    list_dir = _write_bench_frames(root, num_frames=t_len * rate * 2,
                                   h=256, w=340)
    cfg = default_config()
    cfg.DATASET = 'charades'
    cfg.DATADIR = os.path.join(root, 'frames')
    cfg.CHARADES.FRAME_LIST_DIR = list_dir
    cfg.MODEL.NUM_CLASSES = 157
    cfg.TRAIN.VIDEO_LENGTH = t_len
    cfg.TRAIN.SAMPLE_RATE = rate
    cfg.TRAIN.CROP_SIZE = 224
    cfg.TRAIN.BATCH_SIZE = batch_clips
    cfg.NUM_GPUS = 1
    cfg = finalize(cfg)

    def measure(use_native: bool, num_workers: int):
        native_loader.set_native_enabled(use_native)
        if use_native and not native_loader.native_available():
            return None
        db = get_input_db(cfg, 'train')
        loader = DataLoader(db, batch_clips, num_workers=num_workers,
                            prefetch=4, is_train=True)
        it = loader.batches(iters + 1)
        jax.device_put(next(it)['data']).block_until_ready()   # warm
        t0 = time.perf_counter()
        for batch in it:
            jax.device_put(batch['data']).block_until_ready()
        dt = time.perf_counter() - t0
        loader.shutdown()
        return round(batch_clips * iters / dt, 2)

    if worker_counts:
        # Worker-scaling sweep: decode throughput vs loader thread count
        # (cv2/native decode release the GIL, so threads scale with host
        # cores; this makes the linear-scaling claim one command to verify
        # on a multi-core host).
        curve = {}
        for n in worker_counts:
            curve[str(n)] = {'native': measure(True, n),
                             'cv2': measure(False, n)}
            _rearm_watchdog()
        native_loader.set_native_enabled(True)
        best = max((v for row in curve.values() for v in row.values()
                    if v is not None), default=0.0)
        print(json.dumps({
            'metric': 'data worker scaling (JPEG decode + train preprocess '
                      '+ device_put, 32f@256x340->224, {} vCPU)'.format(
                          os.cpu_count()),
            'value': best, 'unit': 'clips/sec', 'vs_baseline': None,
            'clips_per_sec_by_workers': curve,
        }))
        return

    results = {}
    for label, use_native in (('native', True), ('cv2', False)):
        results[label] = measure(use_native, num_workers=8)
        _rearm_watchdog()
    native_loader.set_native_enabled(True)

    value = results.get('native') or results.get('cv2') or 0.0
    print(json.dumps({
        'metric': 'data clips/sec (JPEG decode + train preprocess + '
                  'device_put, 32f@256x340->224, {} vCPU)'.format(
                      os.cpu_count()),
        'value': value, 'unit': 'clips/sec',
        'vs_baseline': None,
        'native_clips_per_sec': results.get('native'),
        'cv2_clips_per_sec': results.get('cv2'),
    }))


def bench_e2e(batch_clips: int, iters: int):
    """``python bench.py e2e [B] [iters]``: full Trainer.train() throughput
    over synthetic JPEGs on the chip -- JPEG decode + preprocess + prefetch
    + device_put overlapped with the jitted train step (the replaced
    reference pipeline: BlobsQueue + RunNet, ``dataloader.py:241-318`` +
    ``train_net.py:148-176``).

    Reports the steady-state e2e rate (first log period excluded: compile +
    prefetch fill) plus the host-only and device-only rates measured in the
    same process, and the overlap ratio: 1.0 = the slower side fully hides
    the faster one (step time == max(host, device)); 0.0 = fully serial
    (step time == host + device).
    """
    import jax
    import jax.numpy as jnp
    from lfb_tpu.core.config import default_config, finalize
    from lfb_tpu.train.trainer import Trainer

    root = '/tmp/lfb_data_bench'
    t_len, rate = 32, 2
    list_dir = _write_bench_frames(root, num_frames=t_len * rate * 2,
                                   h=256, w=340)
    warm = 5
    cfg = default_config()
    cfg.DATASET = 'charades'
    cfg.DATADIR = os.path.join(root, 'frames')
    cfg.CHARADES.FRAME_LIST_DIR = list_dir
    cfg.MODEL.NUM_CLASSES = 157
    cfg.MODEL.DEPTH = 50
    cfg.MODEL.VIDEO_ARC_CHOICE = 2
    cfg.MODEL.MULTI_LABEL = True
    cfg.MODEL.USE_AFFINE = True
    cfg.NONLOCAL.USE_BN = False
    cfg.NONLOCAL.USE_AFFINE = True
    cfg.TRAIN.VIDEO_LENGTH = t_len
    cfg.TRAIN.SAMPLE_RATE = rate
    cfg.TRAIN.CROP_SIZE = 224
    cfg.TRAIN.BATCH_SIZE = batch_clips
    cfg.TRAIN.EVAL_PERIOD = 10 ** 9
    cfg.CHECKPOINT.CHECKPOINT_PERIOD = 0
    cfg.LOG_PERIOD = warm
    # Throughput bench, not a convergence run: from-scratch init in affine
    # (frozen-BN) mode has no normalization, so one SGD step at the
    # fine-tuning default BASE_LR=0.1 explodes the net (NaN at iter 1 on
    # the first chip run).  Use the same tame LR as bench_train.
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.MAX_ITER = warm + iters
    cfg.NUM_GPUS = 1
    cfg.TPU.REMAT = ''
    # Production input path: uint8 host pipeline + on-device normalize.
    # The float path ships 154 MB/batch (B=8, 32x224^2 f32) through the
    # host->device link -- on the tunneled dev backend that transfer alone
    # (~0.6 s) dominated the step and measured overlap_ratio NEGATIVE
    # (e2e 7.5 vs host-only 23.9 clips/sec, r5).  uint8 is 4x smaller and
    # XLA fuses (x/255-mean)/std into the stem (BENCHMARKS.md data table).
    cfg.TPU.DEVICE_NORMALIZE = True
    cfg = finalize(cfg)

    out_dir = os.path.join(root, 'e2e_run')
    trainer = Trainer(cfg, output_dir=out_dir)
    # Benchmark only: skip the 100+ MB end-of-run checkpoint pickle.
    trainer.save_checkpoint = lambda cur_iter: '(skipped for bench)'
    _rearm_watchdog()
    trainer.train()
    e2e = trainer.steady_clips_per_sec
    _rearm_watchdog()

    # Host-only: the same loader pipeline INCLUDING the host->device batch
    # transfer (device_put + sync) -- everything the e2e loop's host side
    # must do, so overlap_ratio compares like with like.  Excluding the
    # transfer made the three-way identity unsatisfiable (negative ratio)
    # on tunneled backends where the transfer is a real cost.
    t0 = time.perf_counter()
    for b in trainer.train_loader.batches(num_batches=iters):
        jax.device_put(b['data']).block_until_ready()
    host_only = batch_clips * iters / (time.perf_counter() - t0)

    # Device-only: the jitted step re-fed one resident batch.
    from lfb_tpu.parallel import shard_batch
    batch = shard_batch(trainer.mesh, next(iter(
        trainer.train_loader.batches(num_batches=1))))
    state = (trainer.trainable, trainer.frozen, trainer.mstate)
    out = trainer.train_step(*state, batch, jax.random.PRNGKey(0),
                             jnp.float32(1e-4))
    state = out[:3]
    float(out[3]['loss'])
    _rearm_watchdog()
    t0 = time.perf_counter()
    for i in range(iters):
        out = trainer.train_step(*state, batch, jax.random.PRNGKey(i),
                                 jnp.float32(1e-4))
        state = out[:3]
    float(out[3]['loss'])
    device_only = batch_clips * iters / (time.perf_counter() - t0)
    trainer.train_loader.shutdown()
    trainer.test_loader.shutdown()

    t_h, t_d, t_e = 1.0 / host_only, 1.0 / device_only, 1.0 / max(e2e, 1e-9)
    overlap = (t_h + t_d - t_e) / min(t_h, t_d)
    print(json.dumps({
        'metric': 'e2e train clips/sec (Trainer.train: JPEG decode + '
                  'preprocess + device_put + fwd+bwd+SGD, {} vCPU)'.format(
                      os.cpu_count()),
        'value': round(e2e, 2), 'unit': 'clips/sec', 'vs_baseline': None,
        'host_only_clips_per_sec': round(host_only, 2),
        'device_only_clips_per_sec': round(device_only, 2),
        'overlap_ratio': round(overlap, 3),
    }))


def main():
    global _WATCHDOG_ARMED
    signal.signal(signal.SIGALRM, _timeout_handler)
    _WATCHDOG_ARMED = True
    signal.alarm(BENCH_TIMEOUT_S)
    if len(sys.argv) > 1 and sys.argv[1] == 'data':
        rest = sys.argv[2:]
        worker_counts = None
        if rest and rest[0] == '--workers':
            try:
                worker_counts = [int(n) for n in rest[1].split(',')]
            except (IndexError, ValueError):
                print('usage: bench.py data [--workers N1,N2,...] '
                      '[batch] [iters]', file=sys.stderr)
                sys.exit(2)
            rest = rest[2:]
        bench_data(int(rest[0]) if rest else 8,
                   int(rest[1]) if len(rest) > 1 else 10,
                   worker_counts=worker_counts)
        return
    if len(sys.argv) > 1 and sys.argv[1] == 'e2e':
        run_with_retries(
            lambda: bench_e2e(int(sys.argv[2]) if len(sys.argv) > 2 else 8,
                              int(sys.argv[3]) if len(sys.argv) > 3 else 20))
        return
    if len(sys.argv) > 1 and sys.argv[1] == 'train':
        run_with_retries(
            lambda: bench_train(int(sys.argv[2]) if len(sys.argv) > 2 else 4,
                                int(sys.argv[3]) if len(sys.argv) > 3 else 10))
        return
    import jax
    from lfb_tpu.models import build_spec, forward, init_params
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(tiny=False)
    if len(sys.argv) > 1:
        candidates = [int(sys.argv[1])]
    else:
        candidates = [48, 32, 16]   # largest batch that fits HBM wins
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    boxes_per_clip = 4
    for batch_clips in candidates:
        try:
            run_with_retries(
                lambda: _run_inference_bench(cfg, batch_clips, iters,
                                             boxes_per_clip))
            return
        except Exception as e:
            if 'memory' not in str(e).lower() or batch_clips == candidates[-1]:
                raise
            print('# batch {} OOM, trying smaller'.format(batch_clips),
                  file=sys.stderr)


def _run_inference_bench(cfg, batch_clips, iters, boxes_per_clip):
    import jax
    from lfb_tpu.models import build_spec, forward, init_params
    n_boxes = batch_clips * boxes_per_clip
    t, crop = cfg.TEST.VIDEO_LENGTH, cfg.TEST.CROP_SIZE

    spec_extract = build_spec(cfg, 'test', lfb_infer_only=True)
    spec_full = build_spec(cfg, 'test')
    params = jax.device_put(init_params(jax.random.PRNGKey(0), spec_full))
    _rearm_watchdog()   # device reachable; compile milestones re-arm later
    extract_names = set(init_params(jax.random.PRNGKey(0), spec_extract))
    extract_params = {k: v for k, v in params.items() if k in extract_names}

    rng = np.random.RandomState(0)
    data = jax.device_put(
        rng.randn(batch_clips, t, crop, crop, 3).astype(np.float32))
    proposals = jax.device_put(np.stack([
        np.repeat(np.arange(batch_clips), boxes_per_clip).astype(np.float32),
        rng.uniform(0, crop / 2, n_boxes).astype(np.float32),
        rng.uniform(0, crop / 2, n_boxes).astype(np.float32),
        rng.uniform(crop / 2, crop, n_boxes).astype(np.float32),
        rng.uniform(crop / 2, crop, n_boxes).astype(np.float32)], axis=1))
    lfb = jax.device_put(rng.randn(
        n_boxes, spec_full.fbo.num_lfb_feat, 2048).astype(np.float32))

    def extract_step(data, p, proposals):
        return forward(spec_extract, p, {'data': data, 'proposals': proposals},
                       train=False)['box_pooled']

    def infer_step(data, p, proposals, lfb):
        return forward(spec_full, p,
                       {'data': data, 'proposals': proposals, 'lfb': lfb},
                       train=False)['prob']

    dt_extract = timed_device_loop(extract_step,
                                   (data, extract_params, proposals), iters)
    dt_infer = timed_device_loop(infer_step,
                                 (data, params, proposals, lfb), iters)
    print('# phase split B={}: extract {:.1f} ms ({:.1f} clips/s), infer '
          '{:.1f} ms ({:.1f} clips/s)'.format(
              batch_clips, dt_extract * 1e3, batch_clips / dt_extract,
              dt_infer * 1e3, batch_clips / dt_infer), file=sys.stderr)

    # The two-phase flow processes each clip once per phase.
    toy_clips_per_sec = 2 * batch_clips / (dt_extract + dt_infer)

    # Honest headline: re-run phase B against a REAL-SCALE resident bank
    # (235 AVA videos, ~3.2 GB f32 in HBM, matching the reference's
    # published bank size, ``GETTING_STARTED.md:45``) with on-device
    # window gather -- the number a production user sees.  The toy-window
    # figure (per-example 300-row lfb blob) is kept as a secondary field.
    # Free ALL toy-phase device arrays (~1.7 GB at B=48) before the bank
    # claims HBM: a stale batch kept alive here can OOM the real-bank
    # phase, which the fallback would silently turn back into the toy
    # headline this phase exists to replace.
    del lfb, data, proposals
    result = {
        'metric': 'clips/sec/chip (bank extraction + FBO inference, '
                  'real-scale resident device bank)',
        'unit': 'clips/sec/chip',
        'toy_window_clips_per_sec': round(toy_clips_per_sec, 2),
    }
    try:
        dt_real, bank_gb = _real_bank_infer_phase(cfg, batch_clips, iters,
                                                  params)
        clips_per_sec = 2 * batch_clips / (dt_extract + dt_real)
        result['bank_gb'] = round(bank_gb, 2)
    except Exception as e:  # noqa: BLE001 - headline must still emit
        print('# real-bank phase failed ({}); falling back to toy-window '
              'headline'.format(str(e).split('\n')[0][:200]), file=sys.stderr)
        clips_per_sec = toy_clips_per_sec
        result['metric'] = ('clips/sec/chip (bank extraction + FBO '
                            'inference, toy window fallback)')
        result['real_bank_error'] = str(e).split('\n')[0][:200]
    result['value'] = round(clips_per_sec, 2)
    result['vs_baseline'] = round(
        clips_per_sec / REFERENCE_CLIPS_PER_SEC_PER_GPU, 2)
    print(json.dumps(result))


def _real_bank_infer_phase(cfg, batch_clips, iters, params,
                           num_videos: int = 235):
    """Phase B at real bank scale: synthesize the AVA host bank
    (235 videos ~= 3.2 GB f32 by default), build the HBM-resident
    ``AvaDeviceBank`` through the real path, and time the device-bank
    eval step (metadata-keyed window gather).  Returns (sec/step,
    bank_gb).  Reuses tools/bank_rehearsal.py (whose r4 chip runs
    recorded 132.4 clips/sec/chip at this scale).  ``num_videos`` is
    parameterized so the CPU suite can pin this exact path at toy scale
    (tests/test_bench_retry.py)."""
    import gc
    import jax
    from lfb_tpu.bank.device_bank import build_device_bank
    from lfb_tpu.core.config import clone
    from lfb_tpu.models import build_spec
    from lfb_tpu.train.steps import make_eval_step

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'tools'))
    import bank_rehearsal as br

    host_bank, _total = br.synthesize_ava_host_bank(num_videos,
                                                    fast_fill=True)
    _rearm_watchdog()
    cfg2 = clone(cfg, {'TPU.DEVICE_BANK': True})
    bank = build_device_bank(cfg2, host_bank)
    jax.block_until_ready(bank.feats)
    bank_gb = bank.feats.size * bank.feats.dtype.itemsize / float(2 ** 30)
    del host_bank
    gc.collect()
    _rearm_watchdog()

    # Same weights as the toy phase (the device bank changes no params).
    spec = build_spec(cfg2, 'test')
    step = make_eval_step(spec, bank=bank)
    batch = br.make_batch(cfg2, spec, batch_clips, num_videos)
    # Timing method note: the fori_loop wrapper (``timed_device_loop``)
    # cannot be used here -- the multi-GB bank rides the step via closure
    # and would lower as an HLO constant inside jit-of-loop (the exact
    # defect ``device_bank._BoundFeatsBank`` exists to prevent).  The
    # per-iter block_until_ready in ``time_step`` was A/B'd against the
    # fori reference on the SAME toy step on this backend (r5): fori
    # 344 ms, time_step 360 ms -- accurate to ~5% and slightly
    # conservative, so it does NOT inflate the headline.  (A Python-level
    # dependency-chain variant measured 564 ms on the same step: each
    # out-of-jit chain op pays tunnel dispatch, so that approach
    # over-counts and was rejected.)
    dt = br.time_step(step, params, batch, iters)
    _rearm_watchdog()
    return dt, bank_gb


if __name__ == '__main__':
    main()

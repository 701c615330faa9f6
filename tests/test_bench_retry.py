"""bench.py transient-failure retry logic (VERDICT r1 weak item 1)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_transient_classification():
    assert bench._is_transient(
        RuntimeError('FAILED_PRECONDITION: backend deinitialized'))
    assert bench._is_transient(ConnectionError('connection reset by peer'))
    assert bench._is_transient(RuntimeError('UNAVAILABLE: socket closed'))
    # OOMs and programming errors must NOT be retried: main() relies on the
    # OOM propagating to fall back to a smaller batch.
    assert not bench._is_transient(
        RuntimeError('RESOURCE_EXHAUSTED: Ran out of memory in memory space '
                     'hbm'))
    assert not bench._is_transient(ValueError('bad shape'))


def test_run_with_retries_recovers(monkeypatch):
    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError('FAILED_PRECONDITION: tunnel dropped')
        return 42

    assert bench.run_with_retries(flaky, attempts=3) == 42
    assert len(calls) == 3


def test_run_with_retries_gives_up(monkeypatch):
    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)

    def always_down():
        raise RuntimeError('UNAVAILABLE: connection refused')

    try:
        bench.run_with_retries(always_down, attempts=2)
    except RuntimeError as e:
        assert 'UNAVAILABLE' in str(e)
    else:
        raise AssertionError('expected the final attempt to re-raise')


def test_run_with_retries_no_retry_on_real_errors(monkeypatch):
    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
    calls = []

    def broken():
        calls.append(1)
        raise ValueError('shape mismatch')

    try:
        bench.run_with_retries(broken, attempts=3)
    except ValueError:
        pass
    assert len(calls) == 1


def test_run_with_retries_leaves_no_pending_alarm(monkeypatch):
    """Regression: retrying outside bench's main() must not arm SIGALRM.
    A leaked alarm fired ~30 min later and killed the whole test process."""
    import signal

    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError('UNAVAILABLE: tunnel dropped')
        return 7

    assert bench.run_with_retries(flaky) == 7
    assert signal.alarm(0) == 0, 'retry armed a stray watchdog alarm'


def test_real_bank_infer_phase_toy_scale():
    """Pin bench.py's real-bank headline phase (synthesize -> AvaDeviceBank
    build -> device-bank eval step with metadata-keyed gather) at toy scale
    on CPU, so a signature/wiring change in the bank build or eval-step API
    can't silently break the driver's headline run."""
    import jax
    import numpy as np
    from lfb_tpu.core import config as C
    from lfb_tpu.models import build_spec, init_params

    cfg = C.default_config()
    cfg.DATASET = 'ava'
    cfg.MODEL.NUM_CLASSES = 80
    cfg.MODEL.USE_AFFINE = True
    cfg.NONLOCAL.USE_BN = False
    cfg.NONLOCAL.USE_AFFINE = True
    cfg.TRAIN.VIDEO_LENGTH = 4
    cfg.TRAIN.CROP_SIZE = 32
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TEST.VIDEO_LENGTH = 4
    cfg.TEST.CROP_SIZE = 32
    cfg.TEST.BATCH_SIZE = 2
    cfg.NUM_GPUS = 1
    cfg.TPU.COMPUTE_DTYPE = 'float32'
    cfg.TPU.USE_PALLAS = False
    cfg.LFB.ENABLED = True
    cfg.LFB.WINDOW_SIZE = 2
    C.finalize(cfg)

    spec = build_spec(cfg, 'test')
    params = jax.device_put(init_params(jax.random.PRNGKey(0), spec))
    dt, bank_gb = bench._real_bank_infer_phase(cfg, batch_clips=2, iters=1,
                                               params=params, num_videos=3)
    assert dt > 0
    assert 0 < bank_gb < 0.1   # toy bank, but a real resident feature table

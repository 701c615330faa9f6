"""Profiling hooks: the reference's PROF_DAG per-op timing
(``train_net.py:69-72``) maps to jax.profiler traces viewable in
XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import logging

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def maybe_trace(enabled: bool, logdir: str = '/tmp/lfb_tpu_trace'):
    """Trace the enclosed steps when cfg.PROF_DAG is on."""
    if not enabled:
        yield
        return
    logger.info('Profiling to %s', logdir)
    with jax.profiler.trace(logdir):
        yield


def device_memory_stats() -> dict:
    """Per-device memory stats (replaces the reference's nvidia-smi scrape,
    ``misc.py:150-164``)."""
    stats = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            if ms:
                stats[str(d.id)] = {
                    'bytes_in_use': ms.get('bytes_in_use', 0),
                    'peak_bytes_in_use': ms.get('peak_bytes_in_use', 0),
                }
        except Exception:
            continue
    return stats

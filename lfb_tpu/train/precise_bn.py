"""Precise-BN: recompute true BN statistics with a forward-only sweep.

Reference: ``lib/utils/bn_helper.py`` -- an auxiliary train-mode model
accumulates per-layer batch mean/meanX^2 over ITER_COMPUTE_PRECISE_BN
iterations and writes true mean/var into the running-stat blobs before
eval/checkpoint.  Here the jitted forward returns each BN layer's batch
statistics directly ('bn_updates'), so the sweep is a plain loop.

Only meaningful when MODEL.USE_AFFINE=False (all released configs freeze BN
as affine and set COMPUTE_PRECISE_BN=False).
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import numpy as np

from lfb_tpu.models.model import forward
from lfb_tpu.models.spec import ModelSpec

logger = logging.getLogger(__name__)


def compute_precise_bn_stats(spec: ModelSpec, params: Dict, batches,
                             num_iters: int, bank=None) -> Dict:
    """Return params with ``*_bn_rm``/``*_bn_riv`` replaced by aggregated
    batch statistics over ``num_iters`` minibatches.

    Var aggregation matches the reference: E[x^2] - E[x]^2 over the
    per-batch means (``bn_helper.py:151-182``).
    """
    assert not spec.use_affine, 'precise-BN is meaningless in affine mode'

    from lfb_tpu.train.steps import _inject_device_bank_lfb

    @jax.jit
    def stats_step(params, batch):
        batch = _inject_device_bank_lfb(spec, bank, batch,
                                        jax.random.PRNGKey(0))
        out = forward(spec, params, batch, train=True,
                      rng=jax.random.PRNGKey(0))
        return out['bn_updates']

    sums: Dict[str, np.ndarray] = {}
    sq_sums: Dict[str, np.ndarray] = {}
    count = 0
    for i, batch in enumerate(batches):
        if i >= num_iters:
            break
        updates = jax.device_get(stats_step(params, batch))
        for name, (mean, var) in updates.items():
            mean = np.asarray(mean)
            # E[x^2] for the batch = var + mean^2.
            sq = np.asarray(var) + mean ** 2
            if name not in sums:
                sums[name] = mean.copy()
                sq_sums[name] = sq.copy()
            else:
                sums[name] += mean
                sq_sums[name] += sq
        count += 1
    assert count > 0, 'no batches for precise-BN'

    new_params = dict(params)
    for name in sums:
        mean = sums[name] / count
        var = sq_sums[name] / count - mean ** 2
        new_params[name + '_rm'] = mean.astype(np.float32)
        new_params[name + '_riv'] = np.maximum(var, 0).astype(np.float32)
    logger.info('Precise-BN: updated %d layers over %d iters',
                len(sums), count)
    return new_params

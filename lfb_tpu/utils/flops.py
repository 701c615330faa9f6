"""Model cost introspection: FLOPs / parameter counts / HLO dumps.

TPU-native replacement for the reference's hand-rolled per-op FLOPs counter
and pbtxt net dumps (``lib/utils/misc.py:87-94,167-272``): XLA's own cost
analysis covers every op after fusion, and the StableHLO text is the
compiled-graph artifact.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict

import jax
import numpy as np

logger = logging.getLogger(__name__)


def count_params(params: Dict) -> int:
    return int(sum(np.prod(np.shape(v)) for v in params.values()))


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """Compiled-program cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-device list
        costs = costs[0]
    return dict(costs or {})


def log_flops_params(fn: Callable, params: Dict, *args) -> Dict[str, float]:
    costs = cost_analysis(fn, params, *args)
    flops = costs.get('flops', float('nan'))
    logger.info('Model: %.2f GFLOPs, %.2fM params',
                flops / 1e9, count_params(params) / 1e6)
    return costs


def save_hlo_text(fn: Callable, path: str, *args) -> str:
    """Dump the optimized HLO (the analog of the reference's net-proto
    pbtxt dumps)."""
    compiled = jax.jit(fn).lower(*args).compile()
    text = compiled.as_text()
    with open(path, 'w') as f:
        f.write(text)
    logger.info('HLO saved to %s', path)
    return path

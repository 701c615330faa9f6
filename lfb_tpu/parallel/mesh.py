"""Device mesh + sharding for data parallelism.

The reference's only parallelism is 8-way single-node data parallelism with
NCCL allreduce inside the Caffe2 graph (``lib/models/model_builder_video.py:
147-157``).  TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over the
ICI-connected slice; the batch is sharded over the ``data`` axis, parameters
are replicated, and XLA inserts the gradient ``psum`` automatically when the
jitted train step computes a global-batch mean loss.

The LFB bank rides the same mesh replicated in HBM (banks are 1-4 GB,
``GETTING_STARTED.md:45``) so window gathers stay on-device; see
``lfb_tpu.bank``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def create_mesh(num_devices: Optional[int] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        assert len(devices) >= num_devices, (
            'Requested {} devices, have {}'.format(num_devices, len(devices)))
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Device-put every batch blob sharded on its leading axis.

    All lfb_tpu batch blobs are padded to fixed, per-device-divisible leading
    dims by the data layer (AVA boxes included), so a uniform leading-axis
    shard is always valid.

    On a SIZE-1 mesh (or no mesh) the blobs are placed plainly, without a
    NamedSharding commitment: committed-sharded inputs force jit to compile
    a mesh-annotated executable even when no in_shardings were given, and
    on the tunneled 'axon' backend that executable class restages committed
    buffers through the tunnel per execution (the r5 bisect in
    BENCHMARKS.md; see ``steps._degenerate_mesh_to_none``).  A 1-device
    "shard" is a plain placement anyway.
    """
    if mesh is None or mesh.size == 1:
        return {k: jax.device_put(v) for k, v in batch.items()}
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}

"""Host input pipeline: ordered multi-threaded minibatch prefetch.

The reference pipes minibatches through 4 loader threads x 12-process pools
into per-GPU Caffe2 BlobsQueues with an out-of-order re-assembly buffer
(``lib/datasets/dataloader.py``).  TPU-natively this collapses to: a thread
pool builds fixed-shape numpy batches ahead of time (cv2 releases the GIL
for decode/resize), an ordered prefetch window keeps the accelerator fed,
and ``parallel.shard_batch`` device-puts each batch sharded over the mesh.

Determinism: batch ``i`` of epoch stream ``seed`` uses
``np.random.default_rng((seed, i))`` -- no global RNG.
"""

from __future__ import annotations

import logging
import math
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def get_input_db(cfg, split: str, *, lfb_infer_only: bool = False,
                 shift: Optional[int] = None, lfb=None,
                 get_train_lfb: bool = False):
    """Dataset factory (reference ``dataloader.py:402-413``)."""
    from lfb_tpu.data.ava import AvaDataset
    from lfb_tpu.data.charades import CharadesDataset
    from lfb_tpu.data.epic import EpicDataset
    db_map = {'ava': AvaDataset, 'charades': CharadesDataset,
              'epic': EpicDataset}
    assert cfg.DATASET in db_map, 'Unknown dataset {}'.format(cfg.DATASET)
    return db_map[cfg.DATASET](cfg, split, lfb_infer_only=lfb_infer_only,
                               shift=shift, lfb=lfb,
                               get_train_lfb=get_train_lfb)


class DataLoader:
    """Ordered prefetching loader over a dataset DB."""

    def __init__(self, db, batch_size: int, *, num_workers: int = 8,
                 prefetch: int = 4, seed: int = 0, is_train: bool = False):
        self.db = db
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.is_train = is_train
        self._pool: Optional[ThreadPoolExecutor] = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------------ #

    def num_batches(self) -> int:
        """Batches per epoch/sweep (test covers the DB, padded final batch,
        reference ``misc.get_total_test_iters``)."""
        return int(math.ceil(self.db.db_size() / float(self.batch_size)))

    def _batch_indices(self, batch_idx: int) -> List[int]:
        size = self.db.db_size()
        if self.is_train:
            # Epoch-shuffled traversal, stateless: batch i covers positions
            # [i*B, i*B+B) of the permutation for epoch i*B//size (matches
            # the reference's per-epoch index shuffle, dataloader.py:180-221;
            # AVA/EPIC resample uniformly inside minibatch and ignore these,
            # Charades consumes them directly).
            B = self.batch_size
            out = []
            pos = batch_idx * B
            while len(out) < B:
                epoch, offset = divmod(pos + len(out), max(size, 1))
                perm = np.random.default_rng(
                    (self.seed, 999983, epoch)).permutation(size)
                take = min(B - len(out), size - offset)
                out.extend(int(i) for i in perm[offset:offset + take])
            return out
        start = (batch_idx * self.batch_size) % (
            self.num_batches() * self.batch_size)
        idx = [min(start + i, size - 1) for i in range(self.batch_size)]
        # Pad past-the-end entries with the chunk's first index (reference
        # pads with indices[0], ``ava.py:203-204``).
        idx = [i if (start + k) < size else idx[0]
               for k, i in enumerate(idx)]
        return idx

    def _build(self, batch_idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, batch_idx))
        return self.db.minibatch(self._batch_indices(batch_idx), rng)

    # ------------------------------------------------------------------ #

    def start(self):
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix='lfb-loader')
        return self

    def shutdown(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def batches(self, num_batches: Optional[int] = None,
                start_batch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield batches in order with a prefetch window."""
        self.start()
        total = num_batches if num_batches is not None else self.num_batches()
        pending = {}
        next_submit = start_batch
        next_yield = start_batch
        end = start_batch + total
        while next_yield < end:
            while next_submit < min(next_yield + self.prefetch, end):
                pending[next_submit] = self._pool.submit(
                    self._build, next_submit)

                next_submit += 1
            fut = pending.pop(next_yield)
            yield fut.result()
            next_yield += 1

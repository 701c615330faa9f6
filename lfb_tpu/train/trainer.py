"""Training orchestration: the TPU-native equivalent of
``tools/train_net.py`` (reference ``train_net.py:93-212``).

One jitted program per iteration (fwd+bwd+psum+SGD); the host loop handles
LR scheduling + momentum correction, checkpoint cadence, periodic eval,
precise-BN, metrics, and the NaN watchdog.  Metric pulls (device->host) are
batched on LOG_PERIOD boundaries so steps stay pipelined.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lfb_tpu.data.loader import DataLoader, get_input_db
from lfb_tpu.eval.metrics import MetricsCalculator
from lfb_tpu.models import build_spec, init_params
from lfb_tpu.models.model import frozen_param_names
from lfb_tpu.parallel import create_mesh, shard_batch
from lfb_tpu.train import checkpoints as ckpt
from lfb_tpu.train import optimizer as opt
from lfb_tpu.train.lr_policy import get_lr_at_iter
from lfb_tpu.train.steps import (make_eval_step, make_train_step,
                                 split_params)

logger = logging.getLogger(__name__)


def _device_prefetch(batches, mesh, depth: int = 2):
    """Yield (host_labels, device_batch) with device_put issued ``depth``
    batches ahead, overlapping host->device transfer with the running step
    (device_put is asynchronous)."""
    import collections
    queue = collections.deque()
    for np_batch in batches:
        queue.append((np_batch['labels'], shard_batch(mesh, np_batch)))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class Trainer:

    def __init__(self, cfg, output_dir: Optional[str] = None, mesh=None,
                 train_lfb=None, test_lfb=None):
        self.cfg = cfg
        self.output_dir = output_dir or cfg.CHECKPOINT.DIR
        self.checkpoint_dir = os.path.join(
            os.path.abspath(self.output_dir), 'checkpoints')
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self.mesh = mesh if mesh is not None else (
            create_mesh(cfg.NUM_GPUS) if len(jax.devices()) >= cfg.NUM_GPUS
            else create_mesh(len(jax.devices())))
        self.train_lfb = train_lfb
        self.test_lfb = test_lfb

        self.spec = build_spec(cfg, 'train')
        self.test_spec = build_spec(cfg, cfg.TEST.DATA_TYPE or 'val')

        # Data.
        self.train_db = get_input_db(cfg, 'train', lfb=train_lfb)
        self.train_loader = DataLoader(
            self.train_db, cfg.TRAIN.BATCH_SIZE,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
            prefetch=cfg.DATALOADER.PREFETCH_BATCHES,
            seed=cfg.RNG_SEED, is_train=True)
        # Training-time evaluation mirrors the reference's phase injection
        # (``train_net.py:107-108``): the val split uses the TRAIN detection
        # threshold and the mini (sec%4==0) subset unless
        # FULL_EVAL_DURING_TRAINING.
        test_cfg = cfg
        if cfg.DATASET == 'ava':
            from lfb_tpu.core.config import clone
            test_cfg = clone(cfg, {
                'AVA.DETECTION_SCORE_THRESH':
                    cfg.AVA.DETECTION_SCORE_THRESH_TRAIN,
                'AVA.FULL_EVAL': cfg.AVA.FULL_EVAL_DURING_TRAINING,
            })
        self.test_db = get_input_db(test_cfg, cfg.TEST.DATA_TYPE or 'val',
                                    lfb=test_lfb)
        self.test_loader = DataLoader(
            self.test_db, cfg.TEST.BATCH_SIZE,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
            prefetch=cfg.DATALOADER.PREFETCH_BATCHES,
            seed=cfg.RNG_SEED + 1, is_train=False)

        # Model/optimizer state.
        params = init_params(jax.random.PRNGKey(cfg.RNG_SEED), self.spec)
        self.frozen_names = frozen_param_names(self.spec, params)
        self.start_iter, prev_lr, params, momentum = self._load_initial(params)
        self.current_lr = prev_lr if prev_lr > 0 else get_lr_at_iter(
            cfg.SOLVER, self.start_iter)
        trainable, frozen = split_params(self.spec, params)
        self.trainable = {k: jnp.asarray(v) for k, v in trainable.items()}
        self.frozen = {k: jnp.asarray(v) for k, v in frozen.items()}
        if momentum is None:
            self.mstate = opt.init_state(params, self.frozen_names)
        else:
            self.mstate = opt.SGDState(momentum={
                k: jnp.asarray(momentum[k]) for k in trainable})

        # Datasets convert host banks to device banks under TPU.DEVICE_BANK;
        # read the (possibly converted) bank back for the jitted steps.
        train_bank = getattr(self.train_db, 'lfb', None)
        if not hasattr(train_bank, 'gather'):
            train_bank = None
        test_bank = getattr(self.test_db, 'lfb', None)
        if not hasattr(test_bank, 'gather'):
            test_bank = None
        use_sm = bool(cfg.TPU.SHARD_MAP)
        if cfg.TPU.BANK_SHARDED and self.mesh is not None:
            from lfb_tpu.bank.device_bank import shard_bank
            train_bank = shard_bank(train_bank, self.mesh)
            test_bank = shard_bank(test_bank, self.mesh)
        self.train_step = make_train_step(self.spec, cfg.SOLVER, self.mesh,
                                          bank=train_bank,
                                          use_shard_map=use_sm)
        self.eval_step = make_eval_step(self.test_spec, self.mesh,
                                        bank=test_bank, bank_seed=cfg.RNG_SEED,
                                        use_shard_map=use_sm)

        # Meters.
        self.train_meter = MetricsCalculator(
            cfg, 'train',
            video_idx_to_name=self.train_db.video_idx_to_name,
            total_num_boxes=getattr(self.train_db, 'num_boxes_used', None),
            output_dir=self.output_dir)
        self.test_meter = MetricsCalculator(
            cfg, 'val',
            video_idx_to_name=self.test_db.video_idx_to_name,
            total_num_boxes=getattr(self.test_db, 'num_boxes_used', None),
            num_test_clips=(self.test_db.num_test_clips
                            if cfg.DATASET == 'charades' else 1),
            full_eval=(cfg.AVA.FULL_EVAL_DURING_TRAINING
                       if cfg.DATASET == 'ava' else True),
            output_dir=self.output_dir)

    # ------------------------------------------------------------------ #

    def _load_initial(self, params):
        """Reference 4-case resume logic (``checkpoints.py:180-237``)."""
        cfg = self.cfg
        momentum = None
        start_iter, prev_lr = 0, 0.0
        np_params = {k: np.asarray(v) for k, v in params.items()}

        resume_file = (ckpt.latest_checkpoint(self.checkpoint_dir)
                       if cfg.CHECKPOINT.RESUME else None)
        if resume_file:
            logger.info('Resuming from %s', resume_file)
            mzero = {k: np.zeros_like(v) for k, v in np_params.items()
                     if k not in self.frozen_names}
            np_params, momentum, start_iter, prev_lr = ckpt.load_params_into(
                resume_file, np_params, load_momentum=True, momentum=mzero)
        elif cfg.TRAIN.PARAMS_FILE:
            logger.info('Initializing from pre-trained %s',
                        cfg.TRAIN.PARAMS_FILE)
            np_params, _, start_iter, prev_lr = ckpt.load_params_into(
                cfg.TRAIN.PARAMS_FILE, np_params,
                convert_model=cfg.CHECKPOINT.CONVERT_MODEL,
                load_momentum=False)
            if cfg.TRAIN.RESUME_FROM_BATCH_SIZE > 0:
                start_iter = ckpt.resume_iter_for_batch_size(
                    start_iter, cfg.TRAIN.RESUME_FROM_BATCH_SIZE,
                    cfg.TRAIN.BATCH_SIZE)
            if cfg.TRAIN.RESET_START_ITER:
                start_iter = 0
        else:
            logger.info('No checkpoint found; training from scratch...')
        return start_iter, prev_lr, np_params, momentum

    def _update_lr(self, cur_iter: int) -> float:
        """LR step + momentum correction (reference
        ``model_builder_video.py:258-314``)."""
        cfg = self.cfg
        new_lr = get_lr_at_iter(cfg.SOLVER, cur_iter)
        if new_lr != self.current_lr and self.current_lr > 0:
            ratio = max(new_lr / max(self.current_lr, 1e-10),
                        self.current_lr / max(new_lr, 1e-10))
            if (cfg.SOLVER.SCALE_MOMENTUM and self.current_lr > 1e-7
                    and ratio > cfg.SOLVER.SCALE_MOMENTUM_THRESHOLD):
                logger.info('Scaling update history by %.6f (new/old lr)',
                            new_lr / self.current_lr)
                self.mstate = opt.correct_momentum(
                    self.mstate, jnp.float32(new_lr / self.current_lr))
        self.current_lr = new_lr
        return new_lr

    # ------------------------------------------------------------------ #

    def _maybe_precise_bn(self):
        """Recompute true BN stats before checkpoint/eval (reference
        ``train_net.py:163-182``); no-op in frozen-affine mode."""
        cfg = self.cfg
        if not cfg.TRAIN.COMPUTE_PRECISE_BN or self.spec.use_affine:
            return
        from lfb_tpu.train.precise_bn import compute_precise_bn_stats
        bank = getattr(self.train_db, 'lfb', None)
        if not hasattr(bank, 'gather'):
            bank = None
        params = compute_precise_bn_stats(
            self.spec, self.params(),
            (shard_batch(self.mesh, b) for b in self.train_loader.batches(
                num_batches=cfg.TRAIN.ITER_COMPUTE_PRECISE_BN)),
            cfg.TRAIN.ITER_COMPUTE_PRECISE_BN, bank=bank)
        for name, value in params.items():
            if name in self.frozen:
                self.frozen[name] = jnp.asarray(value)

    def save_checkpoint(self, cur_iter: int) -> str:
        path = os.path.join(self.checkpoint_dir,
                            'c2_model_iter{}.pkl'.format(cur_iter + 1))
        params = {**jax.device_get(self.trainable),
                  **jax.device_get(self.frozen)}
        ckpt.save_params(path, params, model_iter=cur_iter + 1,
                         lr=self.current_lr,
                         momentum=jax.device_get(self.mstate.momentum))
        logger.info('Saved checkpoint %s', path)
        return path

    def params(self) -> Dict:
        return {**self.trainable, **self.frozen}

    def train(self):
        """Run the full training loop; returns the last checkpoint path."""
        cfg = self.cfg
        last_checkpoint = ckpt.latest_checkpoint(self.checkpoint_dir)
        log_period = max(1, cfg.LOG_PERIOD)
        t_start = time.time()
        pending = []  # (iter, aux, labels, lr) not yet pulled to host
        # Per-iteration wall clock (reference ``Timer`` around every step,
        # ``metrics.py:348-366``) + a steady-state window that excludes the
        # first log period (jit compile + pipeline fill), so e2e throughput
        # is measurable from the outside (bench.py e2e).
        from lfb_tpu.utils.timer import Timer
        self.iter_timer = Timer()
        steady = {'t0': None, 'start': None}
        self.steady_clips_per_sec = 0.0

        def drain():
            for it, aux, labels, lr in pending:
                loss = float(aux['loss'])
                if not np.isfinite(loss):
                    raise RuntimeError(
                        'ERROR: Got NaN loss at iter {}'.format(it))
                self.train_meter.update_train(
                    loss, np.asarray(aux['prob']), labels, lr)
            pending.clear()

        from lfb_tpu.utils.logging_utils import describe_params
        logger.info('Model parameters:\n%s',
                    describe_params(self.params(), max_rows=8))

        train_iter = _device_prefetch(
            self.train_loader.batches(
                num_batches=cfg.SOLVER.MAX_ITER - self.start_iter,
                start_batch=self.start_iter),
            self.mesh, depth=2)

        for cur_iter in range(self.start_iter, cfg.SOLVER.MAX_ITER):
            # PROF_DAG: capture an xprof trace of steps 1-4 (reference uses
            # the prof_dag executor for per-op timing, ``train_net.py:69-72``).
            if cfg.PROF_DAG and cur_iter == self.start_iter + 1:
                jax.profiler.start_trace('/tmp/lfb_tpu_trace')
            if cfg.PROF_DAG and cur_iter == self.start_iter + 4:
                jax.profiler.stop_trace()
                logger.info('Profile trace written to /tmp/lfb_tpu_trace')
            self.iter_timer.tic()
            lr = self._update_lr(cur_iter)
            labels, batch = next(train_iter)
            self.trainable, self.frozen, self.mstate, aux = self.train_step(
                self.trainable, self.frozen, self.mstate, batch,
                jax.random.PRNGKey(cfg.RNG_SEED * 1000003 + cur_iter),
                jnp.float32(lr))
            pending.append((cur_iter, aux, labels, lr))
            self.iter_timer.toc()

            if (cur_iter + 1) % log_period == 0:
                drain()
                if steady['t0'] is None:
                    # First drain done: compile + prefetch fill are behind us.
                    steady['t0'] = time.time()
                    steady['start'] = cur_iter + 1
                elapsed = time.time() - t_start
                done = cur_iter + 1 - self.start_iter
                eta = elapsed / done * (cfg.SOLVER.MAX_ITER - cur_iter - 1)
                logger.info(
                    '| Train ETA: %.0fs LR: %.8f Iters [%d/%d] Loss %7.4f',
                    eta, lr, cur_iter + 1, cfg.SOLVER.MAX_ITER,
                    self.train_meter.aggr_loss
                    / max(self.train_meter.aggr_batch_size, 1))

            if (cfg.CHECKPOINT.CHECKPOINT_PERIOD > 0 and
                    (cur_iter + 1) % cfg.CHECKPOINT.CHECKPOINT_PERIOD == 0) \
                    or cur_iter + 1 == cfg.SOLVER.MAX_ITER:
                drain()
                self._maybe_precise_bn()
                last_checkpoint = self.save_checkpoint(cur_iter)

            if (cur_iter + 1) % cfg.TRAIN.EVAL_PERIOD == 0:
                drain()
                self._maybe_precise_bn()
                self.evaluate(name='iter{}'.format(cur_iter + 1))
                self.train_meter.finalize_metrics(is_train=True)
                from lfb_tpu.utils.logging_utils import (get_json_stats_dict,
                                                         log_json_stats)
                log_json_stats(get_json_stats_dict(
                    cfg, self.train_meter, self.test_meter, cur_iter))
                self.train_meter.reset()

        drain()
        if steady['t0'] is not None and cfg.SOLVER.MAX_ITER > steady['start']:
            self.steady_clips_per_sec = (
                (cfg.SOLVER.MAX_ITER - steady['start'])
                * cfg.TRAIN.BATCH_SIZE / (time.time() - steady['t0']))
        self.train_loader.shutdown()
        self.test_loader.shutdown()
        return last_checkpoint

    def evaluate(self, name: str = 'latest') -> Dict[str, float]:
        """One full sweep over the test split."""
        cfg = self.cfg
        self.test_meter.reset()
        params = self.params()
        for batch in self.test_loader.batches():
            out = self.eval_step(params, shard_batch(self.mesh, batch))
            self.test_meter.update_test(
                np.asarray(out['logits']), batch['labels'],
                original_boxes=batch.get('original_boxes'),
                metadata=batch.get('metadata'),
                box_mask=batch.get('box_mask'))
        metrics = self.test_meter.finalize_metrics(name=name)
        self.test_meter.compute_and_log_best()
        logger.info('Eval %s: %s', name, metrics)
        return metrics

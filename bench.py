"""Benchmark: flagship-model inference throughput on the real TPU chip.

Measures the two-phase LFB inference flow of the reference's headline config
(ava_r101_lfb_nl_3l, ``BASELINE.md``):

  phase A -- bank extraction: lfb_infer_only forward sweeps (box_pooled
             features), reference ``tools/lfb_loader.py:203-220``.
  phase B -- FBO inference: full model, RoIAlign head + 3-layer FBO-NL over
             a 300-row HBM-resident bank window.

Prints ONE JSON line:
  {"metric": "clips/sec/chip (bank extraction + FBO inference)",
   "value": N, "unit": "clips/sec/chip", "vs_baseline": R}

The reference publishes no throughput numbers (SURVEY.md §6).  ``vs_baseline``
is computed against a documented nominal estimate of the reference's per-GPU
inference throughput on its 2019-era 8x V100 setup: ~8 clips/sec/GPU for
R101-I3D-NL at 32x224x224 including the Python/BlobsQueue host loop.  The
>=10x north-star in BASELINE.md therefore corresponds to vs_baseline >= 10.
"""

import json
import sys
import time

import numpy as np

REFERENCE_CLIPS_PER_SEC_PER_GPU = 8.0


def main():
    import jax
    import jax.numpy as jnp
    from lfb_tpu.models import build_spec, forward, init_params
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(tiny=False)
    batch_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    boxes_per_clip = 4
    n_boxes = batch_clips * boxes_per_clip
    t, crop = cfg.TEST.VIDEO_LENGTH, cfg.TEST.CROP_SIZE

    # --- build both phases' models -------------------------------------- #
    spec_extract = build_spec(cfg, 'test', lfb_infer_only=True)
    spec_full = build_spec(cfg, 'test')
    params = init_params(jax.random.PRNGKey(0), spec_full)
    params = jax.device_put(
        {k: v.astype(jnp.float32) for k, v in params.items()})
    extract_params = jax.device_put(
        {k: v for k, v in params.items()
         if k in init_params(jax.random.PRNGKey(0), spec_extract)})

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

    @jax.jit
    def extract_step(p, data, proposals):
        return forward(spec_extract, p, {'data': data, 'proposals': proposals},
                       train=False)['box_pooled']

    @jax.jit
    def infer_step(p, data, proposals, lfb):
        return forward(spec_full, p,
                       {'data': data, 'proposals': proposals, 'lfb': lfb},
                       train=False)['prob']

    # --- warmup (compile) ------------------------------------------------ #
    jax.block_until_ready(extract_step(extract_params, data, proposals))
    jax.block_until_ready(infer_step(params, data, proposals, lfb))

    # --- timed loop: alternate extraction and FBO inference -------------- #
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        a = extract_step(extract_params, data, proposals)
        b = infer_step(params, data, proposals, lfb)
    jax.block_until_ready((a, b))
    elapsed = time.perf_counter() - t0

    total_clips = 2 * iters * batch_clips   # both phases process a clip batch
    clips_per_sec = total_clips / elapsed
    print(json.dumps({
        'metric': 'clips/sec/chip (bank extraction + FBO inference)',
        'value': round(clips_per_sec, 2),
        'unit': 'clips/sec/chip',
        'vs_baseline': round(clips_per_sec / REFERENCE_CLIPS_PER_SEC_PER_GPU, 2),
    }))


if __name__ == '__main__':
    main()

"""Full model assembly: backbone -> head -> FBO -> classifier -> loss.

Reference: ``lib/models/resnet_video.py:133-351`` (graph construction) --
here a single pure function over a flat param pytree, jitted end-to-end.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lfb_tpu.models.backbone import backbone_forward, init_backbone
from lfb_tpu.models.fbo import fbo_forward, init_fbo
from lfb_tpu.models.heads import basic_head, roi_head
from lfb_tpu.models.layers import Params, dropout, gaussian_init
from lfb_tpu.models.spec import ModelSpec


def init_params(rng: jax.Array, spec: ModelSpec) -> Params:
    k_backbone, k_fbo, k_pred = jax.random.split(rng, 3)
    params = init_backbone(k_backbone, spec)
    params.update(init_fbo(k_fbo, spec))
    if not spec.lfb_infer_only:
        params['pred_w'] = gaussian_init(
            k_pred, (spec.head_dim, spec.num_classes), spec.fc_init_std)
        params['pred_b'] = jnp.zeros((spec.num_classes,), jnp.float32)
    return params


def frozen_param_names(spec: ModelSpec, params: Params) -> set:
    """Names excluded from gradient updates.

    Affine scale/bias are frozen by construction (the reference's
    ``AffineNdGradient`` emits no parameter gradients,
    ``caffe2_customized_ops/video/affine_nd_op.cc:45-52``); BN running stats
    are computed params, never SGD-updated.
    """
    frozen = set()
    for name in params:
        if name.endswith('_bn_rm') or name.endswith('_bn_riv'):
            frozen.add(name)
        elif (name.endswith('_bn_s') or name.endswith('_bn_b')):
            # In affine mode every backbone _bn_{s,b} is an AffineNd param.
            # NL blocks use BN or affine per NONLOCAL.USE_BN/USE_AFFINE.
            is_nl = name.startswith('nonlocal_')
            use_affine = spec.nl.use_affine if is_nl else spec.use_affine
            if use_affine:
                frozen.add(name)
    if spec.freeze_backbone:
        head_prefixes = ('pred_', 'lfb_nl', 'lfb_1x1')
        for name in params:
            if not name.startswith(head_prefixes) and '_fbonl_reduc' not in name:
                frozen.add(name)
    return frozen


def forward(
    spec: ModelSpec,
    params: Params,
    batch: Dict[str, jax.Array],
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Run the model.

    Batch blob contract (fixed shapes; reference §2.4 of SURVEY.md):
      data:       (B, T, H, W, 3) normalized RGB frames.
      labels:     (B, num_classes) multi-hot | (B,) int class ids |
                  (N_box, num_classes) for AVA.
      proposals:  AVA only -- (N_box, 5) [batch_idx, x1, y1, x2, y2].
      box_mask:   AVA only -- (N_box,) 1.0 for real boxes, 0.0 for padding.
      lfb:        optional (rows, W, lfb_dim) bank windows
                  (rows = B for clip-level, N_box for AVA).

    Returns dict with 'logits', 'prob', 'loss' (train or when labels given),
    'pool5' features (the LFB-extraction output: 'box_pooled' for AVA), and
    'bn_updates' batch statistics when training with real BN.
    """
    compute_dtype = jnp.dtype(spec.compute_dtype)
    x = batch['data']
    if x.dtype == jnp.uint8:
        # TPU.DEVICE_NORMALIZE path: the host ships raw uint8 crops (4x less
        # transfer); (x/255 - mean)/std runs here in f32 and XLA fuses the
        # per-channel scale/bias into the stem's input processing.
        mean = jnp.asarray(spec.data_mean, jnp.float32)
        std = jnp.asarray(spec.data_std, jnp.float32)
        x = (x.astype(jnp.float32) / 255.0 - mean) / std
    x = x.astype(compute_dtype)
    bn_updates: Dict = {} if (train and not spec.use_affine) else None

    feats = backbone_forward(spec, params, x, train=train,
                             bn_updates=bn_updates)

    if spec.head_type == 'roi':
        clip_feat = roi_head(spec, feats, batch['proposals'], train=train)
    else:
        clip_feat = basic_head(spec, feats)

    out: Dict[str, jax.Array] = {}
    feat_name = 'box_pooled' if spec.head_type == 'roi' else 'pool5'
    out[feat_name] = clip_feat
    if spec.lfb_infer_only:
        return out

    head = clip_feat.astype(jnp.float32)
    if spec.fbo.enabled:
        if rng is not None:
            rng, fbo_rng = jax.random.split(rng)
        else:
            fbo_rng = None
        fbo_out = fbo_forward(spec, params, head, batch['lfb'].astype(jnp.float32),
                              train=train, rng=fbo_rng)
        head = jnp.concatenate([head, fbo_out.astype(jnp.float32)], axis=-1)

    if spec.dropout_rate > 0 and train:
        assert rng is not None, 'training with dropout requires an rng'
        rng, drop_rng = jax.random.split(rng)
        head = dropout(drop_rng, head, spec.dropout_rate)

    logits = head @ params['pred_w'] + params['pred_b']
    out['logits'] = logits

    if spec.multi_label:
        out['prob'] = jax.nn.sigmoid(logits)
    else:
        out['prob'] = jax.nn.softmax(logits, axis=-1)

    labels = batch.get('labels')
    if labels is not None:
        out['loss'] = _loss(spec, logits, labels, batch.get('box_mask'))
    if bn_updates:
        out['bn_updates'] = bn_updates
    return out


def loss_parts(spec: ModelSpec, logits: jax.Array, labels: jax.Array,
               box_mask: Optional[jax.Array]):
    """(numerator_sum, denominator_count) of the classification loss, so a
    shard_map body can psum both parts for an exact global mean."""
    logits = logits.astype(jnp.float32)
    if spec.multi_label:
        labels = labels.astype(jnp.float32)
        per_elem = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        if box_mask is not None:
            w = box_mask.astype(jnp.float32)[:, None]
            per_elem = per_elem * w
            denom = jnp.sum(w) * logits.shape[-1]
        else:
            denom = jnp.asarray(per_elem.size, jnp.float32)
        return jnp.sum(per_elem), denom
    log_p = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_p, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return jnp.sum(nll), jnp.asarray(nll.shape[0], jnp.float32)


def _loss(spec: ModelSpec, logits: jax.Array, labels: jax.Array,
          box_mask: Optional[jax.Array]) -> jax.Array:
    """Classification loss.

    Multi-label: per-element sigmoid CE averaged over (valid) elements,
    matching Detectron's normalized SigmoidCrossEntropyLoss.  Single-label:
    softmax CE averaged over the batch.  The reference additionally scales by
    1/NUM_GPUS because its cross-GPU gradient reduction SUMS
    (``resnet_video.py:333-341``); under global-batch-mean data parallelism
    that factor is already implicit, so no extra scale is applied here.
    """
    num, den = loss_parts(spec, logits, labels, box_mask)
    return num / jnp.maximum(den, 1.0)

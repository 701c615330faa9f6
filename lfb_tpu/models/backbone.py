"""3D ResNet (R50/R101, C2D/I3D) backbone with interleaved space-time
non-local blocks.

Network topology follows the reference (``lib/models/resnet_video.py:133-301``
+ ``lib/models/resnet_helper.py``): conv1 (kTx7x7, stride 1x2x2) -> pool1
(1x3x3 / 1x2x2) -> res2 -> pool2 (2x1x1 temporal) -> res3 (+NL) -> res4 (+NL)
-> res5 (stride 1, spatial dilation 2 when DILATIONS_AFTER_CONV5).

The temporal conv of each bottleneck sits on the first 1x1 (branch2a); res3's
NL blocks run per temporal group of 4 frames in affine mode (reference
``resnet_video.py:246-265``, ``nonlocal_helper.py:174-213``).

All compute is channels-last NDHWC; matmul-heavy NL attention runs through
``lfb_tpu.ops.attention`` (fused Pallas kernel on TPU).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax

from lfb_tpu.models.layers import (Params, apply_norm, init_conv,
                                   init_norm, pallas_ok)
from lfb_tpu.models.spec import STAGE_DIMS, ModelSpec
from lfb_tpu.ops.attention import scaled_softmax_attention
from lfb_tpu.ops.conv3d import conv1_space_to_depth, conv1x1, conv3d
from lfb_tpu.ops.pooling import max_pool_3d


# --------------------------------------------------------------------------- #
# Initialization
# --------------------------------------------------------------------------- #

def init_backbone(key, spec: ModelSpec) -> Params:
    params: Params = {}
    keys = iter(jax.random.split(key, 4096))
    use_temp, _ = spec.arc

    # conv1: kT = 1 + 2*use_temp, 7x7 spatial.
    kt1 = 1 + use_temp[0][0] * 2
    init_conv(next(keys), params, 'conv1', kt1, 7, 7, 3, 64)
    init_norm(params, 'res_conv1_bn', 64, use_affine=spec.use_affine)

    dims_in = 64
    n_blocks = spec.block_counts
    dim_inner = spec.dim_inner_base
    for stage_i, (stage_name, dim_out, inner_mult) in enumerate(
            zip(('res2', 'res3', 'res4', 'res5'), STAGE_DIMS, (1, 2, 4, 8))):
        utc = use_temp[stage_i + 1]
        for idx in range(n_blocks[stage_i]):
            prefix = '{}_{}'.format(stage_name, idx)
            di = dim_inner * inner_mult
            kt = 1 + utc[idx] * 2
            init_conv(next(keys), params, prefix + '_branch2a', kt, 1, 1,
                      dims_in, di)
            init_norm(params, prefix + '_branch2a_bn', di,
                      use_affine=spec.use_affine)
            init_conv(next(keys), params, prefix + '_branch2b', 1, 3, 3,
                      di // spec.groups, di)
            init_norm(params, prefix + '_branch2b_bn', di,
                      use_affine=spec.use_affine)
            init_conv(next(keys), params, prefix + '_branch2c', 1, 1, 1,
                      di, dim_out)
            init_norm(params, prefix + '_branch2c_bn', dim_out,
                      use_affine=spec.use_affine,
                      gamma_init=spec.bn_init_gamma)
            if idx == 0 and dims_in != dim_out:
                init_conv(next(keys), params, prefix + '_branch1', 1, 1, 1,
                          dims_in, dim_out)
                init_norm(params, prefix + '_branch1_bn', dim_out,
                          use_affine=spec.use_affine)
            dims_in = dim_out

            nl_stage = spec.nl_blocks.get(stage_name, ())
            if idx in nl_stage:
                _init_nonlocal(
                    next(keys), params,
                    'nonlocal_conv{}_{}'.format(stage_i + 2, idx),
                    dims_in, dims_in // 2, spec)
    return params


def _init_nonlocal(key, params: Params, prefix: str, dim: int,
                   dim_inner: int, spec: ModelSpec) -> None:
    nl = spec.nl
    k1, k2, k3, k4 = jax.random.split(key, 4)
    has_bias = not nl.no_bias
    init_conv(k1, params, prefix + '_theta', 1, 1, 1, dim, dim_inner,
              std=nl.conv_init_std, bias=has_bias)
    init_conv(k2, params, prefix + '_phi', 1, 1, 1, dim, dim_inner,
              std=nl.conv_init_std, bias=has_bias)
    init_conv(k3, params, prefix + '_g', 1, 1, 1, dim, dim_inner,
              std=nl.conv_init_std, bias=has_bias)
    init_conv(k4, params, prefix + '_out', 1, 1, 1, dim_inner, dim,
              std=nl.conv_init_std, zero=nl.use_zero_init_conv, bias=has_bias)
    if nl.use_bn or nl.use_affine:
        init_norm(params, prefix + '_bn', dim, use_affine=nl.use_affine,
                  gamma_init=nl.bn_init_gamma if nl.use_bn else 1.0)


# --------------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------------- #

def backbone_forward(spec: ModelSpec, params: Params, x: jax.Array, *,
                     train: bool, bn_updates: Dict | None) -> jax.Array:
    """(B, T, H, W, 3) -> (B, T/2, H/16, W/16, 2048)."""
    use_temp, temp_strides = spec.arc
    norm = functools.partial(
        apply_norm, params, use_affine=spec.use_affine, train=train,
        epsilon=spec.bn_epsilon, bn_updates=bn_updates)

    B, T, H, W, _ = x.shape
    h = None
    if pallas_ok(spec, spec.use_pallas_stem) and temp_strides[0][0] == 1:
        # Fused Pallas stem in BOTH modes: training differentiates through
        # a custom VJP (XLA grad-weights conv; the data cotangent is dead
        # code).  Eval keeps the historical bf16 kernel dtype.
        if train:
            from lfb_tpu.ops.pallas_stem import stem_conv_s2d_diff
            h = stem_conv_s2d_diff(x, params['conv1_w'],
                                   temporal_pad=use_temp[0][0],
                                   axis_name=spec.data_axis)
        else:
            from lfb_tpu.ops.pallas_stem import stem_conv_s2d
            h = stem_conv_s2d(x, params['conv1_w'],
                              temporal_pad=use_temp[0][0])
    if h is not None:
        pass
    elif (spec.use_conv1_s2d and H % 2 == 0 and W % 2 == 0
            and temp_strides[0][0] == 1):
        h = conv1_space_to_depth(x, params['conv1_w'],
                                 temporal_pad=use_temp[0][0])
    else:
        h = conv3d(x, params['conv1_w'], strides=(temp_strides[0][0], 2, 2),
                   padding=(use_temp[0][0], 3, 3))
    h = norm('res_conv1_bn', h)
    h = jax.nn.relu(h)
    h = max_pool_3d(h, (1, 3, 3), (1, 2, 2), (0, 1, 1))

    # Rematerialization: 'stage' checkpoints whole res-stages, 'block'
    # checkpoints every residual block (finer grain, less memory).  Only
    # meaningful in training, and disabled in true-BN mode where batch
    # statistics flow out through a side dict.
    remat = (spec.remat if (train and (spec.use_affine or bn_updates is None))
             else '')

    def run_stage(stage_i, h, dilation, stride):
        fn = functools.partial(_stage_forward, spec, params, stage_i,
                               dilation=dilation, stride=stride, train=train,
                               bn_updates=bn_updates, remat_block=remat == 'block')
        # 'res2' checkpoints only the first stage, whose activations
        # dominate the training footprint (256ch x T x crop/4^2 -- 4x the
        # bytes of any later stage): most of the memory win of 'stage' at a
        # fraction of the recompute.
        if remat == 'stage' or (remat == 'res2' and stage_i == 0):
            fn = jax.checkpoint(fn)
        return fn(h)

    h = run_stage(0, h, 1, 1)                       # res2
    h = max_pool_3d(h, (2, 1, 1), (2, 1, 1))        # pool2: T/2
    h = run_stage(1, h, 1, 2)                       # res3 (+NL, grouped if affine)
    h = run_stage(2, h, 1, 2)                       # res4 (+NL)
    dil = 2 if spec.dilations_after_conv5 else 1
    h = run_stage(3, h, dil, 1)                     # res5 (dilated, stride 1)

    if spec.freeze_backbone:
        h = jax.lax.stop_gradient(h)
    return h


def _stage_forward(spec: ModelSpec, params: Params, stage_i: int,
                   h: jax.Array, *, dilation: int, stride: int, train: bool,
                   bn_updates: Dict | None,
                   remat_block: bool = False) -> jax.Array:
    use_temp, temp_strides = spec.arc
    stage_name = 'res{}'.format(stage_i + 2)
    utc, tst = use_temp[stage_i + 1], temp_strides[stage_i + 1]
    dim_out = STAGE_DIMS[stage_i]
    nl_after = spec.nl_blocks.get(stage_name, ())

    for idx in range(spec.block_counts[stage_i]):
        prefix = '{}_{}'.format(stage_name, idx)
        block_stride = stride if idx == 0 else 1
        block = functools.partial(
            _bottleneck, spec, params, prefix, dim_out=dim_out,
            stride=block_stride, temp_stride=tst[idx],
            use_temp_conv=utc[idx], dilation=dilation,
            train=train, bn_updates=bn_updates)
        h = jax.checkpoint(block)(h) if remat_block else block(h)
        if idx in nl_after:
            nl_prefix = 'nonlocal_conv{}_{}'.format(stage_i + 2, idx)
            grouped = spec.use_affine and stage_name == 'res3'
            h = _nonlocal_block(spec, params, nl_prefix, h, grouped=grouped,
                                train=train, bn_updates=bn_updates)
    return h


def _bottleneck(spec: ModelSpec, params: Params, prefix: str, x: jax.Array,
                *, dim_out: int, stride: int, temp_stride: int,
                use_temp_conv: int, dilation: int, train: bool,
                bn_updates: Dict | None) -> jax.Array:
    norm = functools.partial(
        apply_norm, params, use_affine=spec.use_affine, train=train,
        epsilon=spec.bn_epsilon, bn_updates=bn_updates)
    dim_in = x.shape[-1]

    # Fused whole-block Pallas kernel (inference, identity shortcut,
    # frozen-affine): all intermediates stay in VMEM, halving the stage's
    # HBM traffic.  Falls through to the XLA path outside the envelope.
    if (not train and spec.use_affine and dim_in == dim_out
            and stride == 1 and temp_stride == 1 and spec.groups == 1
            and pallas_ok(spec, spec.use_pallas_bottleneck)):
        from lfb_tpu.ops.pallas_bottleneck import (
            fold_bottleneck_params, fused_identity_bottleneck)
        folded = fold_bottleneck_params(params, prefix)
        if folded is not None:
            h = fused_identity_bottleneck(
                x, *folded, temporal_pad=use_temp_conv, dilation=dilation)
            if h is not None:
                return h

    h = conv3d(x, params[prefix + '_branch2a_w'],
               strides=(temp_stride, 1, 1), padding=(use_temp_conv, 0, 0))
    h = jax.nn.relu(norm(prefix + '_branch2a_bn', h))

    h = conv3d(h, params[prefix + '_branch2b_w'],
               strides=(1, stride, stride), padding=(0, dilation, dilation),
               dilation=(1, dilation, dilation), groups=spec.groups)
    h = jax.nn.relu(norm(prefix + '_branch2b_bn', h))

    h = conv3d(h, params[prefix + '_branch2c_w'])
    h = norm(prefix + '_branch2c_bn', h)

    if dim_in == dim_out and temp_stride == 1 and stride == 1:
        sc = x
    else:
        sc = conv3d(x, params[prefix + '_branch1_w'],
                    strides=(temp_stride, stride, stride))
        sc = norm(prefix + '_branch1_bn', sc)
    return jax.nn.relu(h + sc)


def _nonlocal_block(spec: ModelSpec, params: Params, prefix: str,
                    x: jax.Array, *, grouped: bool, train: bool,
                    bn_updates: Dict | None) -> jax.Array:
    """Space-time NL + residual (reference ``nonlocal_helper.py:29-213``)."""
    B, T, H, W, C = x.shape
    group_size = spec.nl_group_size
    group_num = spec.pool_stride // group_size if grouped else 1
    if group_num > 1:
        assert T % group_num == 0, (T, group_num)
        tg = T // group_num
        x_nl = x.reshape(B * group_num, tg, H, W, C)
    else:
        x_nl = x

    y = _spacetime_nonlocal(spec, params, prefix, x_nl, train=train,
                            bn_updates=bn_updates)
    out = x_nl + y
    if group_num > 1:
        out = out.reshape(B, T, H, W, C)
    return out


def _spacetime_nonlocal(spec: ModelSpec, params: Params, prefix: str,
                        x: jax.Array, *, train: bool,
                        bn_updates: Dict | None) -> jax.Array:
    nl = spec.nl
    B, T, H, W, C = x.shape
    dim_inner = params[prefix + '_theta_w'].shape[-1]

    def bias(name):
        return params.get(prefix + name + '_b')

    theta = conv1x1(x, params[prefix + '_theta_w'], bias('_theta'))
    pooled = max_pool_3d(x, (1, 2, 2), (1, 2, 2)) if nl.use_maxpool else x
    phi = conv1x1(pooled, params[prefix + '_phi_w'], bias('_phi'))
    g = conv1x1(pooled, params[prefix + '_g_w'], bias('_g'))

    q = theta.reshape(B, T * H * W, dim_inner)
    k = phi.reshape(B, -1, dim_inner)
    v = g.reshape(B, -1, dim_inner)

    att = scaled_softmax_attention(
        q, k, v,
        scale=dim_inner ** -0.5 if (nl.use_softmax and nl.use_scale) else None,
        use_softmax=nl.use_softmax,
        use_pallas=pallas_ok(spec) if nl.use_softmax else False)
    t = att.reshape(B, T, H, W, dim_inner)

    out = conv1x1(t, params[prefix + '_out_w'], bias('_out'))
    if nl.use_bn or nl.use_affine:
        out = apply_norm(params, prefix + '_bn', out,
                         use_affine=nl.use_affine, train=train,
                         epsilon=nl.bn_epsilon, bn_updates=bn_updates)
    return out

"""Feature Bank Operators (FBO): avg-pool, max-pool, and FBO-NL cross
attention over the long-term feature bank window.

Reference: ``lib/models/lfb_helper.py``.  The FBO-NL stack (``NLLayers`` /
``NLCore``, ``lfb_helper.py:170-292``) is query=clip-feature (1 token),
keys/values=bank window (W tokens) cross attention with LayerNorm/ReLU in
pre-act or post-act arrangement, zero-initialized output projection, dropout
and residual; here each layer is one fused attention call plus pointwise ops
that XLA folds together.

Parity note: zero-padded bank rows participate in the softmax, exactly like
the reference (``lib/datasets/ava.py:300-323`` pads with zeros and no mask is
applied anywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lfb_tpu.models.layers import (Params, dropout, init_conv,
                                   layer_norm, pallas_ok)
from lfb_tpu.models.spec import ModelSpec
from lfb_tpu.ops.attention import scaled_softmax_attention
from lfb_tpu.ops.conv3d import conv1x1


def fbo_input_name(spec: ModelSpec) -> str:
    """The Caffe2 blob name the FBO input-reduce conv was named after.

    The reference derives parameter names from data-blob names; with the
    released configs (ALLOW_INPLACE_SUM/RELU=True) the backbone's final blob
    is ``res5_2_branch2c_bn``, so the basic head's pooled blob is
    ``res5_2_branch2c_bn_pooled`` and the RoI head's is ``box_pooled``
    (reference ``head_helper.py:37,120``; ``lfb_helper.py:295-317``).
    """
    return 'box_pooled' if spec.head_type == 'roi' else 'res5_2_branch2c_bn_pooled'


def init_fbo(key, spec: ModelSpec) -> Params:
    params: Params = {}
    f = spec.fbo
    if not f.enabled or spec.lfb_infer_only:
        return params
    if f.fbo_type in ('avg', 'max'):
        return params  # pure pooling; no parameters

    keys = iter(jax.random.split(key, 64))
    clip_dim = 2048
    has_bias = not spec.nl.no_bias
    if f.input_reduce_dim:
        init_conv(next(keys), params, fbo_input_name(spec) + '_fbonl_reduc',
                  1, 1, 1, clip_dim, f.latent_dim, std=spec.fc_init_std,
                  bias=has_bias)
        theta_dim = f.latent_dim
    else:
        theta_dim = clip_dim
    init_conv(next(keys), params, 'lfb_1x1', 1, 1, 1, f.lfb_dim,
              f.latent_dim, std=spec.fc_init_std, bias=has_bias)
    for i in range(f.num_layers):
        prefix = 'lfb_nl{}'.format(i)
        init_conv(next(keys), params, prefix + '_theta', 1, 1, 1, theta_dim,
                  f.latent_dim, std=spec.nl.conv_init_std, bias=has_bias)
        init_conv(next(keys), params, prefix + '_phi', 1, 1, 1, f.latent_dim,
                  f.latent_dim, std=spec.nl.conv_init_std, bias=has_bias)
        init_conv(next(keys), params, prefix + '_g', 1, 1, 1, f.latent_dim,
                  f.latent_dim, std=spec.nl.conv_init_std, bias=has_bias)
        # Output projection is zero-initialized (init_params2,
        # ``lfb_helper.py:36-40``) so each NL layer starts as identity.
        init_conv(next(keys), params, prefix + '_out', 1, 1, 1, f.latent_dim,
                  theta_dim, zero=True, bias=has_bias)
    return params


def fbo_forward(spec: ModelSpec, params: Params, clip_feat: jax.Array,
                lfb: jax.Array, *, train: bool, rng) -> jax.Array:
    """Apply the configured FBO.

    Args:
      clip_feat: (N, 2048) pooled clip (or box) features.
      lfb: (N, W, lfb_dim) bank window, zero-padded to fixed W.

    Returns:
      (N, out_dim) bank summary to concat with clip features
      (out_dim = latent_dim for 'nl', lfb_dim for 'avg'/'max').
    """
    f = spec.fbo
    if f.fbo_type == 'avg':
        return jnp.mean(lfb, axis=1)
    if f.fbo_type == 'max':
        return jnp.max(lfb, axis=1)
    assert f.fbo_type == 'nl', f.fbo_type

    rngs = jax.random.split(rng, 2 + 2 * f.num_layers) if rng is not None else None

    # prepare_nl_input (``lfb_helper.py:295-317``)
    x = clip_feat
    if f.input_reduce_dim:
        name = fbo_input_name(spec) + '_fbonl_reduc'
        x = conv1x1(x, params[name + '_w'], params.get(name + '_b'))
    if f.input_dropout_on and train:
        x = dropout(rngs[0], x, f.dropout_rate)

    # prepare_lfb (``lfb_helper.py:320-338``)
    bank = conv1x1(lfb, params['lfb_1x1_w'], params.get('lfb_1x1_b'))
    if f.lfb_dropout_on and train:
        bank = dropout(rngs[1], bank, f.dropout_rate)

    for i in range(f.num_layers):
        prefix = 'lfb_nl{}'.format(i)
        layer_rng = rngs[2 + i] if rngs is not None else None
        x = _nl_core(spec, params, prefix, x, bank, train=train, rng=layer_rng)
    return x


def _nl_core(spec: ModelSpec, params: Params, prefix: str, a: jax.Array,
             bank: jax.Array, *, train: bool, rng) -> jax.Array:
    """One FBO-NL layer (reference ``NLCore`` + residual/activation from
    ``NLLayers``, ``lfb_helper.py:170-292``)."""
    f = spec.fbo

    def p(name):
        return params[prefix + name + '_w'], params.get(prefix + name + '_b')

    wt, bt = p('_theta')
    wp, bp = p('_phi')
    wg, bg = p('_g')
    theta = conv1x1(a, wt, bt)[:, None, :]          # (N, 1, L)
    phi = conv1x1(bank, wp, bp)                      # (N, W, L)
    g = conv1x1(bank, wg, bg)                        # (N, W, L)

    t = scaled_softmax_attention(
        theta, phi, g,
        scale=f.latent_dim ** -0.5 if f.scale else None,
        use_pallas=pallas_ok(spec))[:, 0, :]          # (N, L)

    if f.pre_act:
        if f.pre_act_ln:
            t = layer_norm(t)
        t = jax.nn.relu(t)

    wo, bo = p('_out')
    out = conv1x1(t, wo, bo)

    if not f.pre_act:
        out = layer_norm(out)

    # NLCore's dropout is gated on LFB_DROPOUT_ON (``lfb_helper.py:258-261``).
    if f.lfb_dropout_on and train:
        out = dropout(rng, out, f.dropout_rate)

    out = out + a
    if not f.pre_act:
        out = jax.nn.relu(out)
    return out

import numpy as np

import jax
import jax.numpy as jnp

from lfb_tpu.core import config as C
from lfb_tpu.train import lr_policy, optimizer as opt


def solver(**over):
    cfg = C.default_config()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.STEP_SIZES = [60, 20, 10]
    cfg.SOLVER.MAX_ITER = 90
    for k, v in over.items():
        cfg.SOLVER[k] = v
    C.finalize(cfg)
    return cfg.SOLVER


def test_steps_with_relative_lrs():
    s = solver(LRS=[1, 0.1, 0.01])
    assert lr_policy.get_lr_at_iter(s, 0) == 0.02
    assert lr_policy.get_lr_at_iter(s, 59) == 0.02
    assert abs(lr_policy.get_lr_at_iter(s, 60) - 0.002) < 1e-9
    assert abs(lr_policy.get_lr_at_iter(s, 80) - 0.0002) < 1e-9
    assert abs(lr_policy.get_lr_at_iter(s, 89) - 0.0002) < 1e-9


def test_warmup_linear():
    s = solver(LRS=[1, 0.1, 0.01])
    s.WARMUP.WARMUP_ON = True
    s.WARMUP.WARMUP_START_LR = 0.002
    s.WARMUP.WARMUP_END_ITER = 11
    assert abs(lr_policy.get_lr_at_iter(s, 0) - 0.002) < 1e-9
    # linear to lr(11) = 0.02 at it=10: start + 10*(0.02-0.002)/10
    assert abs(lr_policy.get_lr_at_iter(s, 10) - 0.02) < 1e-9
    assert abs(lr_policy.get_lr_at_iter(s, 11) - 0.02) < 1e-9


def test_steps_with_decay():
    s = solver(LR_POLICY='steps_with_decay', GAMMA=0.1)
    assert abs(lr_policy.get_lr_at_iter(s, 0) - 0.02) < 1e-12
    assert abs(lr_policy.get_lr_at_iter(s, 65) - 0.002) < 1e-12
    assert abs(lr_policy.get_lr_at_iter(s, 85) - 0.0002) < 1e-12


def test_momentum_sgd_matches_caffe2_semantics():
    """One step: V = mu*V + lr*(g + wd*p); nesterov step = (1+mu)*V - mu*V_prev."""
    p0 = jnp.array([1.0, -2.0])
    g = jnp.array([0.5, 0.25])
    v0 = jnp.array([0.1, -0.1])
    lr, mu, wd = 0.1, 0.9, 0.01
    params = {'w': p0}
    state = opt.SGDState(momentum={'w': v0})
    new_params, new_state = opt.apply_updates(
        params, {'w': g}, state, lr=lr, momentum=mu, nesterov=True,
        weight_decay=wd, weight_decay_bn=0.0)
    g_wd = np.asarray(g) + wd * np.asarray(p0)
    v1 = mu * np.asarray(v0) + lr * g_wd
    step = (1 + mu) * v1 - mu * np.asarray(v0)
    np.testing.assert_allclose(np.asarray(new_params['w']),
                               np.asarray(p0) - step, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.momentum['w']), v1,
                               rtol=1e-6)


def test_weight_decay_bn_rule():
    params = {'res2_0_branch2a_bn_s': jnp.array([1.0]),
              'conv1_w': jnp.array([1.0])}
    grads = {k: jnp.zeros_like(v) for k, v in params.items()}
    state = opt.init_state(params, frozen=set())
    new_params, _ = opt.apply_updates(
        params, grads, state, lr=1.0, momentum=0.0, nesterov=False,
        weight_decay=0.1, weight_decay_bn=0.0)
    # zero grad: only decay moves params; bn param must not move.
    np.testing.assert_allclose(np.asarray(new_params['res2_0_branch2a_bn_s']),
                               [1.0])
    np.testing.assert_allclose(np.asarray(new_params['conv1_w']), [0.9])


def test_momentum_correction():
    state = opt.SGDState(momentum={'w': jnp.array([2.0])})
    scaled = opt.correct_momentum(state, 0.1)
    np.testing.assert_allclose(np.asarray(scaled.momentum['w']), [0.2])


def test_frozen_excluded_from_state():
    params = {'a': jnp.zeros(3), 'b_bn_s': jnp.zeros(3)}
    state = opt.init_state(params, frozen={'b_bn_s'})
    assert set(state.momentum) == {'a'}

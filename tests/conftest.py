"""Test harness: emulate an 8-device TPU slice on CPU.

Must set XLA flags before jax initializes (safe even if re-imported).
"""

import os

# The session environment pins JAX_PLATFORMS to the TPU tunnel ('axon');
# unit tests always run on an 8-virtual-device CPU backend.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; pin cpu explicitly.
jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402

# Modules dominated by multi-minute jit compiles on the 1-vCPU host.
# ``pytest -m "not slow"`` is the fast core lane (~2 min); the full suite
# takes ~15 min.
_SLOW_MODULES = {
    'test_integration', 'test_parallel', 'test_golden_full_model',
    'test_golden_torch', 'test_pallas_interpret',
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit('.', 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope='session')
def eight_devices():
    import jax
    devs = jax.devices()
    assert len(devs) >= 8, devs
    return devs

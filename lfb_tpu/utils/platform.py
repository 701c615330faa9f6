"""Honor ``JAX_PLATFORMS`` on hosts whose TPU plugin overrides it.

The axon TPU plugin re-pins the platform at import time, so exporting
``JAX_PLATFORMS=cpu`` alone is not enough to run a CLI on CPU (the same
reason ``tests/conftest.py`` pins via ``jax.config``).  Call
:func:`honor_jax_platforms_env` before the first jax use in a tool that
should respect the user's environment choice.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get('JAX_PLATFORMS', '')
    if not want:
        return
    import jax
    jax.config.update('jax_platforms', want)

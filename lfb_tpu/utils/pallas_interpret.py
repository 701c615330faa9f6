"""Force the Pallas kernel path in interpret mode, for CPU validation.

Compiled Pallas kernels only exist on real TPU chips; CPU tests and the
driver's multi-chip dry run still need to exercise the custom-VJP kernel
wiring (stem, fused NL/FBO attention, RoIAlign).  This context manager
routes every ``pallas_call`` through the HLO interpreter and forces the
model's ``pallas_ok`` gates on, with two documented interpreter
limitations worked around:

* the stem dW kernel's accumulated output block trips a Pallas
  hlo-interpreter limitation under shard_map ``check_vma`` typing
  ("dynamic_slice requires varying manual axes to match"); real Mosaic
  compiles it (``tools/tpu_smoke.py`` check 5), so here it falls back to
  the XLA grad-weights conv — whose transpose-inserted psum is itself part
  of what the multi-chip parity checks certify;
* the RoIAlign kernel's scalar-prefetch index maps trip the same
  limitation, so heads keep the XLA RoIAlign under this patch (the kernel
  is parity-tested in tests/test_pallas_interpret.py and runs on chips).

Used by ``__graft_entry__.dryrun_multichip`` and
``tests/test_parallel.py`` — keep the recipe here so the two cannot
silently diverge.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def force_pallas_interpret():
    from jax.experimental import pallas as pl
    from lfb_tpu.models import backbone as backbone_mod
    from lfb_tpu.models import fbo as fbo_mod
    from lfb_tpu.ops import pallas_stem

    patched = [
        (pl, 'pallas_call', pl.pallas_call),
        (backbone_mod, 'pallas_ok', backbone_mod.pallas_ok),
        (fbo_mod, 'pallas_ok', fbo_mod.pallas_ok),
        (pallas_stem, 'stem_conv_s2d_dw', pallas_stem.stem_conv_s2d_dw),
    ]
    orig_call = pl.pallas_call
    pl.pallas_call = lambda *a, **k: orig_call(*a, interpret=True, **k)

    def force_ok(spec, enabled=None):
        # Bypass only the TPU-backend check; honor the spec's per-kernel
        # switches (TPU.USE_PALLAS / TPU.PALLAS_STEM) so interpret-mode
        # callers can attribute parity deltas kernel by kernel.
        return spec.use_pallas if enabled is None else enabled

    backbone_mod.pallas_ok = force_ok
    fbo_mod.pallas_ok = force_ok
    pallas_stem.stem_conv_s2d_dw = lambda *a, **k: None
    try:
        yield
    finally:
        for mod, name, value in patched:
            setattr(mod, name, value)

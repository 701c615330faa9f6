"""Pin tools/mfu_probe.py's tracer to the backbone's op symbols.

``collect_sigs`` monkey-patches ``models.backbone.{conv3d, conv1x1,
scaled_softmax_attention}`` with recorders; a rename in backbone.py would
break the probe silently (it traces via eval_shape, so nothing errors --
the table just goes empty).  This cheap CPU test collects on the real
flagship spec (abstract tracing only, no compute) and asserts the known
signature classes appear with sane counts.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))


def test_collect_sigs_flagship():
    import mfu_probe

    cfg, spec = mfu_probe._flagship(train_crop=224, train_batch=8)
    sigs = mfu_probe.collect_sigs(spec, B=8, crop=224)

    kinds = {s.kind for s in sigs}
    assert kinds == {'conv3d', 'conv1x1', 'attention'}, kinds

    total_calls = sum(sigs.values())
    # Flagship R101-I3D + 3-layer FBO-NL: 128 recorded op calls over 32
    # unique signatures as of round 4.  Exact equality would be brittle
    # against legitimate arch-config changes; a collapse to near-zero is
    # the failure mode being guarded (recorder no longer patched in).
    assert total_calls >= 100, total_calls
    assert len(sigs) >= 25, len(sigs)

    # Temporal (kT>1) convs exist -- the I3D signature the 'flat' mode
    # A/Bs against matmuls.
    assert any(s.kind == 'conv3d' and s.w_shape[0] > 1 for s in sigs)
    # res5-width projection present (2048 channels in or out).
    assert any(s.kind in ('conv3d', 'conv1x1')
               and 2048 in (s.w_shape[-2], s.w_shape[-1]) for s in sigs)
    # In-backbone NL + FBO-NL attention: several distinct attention shapes.
    attn = [s for s in sigs if s.kind == 'attention']
    assert len(attn) >= 2, attn

    # flops() must be positive for every signature (the table sorts by it).
    assert all(s.flops() > 0 for s in sigs)

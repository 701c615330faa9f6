"""Regression test for the parity harness's dry-run path.

``tools/parity_eval.py --dryrun`` rehearses the exact flow that will carry
the north-star measurement the day released weights arrive (reference flow
``tools/test_net.py:48-93``): config load -> manifest-shaped fabricated
checkpoint -> Caffe2-pkl import -> (bank inference for LFB configs) ->
eval sweep over a synthetic tiny dataset -> metric computation -> PARITY
report.  One LFB config suffices here (the round-4 tool run exercised all
five BASELINE.json configs, including flagship multi-crop); keeping it in
the suite makes the harness regression-proof.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))


@pytest.mark.slow
def test_dryrun_epic_verb_lfb_max(tmp_path):
    import parity_eval
    ok = parity_eval.dryrun_one('epic_verb_r50_lfb_max', str(tmp_path))
    assert ok
    # The full path must have produced the eval artifact.
    out = os.path.join(str(tmp_path), 'epic_verb_r50_lfb_max',
                       'epic_predictions_final.pkl')
    assert os.path.isfile(out)


@pytest.mark.slow
def test_dryrun_flagship_multicrop(tmp_path):
    """The most complex eval path in the framework: the flagship
    ava_r101_lfb_nl_3l multi-crop dryrun (2 flips x 1 scale x 3 shifts,
    bank re-inferred per (flip, scale), visibility-gated 3-shift merge,
    6-way sum -- reference ``tools/test_net.py:61-87`` +
    ``metrics.py:599-711``).  Exercised once manually in round 4; pinned
    here so it cannot regress unnoticed."""
    import parity_eval
    ok = parity_eval.dryrun_one('ava_r101_lfb_nl_3l', str(tmp_path))
    assert ok
    root = os.path.join(str(tmp_path), 'ava_r101_lfb_nl_3l')
    assert os.path.isfile(
        os.path.join(root, 'final_multi_crop_testing_results.csv'))
    # All six per-crop detections CSVs must exist (2 flips x 3 shifts).
    shifts = [f for f in os.listdir(root) if 'shift' in f]
    assert len(shifts) == 6, sorted(os.listdir(root))

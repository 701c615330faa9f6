import os

import numpy as np
import pytest

from lfb_tpu.data import native_loader
from tests import synthetic

cv2 = pytest.importorskip('cv2')


@pytest.fixture(scope='module')
def frames(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('nat'))
    rels = synthetic.write_frames(root, 'VID', 6, size=(40, 56))
    return [os.path.join(root, 'frames', r) for r in rels]


def test_native_decode_matches_cv2(frames):
    if not native_loader.native_available():
        pytest.skip('native clip loader not built')
    clip = native_loader.decode_clip(frames)
    ref = np.stack([cv2.imread(p) for p in frames])
    np.testing.assert_array_equal(clip, ref)


def test_native_decode_missing_file_returns_none(frames):
    if not native_loader.native_available():
        pytest.skip('native clip loader not built')
    assert native_loader.decode_clip(['/nonexistent/x.jpg']) is None
    assert native_loader.decode_clip(frames + ['/nonexistent/x.jpg']) is None


def test_load_frames_uses_native_and_matches(frames):
    from lfb_tpu.data.transforms import load_frames
    via_native = load_frames(frames, use_native=True)
    via_cv2 = load_frames(frames, use_native=False)
    np.testing.assert_array_equal(via_native, via_cv2)

"""ctypes binding for the native C++ clip decoder (``native/clip_loader.cc``).

Decodes a whole clip's JPEG frames on C++ threads in one call -- the native
counterpart of the reference's 12-process cv2 decode pools.  Falls back to
cv2 transparently when the shared library is unavailable; bytes are
identical either way (JPEG decode is fully specified, output BGR u8 HWC).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'build', 'liblfbclip.so')

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _build_library() -> bool:
    try:
        subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_SO_PATH)
    except Exception as e:  # pragma: no cover
        logger.info('native clip loader build failed: %s', e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.isfile(_SO_PATH) and not _build_library():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.lfb_probe_jpeg.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.lfb_probe_jpeg.restype = ctypes.c_int
            lib.lfb_decode_clip.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            lib.lfb_decode_clip.restype = ctypes.c_int
            _lib = lib
        except OSError as e:  # pragma: no cover
            logger.info('native clip loader unavailable: %s', e)
            _load_failed = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def set_native_enabled(enabled: bool) -> None:
    """Force-disable (or re-enable) the native decoder, so callers fall back
    to the cv2 path.  Used by ``bench.py data`` to compare decode paths."""
    global _lib, _load_failed
    with _lib_lock:
        if enabled:
            _load_failed = False
        else:
            _lib, _load_failed = None, True


def decode_clip(paths: Sequence[str],
                num_threads: int = 8) -> Optional[np.ndarray]:
    """Decode JPEG frames -> (T, H, W, 3) BGR uint8, or None on any failure
    (caller falls back to cv2)."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.lfb_probe_jpeg(paths[0].encode(), ctypes.byref(h),
                          ctypes.byref(w)) != 0:
        return None
    T = len(paths)
    out = np.empty((T, h.value, w.value, 3), np.uint8)
    c_paths = (ctypes.c_char_p * T)(*[p.encode() for p in paths])
    rc = lib.lfb_decode_clip(
        c_paths, T, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.value, w.value, num_threads)
    if rc != 0:
        logger.warning('native decode failed (rc=%d) for %s...', rc, paths[0])
        return None
    return out

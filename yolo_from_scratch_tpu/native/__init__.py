"""ctypes bindings for the native data-loading runtime (libyolodata.so).

Builds lazily via `make` on first use (g++ + libjpeg/libpng are part of
the image); falls back cleanly if the toolchain or libraries are missing —
callers check `available()` and use the PIL path otherwise.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libyolodata.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)], capture_output=True, text=True,
            timeout=120, check=True,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.yd_decode_letterbox_batch.restype = ctypes.c_int
        lib.yd_decode_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,                     # n
            ctypes.c_int,                     # target
            ctypes.POINTER(ctypes.c_float),   # out
            ctypes.POINTER(ctypes.c_float),   # scales
            ctypes.POINTER(ctypes.c_int32),   # pad_tops
            ctypes.POINTER(ctypes.c_int32),   # pad_lefts
            ctypes.c_int,                     # n_threads
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_letterbox_batch(paths, target_size: int, n_threads: int = 4):
    """Decode + letterbox + normalize a batch of image files natively.

    Returns (images (N, S, S, 3) float32 [0,1], scales (N,) float32,
    pad_tops (N,) int32, pad_lefts (N,) int32, n_failures int).
    Failed decodes leave an all-gray canvas with scale 0.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (libyolodata.so)")
    n = len(paths)
    out = np.empty((n, target_size, target_size, 3), np.float32)
    scales = np.empty(n, np.float32)
    pad_tops = np.empty(n, np.int32)
    pad_lefts = np.empty(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths]
    )
    failures = lib.yd_decode_letterbox_batch(
        ctypes.cast(c_paths, ctypes.POINTER(ctypes.c_char_p)),
        n,
        target_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad_tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pad_lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(n_threads),
    )
    return out, scales, pad_tops, pad_lefts, int(failures)

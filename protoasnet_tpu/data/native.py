"""ctypes bindings for the native C++ data-loader core (native/cinestore.cpp).

Compiles the shared library on first use (``make -C native``); every entry
point has a NumPy fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "resize_video_u8", "gather_windows", "native_available"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) libcinestore.so; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_NATIVE_DIR, "libcinestore.so")
        if not os.path.exists(so):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception as e:
                logging.warning(f"native cinestore build failed ({e}); "
                                f"using NumPy fallbacks")
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            logging.warning(f"could not load {so} ({e}); using NumPy fallbacks")
            return None
        lib.resize_video_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int,
        ]
        lib.gather_windows.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
        logging.info(f"native cinestore loaded from {so}")
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_video_u8(video: np.ndarray, size: int,
                    num_threads: int = 0) -> Optional[np.ndarray]:
    """(T, H, W) uint8 -> (T, size, size) via the native core; None if the
    library is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    video = np.ascontiguousarray(video, dtype=np.uint8)
    t, h, w = video.shape
    out = np.empty((t, size, size), dtype=np.uint8)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    lib.resize_video_u8(_u8p(video), t, h, w, _u8p(out), size, num_threads)
    return out


def gather_windows(store: np.ndarray, offsets: np.ndarray,
                   video_idx: np.ndarray, starts: np.ndarray,
                   ends: np.ndarray, t_max: int) -> Optional[np.ndarray]:
    """Batched padded window gather from the packed (total, S, S) store;
    None if the library is unavailable. ``store`` must be a real contiguous
    array or memmap."""
    lib = get_lib()
    if lib is None:
        return None
    total, s1, s2 = store.shape
    b = len(video_idx)
    out = np.empty((b, t_max, s1, s2), dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    video_idx = np.ascontiguousarray(video_idx, dtype=np.int32)
    starts = np.ascontiguousarray(starts, dtype=np.int32)
    ends = np.ascontiguousarray(ends, dtype=np.int32)
    lib.gather_windows(
        _u8p(store), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        video_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_max, s1 * s2, _u8p(out),
    )
    return out

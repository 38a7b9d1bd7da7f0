"""ctypes binding for the native window-gather library (native/window_gather.cpp).

Builds the shared library on first use (g++ -O3 -shared) and caches it next
to the source; falls back to numpy fancy indexing when a compiler is
unavailable. The native path copies each gathered frame once with
multithreaded memcpy — it is the replacement for the reference's DataLoader
worker processes (reference train_vision_network.py:307 num_workers=4).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "window_gather.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libwindow_gather.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.gather_windows_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.gather_windows_u8.restype = None
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def gather_windows_u8(frames: np.ndarray, frame_idx: np.ndarray,
                      n_threads: int = 0) -> np.ndarray:
    """frames (T, H, W, C) uint8 (contiguous/memmap) + frame_idx (B, L)
    -> (B, L, H, W, C) uint8. Uses the native library when available."""
    frames = np.ascontiguousarray(frames) if not (
        isinstance(frames, np.memmap) or frames.flags["C_CONTIGUOUS"]) else frames
    B, L = frame_idx.shape
    T = frames.shape[0]
    frame_shape = frames.shape[1:]
    frame_bytes = int(np.prod(frame_shape))

    lib = get_lib()
    if lib is None:
        idx = np.clip(frame_idx, 0, T - 1)
        return np.asarray(frames[idx])

    out = np.empty((B, L) + frame_shape, dtype=np.uint8)
    idx = np.ascontiguousarray(frame_idx.astype(np.int64))
    n_threads = n_threads or min(os.cpu_count() or 4, 16)
    lib.gather_windows_u8(
        frames.ctypes.data_as(ctypes.c_void_p), T, frame_bytes,
        idx.ctypes.data_as(ctypes.c_void_p), B, L,
        out.ctypes.data_as(ctypes.c_void_p), n_threads,
    )
    return out

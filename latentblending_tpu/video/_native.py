"""ctypes binding for the native frame-interpolation kernel (native/).

Builds lazily with make on first import; any failure falls back to the
numpy path in video/frames.py (this module then raises ImportError).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libframeinterp.so")


def _rebuild():
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s", "-B", "libframeinterp.so"], check=True, capture_output=True)


def _load():
    if not os.path.exists(_SO):
        _rebuild()
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        # stale/incompatible binary (e.g. built with -march=native on another
        # host) — rebuild from source and retry once
        _rebuild()
        lib = ctypes.CDLL(_SO)
    lib.lerp_frames_multi_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.lerp_frames_multi_u8.restype = None
    return lib


_lib = _load()


def _u8p(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


_one = np.zeros(1, np.float32)


def lerp_into(a: np.ndarray, b: np.ndarray, fract: float, out: np.ndarray) -> np.ndarray:
    """Single-frame lerp into a caller-owned buffer (zero allocation)."""
    _one[0] = fract
    _lib.lerp_frames_multi_u8(
        _u8p(a), _u8p(b), _u8p(out), ctypes.c_int64(a.size),
        _one.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctypes.c_int64(1),
    )
    return out


def lerp_frames_u8(imgs: list[np.ndarray], counts: np.ndarray) -> list[np.ndarray]:
    """Expand keyframes with counts[i] interpolated frames per gap.

    Same output contract as the numpy path in video/frames.py."""
    out: list[np.ndarray] = []
    K = len(imgs)
    imgs = [np.ascontiguousarray(im, dtype=np.uint8) for im in imgs]
    for i in range(K - 1):
        out.append(imgs[i])
        n = int(counts[i])
        if n > 0:
            fracts = np.linspace(0, 1, n + 2, dtype=np.float32)[1:-1].copy()
            a, b = imgs[i], imgs[i + 1]
            buf = np.empty((n,) + a.shape, np.uint8)
            _lib.lerp_frames_multi_u8(
                _u8p(a), _u8p(b), _u8p(buf), ctypes.c_int64(a.size),
                fracts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctypes.c_int64(n),
            )
            out.extend(buf[j] for j in range(n))
    out.append(imgs[-1])
    return out

"""ctypes binding for the JPEG coefficient-space lerp kernel (native/).

In-between movie frames are linear blends of two keyframes, and the DCT is
linear — so when both keyframe JPEGs share one quant table (ours do: the
framework encodes them itself), the blend's quantized coefficients are just
round(lerp(qa, qb, t)). Encoding an interpolated frame then skips color
conversion, subsampling and the forward DCT entirely; only the Huffman pass
remains (native/jpeg_coef_lerp.cpp via libjpeg's jpeg_write_coefficients).
Measured ~1.65 ms/frame vs ~2.7 ms/frame for the full pixel path at 512p on
the 1-core bench host; output PSNR vs the pixel path is bounded by keyframe
quantization noise (>40 dB, tests/test_jpeg_coef_lerp.py).

Builds lazily with make on first import; any failure raises ImportError and
callers fall back to the pixel-lerp path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libjpegcoeflerp.so")


def _rebuild():
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s", "-B", "libjpegcoeflerp.so"], check=True, capture_output=True)


def _load():
    if not os.path.exists(_SO):
        _rebuild()
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _rebuild()
        lib = ctypes.CDLL(_SO)
    lib.jl_pair_open.restype = ctypes.c_void_p
    lib.jl_pair_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t]
    lib.jl_pair_lerp.restype = ctypes.c_int
    lib.jl_pair_lerp.argtypes = [
        ctypes.c_void_p,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.jl_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.jl_free.restype = None
    lib.jl_pair_close.argtypes = [ctypes.c_void_p]
    lib.jl_pair_close.restype = None
    lib.jl_encode_i420.restype = ctypes.c_int
    lib.jl_encode_i420.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    return lib


_lib = _load()


def encode_i420(i420, width: int, height: int, quality: int = 90) -> bytes:
    """Encode a packed I420 frame (Y ++ Cb ++ Cr planes, JFIF full-range
    BT.601 — the layout holder.to_i420_device ships) straight to JPEG via
    libjpeg raw-data mode: no host color conversion, no subsampling pass.
    Same sampling factors and quality tables as the pixel-path encoder, so
    JpegPair accepts mixed pairs. Raises ValueError on unsupported geometry
    (width must be a multiple of 16)."""
    import numpy as np

    buf = np.ascontiguousarray(i420, dtype=np.uint8)
    assert buf.size == width * height * 3 // 2, (buf.size, width, height)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_size_t()
    rc = _lib.jl_encode_i420(buf.tobytes(), int(width), int(height), int(quality),
                             ctypes.byref(out), ctypes.byref(n))
    if rc == 1:
        raise ValueError(f"jl_encode_i420: unsupported geometry {width}x{height}")
    if rc != 0:
        raise RuntimeError(f"jl_encode_i420 failed (rc={rc})")
    try:
        return ctypes.string_at(out, n.value)
    finally:
        _lib.jl_free(out)


class JpegPair:
    """A keyframe pair opened for coefficient-space interpolation.

    Not thread-safe: lerp() scribbles the first keyframe's coefficient
    arrays in place before the Huffman pass. Use one pair per thread.
    """

    def __init__(self, jpg_a: bytes, jpg_b: bytes):
        # set before the ctypes call: if jl_pair_open raises (e.g.
        # ArgumentError on a non-bytes input), __del__ still finds _p
        self._p = None
        self._p = _lib.jl_pair_open(jpg_a, len(jpg_a), jpg_b, len(jpg_b))
        if not self._p:
            # geometry / sampling / quant-table mismatch, or parse failure
            raise ValueError("JPEG pair incompatible for coefficient-space lerp")

    def lerp(self, t: float) -> bytes:
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_size_t()
        rc = _lib.jl_pair_lerp(self._p, float(t), ctypes.byref(out), ctypes.byref(n))
        if rc != 0:
            raise RuntimeError(f"jl_pair_lerp failed (rc={rc})")
        try:
            return ctypes.string_at(out, n.value)
        finally:
            _lib.jl_free(out)

    def close(self):
        # getattr + module-global guard: __del__ may run after a failed
        # __init__ or during interpreter teardown when _lib is already None
        p = getattr(self, "_p", None)
        lib = globals().get("_lib")
        if p and lib is not None:
            lib.jl_pair_close(p)
        self._p = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self.close()

"""ctypes bindings for the native host data-path library (native/fast_data.cpp).

Loads ``native/libfastdata.so``; if absent, attempts a one-shot ``make``
(g++ is baked into the image), and otherwise every entry point reports
unavailable so callers fall back to numpy.  The samplers use it when
present (data/sampler.py), keeping the host index-sampling cost out of the
per-epoch critical path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastdata.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.build_alias_table.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.alias_sample.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pcm16_to_float_mono.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.decode_jpeg_resize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    lib.decode_jpeg_resize.restype = ctypes.c_int
    lib.jpeg_dims.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.jpeg_dims.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class AliasTable:
    """Vose alias table over unnormalized weights; O(1) per draw."""

    def __init__(self, weights: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        w = np.ascontiguousarray(weights, np.float64)
        n = len(w)
        self.n = n
        self.prob = np.empty(n, np.float64)
        self.alias = np.empty(n, np.int64)
        lib.build_alias_table(
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            self.prob.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )

    def sample(self, num_samples: int, seed: int) -> np.ndarray:
        lib = _load()
        out = np.empty(num_samples, np.int64)
        lib.alias_sample(
            self.prob.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.n, num_samples, ctypes.c_uint64(seed & (2 ** 64 - 1)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out


def decode_jpeg(path_or_bytes, out_h: int, out_w: int
                ) -> Optional[np.ndarray]:
    """Decode a JPEG and bilinear-resize to (out_h, out_w).

    Returns float32 RGB HWC in [0, 1], or None when the native library is
    unavailable or decoding fails (callers fall back to PIL).  Uses libjpeg
    DCT-domain downscaling, so large frames never fully materialize.
    """
    lib = _load()
    if lib is None:
        return None
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = np.frombuffer(bytes(path_or_bytes), np.uint8)
    else:
        data = np.fromfile(path_or_bytes, np.uint8)
    out = np.empty((out_h, out_w, 3), np.float32)
    rc = lib.decode_jpeg_resize(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def jpeg_dims(path_or_bytes) -> Optional[tuple]:
    """(height, width) from the JPEG header only; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = np.frombuffer(bytes(path_or_bytes), np.uint8)
    else:
        data = np.fromfile(path_or_bytes, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.jpeg_dims(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(h), ctypes.byref(w),
    )
    return (h.value, w.value) if rc == 0 else None


def pcm16_to_float_mono(pcm: np.ndarray, channels: int) -> Optional[np.ndarray]:
    """Interleaved int16 -> float32 mono in [-1, 1]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, np.int16)
    frames = len(pcm) // channels
    out = np.empty(frames, np.float32)
    lib.pcm16_to_float_mono(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        frames, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out

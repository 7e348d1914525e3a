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
    if os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        # always invoke make (a no-op when the .so is up to date): gating
        # on the .so's absence would silently keep running a stale binary
        # after the C++ sources change
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None  # no binary at all; toolchain unavailable
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
    if hasattr(lib, "decode_jpeg_crop_resize"):
        lib.decode_jpeg_crop_resize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ]
        lib.decode_jpeg_crop_resize.restype = ctypes.c_int
    lib.jpeg_dims.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.jpeg_dims.restype = ctypes.c_int
    if hasattr(lib, "mp4_open"):
        lib.mp4_open.argtypes = [ctypes.c_char_p]
        lib.mp4_open.restype = ctypes.c_void_p
        lib.mp4_close.argtypes = [ctypes.c_void_p]
        lib.mp4_track_count.argtypes = [ctypes.c_void_p]
        lib.mp4_track_count.restype = ctypes.c_int
        lib.mp4_track_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
        lib.mp4_track_info.restype = ctypes.c_int
        lib.mp4_sample_size.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64]
        lib.mp4_sample_size.restype = ctypes.c_int64
        lib.mp4_sample_time.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64]
        lib.mp4_sample_time.restype = ctypes.c_int64
        lib.mp4_read_sample.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.mp4_read_sample.restype = ctypes.c_int64
        lib.mp4_read_range.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.mp4_read_range.restype = ctypes.c_int64
        lib.mp4_range_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64]
        lib.mp4_range_bytes.restype = ctypes.c_int64
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


def decode_jpeg_crop(path_or_bytes, box, out_h: int, out_w: int
                     ) -> Optional[np.ndarray]:
    """Decode, crop ``box = (left, top, right, bottom)`` in original pixel
    coords, and bilinear-resize the crop to (out_h, out_w) — the
    RandomResizedCrop decode path, GIL-free in C++ so loader workers scale.
    Returns float32 RGB HWC in [0, 1] or None (callers fall back to PIL).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "decode_jpeg_crop_resize"):
        return None
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = np.frombuffer(bytes(path_or_bytes), np.uint8)
    else:
        data = np.fromfile(path_or_bytes, np.uint8)
    out = np.empty((out_h, out_w, 3), np.float32)
    left, top, right, bottom = (int(v) for v in box)
    rc = lib.decode_jpeg_crop_resize(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        left, top, right, bottom, out_h, out_w,
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


def _cc(code: int) -> str:
    """int fourcc -> ascii tag ('vide', 'jpeg', 'sowt', ...)."""
    return bytes((code >> s) & 0xFF for s in (24, 16, 8, 0)).decode(
        "latin-1")


class Mp4File:
    """Native ISO-BMFF demuxer handle (native/mp4_demux.cpp) — the
    ffmpeg-free replacement for the reference's container handling
    (cremad/video_preprocessing.py:36-76, vggsound/mp4_to_wav.py:26-44).

    ``tracks`` is a list of dicts with handler / codec fourcc strings,
    timescale, n_samples, and per-kind geometry.  Samples are served by
    index: MJPEG video samples are complete JPEGs; PCM audio samples
    concatenate to the raw stream.
    """

    def __init__(self, path: str):
        lib = _load()
        if lib is None or not hasattr(lib, "mp4_open"):
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.mp4_open(path.encode())
        if not self._h:
            raise ValueError(f"not a parseable MP4/MOV: {path}")
        self.tracks = []
        info = (ctypes.c_int64 * 10)()
        for t in range(lib.mp4_track_count(self._h)):
            lib.mp4_track_info(self._h, t, info)
            self.tracks.append({
                "handler": _cc(info[0]), "codec": _cc(info[1]),
                "timescale": int(info[2]), "n_samples": int(info[3]),
                "width": int(info[4]), "height": int(info[5]),
                "channels": int(info[6]), "sample_rate": int(info[7]),
                "bits": int(info[8]), "duration": int(info[9]),
            })

    def close(self):
        if self._h:
            self._lib.mp4_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def sample_times(self, track: int) -> np.ndarray:
        """Decode timestamps in seconds for every sample of ``track``."""
        tr = self.tracks[track]
        ts = max(tr["timescale"], 1)
        out = np.empty(tr["n_samples"], np.float64)
        for i in range(tr["n_samples"]):
            out[i] = self._lib.mp4_sample_time(self._h, track, i) / ts
        return out

    def read_sample(self, track: int, i: int) -> bytes:
        size = self._lib.mp4_sample_size(self._h, track, i)
        if size < 0:
            raise IndexError(f"sample {i} of track {track}")
        buf = np.empty(size, np.uint8)
        got = self._lib.mp4_read_sample(
            self._h, track, i,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size)
        if got != size:
            raise IOError(f"short read ({got}) for sample {i}")
        return buf.tobytes()

    def read_range(self, track: int, i0: int, i1: int) -> np.ndarray:
        """Concatenated raw bytes of samples [i0, i1) (PCM bulk path)."""
        total = int(self._lib.mp4_range_bytes(self._h, track, i0, i1))
        if total < 0:
            raise IndexError(f"range [{i0}, {i1}) of track {track}")
        buf = np.empty(max(total, 1), np.uint8)
        got = self._lib.mp4_read_range(
            self._h, track, i0, i1,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), total)
        if got != total:
            raise IOError(f"short range read ({got} != {total})")
        return buf[:total]


#: MP4 PCM audio codecs the native demuxer can decode (fourcc -> dtype);
#: compressed codecs (mp4a/AAC) still need ffmpeg.
PCM_MP4_CODECS = {"sowt": "<i2", "twos": ">i2", "lpcm": "<i2", "raw ": "u1"}

#: sample width each fourcc is decoded at (bits == 0 means the stsd entry
#: left it unset — accepted as the codec's natural width)
_PCM_BITS = {"sowt": 16, "twos": 16, "lpcm": 16, "raw ": 8}


def mp4_pcm_undecodable_reason(track: dict) -> Optional[str]:
    """None if the audio track is decodable by ``read_mp4_pcm_mono``,
    else a human-readable reason.  'lpcm' in particular can carry 24-bit
    or float samples — reinterpreting those as int16 would yield noise,
    so width is checked, not just the fourcc."""
    codec = track.get("codec")
    if codec not in PCM_MP4_CODECS:
        return f"audio codec {codec!r} needs ffmpeg (native path decodes PCM only)"
    bits = int(track.get("bits") or 0)
    want = _PCM_BITS[codec]
    if bits not in (0, want):
        return (f"PCM codec {codec!r} with {bits}-bit samples "
                f"(native path decodes {want}-bit only)")
    return None


def read_mp4_pcm_mono(path: str) -> Tuple[np.ndarray, int]:
    """Decode the first PCM audio track of an MP4/MOV to float32 mono.

    Returns ``(audio, sample_rate)``; raises ``ValueError`` naming the
    codec when the track is compressed (the ffmpeg-required case).  The
    data-path replacement for the reference's offline ffmpeg extraction
    (vggsound/mp4_to_wav.py:26-44) — adapters can stream straight from
    the container, no intermediate .wav needed.
    """
    with Mp4File(path) as m:
        tracks = [i for i, t in enumerate(m.tracks)
                  if t["handler"] == "soun"]
        if not tracks:
            raise ValueError(f"{path}: no audio track")
        t = tracks[0]
        tr = m.tracks[t]
        codec = tr["codec"]
        reason = mp4_pcm_undecodable_reason(tr)
        if reason is not None:
            raise ValueError(f"{path}: {reason}")
        dtype = PCM_MP4_CODECS[codec]
        raw = m.read_range(t, 0, tr["n_samples"]).tobytes()
        data = np.frombuffer(raw, dtype=dtype).astype(np.float32)
        if dtype == "u1":
            data = (data - 128.0) / 128.0
        else:
            data = data / 32768.0
        ch = max(tr["channels"], 1)
        if ch > 1:
            data = data[: len(data) // ch * ch].reshape(-1, ch).mean(axis=1)
        sr = tr["sample_rate"] or tr["timescale"] or 16000
        return data.astype(np.float32), int(sr)


def resample_linear(audio: np.ndarray, sr: int, target_sr: int
                    ) -> np.ndarray:
    """Linear resample to ``target_sr`` (identity when rates match).
    The reference resamples with librosa's default; distributional parity
    only (documented divergence)."""
    if sr == target_sr or len(audio) <= 1:
        return np.asarray(audio, np.float32)
    n_out = int(len(audio) * target_sr / sr)
    return np.interp(np.linspace(0, len(audio) - 1, n_out),
                     np.arange(len(audio)), audio).astype(np.float32)


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

"""ctypes bindings for the libav decode module (native/av_decode.cpp).

The reference's L0 layer shells out to ffmpeg/OpenCV/moviepy for
H.264/AAC decode (cremad/video_preprocessing.py:36-76,
vggsound/mp4_to_wav.py:26-44, ave/mp4_to_wav.py:8-39).  This image ships
the FFmpeg 5.x *libraries* but no CLI, so the equivalent is in-process:
``native/libavdecode.so`` links libavformat/libavcodec/libswscale/
libswresample and decodes every codec the system build supports.  When
the library (or the FFmpeg runtime) is absent every entry point reports
unavailable and callers fall back to the pure ISO-BMFF demuxer
(utils/native.Mp4File: MJPEG/PCM) or an ffmpeg binary if one exists.

Decode surfaces:
  - ``read_audio_mono(path, target_sr)`` -> (float32 mono, sr): any
    container/codec, swresample mixdown + rate conversion.
  - ``iter_frames(path, size)`` -> yields (RGB uint8 HxWx3, pts_sec):
    streaming decode, swscale to ``size`` when given.
  - ``decode_frames_at_fps(path, fps, ...)`` -> ffmpeg ``-vf fps``
    semantics (one frame per 1/fps tick, nearest preceding frame) —
    the grid the MJPEG path in tools/preprocess.py implements.
  - ``probe(path)`` -> codec/geometry dict (header-only).

Test-fixture surface: ``encode_mp4`` synthesizes REAL H.264+AAC files
(libx264 + native aac encoder) so tests round-trip the decode path
against actual codecs (tests/test_avdecode.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libavdecode.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_load_mutex = threading.Lock()  # first-use load can race loader/extraction
#                                 worker threads (--jobs pools)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:  # fast path: load already resolved either way
        return _lib
    with _load_mutex:
        if _tried:
            return _lib
        try:
            return _load_locked()
        finally:
            # set LAST (under the mutex) so the lock-free fast path can
            # never observe _tried=True with the load still in flight
            _tried = True


def _load_locked() -> Optional[ctypes.CDLL]:
    global _lib
    if os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        # make is a no-op when the .so is current; it silently skips the
        # libav target on hosts without the FFmpeg dev headers.  flock
        # serializes concurrent first-use builds (multihost workers,
        # parallel preprocess jobs) so no process dlopens a half-written
        # .so; a failed lock degrades to an unsynchronized build.
        lock = None
        try:
            import fcntl

            lock = open(os.path.join(_NATIVE_DIR, ".build.lock"), "w")
            fcntl.flock(lock, fcntl.LOCK_EX)
        except Exception:
            lock = None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass
        finally:
            if lock is not None:
                lock.close()  # closing drops the flock
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:  # FFmpeg runtime libs missing on this host
        return None
    lib.avd_error_msg.restype = ctypes.c_char_p
    lib.avd_has_decoder.argtypes = [ctypes.c_char_p]
    lib.avd_has_encoder.argtypes = [ctypes.c_char_p]
    lib.avd_can_decode_stream.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.avd_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.avd_open_video.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.avd_open_video.restype = ctypes.c_void_p
    lib.avd_video_dims.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.avd_video_duration.argtypes = [ctypes.c_void_p]
    lib.avd_video_duration.restype = ctypes.c_double
    lib.avd_next_frame.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double)]
    lib.avd_close.argtypes = [ctypes.c_void_p]
    lib.avd_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int)]
    lib.avd_decode_audio.restype = ctypes.c_longlong
    lib.avd_free.argtypes = [ctypes.c_void_p]
    lib.avd_encode_mp4.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p]
    _lib = lib
    return _lib


def available() -> bool:
    """True when libavdecode.so loaded (FFmpeg runtime present)."""
    return _load() is not None


def _err(lib) -> str:
    msg = lib.avd_error_msg()
    return msg.decode("utf-8", "replace") if msg else "unknown libav error"


#: ISO-BMFF sample-entry fourcc -> FFmpeg codec short name, for codec-census
#: verdicts (the census probes headers via the cheap native demuxer; this
#: table answers "can libavdecode decode it" without opening each file twice).
FOURCC_TO_FFMPEG = {
    "avc1": "h264", "avc3": "h264", "h264": "h264",
    "hvc1": "hevc", "hev1": "hevc",
    "mp4v": "mpeg4", "xvid": "mpeg4", "XVID": "mpeg4",
    "vp08": "vp8", "vp09": "vp9", "av01": "av1",
    "jpeg": "mjpeg", "mjpa": "mjpeg", "mjpb": "mjpeg",
    "MJPG": "mjpeg", "mjpg": "mjpeg",
    "mp4a": "aac", "Opus": "opus", "opus": "opus",
    "fLaC": "flac", "flac": "flac",
    ".mp3": "mp3", "mp4a.40.34": "mp3",
    "ac-3": "ac3", "ec-3": "eac3",
    "sowt": "pcm_s16le", "twos": "pcm_s16be", "lpcm": "pcm_s16le",
    "raw ": "pcm_u8",
}


def can_decode_fourcc(fourcc: str) -> bool:
    """True when the system libavcodec has a decoder for the codec behind
    an ISO-BMFF sample-entry fourcc (census verdicts)."""
    lib = _load()
    if lib is None:
        return False
    name = FOURCC_TO_FFMPEG.get(fourcc)
    if name is None:
        return False
    return bool(lib.avd_has_decoder(name.encode()))


def has_decoder(name: str) -> bool:
    """True when libavcodec has a decoder with this FFmpeg short name."""
    lib = _load()
    return lib is not None and bool(lib.avd_has_decoder(name.encode()))


def can_decode_stream(path: str, media: str) -> bool:
    """Definitive per-file decodability (``media`` = 'video' | 'audio'):
    resolves the decoder exactly as the decode paths do (by codec id via
    av_find_best_stream), so external-lib-only decoders count — unlike
    the name lookup behind can_decode_fourcc.  Header-only cost."""
    lib = _load()
    return lib is not None and bool(lib.avd_can_decode_stream(
        path.encode(), 0 if media == "video" else 1))


def has_encoder(name: str) -> bool:
    lib = _load()
    return lib is not None and bool(lib.avd_has_encoder(name.encode()))


def probe(path: str) -> Optional[dict]:
    """Header-only probe: codec names, geometry, duration, audio rate.
    None when the container is unreadable or has no A/V stream."""
    lib = _load()
    if lib is None:
        return None
    vname = ctypes.create_string_buffer(64)
    aname = ctypes.create_string_buffer(64)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    dur = ctypes.c_double(0)
    fps = ctypes.c_double(0)
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    rc = lib.avd_probe(path.encode(), vname, 64, aname, 64,
                       ctypes.byref(w), ctypes.byref(h), ctypes.byref(dur),
                       ctypes.byref(fps), ctypes.byref(sr), ctypes.byref(ch))
    if rc != 0:
        return None
    return {
        "video_codec": vname.value.decode() or None,
        "audio_codec": aname.value.decode() or None,
        "width": w.value, "height": h.value,
        "duration": dur.value, "fps": fps.value,
        "sample_rate": sr.value, "channels": ch.value,
    }


def read_audio_mono(path: str, target_sr: int = 0
                    ) -> Tuple[np.ndarray, int]:
    """Decode the best audio stream to float32 mono.

    ``target_sr`` 0 keeps the native rate (callers resample), otherwise
    swresample converts in-process.  Raises ValueError on failure (same
    contract as utils/native.read_mp4_pcm_mono so call sites can chain
    the two paths).
    """
    lib = _load()
    if lib is None:
        raise ValueError(f"{path}: libavdecode unavailable")
    buf = ctypes.POINTER(ctypes.c_float)()
    sr_out = ctypes.c_int(0)
    n = lib.avd_decode_audio(path.encode(), int(target_sr),
                             ctypes.byref(buf), ctypes.byref(sr_out))
    if n < 0:
        raise ValueError(f"{path}: {_err(lib)}")
    try:
        out = np.ctypeslib.as_array(buf, shape=(int(n),)).astype(np.float32)
    finally:
        lib.avd_free(buf)
    return out, int(sr_out.value)


class _OpenVideo:
    """A live decode handle: frame iterator + header metadata from ONE
    avformat open (per-sample gather paths should not reopen the
    container just to read the duration)."""

    def __init__(self, path: str, size: Optional[Tuple[int, int]] = None):
        lib = _load()
        if lib is None:
            raise ValueError(f"{path}: libavdecode unavailable")
        self._lib = lib
        self._path = path
        out_w, out_h = size if size else (0, 0)
        self._h = lib.avd_open_video(path.encode(), int(out_w), int(out_h))
        if not self._h:
            raise ValueError(f"{path}: {_err(lib)}")

    def duration(self) -> float:
        """Container/stream duration in seconds (0.0 when unknown)."""
        return float(self._lib.avd_video_duration(self._h))

    def frames(self) -> Iterator[Tuple[np.ndarray, float]]:
        w = ctypes.c_int(0)
        hh = ctypes.c_int(0)
        self._lib.avd_video_dims(self._h, ctypes.byref(w), ctypes.byref(hh))
        frame = np.empty((hh.value, w.value, 3), np.uint8)
        pts = ctypes.c_double(0)
        while True:
            rc = self._lib.avd_next_frame(
                self._h, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(pts))
            if rc == 0:
                return
            if rc < 0:
                raise ValueError(f"{self._path}: {_err(self._lib)}")
            yield frame.copy(), float(pts.value)

    def close(self) -> None:
        if self._h:
            self._lib.avd_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def iter_frames(path: str, size: Optional[Tuple[int, int]] = None
                ) -> Iterator[Tuple[np.ndarray, float]]:
    """Stream-decode video frames as (RGB uint8 (H, W, 3), pts seconds).
    ``size`` = (width, height) swscales each frame; None keeps native."""
    with _OpenVideo(path, size) as v:
        yield from v.frames()


def video_duration(path: str) -> float:
    """Stream duration in seconds (0.0 when the container doesn't say)."""
    try:
        with _OpenVideo(path) as v:
            return v.duration()
    except ValueError:
        return 0.0


def decode_frames_at_fps(path: str, fps: float, start: float = 0.0,
                         end: Optional[float] = None,
                         size: Optional[Tuple[int, int]] = None):
    """Frames on the ffmpeg ``-vf fps`` tick grid: one frame per 1/fps
    tick in [start, end), each tick taking the nearest PRECEDING decoded
    frame — the same semantics tools/preprocess.py implements for MJPEG
    containers (and that the reference gets from ffmpeg's fps filter,
    cremad/video_preprocessing.py:36-76).

    ``end`` None reads the duration from the open handle (one container
    open total); an EXPLICIT end <= start is an empty segment and yields
    nothing, exactly like the MJPEG path's ``while tick < end`` grid.

    Yields (RGB uint8 (H, W, 3), tick_seconds).
    """
    if end is not None and end <= start:
        return
    with _OpenVideo(path, size) as v:
        duration_known = end is not None
        if end is None:
            end = v.duration()
            duration_known = end > start
        it = v.frames()
        nxt = next(it, None)
        if nxt is None:
            return
        cur, cur_pts = nxt
        nxt = next(it, None)
        n_out = 0
        tick = start
        while True:
            # advance so `cur` is the nearest frame with pts <= tick
            # (clamped to the first frame, like the MJPEG path's max(i, 0))
            while nxt is not None and nxt[1] <= tick + 1e-9:
                cur, cur_pts = nxt
                nxt = next(it, None)
            if duration_known:
                if tick >= end:  # same float grid as the MJPEG path
                    break
            elif nxt is None and tick >= cur_pts + 1.0 / fps - 1e-9:
                # duration unknown (malformed header): grid ends one
                # frame-duration past the last decoded frame, the same
                # fallback the MJPEG path uses (times[-1] + 1/fps)
                break
            yield cur, tick
            n_out += 1
            tick = start + n_out / fps


def encode_mp4(path: str, frames: Optional[np.ndarray], fps: int,
               audio: Optional[np.ndarray], sample_rate: int,
               vcodec: str = "libx264", acodec: str = "aac") -> None:
    """Encode a REAL mp4 (H.264 + AAC by default) from RGB uint8 frames
    (N, H, W, 3) and/or float32 mono audio.  Test-fixture surface: lets
    tests round-trip the decode path against actual codecs."""
    lib = _load()
    if lib is None:
        raise ValueError("libavdecode unavailable")
    n_frames, w, h = 0, 0, 0
    rgb_ptr = None
    if frames is not None and len(frames):
        frames = np.ascontiguousarray(frames, np.uint8)
        n_frames, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        rgb_ptr = frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n_samples = 0
    audio_ptr = None
    if audio is not None and len(audio):
        audio = np.ascontiguousarray(audio, np.float32)
        n_samples = len(audio)
        audio_ptr = audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.avd_encode_mp4(path.encode(), w, h, n_frames, int(fps),
                            rgb_ptr, audio_ptr, n_samples, int(sample_rate),
                            vcodec.encode(), acodec.encode())
    if rc != 0:
        raise ValueError(f"{path}: {_err(lib)}")

"""Native ISO-BMFF demuxer (native/mp4_demux.cpp) + the ffmpeg-free
preprocess backends (tools/preprocess.py video-frames / mp4-to-wav).

A minimal in-test MP4 muxer fabricates MJPEG+PCM files (the codecs the
native stage supports; reference pipelines: cremad/video_preprocessing.py,
vggsound/mp4_to_wav.py), then the demuxer must reproduce the exact sample
bytes and the CLI subcommands must emit frames/wavs from them.
"""

import io
import os
import struct
import subprocess
import sys
import wave

import numpy as np
import pytest
from PIL import Image

from multimodal_clinical_tpu.utils import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


# ---------------------------------------------------------------------------
# Minimal MP4 muxer (test fixture only): one MJPEG video track + one
# 'sowt' (s16le) PCM audio track, each in a single chunk.
# ---------------------------------------------------------------------------

def _box(tag: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, *payload: bytes, version=0, flags=0) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags), *payload)


def _tkhd(track_id, duration, w=0, h=0):
    return _full(b"tkhd", struct.pack(
        ">IIII4xI8xHHHH36xII", 0, 0, track_id, 0, duration,
        0, 0, 0, 0, w << 16, h << 16), flags=7)


def _mdhd(timescale, duration):
    return _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration,
                                      0x55C4, 0))


def _hdlr(handler: bytes):
    return _full(b"hdlr", struct.pack(">4x4s12x", handler) + b"h\x00")


def _stts(count, delta):
    return _full(b"stts", struct.pack(">III", 1, count, delta))


def _stsc(per_chunk):
    return _full(b"stsc", struct.pack(">IIII", 1, 1, per_chunk, 1))


def _stsz_sized(sizes):
    return _full(b"stsz", struct.pack(">II", 0, len(sizes)) +
                 b"".join(struct.pack(">I", s) for s in sizes))


def _stsz_uniform(size, count):
    return _full(b"stsz", struct.pack(">II", size, count))


def _stco(offset):
    return _full(b"stco", struct.pack(">II", 1, offset))


def _video_entry(w, h):
    return _box(b"jpeg", struct.pack(
        ">6xH2x2x12xHHIIIH32sHh",
        1, w, h, 0x00480000, 0x00480000, 0, 1, b"\x00" * 32, 24, -1))


def _audio_entry(channels, rate):
    return _box(b"sowt", struct.pack(
        ">6xH8xHHHHI", 1, channels, 16, 0, 0, rate << 16))


def _trak(entry, tkhd, mdhd, hdlr, header, stts, stsc, stsz, stco):
    stbl = _box(b"stbl", _full(b"stsd", struct.pack(">I", 1), entry),
                stts, stsc, stsz, stco)
    dinf = _box(b"dinf", _full(b"dref", struct.pack(">I", 1),
                               _full(b"url ", flags=1)))
    minf = _box(b"minf", header, dinf, stbl)
    return _box(b"trak", tkhd, _box(b"mdia", mdhd, hdlr, minf))


def write_mp4(path, jpeg_frames, fps, pcm_s16le, channels, rate):
    """Mux MJPEG frames (one sample each) + one PCM track into an MP4."""
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isomiso2")
    video_payload = b"".join(jpeg_frames)
    audio_payload = np.ascontiguousarray(pcm_s16le, "<i2").tobytes()
    mdat = _box(b"mdat", video_payload + audio_payload)
    video_off = len(ftyp) + 8
    audio_off = video_off + len(video_payload)
    n_pcm = len(pcm_s16le) // channels

    w, h = Image.open(io.BytesIO(jpeg_frames[0])).size
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    smhd = _full(b"smhd", struct.pack(">Hxx", 0))
    v = _trak(_video_entry(w, h), _tkhd(1, len(jpeg_frames), w, h),
              _mdhd(int(round(fps)), len(jpeg_frames)), _hdlr(b"vide"),
              vmhd, _stts(len(jpeg_frames), 1), _stsc(len(jpeg_frames)),
              _stsz_sized([len(f) for f in jpeg_frames]), _stco(video_off))
    a = _trak(_audio_entry(channels, rate), _tkhd(2, n_pcm),
              _mdhd(rate, n_pcm), _hdlr(b"soun"), smhd,
              _stts(n_pcm, 1), _stsc(n_pcm),
              _stsz_uniform(2 * channels, n_pcm), _stco(audio_off))
    mvhd = _full(b"mvhd", struct.pack(
        ">IIIIIH10x36x24xI", 0, 0, 1000, 0, 0x00010000, 0x0100, 3))
    moov = _box(b"moov", mvhd, v, a)
    with open(path, "wb") as f:
        f.write(ftyp + mdat + moov)


def _jpeg(seed, size=(48, 32)):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (size[1], size[0], 3),
                                       dtype=np.uint8).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    return buf.getvalue()


@pytest.fixture
def mp4_file(tmp_path):
    frames = [_jpeg(i) for i in range(6)]
    rng = np.random.default_rng(7)
    rate, channels, secs = 16000, 2, 3
    pcm = (rng.normal(scale=0.2, size=rate * secs * channels) *
           32767).clip(-32768, 32767).astype(np.int16)
    path = str(tmp_path / "clip0001.mp4")
    write_mp4(path, frames, fps=2.0, pcm_s16le=pcm, channels=channels,
              rate=rate)
    return path, frames, pcm, channels, rate


def test_probe_tracks(mp4_file):
    path, frames, pcm, channels, rate = mp4_file
    with native.Mp4File(path) as m:
        kinds = {t["handler"]: t for t in m.tracks}
        assert set(kinds) == {"vide", "soun"}
        v, a = kinds["vide"], kinds["soun"]
        assert v["codec"] == "jpeg"
        assert (v["width"], v["height"]) == (48, 32)
        assert v["n_samples"] == len(frames)
        assert a["codec"] == "sowt"
        assert a["channels"] == channels
        assert a["sample_rate"] == rate
        assert a["n_samples"] == len(pcm) // channels


def test_video_samples_roundtrip(mp4_file):
    path, frames, *_ = mp4_file
    with native.Mp4File(path) as m:
        t = next(i for i, tr in enumerate(m.tracks)
                 if tr["handler"] == "vide")
        for i, f in enumerate(frames):
            assert m.read_sample(t, i) == f
        times = m.sample_times(t)
        np.testing.assert_allclose(times, np.arange(len(frames)) / 2.0)


def test_audio_range_roundtrip(mp4_file):
    path, _, pcm, channels, rate = mp4_file
    with native.Mp4File(path) as m:
        t = next(i for i, tr in enumerate(m.tracks)
                 if tr["handler"] == "soun")
        raw = m.read_range(t, 0, m.tracks[t]["n_samples"])
        got = np.frombuffer(raw.tobytes(), "<i2")
        np.testing.assert_array_equal(got, pcm)


def test_cli_video_frames_native(mp4_file, tmp_path):
    path, frames, *_ = mp4_file
    out = tmp_path / "frames"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "preprocess.py"),
         "video-frames", "--video-dir", os.path.dirname(path),
         "--out", str(out), "--fps", "2", "--backend", "native"],
        check=True, capture_output=True, cwd=REPO)
    clip_dir = out / "clip0001"
    written = sorted(os.listdir(clip_dir))
    # 6 frames at the native 2 fps -> the grid reproduces every sample
    assert len(written) == len(frames)
    for name, f in zip(written, frames):
        assert (clip_dir / name).read_bytes() == f


def test_cli_codec_census(mp4_file, tmp_path):
    """codec-census aggregates per-codec counts with a native verdict and
    runs automatically at the start of video-frames/mp4-to-wav."""
    path, *_ = mp4_file
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "preprocess.py"),
         "codec-census", "--video-dir", os.path.dirname(path)],
        check=True, capture_output=True, text=True, cwd=REPO)
    assert "1 files probed" in proc.stdout
    assert "video='jpeg' audio='sowt': 1 (native-ok)" in proc.stdout
    # the census header also leads the extraction subcommands
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "preprocess.py"),
         "video-frames", "--video-dir", os.path.dirname(path),
         "--out", str(tmp_path / "f"), "--fps", "2", "--backend", "native"],
        check=True, capture_output=True, text=True, cwd=REPO)
    assert "[census]" in proc.stdout


def test_cli_mp4_to_wav_native(mp4_file, tmp_path):
    path, _, pcm, channels, rate = mp4_file
    out = tmp_path / "wav"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "preprocess.py"),
         "mp4-to-wav", "--video-dir", os.path.dirname(path),
         "--out", str(out), "--backend", "native"],
        check=True, capture_output=True, cwd=REPO)
    with wave.open(str(out / "clip0001.wav"), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == 16000
        got = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    # rate already 16 kHz -> no resample; mono mixdown of the two channels
    want = pcm.reshape(-1, channels).astype(np.float32).mean(axis=1)
    np.testing.assert_allclose(got.astype(np.float32), want, atol=1.01)


def test_cli_video_frames_segment(mp4_file, tmp_path):
    """Segment csv limits extraction to [0.5, 1.5) -> 2 frames at 2 fps."""
    path, frames, *_ = mp4_file
    seg = tmp_path / "segments.csv"
    seg.write_text("clip0001,0.5,1.5\n")
    out = tmp_path / "frames_seg"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "preprocess.py"),
         "video-frames", "--video-dir", os.path.dirname(path),
         "--out", str(out), "--fps", "2", "--backend", "native",
         "--segments", str(seg), "--min-frames", "1"],
        check=True, capture_output=True, cwd=REPO)
    written = sorted(os.listdir(out / "clip0001"))
    assert len(written) == 2
    # grid ticks 0.5, 1.0 -> samples 1 and 2
    assert (out / "clip0001" / written[0]).read_bytes() == frames[1]
    assert (out / "clip0001" / written[1]).read_bytes() == frames[2]


def test_unsupported_codec_message(tmp_path):
    """An honest error names the codec and the ffmpeg requirement."""
    frames = [_jpeg(0)]
    path = str(tmp_path / "x.mp4")
    write_mp4(path, frames, 1.0, np.zeros(16, np.int16), 1, 16000)
    # rewrite the video stsd fourcc to avc1 (H.264)
    data = bytearray(open(path, "rb").read())
    idx = data.find(b"jpeg")
    data[idx:idx + 4] = b"avc1"
    open(path, "wb").write(bytes(data))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import preprocess as pp
    finally:
        sys.path.pop(0)
    with pytest.raises(RuntimeError, match="avc1.*ffmpeg"):
        pp._native_video_frames(path, str(tmp_path), 1.0, None)


def test_vggsound_streams_audio_from_mp4(tmp_path):
    """The adapter falls back to PCM-from-mp4 via the native demuxer when
    no offline wav extraction exists (benchmarks/vggsound._read_audio)."""
    from multimodal_clinical_tpu.benchmarks.vggsound import SR, _read_audio

    rng = np.random.default_rng(3)
    pcm = (rng.normal(scale=0.2, size=SR * 2) * 20000).astype(np.int16)
    os.makedirs(tmp_path / "video")
    write_mp4(str(tmp_path / "video" / "abc_0.mp4"), [_jpeg(0)], 1.0,
              pcm, channels=1, rate=SR)
    audio = _read_audio(str(tmp_path), "abc_0")
    np.testing.assert_allclose(audio, pcm.astype(np.float32) / 32768.0,
                               atol=1e-6)

    # wav takes precedence when present
    os.makedirs(tmp_path / "audio")
    with wave.open(str(tmp_path / "audio" / "abc_0.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((pcm // 2).tobytes())
    audio2 = _read_audio(str(tmp_path), "abc_0")
    np.testing.assert_allclose(audio2, (pcm // 2).astype(np.float32)
                               / 32768.0, atol=1e-6)


def test_vggsound_adapter_admits_mp4_only_clips(tmp_path, monkeypatch):
    """Full adapter path with NO extracted wavs: _mp4_streamable probes the
    corpus, csv admission requires video+frames, gather produces batches
    with audio streamed from the container.  Run WITHOUT the libav module
    (monkeypatched away) so the strict frames-dir admission rule is what's
    under test; with libav the frame-less clip is instead admitted via
    mp4-direct frame streaming
    (tests/test_avdecode.py::test_vggsound_streams_frames_from_mp4)."""
    from multimodal_clinical_tpu.benchmarks.vggsound import SR, get_data
    from multimodal_clinical_tpu.utils import avdecode

    monkeypatch.setattr(avdecode, "_load", lambda: None)

    rng = np.random.default_rng(11)
    os.makedirs(tmp_path / "video")
    rows = []
    for i in range(6):
        ytid, start = f"vid{i:03d}", i
        clip = f"{ytid}_{start:06d}"  # producers zero-pad the start
        pcm = (rng.normal(scale=0.2, size=SR * 11) * 20000).astype(np.int16)
        write_mp4(str(tmp_path / "video" / f"{clip}.mp4"),
                  [_jpeg(i)], 1.0, pcm, channels=1, rate=SR)
        # frames dir required for admission (decode path reads it)
        fdir = tmp_path / "frames" / clip
        os.makedirs(fdir)
        for j in range(4):
            (fdir / f"f{j}.jpg").write_bytes(_jpeg(i * 7 + j, (320, 240)))
        split = "train" if i < 4 else "test"
        rows.append(f"{ytid},{start},class{i % 2},{split}")
    # one clip with video but NO frames: must be dropped, not crash
    clip = "vidnof_000009"
    write_mp4(str(tmp_path / "video" / f"{clip}.mp4"), [_jpeg(9)], 1.0,
              (rng.normal(size=SR * 11) * 100).astype(np.int16), 1, SR)
    rows.append("vidnof,9,class0,train")
    (tmp_path / "vggsound.csv").write_text("\n".join(rows) + "\n")

    args = type("A", (), {"data_path": str(tmp_path) + "/", "seed": 0,
                          "use_video_frames": 2, "num_classes": 2})()
    data = get_data(args)
    assert not data.synthetic
    assert len(data.train) == 4  # frame-less clip dropped at admission
    assert len(data.test) == 2
    batch = data.train.gather(np.arange(2))
    assert batch["x1_waveform"].shape == (2, SR * 5)
    assert batch["x2"].shape == (2, 2, 224, 224, 3)
    assert np.abs(batch["x1_waveform"]).max() <= 1.0


def test_vggsound_adapter_rejects_compressed_audio(tmp_path, capsys,
                                                   monkeypatch):
    """Without the libav module, a corpus whose mp4 audio is not PCM must
    NOT be admitted via the mp4 path (it would crash at gather time) —
    with zero admitted clips the adapter raises an actionable
    FileNotFoundError.  (With libav present the same corpus IS admitted:
    tests/test_avdecode.py::test_vggsound_streams_aac_mp4.)"""
    from multimodal_clinical_tpu.benchmarks.vggsound import SR, get_data
    from multimodal_clinical_tpu.utils import avdecode

    monkeypatch.setattr(avdecode, "_load", lambda: None)
    os.makedirs(tmp_path / "video")
    path = str(tmp_path / "video" / "vid000_000000.mp4")
    write_mp4(path, [_jpeg(0)], 1.0,
              np.zeros(SR, np.int16), 1, SR)
    data = bytearray(open(path, "rb").read())
    idx = data.find(b"sowt")
    data[idx:idx + 4] = b"mp4a"  # pretend AAC
    open(path, "wb").write(bytes(data))
    os.makedirs(tmp_path / "frames" / "vid000_000000")
    (tmp_path / "vggsound.csv").write_text("vid000,0,class0,train\n")

    args = type("A", (), {"data_path": str(tmp_path) + "/", "seed": 0,
                          "use_video_frames": 2, "num_classes": 2})()
    # zero admitted clips -> actionable error naming the prep commands
    with pytest.raises(FileNotFoundError, match="0 train clips"):
        get_data(args)
    out = capsys.readouterr().out
    assert "needs ffmpeg" in out


def test_vggsound_adapter_rejects_empty_test_split(tmp_path):
    """A corpus that admits train clips but ZERO test clips must raise the
    same actionable error (otherwise training runs for a full schedule and
    only fails at the empty val/test epochs)."""
    import wave

    from multimodal_clinical_tpu.benchmarks.vggsound import SR, get_data

    os.makedirs(tmp_path / "audio")
    pcm = (np.zeros(SR * 11)).astype(np.int16)
    with wave.open(str(tmp_path / "audio" / "vid000_000000.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())
    fdir = tmp_path / "frames" / "vid000_000000"
    os.makedirs(fdir)
    for j in range(2):
        (fdir / f"f{j}.jpg").write_bytes(_jpeg(j))
    (tmp_path / "vggsound.csv").write_text(
        "vid000,0,class0,train\nvid001,0,class0,test\n")

    args = type("A", (), {"data_path": str(tmp_path) + "/", "seed": 0,
                          "use_video_frames": 2, "num_classes": 2})()
    with pytest.raises(FileNotFoundError, match="0 test clips"):
        get_data(args)


def test_mp4_pcm_bits_guard():
    """'lpcm' can carry 24-bit/float samples — fourcc alone must not admit
    a track the int16 decode would turn to noise."""
    from multimodal_clinical_tpu.utils.native import mp4_pcm_undecodable_reason

    assert mp4_pcm_undecodable_reason({"codec": "sowt", "bits": 16}) is None
    assert mp4_pcm_undecodable_reason({"codec": "lpcm", "bits": 0}) is None
    assert mp4_pcm_undecodable_reason({"codec": "raw ", "bits": 8}) is None
    assert "24-bit" in mp4_pcm_undecodable_reason(
        {"codec": "lpcm", "bits": 24})
    assert "ffmpeg" in mp4_pcm_undecodable_reason(
        {"codec": "mp4a", "bits": 16})

"""VGGSound benchmark: 309-class audio-visual classification (largest data,
~338 GB; the reference's only published throughput number lives here —
vggsound/README.md:5-6, 392 samples/s on a ~24 GB GPU).

Data (reference vggsound/get_data.py): csv-driven file lists with existence
filtering; audio decoded ON THE FLY in DataLoader workers — load 16 kHz
mono, tile to >=10 s, random 5 s crop, librosa.stft(n_fft=256, hop=128),
log(abs + 1e-7), train-time SpecAugment (get_data.py:106-128); visual =
``use_video_frames`` random frames.  Batch audio shape (B, 129, 626).

TPU-native redesign of that hot loop: the host reads+crops RAW WAVEFORMS
only (stdlib wave / soundfile, no librosa/DSP on host) and ships (B, 80000)
float32 to the device; the STFT->log spectrogram runs inside jit as an MXU
matmul (ops/spectrogram.log_spectrogram) and SpecAugment as a fused masking
op (ops/specaugment.spec_augment).  This inverts the reference's
input-bound profile: host does IO, device does DSP.
"""

from __future__ import annotations

import csv
import os
import wave
from typing import Dict, Tuple

import numpy as np

from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import CremadFusionNet

MODEL_TYPES = ("jlogits", "jprobas", "ensemble")
SR = 16000
CROP_SEC = 5


def _read_wav(path: str) -> np.ndarray:
    """Read a 16-bit PCM wav to float32 mono in [-1, 1] at SR (host IO
    only; the int16->float mixdown uses the native C++ path when built).
    Wavs not at SR are linearly resampled — the reference's
    librosa.load(sr=16000) resamples too (vggsound/get_data.py:106)."""
    with wave.open(path, "rb") as w:
        n = w.getnframes()
        channels = w.getnchannels()
        rate = w.getframerate()
        data = np.frombuffer(w.readframes(n), dtype=np.int16)
    from ..utils.native import pcm16_to_float_mono, resample_linear

    out = pcm16_to_float_mono(data, channels)
    if out is None:
        if channels > 1:
            data = data.reshape(-1, channels).mean(axis=1)
        out = (data / 32768.0).astype(np.float32)
    if rate != SR:
        out = resample_linear(out, rate, SR)
    return out


_VIDEO_EXTS = (".mp4", ".mov")


def _read_audio(data_dir: str, clip_id: str) -> np.ndarray:
    """Clip audio at 16 kHz float mono: ``audio/<clip>.wav`` when the
    offline wav extraction ran, else streamed straight from
    ``video/<clip>.mp4|.mov`` — PCM tracks via the native demuxer
    (utils/native.read_mp4_pcm_mono), compressed tracks (AAC/Opus/...)
    via the in-process libav module (utils/avdecode) — no ffmpeg stage
    either way (the reference decodes per-sample with librosa from
    pre-extracted wavs, vggsound/get_data.py:106-125)."""
    wav_path = os.path.join(data_dir, "audio", clip_id + ".wav")
    if os.path.exists(wav_path):
        return _read_wav(wav_path)
    from ..utils.native import read_mp4_pcm_mono, resample_linear

    for ext in _VIDEO_EXTS:
        path = os.path.join(data_dir, "video", clip_id + ext)
        if os.path.exists(path):
            try:
                audio, sr = read_mp4_pcm_mono(path)
            except Exception:
                # any native-path failure (non-PCM codec ValueError,
                # native-library-unavailable RuntimeError, short-read
                # IOError on a truncated file): the libav decoder is the
                # catch-all, matching _mp4_streamable's admission probe —
                # re-raise only when it too is absent
                from ..utils import avdecode

                if not avdecode.available():
                    raise
                audio, sr = avdecode.read_audio_mono(path)
            return resample_linear(audio, sr, SR)
    raise FileNotFoundError(
        f"no audio for {clip_id}: neither audio/{clip_id}.wav nor "
        f"video/{clip_id}.mp4 under {data_dir}")


def _mp4_streamable(data_dir: str) -> bool:
    """One-shot probe: can clips stream audio straight from the container?
    Checks the FIRST video/*.mp4|.mov (datasets are codec-homogeneous):
    admitting undecodable-audio mp4s would crash mid-epoch at gather
    time, so clips without extracted wavs are only admitted when the
    probe says the native PCM path works OR the libav module can decode
    the codec (AAC/Opus/... — real VGGSound downloads are H.264/AAC)."""
    from ..utils.native import Mp4File, mp4_pcm_undecodable_reason

    video_dir = os.path.join(data_dir, "video")
    if not os.path.isdir(video_dir):
        return False
    for name in sorted(os.listdir(video_dir)):
        if not name.endswith(_VIDEO_EXTS):
            continue
        path = os.path.join(video_dir, name)
        try:
            with Mp4File(path) as m:
                audio = [t for t in m.tracks if t["handler"] == "soun"]
        except Exception:
            audio = None  # non-BMFF container: let libav probe decide
        if audio:
            reason = mp4_pcm_undecodable_reason(audio[0])
            if reason is None:
                return True
        elif audio is not None:
            reason = "no audio track"
        else:
            reason = "container unreadable by the native demuxer"
        from ..utils import avdecode

        if avdecode.available():
            # definitive per-file check: decoder resolved by codec id the
            # same way read_audio_mono will (external-lib decoders count)
            if avdecode.can_decode_stream(path, "audio"):
                return True
            info = avdecode.probe(path)
            codec = info["audio_codec"] if info else None
            reason = (f"audio codec {codec!r} has no libav decoder"
                      if codec else reason)
        print(f"[vggsound] video/{name}: {reason} — "
              "mp4-direct streaming disabled (extract wavs via "
              "tools/preprocess.py mp4-to-wav)")
        return False
    return False


#: tick grid for mp4-direct frame streaming — the same 1 FPS grid
#: tools/preprocess.py video-frames extracts at (reference
#: vggsound/video_preprocessing.py dumps 1 frame/sec too)
FRAME_FPS = 1.0


def _mp4_frames_streamable(data_dir: str) -> bool:
    """Probe (called LAZILY, only when an admission candidate actually
    lacks an extracted frames/<clip>/ dir): can such clips stream video
    frames straight from the container?  True when the libav module is
    present and it resolves a decoder for the first video file — by
    codec id, exactly as the decode path will, so external-lib-only
    decoders count (datasets are codec-homogeneous).  Streaming decodes
    the whole clip per sample, so a throughput note is printed — offline
    extraction (tools/preprocess.py video-frames) stays the fast path."""
    from ..utils import avdecode

    video_dir = os.path.join(data_dir, "video")
    if not os.path.isdir(video_dir) or not avdecode.available():
        return False
    for name in sorted(os.listdir(video_dir)):
        if not name.endswith(_VIDEO_EXTS):
            continue
        path = os.path.join(video_dir, name)
        if avdecode.can_decode_stream(path, "video"):
            info = avdecode.probe(path)
            codec = (info or {}).get("video_codec", "?")
            print(f"[vggsound] streaming video frames straight from "
                  f"containers ({codec} via libav) for clips without an "
                  "extracted frames/<clip>/ dir — decode-per-sample is "
                  "slower than pre-extracted JPEGs; run tools/preprocess.py "
                  "video-frames for full throughput")
            return True
        return False
    return False


class VGGSoundDiskDataset:
    """Host side: raw waveform crop + frame decode; DSP happens on device."""

    def __init__(self, data_dir: str, items, train: bool,
                 use_video_frames: int = 4, seed: int = 0):
        self.data_dir = data_dir
        self.items = items  # list of (clip_id, label)
        self.train = train
        self.use_video_frames = use_video_frames
        self.labels = np.asarray([l for _, l in items], np.int32)
        self._seed = int(seed)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Stateless per-(seed, epoch, index) augmentation draws — see
        data/core.sample_rng; enables thread-parallel gathers."""
        self._epoch = int(epoch)

    def __len__(self):
        return len(self.items)

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        from ..data.core import sample_rng
        from ..data.imageops import load_frame_eval_u8, load_frame_train_u8

        waves, frames, labels = [], [], []
        for i in indices:
            rng = sample_rng(self._seed, self._epoch, int(i))
            clip_id, label = self.items[int(i)]
            wav = _read_audio(self.data_dir, clip_id)
            if len(wav) == 0:
                # np.tile of an empty array stays empty — without this
                # guard a zero-frame extraction would loop forever
                raise ValueError(
                    f"clip {clip_id!r}: decoded audio is empty "
                    f"(failed/truncated wav or PCM track)")
            while len(wav) < SR * 10:
                wav = np.tile(wav, 2)
            # random 5 s crop in EVERY mode — the reference draws
            # random.randint(0, rate*5) unconditionally (get_data.py:113),
            # eval/test included, exactly like its random frame choice
            # below; our draw is the stateless per-(seed, epoch, index)
            # stream, so eval is reproducible run-to-run at equal seed
            start = rng.integers(0, SR * 5 + 1)
            crop = np.clip(wav[start:start + SR * CROP_SEC], -1.0, 1.0)
            waves.append(crop)

            frame_dir = os.path.join(self.data_dir, "frames", clip_id)
            if os.path.isdir(frame_dir):
                names = sorted(os.listdir(frame_dir))
                # random frame choice in BOTH modes (get_data.py:148-152)
                picks = np.sort(rng.choice(
                    len(names), self.use_video_frames,
                    replace=len(names) < self.use_video_frames))
                fs = []
                for p in picks:
                    fpath = os.path.join(frame_dir, names[int(p)])
                    # reference transforms (get_data.py:131-143): train
                    # RandomResizedCrop+flip, eval Resize — shipped uint8;
                    # ImageNet normalize runs on device (device_preprocess)
                    if self.train:
                        fs.append(load_frame_train_u8(fpath, rng))
                    else:
                        fs.append(load_frame_eval_u8(fpath))
            else:
                fs = self._stream_frames(clip_id, rng)
            frames.append(np.stack(fs))
            labels.append(label)
        return {
            # raw waveform: the train step (or eval) maps it through the
            # on-device log_spectrogram + SpecAugment graph
            "x1_waveform": np.stack(waves),
            "x2": np.stack(frames),
            "label": np.asarray(labels, np.int32),
        }

    def _stream_frames(self, clip_id: str, rng: np.random.Generator):
        """mp4-direct frame path (no extracted frames/<clip>/ dir): decode
        the clip's 1 FPS tick grid via libav (the exact grid
        tools/preprocess.py video-frames would have written to disk), then
        the usual random pick + train/eval transform.  Admission
        (_read_csv_items with frames_stream_ok) guarantees libav can
        decode the corpus codec, so failures here are per-file corruption
        and raise with the clip named."""
        from ..data.imageops import (transform_frame_eval_u8,
                                     transform_frame_train_u8)
        from ..utils import avdecode

        for ext in _VIDEO_EXTS:
            path = os.path.join(self.data_dir, "video", clip_id + ext)
            if os.path.exists(path):
                break
        else:
            raise FileNotFoundError(
                f"no frames for {clip_id}: neither frames/{clip_id}/ nor "
                f"video/{clip_id}.mp4 under {self.data_dir}")
        decoded = [f for f, _ in avdecode.decode_frames_at_fps(
            path, FRAME_FPS)]
        if not decoded:
            raise ValueError(
                f"clip {clip_id!r}: video decoded to zero frames")
        picks = np.sort(rng.choice(
            len(decoded), self.use_video_frames,
            replace=len(decoded) < self.use_video_frames))
        if self.train:
            return [transform_frame_train_u8(decoded[int(p)], rng)
                    for p in picks]
        return [transform_frame_eval_u8(decoded[int(p)]) for p in picks]


def _read_csv_items(data_dir: str, csv_name: str, split: str,
                    class_map: dict, mp4_ok: bool = False,
                    frames_stream_ok=None):
    """Rows of one split mapped through a SHARED class map.  The reference
    derives class ids from the train split and maps both splits through it
    (vggsound/get_data.py:88-101); the map is grown in train-row order.

    A clip is admitted when its wav exists (reference behavior), or —
    when ``mp4_ok`` (the container audio is native- or libav-streamable,
    see ``_mp4_streamable``) — when video/<clip>.mp4|.mov exists AND its
    frames are reachable: an extracted frames/<clip>/ dir, or
    ``frames_stream_ok()`` (a CALLABLE so the libav probe and its
    slow-path throughput note run only when some candidate clip actually
    lacks a frames dir — see ``_mp4_frames_streamable``).  Admission
    implies gather cannot fail."""
    items = []
    path = os.path.join(data_dir, csv_name)
    with open(path) as f:
        for row in csv.reader(f):
            if len(row) < 4 or row[3] != split:
                continue
            # zero-padded start time — the naming every producer uses:
            # reference get_data.py:70-71 / fix_missing.py:17 and our
            # tools/preprocess.py vggsound-split all write
            # <ytid>_<start zfill(6)>.*
            clip_id, cls = f"{row[0]}_{str(row[1]).zfill(6)}", row[2]
            if split == "train":
                class_map.setdefault(cls, len(class_map))
            if cls not in class_map:
                continue
            ok = os.path.exists(os.path.join(data_dir, "audio",
                                             clip_id + ".wav"))
            if not ok and mp4_ok:
                ok = any(os.path.exists(os.path.join(
                    data_dir, "video", clip_id + ext))
                    for ext in _VIDEO_EXTS) and (
                        os.path.isdir(os.path.join(data_dir, "frames",
                                                   clip_id))
                        or (frames_stream_ok is not None
                            and frames_stream_ok()))
            if ok:
                items.append((clip_id, class_map[cls]))
    return items


def get_data(args) -> DataBundle:
    data_dir = getattr(args, "data_path", "data/vggsound/")
    csv_path = os.path.join(data_dir, "vggsound.csv")
    if os.path.exists(csv_path):
        seed = int(getattr(args, "seed", 0))
        nframes = int(getattr(args, "use_video_frames", 4))
        class_map: dict = {}
        mp4_ok = _mp4_streamable(data_dir)
        # memoized lazy probe: runs (and prints its throughput note) only
        # if some candidate clip actually lacks an extracted frames dir
        _cache: list = []

        def frames_stream_ok() -> bool:
            if not _cache:
                _cache.append(_mp4_frames_streamable(data_dir))
            return _cache[0]

        train_items = _read_csv_items(data_dir, "vggsound.csv", "train",
                                      class_map, mp4_ok, frames_stream_ok)
        test_items = _read_csv_items(data_dir, "vggsound.csv", "test",
                                     class_map, mp4_ok, frames_stream_ok)
        for split_name, split_items in (("train", train_items),
                                        ("test", test_items)):
            if not split_items:
                raise FileNotFoundError(
                    f"{data_dir}vggsound.csv exists but 0 {split_name} "
                    "clips were admitted: each clip needs "
                    "audio/<clip>.wav (run tools/preprocess.py mp4-to-wav) "
                    "or, for streamable-audio mp4s, video/<clip>.mp4 plus "
                    "frames — an extracted frames/<clip>/ dir "
                    "(tools/preprocess.py video-frames), or the libav "
                    "module to stream them from the container")
        train = VGGSoundDiskDataset(data_dir, train_items, True, nframes,
                                    seed)
        test = VGGSoundDiskDataset(data_dir, test_items, False, nframes,
                                   seed)
        val = test  # reference quirk: val IS test (vggsound/get_data.py:180-185)
        synthetic = False
    else:
        print(f"[vggsound] real data not found under {data_dir!r}; "
              "using synthetic twin")
        train, val, test = make_synthetic_splits(
            "vggsound", int(args.num_classes), int(getattr(args, "seed", 0)),
            n_train=64, n_val=32, n_test=32,
        )
        synthetic = True
    # balanced samplers on train AND val (vggsound/run_training.py:62-80;
    # val aliases the test set, so the val stream is a weighted resample
    # of it); the test sampler is BUILT but never passed to the test
    # DataLoader (run_training.py:84-92) — test iteration is sequential
    return DataBundle(train, val, test, train_sampler="weighted",
                      val_sampler="weighted", synthetic=synthetic)


def device_preprocess(batch, rng, train: bool):
    """Raw waveform -> (B, 129, 626, 1) log-spectrogram (+ SpecAugment at
    train), fused into the jitted step (vggsound/get_data.py:106-128
    equivalents, on device)."""
    import jax

    from ..ops.pallas_spectrogram import pallas_log_spectrogram
    from ..ops.spectrogram import log_spectrogram
    from ..ops.specaugment import spec_augment

    from ..data.imageops import normalize_frames_device

    batch = dict(batch)
    # uint8-shipped frames -> normalized float on device (float = synthetic
    # twin or bench fixture: pass-through)
    batch["x2"] = normalize_frames_device(batch["x2"])
    if "x1_waveform" not in batch:
        return batch
    wave = batch.pop("x1_waveform")
    if jax.default_backend() == "tpu":
        spec2d = pallas_log_spectrogram(wave, n_fft=256, hop=128)
    else:
        spec2d = log_spectrogram(wave, n_fft=256, hop=128)
    if train:
        spec2d = spec_augment(rng, spec2d, freq_mask_param=30,
                              time_mask_param=120, num_freq_masks=2,
                              num_time_masks=3)
    batch["x1"] = spec2d[..., None]
    return batch


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jprobas")
    module = CremadFusionNet(num_classes=int(args.num_classes),
                             dtype=resolve_dtype(args))
    common = dict(sched_step_size=30, sched_gamma=0.5,
                  device_preprocess=device_preprocess,
                  # legacy runner: no ModelCheckpoint, test on final-epoch
                  # weights (vggsound/run_training.py:106-130)
                  test_restore_best=False,
                  # flat epoch-end names (vggsound/ensemble_model.py:171-174)
                  legacy_metric_aliases=True)
    if model_type == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits", **common)
    elif model_type == "jprobas":
        spec = ModelSpec(module=module, contract="jprobas", **common)
    elif model_type == "ensemble":
        # legacy dir: train loss is the MEAN (vggsound/ensemble_model.py:114)
        spec = ModelSpec(module=module, contract="ensemble",
                         ensemble_train_mean=True, **common)
    else:
        raise NotImplementedError(f"vggsound model_type {model_type!r}")
    return spec, {}

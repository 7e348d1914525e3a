"""Crema-D benchmark (north-star #1): audio log-spectrogram + 3 video frames,
6-way emotion classification.

Data (reference cremad/get_data.py): train.csv/test.csv file lists; pickled
(257, 1004) spectrograms; first 3 JPEG frames per clip through the
reference transforms — train RandomResizedCrop(224) + horizontal flip,
eval Resize((224, 224)), both ImageNet-normalized (get_data.py:94-109);
balanced weighted samplers on train and val; VAL IS THE TEST SET
(get_data.py:160-166 quirk — preserved).

All ten model variants from the reference factory (cremad/__init__.py:4-23):
  jlogits / jprobas / ensemble (CE x3, cremad/ensemble_model.py:54-55) /
  ogm_ge (alpha from yaml) / ensemble_ogm_ge (ensemble + modulation,
  ensemble_model_noised.py:118-123) / qmf / qmf_ablate /
  qmf_ablate_Ljoint / qmf_ablate_Lunimodal / ogm_ge_lreg (QMF loss +
  OGM-GE modulation, joint_model_ogm_ge_lreg.py).

Zero-offline-stage fallbacks (per corpus, chosen once in get_data): when
``audio_spec/`` pickles were never generated, the host ships the tiled
10 s waveform instead and the (257, 1004) log-spectrogram runs ON DEVICE
inside the jitted step (ops/spectrogram.cremad_spectrogram — the same
math tools/preprocess.py cremad-audio uses to build the pickles);
waveforms come from ``audio/<clip>.wav`` or, via the in-process libav
decoder, straight from ``video/<clip>.mp4|.flv`` (raw Crema-D downloads
are H.264/AAC flv/mp4).  When ``image/<clip>/`` frame dirs are absent,
the first 3 ticks of the 1 FPS grid stream from the container too.  The
reference cannot run before its OpenCV/librosa preprocessing pass
(cremad/video_preprocessing.py).
"""

from __future__ import annotations

import csv
import os
import pickle
from typing import Dict, Tuple

import numpy as np

from ..data.core import ArrayDataset
from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import CremadFusionNet

MODEL_TYPES = ("jlogits", "jprobas", "ensemble", "ogm_ge", "ensemble_ogm_ge",
               "qmf", "qmf_ablate", "qmf_ablate_Ljoint",
               "qmf_ablate_Lunimodal", "ogm_ge_lreg")

SR = 16000
TILE_SEC = 10  # tile-to->=10s window (cremad/video_preprocessing.py:113-118)
_VIDEO_EXTS = (".mp4", ".mov", ".flv")  # raw Crema-D ships VideoFlash .flv


def _find_video(data_dir: str, clip_id: str, video_dir: str = "video"):
    for ext in _VIDEO_EXTS:
        path = os.path.join(data_dir, video_dir, clip_id + ext)
        if os.path.exists(path):
            return path
    return None


def _tile_clip_waveform(wav: np.ndarray, clip_id: str) -> np.ndarray:
    """Tile to the fixed 10 s window and clip to [-1, 1] — the host half
    of the offline pipeline (video_preprocessing.py:113-118); the
    spectrogram half runs on device (device_preprocess)."""
    if len(wav) == 0:
        raise ValueError(f"clip {clip_id!r}: decoded audio is empty")
    target = SR * TILE_SEC
    reps = int(np.ceil(target / len(wav)))
    return np.clip(np.tile(wav, reps)[:target], -1.0, 1.0).astype(np.float32)


class CremadDiskDataset:
    """Lazy per-batch loader over pickled spectrograms + JPEG frames.

    Frames go through the reference's exact torchvision pipeline
    (cremad/get_data.py:94-109): train RandomResizedCrop(224) + horizontal
    flip + ImageNet normalize; eval Resize((224, 224)) + normalize; the
    first ``num_frames`` frames of each clip dir (the reference reads
    os.listdir order; we sort for determinism).  Decoding runs on the host
    prefetch thread (native libjpeg for the eval exact-resize path).

    On-disk layout is parameterized by class attributes so subclasses can
    serve reference corpora with other directory names (AVE:
    ``Audio-1004-SE``/``Image-01-FPS-SE``/``AVE``/``Audios``,
    ave/get_data.py:66-95).
    """

    num_frames = 3  # PMR protocol (cremad/get_data.py:117)
    audio_pkl_dir = "audio_spec"
    image_dir = "image"
    video_dir = "video"
    wav_dir = "audio"

    def __init__(self, data_dir: str, items, train: bool, seed: int = 0,
                 audio_mode: str = "pkl"):
        self.data_dir = data_dir
        self.items = items  # list of (clip_id, label)
        self.train = train
        self.audio_mode = audio_mode  # "pkl" | "stream" (per-corpus)
        self.labels = np.asarray([lab for _, lab in items], np.int32)
        self._seed = int(seed)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Augmentation stream epoch (forwarded by the Loader); draws are
        stateless per (seed, epoch, sample index) so thread-parallel
        gathers stay deterministic (data/core.sample_rng)."""
        self._epoch = int(epoch)

    def __len__(self):
        return len(self.items)

    def _frame_names(self, frame_dir):
        return sorted(os.listdir(frame_dir))[: self.num_frames]

    def _find_video(self, clip_id: str):
        return _find_video(self.data_dir, clip_id, self.video_dir)

    def _stream_ticks(self, clip_id: str):
        """(start, end) seconds of the 1 FPS tick grid to stream frames
        from.  Crema-D reads from the clip head (the extraction would have
        written the whole grid and get_data.py:117 picks the first 3
        files); end=None early-stops after num_frames ticks."""
        return 0.0, None

    def _stream_fps(self, clip_id: str) -> float:
        """Tick rate for streaming frames straight from the container.
        1 FPS matches the offline extraction grid; subclasses raise it for
        short segment windows (AVE)."""
        return 1.0

    def _window_waveform(self, wav: np.ndarray, clip_id: str) -> np.ndarray:
        """Fixed 10 s training window from a decoded 16 kHz waveform.
        Crema-D: tile the whole clip (video_preprocessing.py:113-118)."""
        return _tile_clip_waveform(wav, clip_id)

    def _load_frames(self, clip_id: str, rng) -> np.ndarray:
        # uint8 pre-normalization frames: ToTensor/Normalize runs on device
        # (device_preprocess below) — 2x fewer H2D bytes than bf16, 4x
        # fewer than fp32, and byte-identical to the torchvision pipeline's
        # post-resize uint8 stage (cremad/get_data.py:94-109)
        from ..data.imageops import load_frame_eval_u8, load_frame_train_u8

        frame_dir = os.path.join(self.data_dir, self.image_dir, clip_id)
        frames = []
        if os.path.isdir(frame_dir):
            for name in self._frame_names(frame_dir):
                path = os.path.join(frame_dir, name)
                if self.train:
                    frames.append(load_frame_train_u8(path, rng))
                else:
                    frames.append(load_frame_eval_u8(path))
        else:
            frames = self._stream_frames(clip_id, rng)
        if not frames:
            # admission only checks the audio artifact; fail with the clip
            # name instead of an IndexError deep in a prefetch thread
            raise FileNotFoundError(
                f"clip {clip_id!r}: no frames under {frame_dir!r} and no "
                f"streamable {self.video_dir}/{clip_id}.mp4|.flv "
                f"(frame extraction incomplete?)")
        while len(frames) < self.num_frames:
            frames.append(frames[-1])
        return np.stack(frames)  # (num_frames, 224, 224, 3)

    def _stream_frames(self, clip_id: str, rng):
        """No extracted image/<clip>/ dir: decode the FIRST num_frames
        ticks of the 1 FPS grid straight from the container (the same
        frames the reference's extraction would have written and
        get_data.py:117 would have picked — it reads the first 3 files).
        Early-stop: only ~3 s of video is decoded per sample."""
        from ..data.imageops import (transform_frame_eval_u8,
                                     transform_frame_train_u8)
        from ..utils import avdecode

        path = self._find_video(clip_id)
        if path is None or not avdecode.available():
            return []
        start, end = self._stream_ticks(clip_id)
        fps = self._stream_fps(clip_id)
        frames = []
        for frame, _tick in avdecode.decode_frames_at_fps(path, fps,
                                                          start=start,
                                                          end=end):
            frames.append(
                transform_frame_train_u8(frame, rng) if self.train
                else transform_frame_eval_u8(frame))
            if len(frames) == self.num_frames:
                break
        return frames

    def _load_audio_waveform(self, clip_id: str) -> np.ndarray:
        """Streaming audio mode: 16 kHz mono from <wav_dir>/<clip>.wav,
        else any-codec decode straight from the video container (libav);
        the per-dataset ``_window_waveform`` cuts the 10 s window."""
        from ..utils.native import resample_linear

        wav_path = os.path.join(self.data_dir, self.wav_dir,
                                clip_id + ".wav")
        if os.path.exists(wav_path):
            from .vggsound import _read_wav

            return self._window_waveform(_read_wav(wav_path), clip_id)
        path = self._find_video(clip_id)
        if path is None:
            raise FileNotFoundError(
                f"clip {clip_id!r}: no {self.audio_pkl_dir} pickle, no "
                f"{self.wav_dir}/{clip_id}.wav, no video container")
        from ..utils import avdecode

        audio, sr = avdecode.read_audio_mono(path)
        return self._window_waveform(resample_linear(audio, sr, SR),
                                     clip_id)

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        from ..data.core import sample_rng

        specs, frames, labels = [], [], []
        for i in indices:
            clip_id, label = self.items[int(i)]
            if self.audio_mode == "pkl":
                with open(os.path.join(self.data_dir, self.audio_pkl_dir,
                                       clip_id + ".pkl"), "rb") as f:
                    spec = pickle.load(f)
                specs.append(np.asarray(spec, np.float32)[..., None])
            else:  # "stream": ship the waveform, spectrogram on device
                specs.append(self._load_audio_waveform(clip_id))
            frames.append(self._load_frames(
                clip_id, sample_rng(self._seed, self._epoch, int(i))))
            labels.append(label)
        key = "x1" if self.audio_mode == "pkl" else "x1_waveform"
        return {
            key: np.stack(specs),
            "x2": np.stack(frames),  # uint8; normalized on device
            "label": np.asarray(labels, np.int32),
        }


_CLASSES = {"NEU": 0, "HAP": 1, "SAD": 2, "FEA": 3, "DIS": 4, "ANG": 5}


def _audio_mode(data_dir: str) -> str:
    """Per-corpus audio source: 'pkl' when the offline audio_spec/ stage
    ran (reference layout — existence filtering per clip like
    cremad/get_data.py:80-85), else 'stream' (waveforms from wavs or
    containers, spectrogram on device).  One mode per corpus so batches
    are key-homogeneous."""
    if os.path.isdir(os.path.join(data_dir, "audio_spec")):
        return "pkl"
    print("[cremad] no audio_spec/ pickles — shipping 10 s waveforms and "
          "computing the (257, 1004) log-spectrogram on device "
          "(tools/preprocess.py cremad-audio builds the offline pickles)")
    return "stream"


class _StreamProbe:
    """PER-CLIP decodability verdicts for container streaming, with
    per-CODEC memoization.

    Each clip is judged on its OWN container: a cheap header-only avformat
    probe (``avdecode.probe`` — no frame decode) reads its codec names,
    and decoder availability is memoized per codec id, so a 7,400-clip
    corpus costs 7,400 header opens (a one-time dataset-construction cost
    of a few ms each, only on the zero-offline-stage path) but at most a
    handful of decoder lookups.  Per-clip granularity means a mixed corpus
    — H.264 .mp4 next to HEVC .mp4 on a libav build without an HEVC
    decoder — admits exactly the decodable clips instead of letting the
    first container answer for everything and raising mid-epoch in a
    prefetch gather; a corrupt first file likewise poisons only itself.
    ``dataset_cls`` supplies the on-disk layout (Crema-D default; AVE
    passes AveDiskDataset)."""

    def __init__(self, data_dir: str, dataset_cls=None):
        self.data_dir = data_dir
        self.cls = dataset_cls or CremadDiskDataset
        self._by_codec: Dict[str, bool] = {}

    def _codec_ok(self, avdecode, name: Optional[str]) -> bool:
        if not name:
            return False
        if name not in self._by_codec:
            self._by_codec[name] = avdecode.has_decoder(name)
        return self._by_codec[name]

    def _probe(self, sample_path: str) -> Tuple[bool, bool]:
        from ..utils import avdecode

        if not avdecode.available():
            return (False, False)
        info = avdecode.probe(sample_path)
        if info is None:  # unparseable header: fall back to trial decode
            return (avdecode.can_decode_stream(sample_path, "audio"),
                    avdecode.can_decode_stream(sample_path, "video"))
        return (self._codec_ok(avdecode, info.get("audio_codec")),
                self._codec_ok(avdecode, info.get("video_codec")))

    def admissible(self, clip_id: str) -> bool:
        """Both modalities must be reachable so gather cannot fail:
        audio = wav or decodable container track; frames = extracted
        frame dir or decodable container video stream."""
        video = _find_video(self.data_dir, clip_id, self.cls.video_dir)
        audio_ok, video_ok = self._probe(video) if video else (False, False)
        has_wav = os.path.exists(
            os.path.join(self.data_dir, self.cls.wav_dir, clip_id + ".wav"))
        if not (has_wav or (video and audio_ok)):
            return False
        has_frames = os.path.isdir(
            os.path.join(self.data_dir, self.cls.image_dir, clip_id))
        return has_frames or bool(video and video_ok)

    def streamable_frames(self, clip_id: str) -> bool:
        """True when the clip's container has a decodable video stream
        (used by pkl-mode admission when the frame dir is absent)."""
        video = _find_video(self.data_dir, clip_id, self.cls.video_dir)
        if not video:
            return False
        return self._probe(video)[1]


def _read_split(data_dir: str, csv_name: str, audio_mode: str = "pkl",
                stream_probe=None):
    items = []
    with open(os.path.join(data_dir, csv_name)) as f:
        for row in csv.reader(f):
            if not row:
                continue
            clip_id, cls = row[0], row[1]
            if cls not in _CLASSES:
                continue
            if audio_mode == "pkl":
                ok = os.path.exists(os.path.join(data_dir, "audio_spec",
                                                 clip_id + ".pkl"))
            else:
                ok = stream_probe.admissible(clip_id)
            if ok:
                items.append((clip_id, _CLASSES[cls]))
    return items


def get_data(args) -> DataBundle:
    data_dir = getattr(args, "data_path", "data/cremad/")
    seed = int(getattr(args, "seed", 0))
    if os.path.exists(os.path.join(data_dir, "train.csv")):
        mode = _audio_mode(data_dir)
        probe = _StreamProbe(data_dir) if mode == "stream" else None
        train_items = _read_split(data_dir, "train.csv", mode, probe)
        test_items = _read_split(data_dir, "test.csv", mode, probe)
        for name, split in (("train", train_items), ("test", test_items)):
            if not split:
                raise FileNotFoundError(
                    f"{data_dir}{name}.csv exists but 0 clips were "
                    "admitted: each clip needs audio_spec/<clip>.pkl "
                    "(tools/preprocess.py cremad-audio), or — for the "
                    "zero-offline-stage path — BOTH audio "
                    "(audio/<clip>.wav or a libav-decodable container "
                    "track) AND frames (image/<clip>/ dir or a "
                    "libav-decodable video stream in "
                    "video/<clip>.mp4|.flv)")
        train = CremadDiskDataset(data_dir, train_items, True, seed, mode)
        test = CremadDiskDataset(data_dir, test_items, False, seed, mode)
        val = test  # reference quirk: val IS test (cremad/get_data.py:160-166)
        synthetic = False
    else:
        print(f"[cremad] real data not found under {data_dir!r}; "
              "using synthetic twin")
        train, val, test = make_synthetic_splits(
            "cremad", int(args.num_classes), seed,
            n_train=64, n_val=32, n_test=32,
        )
        synthetic = True
    # balanced samplers on train and val, sequential test
    # (cremad/run_trainer.py:40-70)
    return DataBundle(train, val, test, train_sampler="weighted",
                      val_sampler="weighted", synthetic=synthetic)


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jlogits")
    module = CremadFusionNet(num_classes=int(args.num_classes),
                             dtype=resolve_dtype(args))
    alpha = float(getattr(args, "alpha", 0.8))
    grad_mod = getattr(args, "grad_mod_type", "OGM_GE")

    if model_type == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits")
    elif model_type == "jprobas":
        spec = ModelSpec(module=module, contract="jprobas")
    elif model_type == "ensemble":
        spec = ModelSpec(module=module, contract="ensemble",
                         unimodal_loss_scale=3.0)
    elif model_type == "ogm_ge":
        spec = ModelSpec(module=module, contract="ogm_ge",
                         grad_mod_type=grad_mod, ogm_alpha=alpha)
    elif model_type == "ensemble_ogm_ge":
        # the noised ensemble+OGM variant uses PLAIN CE (no x3.0 —
        # cremad/ensemble_model_noised.py:56-57 builds FusionNet with a
        # bare CrossEntropyLoss) and trains on the MEAN
        # (ensemble_model_noised.py:104), unlike the plain cremad
        # ensemble's scaled sum
        spec = ModelSpec(module=module, contract="ensemble",
                         ensemble_train_mean=True, apply_grad_mod=True,
                         grad_mod_type=grad_mod, ogm_alpha=alpha)
    elif model_type == "qmf":
        spec = ModelSpec(module=module, contract="qmf",
                         n_train_samples=n_train)
    elif model_type == "qmf_ablate":
        spec = ModelSpec(module=module, contract="qmf",
                         n_train_samples=n_train, qmf_ablate_train=True)
    elif model_type == "qmf_ablate_Ljoint":
        spec = ModelSpec(module=module, contract="qmf",
                         n_train_samples=n_train, qmf_drop_joint=True)
    elif model_type == "qmf_ablate_Lunimodal":
        spec = ModelSpec(module=module, contract="qmf",
                         n_train_samples=n_train, qmf_drop_unimodal=True)
    elif model_type == "ogm_ge_lreg":
        spec = ModelSpec(module=module, contract="qmf",
                         n_train_samples=n_train, apply_grad_mod=True,
                         grad_mod_type=grad_mod, ogm_alpha=alpha)
    else:
        raise NotImplementedError(f"cremad model_type {model_type!r}")
    import dataclasses

    spec = dataclasses.replace(spec, device_preprocess=device_preprocess)
    return spec, {}


def device_preprocess(batch, rng, train: bool):
    """uint8-shipped frames -> ImageNet-normalized float32 on device: the
    ToTensor+Normalize stage of cremad/get_data.py:94-109 moved across the
    H2D boundary (2x fewer tunnel bytes than bf16; float inputs — the
    synthetic twin — pass through unchanged).

    Streaming audio mode ships the tiled 10 s waveform instead of the
    offline pickle; the (257, 1004) log-spectrogram then runs inside the
    jitted step (ops/spectrogram.cremad_spectrogram — the exact math the
    offline cremad-audio stage pickles, video_preprocessing.py:119-130)."""
    from ..data.imageops import normalize_frames_device

    batch = dict(batch)
    batch["x2"] = normalize_frames_device(batch["x2"])
    if "x1_waveform" in batch:
        from ..ops.spectrogram import cremad_spectrogram

        wave = batch.pop("x1_waveform")
        batch["x1"] = cremad_spectrogram(wave)[..., None]
    return batch

"""AVE benchmark: Audio-Visual Event, 28-way classification (PMR protocol).

Data (reference ave/get_data.py): per-split txt lists (``CLASS&clip&...``)
with class ids in FIRST-APPEARANCE order over testSet.txt
(ave/get_data.py:79-87); ``Audio-1004-SE/<clip>.pkl`` precomputed
(257, 1004) spectrogram features + ``Image-01-FPS-SE/<clip>/`` frame dirs
(ave/get_data.py:66-95) — the SE artifacts are segment-aware: the offline
stage cuts each clip to its ``Annotations.txt`` start/end window
(ave/video_preprocessing.py:216-279).  6 frames per clip
(ave/get_data.py:135); SpecAugment active at train with reduced params
(ave/get_data.py:148-155); balanced samplers on train and val — the
runner BUILDS a test sampler too but never passes it to the test
DataLoader, so test iteration is sequential (ave/run_training.py:84-92,
the same built-but-unused quirk as mimic's train sampler).  Legacy
scheduler: StepLR(10, 0.5)
(ave/joint_model.py:250-258).

Zero-offline-stage fallback (like cremad/vggsound): a raw AVE download is
``AVE/<clip>.mp4`` containers + ``Annotations.txt`` only.  When the
``Audio-1004-SE/`` pickles were never generated, the host ships the
SE-windowed 10 s waveform (``Audios/<clip>.wav`` if ave/mp4_to_wav.py ran,
else AAC decoded in-process from the container) and the (257, 1004)
log-spectrogram runs on device inside the jitted step — the same math the
offline extractWav_SE pickles (ave/video_preprocessing.py:244-279).
Missing ``Image-01-FPS-SE/<clip>/`` dirs stream the segment's 1 FPS-grid
frames straight from the container (ticks start..end inclusive, mirroring
video2frame_update_SE's num_count window,
ave/video_preprocessing.py:121-126).

Models: scratch dual ResNet18 like Crema-D under jlogits / jprobas /
ensemble.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import CremadFusionNet
from .cremad import SR, TILE_SEC, CremadDiskDataset, _StreamProbe

MODEL_TYPES = ("jlogits", "jprobas", "ensemble")
NUM_FRAMES = 6
# video2frame_update_SE defaults when a clip has no annotation row
# (ave/video_preprocessing.py:216)
DEFAULT_SEGMENT = (0, 10)


class AveDiskDataset(CremadDiskDataset):
    """Crema-D loader machinery over the reference AVE on-disk layout
    (ave/get_data.py:66-95) with 6 DISTINCT frames per clip (PMR
    protocol, ave/get_data.py:135) + SpecAugment applied on device by the
    train step pipeline (ops/specaugment.py).  Streaming mode is
    segment-aware per Annotations.txt."""

    num_frames = NUM_FRAMES
    audio_pkl_dir = "Audio-1004-SE"
    image_dir = "Image-01-FPS-SE"
    video_dir = "AVE"
    wav_dir = "Audios"

    def __init__(self, data_dir: str, items, train: bool, seed: int = 0,
                 audio_mode: str = "pkl",
                 segments: Optional[Dict[str, Tuple[int, int]]] = None):
        super().__init__(data_dir, items, train, seed, audio_mode)
        self.segments = segments or {}

    def _segment(self, clip_id: str) -> Tuple[int, int]:
        return self.segments.get(clip_id, DEFAULT_SEGMENT)

    def _stream_ticks(self, clip_id: str):
        # frames are saved for 1 FPS ticks with num_count in
        # [start_t, end_t] INCLUSIVE (ave/video_preprocessing.py:121-126)
        start, end = self._segment(clip_id)
        return float(start), float(end) + 1.0

    def _stream_fps(self, clip_id: str) -> float:
        """Short segments stream at a raised tick rate so they still
        yield ``num_frames`` DISTINCT frames: the reference's offline SE
        extraction tops short segments up to >= 10 distinct frames by
        sampling extra random frame ids inside the window
        (ave/video_preprocessing.py:131-158); evenly-spaced ticks are the
        deterministic stand-in (divergence noted in PARITY.md)."""
        start, end = self._stream_ticks(clip_id)
        window = max(end - start, 1e-6)
        if window >= self.num_frames:
            return 1.0
        return float(self.num_frames) / window

    def _window_waveform(self, wav: np.ndarray, clip_id: str) -> np.ndarray:
        """extractWav_SE host math (ave/video_preprocessing.py:254-266):
        slice [start, end) seconds, tile x10, tile x10 AGAIN if still
        short, truncate to 10 s, clip to [-1, 1].

        Slices shorter than 0.1 s keep tiling past the reference's
        at-most-twice until the 10 s target: the reference would write a
        short pickle there that crashes its own DataLoader at np.stack
        time, so matching it would just move an opaque shape error into a
        training-time prefetch thread."""
        start, end = self._segment(clip_id)
        seg = wav[SR * start: SR * end]
        if len(seg) == 0:
            raise ValueError(
                f"clip {clip_id!r}: empty audio segment [{start}, {end}) s "
                f"over a {len(wav) / SR:.2f} s waveform (Annotations.txt "
                "row wrong, or a truncated download whose audio ends "
                "before the annotated window?)")
        target = SR * TILE_SEC
        res = np.tile(seg, 10)
        if len(res) < target:
            res = np.tile(res, 10)
        if len(res) < target:  # < 0.1 s slice; see docstring
            res = np.tile(res, -(-target // len(res)))
        return np.clip(res[:target], -1.0, 1.0).astype(np.float32)


def _read_annotations(data_dir: str) -> Dict[str, Tuple[int, int]]:
    """clip -> (start_t, end_t) from Annotations.txt
    (``category&clip&quality&start&end``, header line skipped —
    ave/video_preprocessing.py:186-216)."""
    path = os.path.join(data_dir, "Annotations.txt")
    segments: Dict[str, Tuple[int, int]] = {}
    if not os.path.exists(path):
        return segments
    with open(path) as f:
        lines = f.readlines()
    for line in lines[1:]:
        parts = line.strip().split("&")
        if len(parts) >= 5:
            try:
                segments[parts[1]] = (int(parts[3]), int(parts[4]))
            except ValueError:
                continue
    return segments


def _audio_mode(data_dir: str) -> str:
    """'pkl' when the offline Audio-1004-SE/ stage ran (reference layout),
    else 'stream' (SE-windowed waveforms, spectrogram on device)."""
    if os.path.isdir(os.path.join(data_dir, AveDiskDataset.audio_pkl_dir)):
        return "pkl"
    print("[ave] no Audio-1004-SE/ pickles — shipping SE-windowed 10 s "
          "waveforms and computing the (257, 1004) log-spectrogram on "
          "device (ave/video_preprocessing.py extractWav_SE equivalent)")
    return "stream"


def _read_split_txt(data_dir: str, txt: str, class_map, audio_mode: str,
                    probe: _StreamProbe,
                    segments: Optional[Dict[str, Tuple[int, int]]] = None):
    """Split items with the reference's admission semantics
    (ave/get_data.py:89-101): skip unknown classes, admit a clip once
    (repeated rows are deduped), require both modalities reachable —
    pkl mode: the Audio-1004-SE pickle plus extracted frames (or a
    streamable container video); stream mode: both modalities via
    wavs/containers.  Stream mode additionally drops (with a warning)
    clips whose Annotations.txt segment is empty (start >= end — the
    reference's own FIXME at ave/video_preprocessing.py:145 acknowledges
    such rows exist): admitting one would raise inside a training-time
    prefetch gather instead of here."""
    items, seen = [], set()
    path = os.path.join(data_dir, txt)
    if not os.path.exists(path):
        return items
    with open(path) as f:
        for line in f:
            parts = line.strip().split("&")
            if len(parts) < 2 or parts[0] not in class_map:
                continue
            clip = parts[1]
            if clip in seen:
                continue
            if audio_mode == "pkl":
                ok = os.path.exists(
                    os.path.join(data_dir, AveDiskDataset.audio_pkl_dir,
                                 clip + ".pkl"))
                ok = ok and (
                    os.path.isdir(os.path.join(
                        data_dir, AveDiskDataset.image_dir, clip))
                    or probe.streamable_frames(clip))
            else:
                start, end = (segments or {}).get(clip, DEFAULT_SEGMENT)
                if start >= end:
                    print(f"[ave] dropping {clip!r}: empty Annotations.txt "
                          f"segment [{start}, {end})")
                    continue
                ok = probe.admissible(clip)
            if ok:
                seen.add(clip)
                items.append((clip, class_map[parts[0]]))
    return items


def get_data(args) -> DataBundle:
    data_dir = getattr(args, "data_path", "data/ave/")
    test_txt = os.path.join(data_dir, "testSet.txt")
    if os.path.exists(test_txt):
        # class ids in first-appearance order over testSet.txt — the
        # reference appends unseen classes in file order
        # (ave/get_data.py:79-87), NOT sorted
        classes = []
        with open(test_txt) as f:
            for line in f:
                if "&" not in line:
                    continue
                cls = line.split("&")[0]
                if cls not in classes:
                    classes.append(cls)
        class_map = {c: i for i, c in enumerate(classes)}
        seed = int(getattr(args, "seed", 0))
        mode = _audio_mode(data_dir)
        segments = _read_annotations(data_dir)
        probe = _StreamProbe(data_dir, AveDiskDataset)
        splits = {}
        for split, txt, train in (("train", "trainSet.txt", True),
                                  ("val", "valSet.txt", False),
                                  ("test", "testSet.txt", False)):
            items = _read_split_txt(data_dir, txt, class_map, mode, probe,
                                    segments)
            if not items:
                raise FileNotFoundError(
                    f"{data_dir}{txt}: 0 clips admitted — each clip needs "
                    "Audio-1004-SE/<clip>.pkl + Image-01-FPS-SE/<clip>/ "
                    "(the offline SE extraction), or — for the "
                    "zero-offline-stage path — AVE/<clip>.mp4 with "
                    "libav-decodable audio AND video streams (or "
                    "Audios/<clip>.wav for the audio half)")
            splits[split] = AveDiskDataset(data_dir, items, train, seed,
                                           mode, segments)
        train, val, test = splits["train"], splits["val"], splits["test"]
        synthetic = False
    else:
        print(f"[ave] real data not found under {data_dir!r}; "
              "using synthetic twin")
        train, val, test = make_synthetic_splits(
            "ave", int(args.num_classes), int(getattr(args, "seed", 0)),
            n_train=64, n_val=32, n_test=32,
        )
        synthetic = True
    # balanced samplers on train and val; the test sampler is BUILT but
    # never passed to the test DataLoader (ave/run_training.py:84-92), so
    # test iteration is sequential
    return DataBundle(train, val, test, train_sampler="weighted",
                      val_sampler="weighted", synthetic=synthetic)


def device_preprocess(batch, rng, train: bool):
    """uint8 frame normalization (both modes — AveDiskDataset inherits the
    Crema-D uint8 shipping); streaming mode turns the SE-windowed waveform
    into the (257, 1004) log-spectrogram on device (the extractWav_SE
    pickle math, ave/video_preprocessing.py:268-276); train adds
    SpecAugment on the spectrogram (ave/get_data.py:148-155)."""
    from ..data.imageops import normalize_frames_device

    batch = dict(batch)
    batch["x2"] = normalize_frames_device(batch["x2"])
    if "x1_waveform" in batch:
        from ..ops.spectrogram import cremad_spectrogram

        wave = batch.pop("x1_waveform")
        batch["x1"] = cremad_spectrogram(wave)[..., None]
    if not train:
        return batch
    from ..ops.specaugment import spec_augment

    # reduced masking params per ave/get_data.py:148-155
    batch["x1"] = spec_augment(rng, batch["x1"], freq_mask_param=15,
                               time_mask_param=60, num_freq_masks=1,
                               num_time_masks=1)
    return batch


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jprobas")
    module = CremadFusionNet(num_classes=int(args.num_classes),
                             dtype=resolve_dtype(args))
    common = dict(sched_step_size=10, sched_gamma=0.5,
                  device_preprocess=device_preprocess,
                  # legacy runner: no ModelCheckpoint, test on final-epoch
                  # weights (ave/run_training.py:106-131)
                  test_restore_best=False,
                  # flat epoch-end names (ave/joint_model.py:197-201)
                  legacy_metric_aliases=True)
    if model_type == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits", **common)
    elif model_type == "jprobas":
        spec = ModelSpec(module=module, contract="jprobas", **common)
    elif model_type == "ensemble":
        # legacy dir: train loss is the MEAN (ave/ensemble_model.py:115)
        spec = ModelSpec(module=module, contract="ensemble",
                         ensemble_train_mean=True, **common)
    else:
        raise NotImplementedError(f"ave model_type {model_type!r}")
    return spec, {}

"""AVE benchmark: Audio-Visual Event, 28-way classification (PMR protocol).

Data (reference ave/get_data.py): per-split txt lists derived from
testSet.txt classes; ``Audio-1004-SE`` precomputed (257, 1004) spectrogram
features (pickles) + frame folders; 6 frames per clip; SpecAugment active
at train (ave/get_data.py:148-155); balanced samplers on train, val AND
test (ave/run_training.py:62-92).  Legacy scheduler: StepLR(10, 0.5)
(ave/joint_model.py:250-258).

Models: scratch dual ResNet18 like Crema-D under jlogits / jprobas /
ensemble.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Tuple

import numpy as np

from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import CremadFusionNet
from .cremad import CremadDiskDataset

MODEL_TYPES = ("jlogits", "jprobas", "ensemble")
NUM_FRAMES = 6


class AveDiskDataset(CremadDiskDataset):
    """Same on-disk layout handling as Crema-D but 6 DISTINCT frames per
    clip (PMR protocol, ave/get_data.py:135) + SpecAugment applied on
    device by the train step pipeline (ops/specaugment.py)."""

    num_frames = NUM_FRAMES


def _read_split_txt(data_dir: str, txt: str, class_map):
    items = []
    path = os.path.join(data_dir, txt)
    if not os.path.exists(path):
        return items
    with open(path) as f:
        for line in f:
            parts = line.strip().split("&")
            if len(parts) >= 2 and parts[0] in class_map:
                items.append((parts[1], class_map[parts[0]]))
    return items


def get_data(args) -> DataBundle:
    data_dir = getattr(args, "data_path", "data/ave/")
    test_txt = os.path.join(data_dir, "testSet.txt")
    if os.path.exists(test_txt):
        classes = sorted({line.split("&")[0]
                          for line in open(test_txt) if "&" in line})
        class_map = {c: i for i, c in enumerate(classes)}
        seed = int(getattr(args, "seed", 0))
        train = AveDiskDataset(data_dir,
                               _read_split_txt(data_dir, "trainSet.txt",
                                               class_map), True, seed)
        val = AveDiskDataset(data_dir,
                             _read_split_txt(data_dir, "valSet.txt",
                                             class_map), False, seed)
        test = AveDiskDataset(data_dir,
                              _read_split_txt(data_dir, "testSet.txt",
                                              class_map), False, seed)
        synthetic = False
    else:
        print(f"[ave] real data not found under {data_dir!r}; "
              "using synthetic twin")
        train, val, test = make_synthetic_splits(
            "ave", int(args.num_classes), int(getattr(args, "seed", 0)),
            n_train=64, n_val=32, n_test=32,
        )
        synthetic = True
    # balanced samplers incl. test (ave/run_training.py:62-92)
    return DataBundle(train, val, test, train_sampler="weighted",
                      val_sampler="weighted", test_sampler="weighted",
                      synthetic=synthetic)


def device_preprocess(batch, rng, train: bool):
    """uint8 frame normalization (both modes — AveDiskDataset inherits the
    Crema-D uint8 shipping) + train-time SpecAugment on the audio
    spectrogram, fused on device (ave/get_data.py:148-155 equivalent)."""
    from ..data.imageops import normalize_frames_device

    batch = dict(batch)
    batch["x2"] = normalize_frames_device(batch["x2"])
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
                  device_preprocess=device_preprocess)
    if model_type == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits", **common)
    elif model_type == "jprobas":
        spec = ModelSpec(module=module, contract="jprobas", **common)
    elif model_type == "ensemble":
        spec = ModelSpec(module=module, contract="ensemble", **common)
    else:
        raise NotImplementedError(f"ave model_type {model_type!r}")
    return spec, {}

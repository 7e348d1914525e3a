"""MUsTARD benchmark: 3-modality sarcasm detection (vision 371 / audio 81 /
text 300-d GloVe sequences, binary).

Data (reference mustard/get_data.py): MultiBench affect ``sarcasm.pkl``;
empty-text samples dropped; z-normalization; sequences padded/truncated to
``max_seq_len`` (40).  The reference flags this benchmark as
not-for-benchmarking due to LSTM convergence issues (mustard/ERROR.md:1) —
preserved as a warning.

Model: three LstmClassifiers with 3-way logit-mean fusion
(mustard/joint_model.py:45-83) under the jlogits contract — this is the
engine's 3-modality generalization path.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Tuple

import numpy as np

from ..data.core import ArrayDataset
from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec
from ..models.zoo import MustardFusionNet

MODEL_TYPES = ("jlogits", "ensemble")


def _pad_seq(x: np.ndarray, max_len: int) -> np.ndarray:
    if len(x) >= max_len:
        return x[:max_len]
    return np.concatenate(
        [np.zeros((max_len - len(x),) + x.shape[1:], x.dtype), x]
    )


def _load_real(path: str, max_seq_len: int):
    with open(path, "rb") as f:
        data = pickle.load(f)

    def build(split):
        d = data[split]
        vision = np.stack([_pad_seq(np.asarray(v, np.float32), max_seq_len)
                           for v in d["vision"]])
        audio = np.stack([_pad_seq(np.asarray(a, np.float32), max_seq_len)
                          for a in d["audio"]])
        text = np.stack([_pad_seq(np.asarray(t, np.float32), max_seq_len)
                         for t in d["text"]])
        labels = (np.asarray(d["labels"]).reshape(len(vision), -1)[:, 0] > 0
                  ).astype(np.int32)
        for arr in (vision, audio, text):
            arr[~np.isfinite(arr)] = 0
        return ArrayDataset([vision, audio, text], labels)

    return build("train"), build("valid"), build("test")


def get_data(args) -> DataBundle:
    path = getattr(args, "data_path", "data/mustard/sarcasm.pkl")
    max_seq_len = int(getattr(args, "max_seq_len", 40))
    if os.path.exists(path):
        print("[mustard] note: reference flags this benchmark as unstable "
              "(mustard/ERROR.md)")
        train, val, test = _load_real(path, max_seq_len)
        synthetic = False
    else:
        print(f"[mustard] real data not found at {path!r}; "
              "using synthetic twin")
        train, val, test = make_synthetic_splits(
            "mustard", int(args.num_classes), int(getattr(args, "seed", 0)),
            n_train=64, n_val=32, n_test=32,
        )
        synthetic = True
    return DataBundle(train, val, test, train_sampler="random",
                      synthetic=synthetic)


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jlogits")
    module = MustardFusionNet(num_classes=int(args.num_classes))
    if model_type == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits", num_modality=3)
    elif model_type == "ensemble":
        spec = ModelSpec(module=module, contract="ensemble", num_modality=3)
    else:
        raise NotImplementedError(f"mustard model_type {model_type!r}")
    # legacy plain SGD (mustard runner, self-contained module)
    return spec, {"momentum": 0.0, "weight_decay": 0.0}

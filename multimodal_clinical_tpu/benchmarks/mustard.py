"""MUsTARD benchmark: 3-modality sarcasm detection (vision 371 / audio 81 /
text 300-d GloVe sequences, binary).

Data (reference mustard/get_data.py): MultiBench affect ``sarcasm.pkl``;
samples whose text features sum to zero are dropped (drop_entry,
get_data.py:268-270); sequences end-padded/truncated to ``max_seq_len``
(40); z-normalization follows the reference default (off).  The reference
flags this benchmark as not-for-benchmarking due to LSTM convergence
issues (mustard/ERROR.md:1) — preserved as a warning.

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
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import MustardFusionNet

MODEL_TYPES = ("jlogits", "ensemble")


def _pad_seq(x: np.ndarray, max_len: int) -> np.ndarray:
    """Trim/pad to max_len with END padding, matching the reference's
    F.pad-at-the-end (mustard/get_data.py:189-198, 238-241)."""
    if len(x) >= max_len:
        return x[:max_len]
    return np.concatenate(
        [x, np.zeros((max_len - len(x),) + x.shape[1:], x.dtype)]
    )


def _load_real(path: str, max_seq_len: int):
    with open(path, "rb") as f:
        data = pickle.load(f)

    def build(split):
        d = data[split]
        # drop_entry: remove samples with all-zero text (get_data.py:268-270)
        keep = [i for i, t in enumerate(d["text"])
                if np.abs(np.asarray(t)).sum() > 0]
        vision = np.stack([_pad_seq(np.asarray(d["vision"][i], np.float32),
                                    max_seq_len) for i in keep])
        audio = np.stack([_pad_seq(np.asarray(d["audio"][i], np.float32),
                                   max_seq_len) for i in keep])
        text = np.stack([_pad_seq(np.asarray(d["text"][i], np.float32),
                                  max_seq_len) for i in keep])
        labels = (np.asarray(d["labels"])[keep].reshape(len(keep), -1)[:, 0]
                  > 0).astype(np.int32)
        for arr in (vision, audio, text):
            arr[~np.isfinite(arr)] = 0
        return ArrayDataset([vision, audio, text], labels)

    return build("train"), build("valid"), build("test")


def get_data(args) -> DataBundle:
    path = getattr(args, "data_path", "data/mustard/sarcasm.pkl")
    max_seq_len = int(getattr(args, "max_seq_len", 40))
    # isfile, not exists: data_path is the sarcasm.pkl FILE itself; a
    # directory here (e.g. a generic data_path override) means synthetic
    if os.path.isfile(path):
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
    # the reference's train DataLoader passes neither a sampler nor
    # shuffle=True (mustard/run_training.py:73-80; torch defaults to
    # shuffle=False) — sequential train order every epoch, preserved
    return DataBundle(train, val, test, train_sampler="sequential",
                      synthetic=synthetic)


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jlogits")
    module = MustardFusionNet(num_classes=int(args.num_classes),
                              dtype=resolve_dtype(args))
    # legacy runner: no ModelCheckpoint, test on final-epoch weights
    # (mustard/run_training.py:100-135)
    common = dict(num_modality=3, test_restore_best=False,
                  # flat epoch-end names incl. x3 (joint_model.py:197-201,
                  # 264-268: val_loss / x{i}_val_acc / avg_test_*)
                  legacy_metric_aliases=True)
    if model_type == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits", **common)
    elif model_type == "ensemble":
        spec = ModelSpec(module=module, contract="ensemble", **common)
    else:
        raise NotImplementedError(f"mustard model_type {model_type!r}")
    # the mustard module trains with bare Adam(args.lr) — torch defaults,
    # no scheduler (mustard/joint_model.py:275-277; use_scheduler is off in
    # configs/mustard.yaml because the legacy runner never builds StepLR).
    # jlogits is the only variant whose model file exists in the reference
    # (run_training.py:41-48 also dispatches ensemble/jprobas but those
    # imports would fail); the repo's ensemble extension keeps the same
    # optimizer protocol as the directory's one real model.
    return spec, {"optimizer": "adam"}

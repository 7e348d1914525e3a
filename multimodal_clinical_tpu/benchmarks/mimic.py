"""MIMIC-III EHR benchmark: static 5-dim + 24x12 time series, 6-way mortality
(or binary ICD-9 via ``task_num``).

Data (reference mimic/get_data.py:30-95): MultiBench ``im.pk`` pickle;
inf/nan -> 0; z-score both modalities; task -1 builds the 6-class mortality
label; shuffled 10%/10%/80% val/test/train split.  The reference builds a
balanced train sampler but never passes it to the DataLoader, and never
sets shuffle=True either (mimic/run_training.py:39-46) — preserved: train
iterates the dataset-construction random.shuffle order, identical every
epoch (per-seed variation comes from that initial shuffle + init).

Model variants (mimic/__init__.py factory):
  jlogits  — MLP(5->...C) + GRU(12->32) logit mean (joint_model.py)
  ensemble — same nets, WEIGHTED train loss / train metrics w1=0.8 /
             w2=1.5 (ensemble_model.py:157,160); val/test fuse the PLAIN
             mean (x1+x2)/2 (ensemble_model.py:197-199,234-239)
  jprobas  — probability fusion (joint_model_proba.py)
  ogm_ge   — manual-opt OGM-GE; no 4-D params in MLP/GRU so the modulation
             is a documented no-op (ogm_ge_model.py:192-193, SURVEY §2.3)
  qmf      — the reference's qmf_model.py is broken as-is (idx never
             unpacked, 4-tuple where 5-tuple expected — SURVEY §2.3); this
             implements the *intended* QMF.
"""

from __future__ import annotations

import os
import pickle
import random
from typing import Dict, Tuple

import numpy as np

from ..data.core import ArrayDataset
from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import MimicFusionNet

MODEL_TYPES = ("jlogits", "ensemble", "jprobas", "ogm_ge", "qmf")


def _load_real(path: str, task: int, seed: int):
    with open(path, "rb") as f:
        datafile = pickle.load(f)
    x_t = np.asarray(datafile["ep_tdata"], np.float32)
    x_s = np.asarray(datafile["adm_features_all"], np.float32)
    x_t[~np.isfinite(x_t)] = 0
    x_s[~np.isfinite(x_s)] = 0
    x_s = (x_s - x_s.mean(0)) / x_s.std(0)
    x_t = (x_t - x_t.mean((0, 1))) / x_t.std((0, 1))

    if task < 0:
        adm = np.asarray(datafile["adm_labels_all"])
        # 6-way time-to-mortality construction (mimic/get_data.py:64-80)
        y = np.select(
            [adm[:, 1] > 0, adm[:, 2] > 0, adm[:, 3] > 0, adm[:, 4] > 0,
             adm[:, 5] > 0],
            [1, 2, 3, 4, 5],
            default=0,
        )
    else:
        y = np.asarray(datafile["y_icd9"])[:, task]
    y = y.astype(np.int32)

    n = len(y)
    order = list(range(n))
    random.Random(seed).shuffle(order)  # reference uses random.shuffle
    order = np.asarray(order)
    val_idx = order[: n // 10]
    test_idx = order[n // 10: n // 5]
    train_idx = order[n // 5:]

    def subset(idx):
        return ArrayDataset([x_s[idx], x_t[idx]], y[idx])

    return subset(train_idx), subset(val_idx), subset(test_idx)


def get_data(args) -> DataBundle:
    path = getattr(args, "data_path", "data/mimic/im.pk")
    task = int(getattr(args, "task_num", -1))
    # isfile, not exists: data_path is the im.pk FILE itself; a directory
    # here (e.g. a generic data_path override) means "no real data"
    if os.path.isfile(path):
        train, val, test = _load_real(path, task, int(getattr(args, "seed", 0)))
        synthetic = False
    else:
        print(f"[mimic] real data not found at {path!r}; using synthetic twin")
        train, val, test = make_synthetic_splits(
            "mimic", int(args.num_classes), int(getattr(args, "seed", 0))
        )
        synthetic = True
    # the balanced sampler is BUILT but never passed to the DataLoader,
    # and shuffle is never set (mimic/run_training.py:39-46; torch
    # defaults to shuffle=False): training iterates the post-construction
    # random.shuffle order, the SAME order every epoch — preserved
    return DataBundle(train, val, test, train_sampler="sequential",
                      synthetic=synthetic)


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jlogits")
    module = MimicFusionNet(num_classes=int(args.num_classes),
                            dtype=resolve_dtype(args))
    common: Dict = {}
    if model_type == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits")
    elif model_type == "jprobas":
        spec = ModelSpec(module=module, contract="jprobas")
        # jprobas alone trains with bare Adam(args.lr) — torch defaults,
        # no scheduler (mimic/joint_model_proba.py:314-316); every other
        # mimic variant is SGD(0.9, 1e-4) (mimic/joint_model.py:257)
        common = {"optimizer": "adam"}
    elif model_type == "ensemble":
        spec = ModelSpec(module=module, contract="ensemble",
                         fusion_weights=(0.8, 1.5))
    elif model_type == "ogm_ge":
        spec = ModelSpec(module=module, contract="ogm_ge",
                         grad_mod_type=getattr(args, "grad_mod_type", "OGM_GE"),
                         ogm_alpha=float(getattr(args, "alpha", 0.1)))
    elif model_type == "qmf":
        spec = ModelSpec(module=module, contract="qmf",
                         n_train_samples=n_train)
    else:
        raise NotImplementedError(f"mimic model_type {model_type!r}")
    return spec, common

"""AV-MNIST benchmark: 28x28 digit image + 112x112 audio spectrogram, 10-way.

Data (reference avmnist/get_data.py:25-58): six ``.npy`` arrays under
``<data_path>/image``, ``<data_path>/audio`` + label files; /255
normalization; 55k/5k/10k train/val/test split.  Falls back to a synthetic
twin when the files are absent.

Model variants (avmnist/*.py, legacy self-contained Lightning modules):
  jlogits          — LeNet(6,3) + LeNet(6,5), CE on mean logits
  jprobas          — CE on log-mean-softmax (joint_model_proba.py:116-144)
  jprobas_jlogits  — probas train / logits eval (joint_model_proba_logits.py)
  ensemble         — per-modality CE (ensemble_model.py:121-124)
  ensemble_probas  — ensemble with log-prob reporting (ensemble_model_probas.py)

The legacy AV-MNIST optimizer is plain SGD with no momentum / weight decay
(avmnist/joint_model.py:340-342); no LR scheduler.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from ..data.core import ArrayDataset
from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import AVMnistFusionNet

MODEL_TYPES = ("jlogits", "jprobas", "jprobas_jlogits", "ensemble",
               "ensemble_probas")


def _load_real(data_dir: str):
    img_tr = np.load(os.path.join(data_dir, "image", "train_data.npy"))
    aud_tr = np.load(os.path.join(data_dir, "audio", "train_data.npy"))
    lab_tr = np.load(os.path.join(data_dir, "train_labels.npy")).astype(np.int32)
    img_te = np.load(os.path.join(data_dir, "image", "test_data.npy"))
    aud_te = np.load(os.path.join(data_dir, "audio", "test_data.npy"))
    lab_te = np.load(os.path.join(data_dir, "test_labels.npy")).astype(np.int32)

    def prep(img, aud):
        img = (img.reshape(-1, 28, 28, 1) / 255.0).astype(np.float32)
        aud = (aud.reshape(-1, 112, 112, 1) / 255.0).astype(np.float32)
        return img, aud

    img_tr, aud_tr = prep(img_tr, aud_tr)
    img_te, aud_te = prep(img_te, aud_te)
    train = ArrayDataset([img_tr[:55000], aud_tr[:55000]], lab_tr[:55000])
    val = ArrayDataset([img_tr[55000:], aud_tr[55000:]], lab_tr[55000:])
    test = ArrayDataset([img_te, aud_te], lab_te)
    return train, val, test


def get_data(args) -> DataBundle:
    data_dir = getattr(args, "data_path", "data/avmnist/")
    if os.path.exists(os.path.join(data_dir, "train_labels.npy")):
        train, val, test = _load_real(data_dir)
        synthetic = False
    else:
        print(f"[avmnist] real data not found under {data_dir!r}; "
              "using synthetic twin")
        train, val, test = make_synthetic_splits(
            "avmnist", int(args.num_classes), int(getattr(args, "seed", 0))
        )
        synthetic = True
    # the reference's train DataLoader passes neither a sampler nor
    # shuffle=True (avmnist/run_training.py:73-79; torch defaults to
    # shuffle=False), so training iterates the SAME sequential order
    # every epoch — preserved
    return DataBundle(train, val, test, train_sampler="sequential",
                      synthetic=synthetic)


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jlogits")
    module = AVMnistFusionNet(num_classes=int(args.num_classes),
                              dtype=resolve_dtype(args))
    contract = {
        "jlogits": "jlogits",
        "jprobas": "jprobas",
        "jprobas_jlogits": "jprobas",
        "ensemble": "ensemble",
        "ensemble_probas": "ensemble",
    }.get(model_type)
    if contract is None:
        raise NotImplementedError(f"avmnist model_type {model_type!r}")
    spec = ModelSpec(
        module=module,
        contract=contract,
        eval_fusion="logits" if model_type == "jprobas_jlogits" else None,
        report_logprobs=(model_type == "ensemble_probas"),
        # legacy dir trains on the MEAN of the per-modality losses
        # (avmnist/ensemble_model.py:195, ensemble_model_probas.py:205)
        ensemble_train_mean=True,
        # legacy runner has no ModelCheckpoint: test runs on the
        # final-epoch weights (avmnist/run_training.py:109-128)
        test_restore_best=False,
        # flat epoch-end metric names (val_loss / x1_val_acc /
        # avg_test_acc — joint_model.py:265-268,312-316)
        legacy_metric_aliases=True,
    )
    # legacy plain SGD (avmnist/joint_model.py:340-342)
    opt_kwargs = {"momentum": 0.0, "weight_decay": 0.0}
    return spec, opt_kwargs

"""Enrico benchmark: UI screenshot + wireframe images, 20 design topics.

Data (reference enrico/get_data.py:40-200): ``design_topics.csv`` with
screen ids + topics; corrupted ids {50105, 50109} dropped; deterministic
shuffle-split 65/15/20 by seed 42; images resized to 256x128 and scaled to
[0, 1]; inverse-frequency weighted train sampler.  The whole dataset is
~1.4k images, so it is decoded once up front into memory (the reference
re-decodes JPEG/PNG in every worker __getitem__ — a host hot loop).

Modality-noise experiments (enrico/get_data_noised.py:135-186): with
probability ``noise_p`` a sample's screenshot (x1) is swapped with one from
a different class, keeping x2 and the label; ``label_noise_p`` corrupts
labels uniformly.  Both reproduced here at load time.

Model variants (enrico/__init__.py factory):
  jlogits         — ResNet18Slim pair, frozen features (joint_model.py),
                    StepLR(10, 0.5)
  ensemble        — unfrozen features (ensemble_model.py), StepLR(70, 0.5)
  ensemble_vicreg — ensemble + VICReg(emb1, emb2) * 0.1
                    (ensemble_model_vicreg.py:151)
  ensemble_counts / jlogits_counts — analysis variants (per-head min-loss
                    counters / VGG11Slim backbone); mapped to their base
                    contracts (count streams tracked in eval outputs).
"""

from __future__ import annotations

import csv
import os
import random
from typing import Dict, Tuple

import numpy as np

from ..data.core import ArrayDataset
from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import EnricoFusionNet, EnricoVGGFusionNet

MODEL_TYPES = ("jlogits", "ensemble", "ensemble_vicreg", "ensemble_counts",
               "jlogits_counts")
IGNORES = {"50105", "50109"}


def _decode_image(path: str, size=(256, 128)) -> np.ndarray:
    """Exact-resize decode to (H, W, 3) uint8 — the post-resize stage of
    the reference's transforms.Resize((256, 128)); ToTensor's /255 runs on
    device (device_preprocess), so the in-memory dataset and the H2D
    transfer are 4x smaller than float32 (~0.28 GB vs ~1.1 GB for the full
    corpus — this VM faults memory lazily, so bytes are time).  JPEGs go
    through the native libjpeg path (DCT-domain downscale + bilinear) when
    built; PNGs (the wireframes) and fallback use PIL."""
    if path.endswith((".jpg", ".jpeg")):
        from ..data.imageops import _quantize_u8
        from ..utils.native import decode_jpeg

        out = decode_jpeg(path, size[0], size[1])
        if out is not None:
            return _quantize_u8(out)
    from PIL import Image

    # BILINEAR: torchvision Resize default (the reference's transform);
    # PIL's own default (BICUBIC) would diverge from both the reference
    # and the native decode path
    img = Image.open(path).convert("RGB").resize((size[1], size[0]),
                                                 resample=Image.BILINEAR)
    return np.asarray(img, np.uint8)  # (H, W, 3)


def _load_real(data_dir: str, seed42: int = 42):
    csv_file = os.path.join(data_dir, "design_topics.csv")
    with open(csv_file) as f:
        examples = [e for e in csv.DictReader(f) if e["screen_id"] not in IGNORES]
    topics = sorted({e["topic"] for e in examples})
    topic2idx = {t: i for i, t in enumerate(topics)}

    keys = list(range(len(examples)))
    random.Random(seed42).shuffle(keys)
    n = len(examples)
    splits = {
        "train": keys[: int(n * 0.65)],
        "val": keys[int(n * 0.65): int(n * 0.80)],
        "test": keys[int(n * 0.80):],
    }

    def build(split_keys):
        imgs, wires, labels = [], [], []
        for k in split_keys:
            e = examples[k]
            sid = e["screen_id"]
            imgs.append(_decode_image(os.path.join(data_dir, "screenshots",
                                                   sid + ".jpg")))
            wires.append(_decode_image(os.path.join(data_dir, "wireframes",
                                                    sid + ".png")))
            labels.append(topic2idx[e["topic"]])
        return ArrayDataset([np.stack(imgs), np.stack(wires)],
                            np.asarray(labels, np.int32))

    return build(splits["train"]), build(splits["val"]), build(splits["test"])


def _apply_noise(train: ArrayDataset, noise_p: float, label_noise_p: float,
                 num_classes: int, seed: int) -> ArrayDataset:
    """Cross-class x1 swap + label noise (enrico/get_data_noised.py:135-186)."""
    rng = np.random.default_rng((seed, 1234))
    x1, x2 = train.modalities
    labels = train.labels.copy()
    n = len(labels)
    if noise_p > 0:
        x1 = x1.copy()
        swap_mask = rng.random(n) < noise_p
        for i in np.nonzero(swap_mask)[0]:
            other = np.nonzero(labels != labels[i])[0]
            if len(other):
                x1[i] = train.modalities[0][rng.choice(other)]
    if label_noise_p > 0:
        flip = rng.random(n) < label_noise_p
        labels[flip] = rng.integers(0, num_classes, size=int(flip.sum()))
    return ArrayDataset([x1, x2], labels)


def get_data(args) -> DataBundle:
    data_dir = getattr(args, "data_path", "data/enrico/")
    if os.path.exists(os.path.join(data_dir, "design_topics.csv")):
        train, val, test = _load_real(data_dir)
        synthetic = False
    else:
        print(f"[enrico] real data not found under {data_dir!r}; "
              "using synthetic twin")
        train, val, test = make_synthetic_splits(
            "enrico", int(args.num_classes), int(getattr(args, "seed", 0)),
            n_train=128, n_val=32, n_test=32,
        )
        synthetic = True
    noise_p = float(getattr(args, "noise_p", 0.0) or 0.0)
    label_noise_p = float(getattr(args, "label_noise_p", 0.0) or 0.0)
    if noise_p or label_noise_p:
        train = _apply_noise(train, noise_p, label_noise_p,
                             int(args.num_classes),
                             int(getattr(args, "seed", 0)))
    return DataBundle(train, val, test, train_sampler="weighted",
                      synthetic=synthetic)


def load_pretrained(args, state):
    """Inject ImageNet resnet18 weights from a LOCAL torch checkpoint into
    both ResNet18Slim towers (config key ``torchvision_weights``).

    The reference downloads these at construction
    (enrico/joint_model.py:28 ``tmodels.resnet18(pretrained=True)``); in a
    zero-egress environment the checkpoint must be provided on disk (a
    torch ``state_dict`` saved with torch.save).  No-op when unset.
    """
    ckpt = getattr(args, "torchvision_weights", None)
    if not ckpt:
        return state
    import torch

    from ..models.torch_port import port_resnet_encoder

    sd = torch.load(ckpt, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    feats_p, feats_s = port_resnet_encoder(sd)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for tower in ("x1_model", "x2_model"):
        params[tower] = dict(params[tower])
        params[tower]["features"] = feats_p
        stats[tower] = dict(stats[tower])
        stats[tower]["features"] = feats_s
    print(f"[enrico] loaded torchvision resnet18 weights from {ckpt}")
    return state.replace(params=params, batch_stats=stats)


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jlogits")
    num_classes = int(args.num_classes)
    dropout_p = float(getattr(args, "dropout_p", 0.2) or 0.2)
    if model_type in ("jlogits", "jlogits_counts"):
        dt = resolve_dtype(args)
        if model_type == "jlogits_counts":
            module = EnricoVGGFusionNet(num_classes, dropout_p=dropout_p,
                                        dtype=dt)
            # VGG11Slim freezes its whole conv stack (inline Conv/BN layers)
            frozen = tuple(f"{t}/{m}" for t in ("x1_model", "x2_model")
                           for m in ("Conv_", "TorchBatchNorm_"))
        else:
            module = EnricoFusionNet(num_classes, freeze_features=True,
                                     dtype=dt)
            frozen = ("x1_model/features", "x2_model/features")
        spec = ModelSpec(module=module, contract="jlogits",
                         sched_step_size=10, sched_gamma=0.5,
                         frozen_prefixes=frozen,
                         track_min_loss_counts=(model_type == "jlogits_counts"))
    elif model_type in ("ensemble", "ensemble_counts"):
        module = EnricoFusionNet(num_classes, freeze_features=False,
                                 dtype=resolve_dtype(args))
        spec = ModelSpec(module=module, contract="ensemble",
                         sched_step_size=70, sched_gamma=0.5,
                         track_min_loss_counts=(model_type == "ensemble_counts"))
    elif model_type == "ensemble_vicreg":
        module = EnricoFusionNet(num_classes, freeze_features=False,
                                 dtype=resolve_dtype(args))
        spec = ModelSpec(module=module, contract="ensemble",
                         vicreg_weight=0.1,
                         sched_step_size=70, sched_gamma=0.5)
    else:
        # NB: the reference ships enrico/joint_model_proba.py (which would
        # train with bare Adam, joint_model_proba.py:282) but its factory
        # has no jprobas branch (enrico/__init__.py) — the file is
        # unreachable from the CLI, so no jprobas variant exists here either
        raise NotImplementedError(f"enrico model_type {model_type!r}")
    import dataclasses

    spec = dataclasses.replace(spec, device_preprocess=device_preprocess)
    return spec, {}


def device_preprocess(batch, rng, train: bool):
    """uint8-shipped screenshots/wireframes -> float32 in [0, 1] on device
    (the ToTensor stage of the reference transform — enrico applies no
    ImageNet normalization, enrico/get_data.py:94-103).  Float inputs (the
    synthetic twin) pass through unchanged."""
    from ..data.imageops import to_unit_floats_device

    batch = dict(batch)
    batch["x1"] = to_unit_floats_device(batch["x1"])
    batch["x2"] = to_unit_floats_device(batch["x2"])
    return batch

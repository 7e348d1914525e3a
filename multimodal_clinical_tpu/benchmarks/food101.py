"""UPMC Food-101 benchmark (north-star #2): recipe text + food image,
101-way, SigLIP dual-tower backbone.

Data (reference food101/get_data.py:101-117): precomputed SigLIP
``input_ids`` (64 tokens) and ``pixel_values`` (224x224) ``.npy`` tensors
per sample, listed by ``my_{train,dev,test}_food.txt``; idx appended for
qmf/lreg.  Pixel tensors are stored CHW by the HF processor and converted
to NHWC here.  Falls back to a synthetic twin when files are absent.

Model variants (food101/__init__.py factory):
  jlogits / ensemble — SigLIP towers fully trainable + two MLP heads
      (768->512->512->C, dropout 0.2), StepLR(50, 0.5)
      (food101/joint_model.py:83)
  ogm_ge — heads named x1_model/x2_model carry no 4-D params, so the
      modulation is the reference's documented no-op
      (food101/joint_model_ogm_ge.py, SURVEY §2.3)
  qmf — QMF loss over the two head logits (food101/joint_model_qmf.py)
  jprobas / jprobas_jlogits — the legacy frozen-ResNet50 + frozen-BERT
      towers (joint_model_proba.py / joint_model_proba_logits.py:30-90):
      x1 = image (B, 224, 224, 3), x2 = bert-base token ids; StepLR(500,
      0.75).  Weights port from LOCAL torchvision/HF checkpoints via
      ``resnet50_weights`` / ``bert_weights`` config keys (zero-egress:
      random init otherwise, documented divergence for absolute accuracy).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import Food101FusionNet, Food101LegacyFusionNet

MODEL_TYPES = ("jlogits", "ensemble", "ogm_ge", "qmf", "jprobas",
               "jprobas_jlogits")


class Food101DiskDataset:
    """Per-sample .npy token/pixel tensors read lazily at gather time."""

    def __init__(self, data_dir: str, split_file: str):
        self.data_dir = data_dir
        self.items = []
        with open(os.path.join(data_dir, split_file)) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 2:
                    self.items.append((parts[0], int(parts[1])))
        self.labels = np.asarray([l for _, l in self.items], np.int32)

    def __len__(self):
        return len(self.items)

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        toks, pixels, labels = [], [], []
        for i in indices:
            name, label = self.items[int(i)]
            stem = os.path.splitext(os.path.basename(name))[0]
            toks.append(np.load(os.path.join(self.data_dir, "tokens",
                                             stem + "_input_ids.npy")))
            px = np.load(os.path.join(self.data_dir, "tokens",
                                      stem + "_pixel_values.npy"))
            if px.ndim == 4:
                px = px[0]
            pixels.append(px.transpose(1, 2, 0))  # CHW -> HWC
            labels.append(label)
        return {
            "x1": np.stack(toks).astype(np.int32).reshape(len(indices), -1),
            "x2": np.stack(pixels).astype(np.float32),
            "label": np.asarray(labels, np.int32),
        }


LEGACY_TYPES = ("jprobas", "jprobas_jlogits")


def get_data(args) -> DataBundle:
    data_dir = getattr(args, "data_path", "data/food101/")
    if getattr(args, "model_type", "qmf") in LEGACY_TYPES:
        return _get_legacy_data(args, data_dir)
    train_txt = os.path.join(data_dir, "my_train_food.txt")
    if os.path.exists(train_txt):
        train = Food101DiskDataset(data_dir, "my_train_food.txt")
        val = Food101DiskDataset(data_dir, "my_dev_food.txt")
        test = Food101DiskDataset(data_dir, "my_test_food.txt")
        synthetic = False
    else:
        print(f"[food101] real data not found under {data_dir!r}; "
              "using synthetic twin")
        train, val, test = make_synthetic_splits(
            "food101", int(args.num_classes), int(getattr(args, "seed", 0)),
            n_train=128, n_val=32, n_test=32,
        )
        synthetic = True
    # the reference's train DataLoader passes neither a sampler nor
    # shuffle=True (food101/run_training.py:39-45; torch defaults to
    # shuffle=False) — sequential train order (my_train_food.txt order)
    # every epoch, preserved
    return DataBundle(train, val, test, train_sampler="sequential",
                      synthetic=synthetic)


def _get_legacy_data(args, data_dir: str) -> DataBundle:
    """Legacy pipeline (food101/get_data_old.py): raw JPEG + title text
    tokenized with bert-base-uncased WordPiece.  Real-data path: texts_
    {split}.csv (image_name, text, food) + images/{split}/<class>/<name>;
    synthetic twin otherwise."""
    csv_path = os.path.join(data_dir, "texts_train.csv")
    if os.path.exists(csv_path):
        from ..data.food101_legacy import Food101LegacyDiskDataset

        train = Food101LegacyDiskDataset(data_dir, "train", args)
        val = Food101LegacyDiskDataset(data_dir, "test", args)
        # the legacy variants run through the same sampler-less, shuffle-
        # less runner (food101/run_training.py:39-45) — get_data_old.py's
        # balanced_sampler is exercised only by its __main__ smoke block
        return DataBundle(train, val, val, train_sampler="sequential",
                          synthetic=False)
    print(f"[food101] legacy texts_train.csv not found under {data_dir!r}; "
          "using synthetic twin")
    train, val, test = make_synthetic_splits(
        "food101_legacy", int(args.num_classes),
        int(getattr(args, "seed", 0)), n_train=128, n_val=32, n_test=32)
    return DataBundle(train, val, test, train_sampler="sequential",
                      synthetic=True)


def _torch_state_dict(path: str) -> Dict:
    """Local torch/HF checkpoint -> raw state dict.  Accepts a file
    (.pth/.bin/.pt/.safetensors) or an HF snapshot dir."""
    if os.path.isdir(path):
        for cand in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(
                f"{path}: no model.safetensors / pytorch_model.bin")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
        sd = sd["state_dict"]  # lightning-style wrapper
    return sd


def load_pretrained(args, state):
    """Inject tower weights from LOCAL checkpoints.  No-op when unset.

      * ``siglip_weights`` — HF SigLIP snapshot dir for the default
        dual-tower variants.
      * ``resnet50_weights`` / ``bert_weights`` — torchvision resnet50 /
        HF bert-base checkpoints for the legacy jprobas variants
        (joint_model_proba_logits.py:52-66 loads IMAGENET1K_V2 +
        bert-base-uncased; zero-egress here, so the files must be local).
    """
    ckpt = getattr(args, "siglip_weights", None)
    if ckpt:
        from ..models.siglip import load_hf_siglip_params

        params = dict(state.params)
        params["model"] = load_hf_siglip_params(ckpt, params["model"])
        print(f"[food101] loaded SigLIP weights from {ckpt}")
        state = state.replace(params=params)

    r50 = getattr(args, "resnet50_weights", None)
    bert = getattr(args, "bert_weights", None)
    if not (r50 or bert):
        return state
    if "x1_model" not in state.params or "features" not in state.params[
            "x1_model"]:
        raise ValueError(
            "resnet50_weights/bert_weights apply to the legacy "
            "jprobas/jprobas_jlogits variants only (current model_type="
            f"{getattr(args, 'model_type', '?')!r})")
    from ..models.torch_port import port_bert, port_bottleneck_encoder

    params = dict(state.params)
    if r50:
        stages = tuple(getattr(args, "legacy_stages", (3, 4, 6, 3)))
        enc_params, enc_stats = port_bottleneck_encoder(
            _torch_state_dict(r50), stage_sizes=stages)
        params["x1_model"] = {**params["x1_model"], "features": enc_params}
        stats = dict(state.batch_stats)
        stats["x1_model"] = {**stats["x1_model"], "features": enc_stats}
        state = state.replace(batch_stats=stats)
        print(f"[food101] loaded resnet50 tower from {r50}")
    if bert:
        sd = _torch_state_dict(bert)
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
        enc = port_bert(sd, torch_prefix=prefix,
                        num_layers=int(getattr(args, "legacy_bert_layers",
                                               12)),
                        num_heads=int(getattr(args, "legacy_bert_heads",
                                              12)))
        params["x2_model"] = {**params["x2_model"], "model": enc}
        print(f"[food101] loaded BERT tower from {bert}")
    return state.replace(params=params)


def get_model_spec(args, n_train: int, mesh=None) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "qmf")
    # GPipe the SigLIP towers when the mesh carries a 'stage' axis
    # (mesh_shape: {data: D, stage: S} + pipeline_stages: S) — the
    # TPU-native scaling surface for towers deeper than one chip;
    # parallel/pipeline.py / models/siglip.PipelinedEncoderStack
    pp_stages = int(getattr(args, "pipeline_stages", 0) or 0)
    seq_sharding = bool(getattr(args, "sequence_sharding", False))
    module = Food101FusionNet(
        num_classes=int(args.num_classes), dtype=resolve_dtype(args),
        pipeline_stages=pp_stages,
        pipeline_microbatches=int(getattr(args, "pipeline_microbatches", 4)),
        sequence_sharding=seq_sharding,
        mesh=mesh if (pp_stages > 1 or seq_sharding) else None)
    common = dict(sched_step_size=50, sched_gamma=0.5)
    if model_type == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits", **common)
    elif model_type == "ensemble":
        spec = ModelSpec(module=module, contract="ensemble", **common)
    elif model_type == "ogm_ge":
        spec = ModelSpec(module=module, contract="ogm_ge",
                         grad_mod_type=getattr(args, "grad_mod_type", "OGM_GE"),
                         ogm_alpha=float(getattr(args, "alpha", 0.1)),
                         **common)
    elif model_type == "qmf":
        spec = ModelSpec(module=module, contract="qmf",
                         n_train_samples=n_train, **common)
    elif model_type in LEGACY_TYPES:
        legacy = Food101LegacyFusionNet(
            num_classes=int(args.num_classes),
            stage_sizes=tuple(getattr(args, "legacy_stages", (3, 4, 6, 3))),
            bert_layers=int(getattr(args, "legacy_bert_layers", 12)),
            bert_width=int(getattr(args, "legacy_bert_width", 768)),
            bert_heads=int(getattr(args, "legacy_bert_heads", 12)),
            bert_vocab=int(getattr(args, "legacy_bert_vocab", 30522)),
            dtype=resolve_dtype(args),
        )
        # StepLR(500, 0.75) — food101/joint_model_proba_logits.py:282
        spec = ModelSpec(
            module=legacy, contract="jprobas",
            frozen_prefixes=("x1_model/features", "x2_model/model"),
            eval_fusion="logits" if model_type == "jprobas_jlogits" else None,
            sched_step_size=500, sched_gamma=0.75)
    else:
        raise NotImplementedError(f"food101 model_type {model_type!r}")
    return spec, {}

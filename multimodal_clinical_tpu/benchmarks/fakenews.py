"""Fakeddit benchmark: post text + image, 6-way fake-news classification.

The reference left this benchmark BROKEN: fakenews/run_training.py:42-44
imports a ``joint_model`` module that does not exist, and fakenews/model.py
holds an older concat-fusion design outside the base-class hierarchy
(SURVEY §2.3).  This module completes the design in the framework's
late-fusion style: BERT-tokenized text through a small transformer tower +
a scratch ResNet18 image tower, jlogits/ensemble contracts.

Data: TSV with ``clean_title`` + image id + ``6_way_label`` columns
(fakenews/get_data.py tsv schema); text tokenized with the HF bert-base
tokenizer when available locally (transformers is baked in but weights may
not be — falls back to a hash-bucket tokenizer, documented divergence);
images decoded + resized to 224.  Synthetic twin when files are absent.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from ..data.synthetic import make_synthetic_splits
from ..engine.run import DataBundle
from ..engine.spec import ModelSpec, resolve_dtype
from ..models.zoo import FakeNewsEmbedFusionNet, FakeNewsFusionNet

MODEL_TYPES = ("jlogits", "ensemble", "jlogits_dialogue",
               "ensemble_dialogue", "jlogits_embed",
               "jlogits_embed_dialogue")


def _hash_tokenize(text: str, max_len: int, vocab: int) -> np.ndarray:
    """Stable hash-bucket tokenizer (crc32, NOT python hash(): str hashing
    is salted per interpreter, which would scramble the vocabulary across
    restarts/resume and across hosts)."""
    import zlib

    ids = [(zlib.crc32(tok.encode()) % (vocab - 2)) + 2
           for tok in text.lower().split()]
    ids = ids[:max_len]
    return np.asarray(ids + [0] * (max_len - len(ids)), np.int32)


class FakeNewsDiskDataset:
    def __init__(self, data_dir: str, tsv: str, max_len: int, vocab: int,
                 args=None):
        import csv as _csv

        self.data_dir = data_dir
        self.max_len = max_len
        self.vocab = vocab
        self.items = []
        with open(os.path.join(data_dir, tsv)) as f:
            for row in _csv.DictReader(f, delimiter="\t"):
                img = os.path.join(data_dir, "images", row["id"] + ".jpg")
                if os.path.exists(img):
                    self.items.append((row.get("clean_title", ""), img,
                                       int(row["6_way_label"])))
        self.labels = np.asarray([l for _, _, l in self.items], np.int32)
        # tokenizer priority: native WordPiece over a local vocab.txt
        # (bert_vocab_path config key or data_dir/vocab.txt) > native
        # SentencePiece over a local tokenizer.model/spiece.model
        # (spm_model_path key, data/spm.py) > HF tokenizer from local
        # files > crc32 hash buckets (documented fallback)
        from ..data.spm import load_spm
        from ..data.wordpiece import load_tokenizer

        args_ns = (args if args is not None
                   else type("A", (), {"data_path": data_dir})())
        self._tokenizer = None
        self._spm = None
        self._wordpiece = load_tokenizer(args_ns)
        if self._wordpiece is None:
            self._spm = load_spm(args_ns)
        if self._wordpiece is None and self._spm is None:
            try:
                from transformers import BertTokenizerFast

                self._tokenizer = BertTokenizerFast.from_pretrained(
                    "bert-base-uncased", local_files_only=True)
            except Exception:
                print("[fakenews] no vocab.txt/tokenizer.model and HF "
                      "tokenizer unavailable; hash tokenizer in use")

    def __len__(self):
        return len(self.items)

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        from PIL import Image

        toks, imgs, labels = [], [], []
        for i in indices:
            text, img_path, label = self.items[int(i)]
            if self._wordpiece is not None:
                toks.append(self._wordpiece.encode(text, self.max_len))
            elif self._spm is not None:
                ids = self._spm.encode(text)[: self.max_len]
                ids = ids + [max(self._spm.pad_id, 0)] * (self.max_len
                                                          - len(ids))
                toks.append(np.asarray(ids, np.int32))
            elif self._tokenizer is not None:
                enc = self._tokenizer(text, max_length=self.max_len,
                                      truncation=True, padding="max_length")
                toks.append(np.asarray(enc["input_ids"], np.int32))
            else:
                toks.append(_hash_tokenize(text, self.max_len, self.vocab))
            img = Image.open(img_path).convert("RGB").resize((224, 224))
            imgs.append(np.asarray(img, np.float32) / 255.0)
            labels.append(label)
        return {"x1": np.stack(toks), "x2": np.stack(imgs),
                "label": np.asarray(labels, np.int32)}


_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class FakeNewsEmbedDataset:
    """Precomputed-embedding dataset for the embed-fusion variants.

    Reads the dataframe pickle written by ``tools/preprocess.py
    fakenews-embed`` ({"id", "embedding", "label"[, "dialogue_embedding"]}
    — the TPU-native stand-in for the reference's
    ``preprocessed_*_dataframe_path`` pickles, fakenews/fakenews.yaml) and
    images from ``<data_dir>/images/<id>.jpg`` (model.py:24
    ``IMAGES_DIR``).  Images follow the reference's embed-model transform:
    resize to 224, scale to [0, 1], normalize with the torchvision
    imagenet mean/std (model.py:77-87 ``build_image_transform``).  Rows
    whose image file is missing are dropped at admission (the reference
    preprocessing guarantees image presence)."""

    def __init__(self, data_dir: str, pickle_path: str,
                 with_dialogue: bool, image_dim: int = 224):
        import pickle

        with open(pickle_path, "rb") as f:
            frame = pickle.load(f)
        self.data_dir = data_dir
        self.image_dim = image_dim
        self.with_dialogue = with_dialogue
        if with_dialogue and "dialogue_embedding" not in frame:
            raise ValueError(
                f"{pickle_path} has no 'dialogue_embedding' — rerun "
                "tools/preprocess.py fakenews-embed --dialogue")
        self.items = []
        for i, sid in enumerate(frame["id"]):
            img = os.path.join(data_dir, "images", str(sid) + ".jpg")
            if os.path.exists(img):
                self.items.append((i, img))
        keep = [i for i, _ in self.items]
        self.embeddings = np.asarray(frame["embedding"],
                                     np.float32)[keep]
        self.dialogue = (np.asarray(frame["dialogue_embedding"],
                                    np.float32)[keep]
                         if with_dialogue else None)
        self.labels = np.asarray(frame["label"], np.int32)[keep]

    def __len__(self):
        return len(self.items)

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        from PIL import Image

        imgs = []
        for i in indices:
            _, img_path = self.items[int(i)]
            img = Image.open(img_path).convert("RGB").resize(
                (self.image_dim, self.image_dim))
            arr = np.asarray(img, np.float32) / 255.0
            imgs.append((arr - _IMAGENET_MEAN) / _IMAGENET_STD)
        out = {"x1": self.embeddings[indices], "x2": np.stack(imgs),
               "label": self.labels[indices]}
        if self.dialogue is not None:
            out["x3"] = self.dialogue[indices]
        return out


def get_data(args) -> DataBundle:
    data_dir = getattr(args, "data_path", "data/fakenews/")
    max_len = int(getattr(args, "max_seq_len", 128))
    vocab = int(getattr(args, "vocab_size", 30522))
    model_type = str(getattr(args, "model_type", ""))
    if "_embed" in model_type:
        return _get_embed_data(args, data_dir)
    with_dialogue = model_type.endswith("_dialogue")
    train_tsv = os.path.join(data_dir, "train.tsv")
    if os.path.exists(train_tsv) and not with_dialogue:
        train = FakeNewsDiskDataset(data_dir, "train.tsv", max_len, vocab,
                                    args)
        val = FakeNewsDiskDataset(data_dir, "validate.tsv", max_len, vocab,
                                  args)
        test = FakeNewsDiskDataset(data_dir, "test.tsv", max_len, vocab,
                                   args)
        synthetic = False
    else:
        benchmark = "fakenews_dialogue" if with_dialogue else "fakenews"
        if with_dialogue and os.path.exists(train_tsv):
            print("[fakenews] dialogue variant needs a summarized-dialogue "
                  "column; using synthetic twin (see docs/DATASETS.md)")
        else:
            print(f"[fakenews] real data not found under {data_dir!r}; "
                  "using synthetic twin")
        train, val, test = make_synthetic_splits(
            benchmark, int(args.num_classes), int(getattr(args, "seed", 0)),
            n_train=64, n_val=32, n_test=32,
        )
        synthetic = True
    # the reference's train DataLoader passes neither a sampler nor
    # shuffle=True (fakenews/run_training.py:63-70; torch defaults to
    # shuffle=False) — sequential train order every epoch, preserved
    return DataBundle(train, val, test, train_sampler="sequential",
                      synthetic=synthetic)


def _get_embed_data(args, data_dir: str) -> DataBundle:
    """Embed-variant data: the reference's ``preprocessed_{train,val,
    test}_dataframe_path`` config keys (fakenews/fakenews.yaml) point at
    dataframe pickles; this repo's wire format for them is the one
    ``tools/preprocess.py fakenews-embed`` writes.  Defaults look next to
    ``data_path`` under the reference's file-name convention."""
    with_dialogue = str(getattr(args, "model_type", "")).endswith("_dialogue")
    infix = "text_image_dialogue" if with_dialogue else "text_image"
    paths = {}
    for split in ("train", "val", "test"):
        p = getattr(args, f"preprocessed_{split}_dataframe_path", None)
        paths[split] = p or os.path.join(
            data_dir, f"{split}__{infix}_dataframe.pkl")
    if all(os.path.exists(p) for p in paths.values()):
        splits = [FakeNewsEmbedDataset(data_dir, paths[s], with_dialogue)
                  for s in ("train", "val", "test")]
        synthetic = False
    else:
        missing = [p for p in paths.values() if not os.path.exists(p)]
        print(f"[fakenews] embed dataframes not found ({missing[0]}, ...); "
              "using synthetic twin")
        name = ("fakenews_embed_dialogue" if with_dialogue
                else "fakenews_embed")
        splits = make_synthetic_splits(
            name, int(args.num_classes), int(getattr(args, "seed", 0)),
            n_train=64, n_val=32, n_test=32,
        )
        synthetic = True
    # same loader wiring as the token variants: sequential everywhere
    # (fakenews/run_training.py:63-88)
    return DataBundle(*splits, train_sampler="sequential",
                      synthetic=synthetic)


def load_pretrained(args, state):
    """Inject the embed variant's image tower from a LOCAL torchvision
    resnet152 checkpoint (``resnet152_weights`` config key) — the
    reference builds its image module with
    ``torchvision.models.resnet152(pretrained=True)``
    (fakenews/model.py:238), which needs egress; here the state dict must
    be a local file.  No-op when unset."""
    ckpt = getattr(args, "resnet152_weights", None)
    if not ckpt:
        return state
    if "image_module" not in state.params:
        raise ValueError(
            "resnet152_weights applies to the jlogits_embed[_dialogue] "
            "variants only (current model_type="
            f"{getattr(args, 'model_type', '?')!r})")
    from ..models.torch_port import port_bottleneck_encoder
    from .food101 import _torch_state_dict

    stages = tuple(getattr(args, "embed_stage_sizes", (3, 8, 36, 3)))
    enc_params, enc_stats = port_bottleneck_encoder(
        _torch_state_dict(ckpt), stage_sizes=stages)
    params = dict(state.params)
    params["image_module"] = enc_params
    stats = dict(state.batch_stats)
    stats["image_module"] = enc_stats
    print(f"[fakenews] loaded resnet152 tower from {ckpt}")
    return state.replace(params=params, batch_stats=stats)


def get_model_spec(args, n_train: int) -> Tuple[ModelSpec, Dict]:
    model_type = getattr(args, "model_type", "jlogits")
    with_dialogue = model_type.endswith("_dialogue")
    if "_embed" in model_type:
        # the reference's one RUNNABLE fakenews model: concat fusion over
        # precomputed embeddings + resnet152 (fakenews/model.py:34-257).
        # Single fused head -> jlogits contract with num_modality=1.
        module = FakeNewsEmbedFusionNet(
            num_classes=int(args.num_classes),
            embedding_dim=int(getattr(args, "text_embed_dim", 768)),
            with_dialogue=with_dialogue,
            image_stage_sizes=tuple(getattr(args, "embed_stage_sizes",
                                            (3, 8, 36, 3))),
            dropout_p=float(getattr(args, "dropout_p", 0.1)),
            dtype=resolve_dtype(args),
        )
        spec = ModelSpec(
            module=module, contract="jlogits", num_modality=1,
            num_inputs=3 if with_dialogue else 2,
            # legacy standalone dir: no ModelCheckpoint, final-epoch test,
            # flat epoch-end aliases (model.py:207-226 test_epoch_end)
            test_restore_best=False, legacy_metric_aliases=True)
        # bare Adam with the module-scope LEARNING_RATE=1e-4 constant
        # (fakenews/model.py:18,229-232 — same protocol as the token path)
        return spec, {"optimizer": "adam", "lr_override": 1.0e-4}
    module = FakeNewsFusionNet(
        num_classes=int(args.num_classes),
        vocab_size=int(getattr(args, "vocab_size", 30522)),
        with_dialogue=with_dialogue,
        dtype=resolve_dtype(args),
    )
    num_modality = 3 if with_dialogue else 2
    base = model_type.replace("_dialogue", "")
    # legacy standalone runner: no ModelCheckpoint — trainer.test(model)
    # runs the FINAL-epoch weights (fakenews/run_training.py:103-127)
    common = dict(num_modality=num_modality, test_restore_best=False,
                  # flat test epoch-end names (fakenews/model.py:210-213);
                  # NB the reference model has NO validation_step at all —
                  # Lightning skips val despite run_training passing a val
                  # loader; our val epoch (and its aliases) is additive
                  legacy_metric_aliases=True)
    if base == "jlogits":
        spec = ModelSpec(module=module, contract="jlogits", **common)
    elif base == "ensemble":
        spec = ModelSpec(module=module, contract="ensemble", **common)
    else:
        raise NotImplementedError(f"fakenews model_type {model_type!r}")
    # bare Adam with the module-scope LEARNING_RATE=1e-4 constant — the
    # model ignores args.lr entirely (fakenews/model.py:18,230), so the
    # config's learning_rate never reaches the optimizer; torch defaults,
    # no scheduler (use_scheduler: False in fakenews.yaml:33)
    return spec, {"optimizer": "adam", "lr_override": 1.0e-4}

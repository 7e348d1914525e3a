"""Config resolution + seeding for the ``python main.py --dir <dataset>`` CLI.

Mirrors the reference flow (utils/setup_configs.py:7-35): parse ``--dir``,
deep-merge ``base_cfg.yaml`` with ``<dataset>.yaml``, flatten keys onto an
argparse-style namespace, and seed everything.  Config files live under
``configs/`` at the repo root (``configs/base_cfg.yaml`` +
``configs/<dataset>.yaml``) with the same key schema as the reference; for
drop-in compatibility we also accept the reference's layout
(``utils/base_cfg.yaml`` + ``<dir>/<dir>.yaml``) when those files exist.

Seeding is TPU-native: one integer seed feeds both the Python/NumPy host RNGs
(data order, samplers) and the root ``jax.random.PRNGKey`` threaded through
the TrainState.
"""

from __future__ import annotations

import argparse
import os
import random
from types import SimpleNamespace
from typing import Any, Dict, Optional

import numpy as np

from .merge import load_and_merge_yaml

# Repo root = two levels above this file's package.
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

KNOWN_DATASETS = (
    "avmnist",
    "mimic",
    "enrico",
    "cremad",
    "food101",
    "ave",
    "vggsound",
    "mustard",
    "fakenews",
)


def _config_paths(dataset_dir: str, root: Optional[str] = None):
    """Resolve (base, override) YAML paths for a dataset name.

    Prefers this repo's ``configs/`` layout; falls back to the reference's
    ``utils/base_cfg.yaml`` + ``<dir>/<dir>.yaml`` layout so existing configs
    can be used unmodified.
    """
    root = root or _REPO_ROOT
    new_base = os.path.join(root, "configs", "base_cfg.yaml")
    new_override = os.path.join(root, "configs", dataset_dir + ".yaml")
    if os.path.exists(new_base) and os.path.exists(new_override):
        return new_base, new_override
    ref_base = os.path.join(root, "utils", "base_cfg.yaml")
    ref_override = os.path.join(root, dataset_dir, dataset_dir + ".yaml")
    if os.path.exists(ref_base) and os.path.exists(ref_override):
        return ref_base, ref_override
    raise FileNotFoundError(
        f"No config found for dataset '{dataset_dir}' (looked for "
        f"{new_override} and {ref_override})"
    )


def seed_everything(seed: int) -> int:
    """Seed host RNGs deterministically (JAX keys are derived per-use).

    Note: PYTHONHASHSEED is deliberately NOT set here — it cannot affect
    the already-running interpreter's string hashing (only child python
    processes), so setting it would advertise determinism it doesn't
    provide.  Nothing in this repo depends on str-hash ordering (the
    fakenews tokenizer uses crc32 for exactly that reason)."""
    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed)
    return seed


def config_to_args(cfg: Dict[str, Any]) -> SimpleNamespace:
    args = SimpleNamespace()
    for key, val in cfg.items():
        setattr(args, key, val)
    return args


def load_config(dataset_dir: str, root: Optional[str] = None,
                overrides: Optional[Dict[str, Any]] = None) -> SimpleNamespace:
    """Load merged config for a dataset and return a flat namespace."""
    base_file, override_file = _config_paths(dataset_dir, root)
    cfg = load_and_merge_yaml(base_file, override_file)
    if overrides:
        cfg.update(overrides)
    args = config_to_args(cfg)
    args.dir = dataset_dir
    seed_everything(getattr(args, "seed", 0))
    return args


def setup_configs(argv=None) -> SimpleNamespace:
    """Parse ``--dir`` (plus optional ``--seed``/``--set k=v``) and load config."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", type=str, default=None)
    parser.add_argument("--config", type=str, default=None,
                        help="single YAML merged over base_cfg (the legacy "
                             "runners' flag, e.g. ave/run_training.py:28-37); "
                             "the dataset is inferred from the file stem")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the run's rolling 'last' checkpoint")
    parser.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="override any config key, e.g. --set model_type=qmf",
    )
    args_cli = parser.parse_args(argv)
    if not args_cli.dir and not args_cli.config:
        raise NotImplementedError("No directory provided, please specify flag --dir")

    overrides: Dict[str, Any] = {}
    if args_cli.config:
        # legacy single-yaml mode (ave/run_training.py:28-37): the file's
        # contents become overrides on top of the normal base+dataset
        # merge.  Without --dir the dataset name is the file stem; with
        # --dir the file still applies (silently dropping it would let a
        # user train with the wrong hyperparameters, believing they took)
        from .merge import load_yaml

        if not args_cli.dir:
            args_cli.dir = os.path.splitext(
                os.path.basename(args_cli.config))[0]
        overrides.update(load_yaml(args_cli.config))
    for item in args_cli.set:
        key, _, raw = item.partition("=")
        try:
            import yaml

            overrides[key] = yaml.safe_load(raw)
        except Exception:
            overrides[key] = raw
    if args_cli.seed is not None:
        overrides["seed"] = args_cli.seed
    overrides["resume"] = bool(args_cli.resume)

    return load_config(args_cli.dir, overrides=overrides)

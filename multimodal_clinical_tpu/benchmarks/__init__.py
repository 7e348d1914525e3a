"""Benchmark registry: ``--dir <name>`` -> benchmark module.

Each benchmark module exposes
    get_data(args) -> engine.run.DataBundle
    get_model_spec(args, n_train) -> (engine.spec.ModelSpec, opt_kwargs)
mirroring the reference's per-dataset ``get_data`` / ``get_model`` factories
(e.g. cremad/__init__.py:4-23, main.py:8-17).
"""

from __future__ import annotations

import importlib

_REGISTRY = {
    "avmnist": ".avmnist",
    "mimic": ".mimic",
    "enrico": ".enrico",
    "cremad": ".cremad",
    "food101": ".food101",
    "ave": ".ave",
    "vggsound": ".vggsound",
    "mustard": ".mustard",
    "fakenews": ".fakenews",
}


def get_benchmark(name: str):
    if name not in _REGISTRY:
        raise NotImplementedError(
            f"unknown benchmark {name!r}; known: {sorted(_REGISTRY)}"
        )
    return importlib.import_module(_REGISTRY[name], package=__name__)


def available() -> list:
    return sorted(_REGISTRY)

"""YAML deep-merge config loading.

Byte-compatible with the reference's two-layer config scheme
(utils/merge_yaml.py:3-20): a base YAML provides defaults, a per-dataset
YAML overrides it with a recursive dict merge (override wins; nested dicts
merge key-by-key; non-dict values are replaced).
"""

from __future__ import annotations

from typing import Any, Dict

import yaml


def deep_merge(dct: Dict[str, Any], merge_dct: Dict[str, Any]) -> None:
    """Recursively merge ``merge_dct`` into ``dct`` in place (override wins)."""
    for key, value in merge_dct.items():
        if key in dct and isinstance(dct[key], dict) and isinstance(value, dict):
            deep_merge(dct[key], value)
        else:
            dct[key] = value


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        loaded = yaml.safe_load(f)
    return loaded or {}


def load_and_merge_yaml(base_filepath: str, override_filepath: str) -> Dict[str, Any]:
    """Load two YAML files and deep-merge (override file takes precedence)."""
    base_config = load_yaml(base_filepath)
    override_config = load_yaml(override_filepath)
    deep_merge(base_config, override_config)
    return base_config

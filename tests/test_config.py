"""Config-system tests: deep-merge semantics + --dir resolution."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_clinical_tpu.config import (  # noqa: E402
    KNOWN_DATASETS,
    deep_merge,
    load_config,
    setup_configs,
)


def test_deep_merge_override_wins():
    base = {"a": 1, "b": {"c": 2, "d": 3}, "e": [1, 2]}
    over = {"b": {"c": 9}, "e": [7], "f": "new"}
    deep_merge(base, over)
    assert base == {"a": 1, "b": {"c": 9, "d": 3}, "e": [7], "f": "new"}


def test_deep_merge_replaces_non_dicts():
    base = {"x": {"y": 1}}
    deep_merge(base, {"x": 5})
    assert base == {"x": 5}


def test_deep_merge_nested_three_levels():
    base = {"a": {"b": {"c": 1, "d": 2}}}
    deep_merge(base, {"a": {"b": {"c": 10}}})
    assert base == {"a": {"b": {"c": 10, "d": 2}}}


@pytest.mark.parametrize("name", KNOWN_DATASETS)
def test_all_dataset_configs_load(name):
    args = load_config(name)
    # base schema keys present on every benchmark
    for key in ("num_classes", "batch_size", "learning_rate", "num_epochs",
                "data_path", "model_type", "group_name", "seed"):
        assert hasattr(args, key), f"{name} missing {key}"
    assert args.dir == name


def test_setup_configs_cli_overrides():
    args = setup_configs(["--dir", "avmnist", "--seed", "123",
                          "--set", "batch_size=8", "--set", "model_type=ensemble"])
    assert args.seed == 123
    assert args.batch_size == 8
    assert args.model_type == "ensemble"


def test_setup_configs_requires_dir():
    with pytest.raises(NotImplementedError):
        setup_configs([])


def test_step_metric_name_fixups():
    from multimodal_clinical_tpu.engine.metrics import step_metric_name

    # step-level naming quirk preserved (BaseModel.py:99 vs 124)
    assert step_metric_name("train", "train_x1_acc_uncal") == \
        "train_step/train_x1_uncal_acc"
    assert step_metric_name("train", "train_loss") == "train_step/train_loss"
    assert step_metric_name("val", "val_acc") == "val_step/val_acc"


def test_setup_configs_legacy_config_flag(tmp_path):
    # legacy runners take a single --config yaml (ave/run_training.py:28-37)
    cfg = tmp_path / "avmnist.yaml"
    cfg.write_text("batch_size: 12\nmodel_type: ensemble\n")
    args = setup_configs(["--config", str(cfg)])
    assert args.dir == "avmnist"
    assert args.batch_size == 12
    assert args.model_type == "ensemble"
    assert args.num_classes == 10  # from configs/avmnist.yaml base merge


def test_setup_configs_config_with_dir_applies_overlay(tmp_path):
    # --config alongside --dir must apply (not be silently dropped)
    cfg = tmp_path / "tuned.yaml"
    cfg.write_text("batch_size: 24\nlearning_rate: 0.5\n")
    args = setup_configs(["--dir", "avmnist", "--config", str(cfg)])
    assert args.dir == "avmnist"
    assert args.batch_size == 24
    assert args.learning_rate == 0.5
    # --set still wins over the --config overlay
    args2 = setup_configs(["--dir", "avmnist", "--config", str(cfg),
                           "--set", "batch_size=4"])
    assert args2.batch_size == 4


def test_trainer_arg_quirks_match_reference_runners():
    """Per-dir pl.Trainer kwargs the reference runners override:

    * log_every_n_steps=10 on avmnist/mustard (avmnist/run_training.py:117,
      mustard/run_training.py:120); every other runner passes 30
      (utils/run_trainer.py:49 and the standalone runners).
    * precision: mustard alone trains at full fp32 — precision="32"
      (mustard/run_training.py:118) — while every other dir is
      "bf16-mixed" (utils/run_trainer.py:47, avmnist/run_training.py:115).
    """
    for name in KNOWN_DATASETS:
        args = load_config(name)
        expect_log = 10 if name in ("avmnist", "mustard") else 30
        assert args.log_every_n_steps == expect_log, name
        expect_dtype = "float32" if name == "mustard" else "bfloat16"
        assert args.compute_dtype == expect_dtype, name

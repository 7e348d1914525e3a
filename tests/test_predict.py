"""Batch-inference CLI (tools/predict.py): train -> checkpoint -> predict
round trip; prediction accuracy must reproduce the trainer's test accuracy
(same jitted eval program, same fusion math)."""

import csv
import os
import sys

import numpy as np
import pytest

from multimodal_clinical_tpu.benchmarks import avmnist

from test_engine_extras import build_trainer, make_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.mark.parametrize("model_type", ["jlogits", "jprobas"])
def test_predict_matches_trainer_test(tmp_path, model_type):
    import predict as predict_mod

    args = make_args(num_epochs=2, batch_size=16, ckpt_dir=str(tmp_path),
                     model_type=model_type)
    trainer, data = build_trainer(avmnist, args)
    trainer.fit()
    test_summary = trainer.test()

    rows, summary = predict_mod.predict(
        args, avmnist, split="test", ckpt_dir=trainer.ckpt.ckpt_dir,
        which="best")
    assert summary["n"] == len(data.test)
    assert abs(summary["acc"]
               - test_summary["test_epoch/test_avg_acc"]) < 1e-6

    # row schema: idx, label, pred, per-modality preds, fused logprob
    idxs = {r[0] for r in rows}
    assert idxs == set(range(len(data.test)))
    for r in rows:
        assert 0 <= r[1] < 4 and 0 <= r[2] < 4
        assert len(r) == 3 + 2 + 1
        assert r[-1] <= 0 or np.isclose(r[-1], 0)


def test_predict_last_checkpoint(tmp_path):
    import predict as predict_mod

    args = make_args(num_epochs=1, batch_size=16, ckpt_dir=str(tmp_path))
    trainer, data = build_trainer(avmnist, args)
    trainer.fit()
    rows, summary = predict_mod.predict(
        args, avmnist, split="val", ckpt_dir=trainer.ckpt.ckpt_dir,
        which="last")
    assert summary["n"] == len(data.val)
    assert 0.0 <= summary["acc"] <= 1.0

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


def test_predict_train_split_one_row_per_sample(tmp_path):
    """enrico's train loader samples WITH replacement (weighted sampler)
    and gathers in train mode; predict --split train must bypass both and
    emit exactly one deterministic row per sample."""
    import predict as predict_mod

    from multimodal_clinical_tpu.benchmarks import enrico

    args = make_args(model_type="jlogits", num_epochs=1, batch_size=16,
                     ckpt_dir=str(tmp_path))
    trainer, data = build_trainer(enrico, args)
    trainer.fit()
    rows, summary = predict_mod.predict(
        args, enrico, split="train", ckpt_dir=trainer.ckpt.ckpt_dir,
        which="best")
    assert summary["n"] == len(data.train)
    assert sorted(r[0] for r in rows) == list(range(len(data.train)))


def test_predict_ensemble_fusion_is_eval_mean(tmp_path):
    """mimic's w1/w2 weighting is TRAIN-only: the reference's test step
    fuses the PLAIN mean (x1+x2)/2 (mimic/ensemble_model.py:234-239), so
    the CSV's fused_logprob column must use exactly that fusion even when
    spec.fusion_weights=(0.8, 1.5) is set for the train loss."""
    import jax
    import predict as predict_mod

    from multimodal_clinical_tpu.benchmarks import mimic
    from multimodal_clinical_tpu.engine.checkpoint import BestCheckpointer
    from multimodal_clinical_tpu.engine.run import (
        build_loaders, init_state_on_mesh,
    )
    from multimodal_clinical_tpu.engine.steps import make_eval_step
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    args = make_args(model_type="ensemble", num_classes=6, num_epochs=1,
                     batch_size=16, ckpt_dir=str(tmp_path))
    trainer, data = build_trainer(mimic, args)
    trainer.fit()
    rows, _ = predict_mod.predict(
        args, mimic, split="test", ckpt_dir=trainer.ckpt.ckpt_dir,
        which="best")
    got = {r[0]: r[-1] for r in rows}

    # independent recomputation with the explicit eval-mean formula
    mesh = make_mesh()
    spec, opt_kwargs = mimic.get_model_spec(args, n_train=len(data.train))
    assert spec.fusion_weights == (0.8, 1.5)
    state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    state = BestCheckpointer(trainer.ckpt.ckpt_dir).restore_best(state)
    eval_step = make_eval_step(spec)
    _, _, test_loader = build_loaders(args, data, mesh)
    for batch in test_loader:
        out = eval_step(state, batch)
        stack = np.asarray(out["logits_stack"], np.float32)
        valid = np.asarray(out["valid"]) > 0
        idx = np.asarray(jax.device_get(batch["idx"]))
        fused = (stack[:, 0] + stack[:, 1]) / 2
        shifted = fused - fused.max(-1, keepdims=True)
        logp = shifted - np.log(np.exp(shifted).sum(-1, keepdims=True))
        for b in range(len(idx)):
            if valid[b]:
                np.testing.assert_allclose(
                    got[int(idx[b])], logp[b].max(), rtol=1e-5, atol=1e-5)


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

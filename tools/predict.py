"""Batch inference CLI: load a trained checkpoint, run the eval step over
a split, and export per-sample predictions.

The reference has no inference surface at all — its flow ends at
`run_trainer`'s test epoch.  This tool closes the train->serve loop:

    python tools/predict.py --dir cremad --ckpt data/cremad_ckpts/<group>/ckpt \\
        [--split test|val|train] [--which best|last] [--out preds.csv]
        [--set key=value ...]

Writes one CSV row per (valid) sample: sample idx, label, fused argmax
prediction, per-modality argmax predictions, and the fused max
log-probability — the artifact downstream calibration / error-analysis
tooling (mimic/analyze_data.py style) consumes.  Uses the same jitted
eval program as validation, so serving numerics == eval numerics.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

import numpy as np


def predict(args, benchmark, split: str, ckpt_dir: str, which: str):
    """Returns (rows, summary): per-sample prediction rows + accuracy."""
    import jax

    from multimodal_clinical_tpu.engine.checkpoint import BestCheckpointer
    from multimodal_clinical_tpu.engine.run import (
        build_loaders, init_state_on_mesh,
    )
    from multimodal_clinical_tpu.engine.steps import make_eval_step
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(getattr(args, "mesh_shape", None) or None)
    data = benchmark.get_data(args)
    spec, opt_kwargs = benchmark.get_model_spec(args, n_train=len(data.train))
    state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)

    ck = BestCheckpointer(ckpt_dir)
    if which == "last":
        restored = ck.restore_last(state)
        if restored is None:
            raise FileNotFoundError(f"no rolling checkpoint under {ckpt_dir}")
        state = restored
    else:
        state = ck.restore_best(state)
        if state is None or ck.best_path is None:
            raise FileNotFoundError(f"no best checkpoint under {ckpt_dir}")

    if split == "train":
        # Inference over the train split must be one deterministic row per
        # sample: bypass the training sampler policy (cremad/ave/enrico/
        # vggsound use with-replacement weighted sampling) and gather in
        # eval mode (no random augmentation).
        import copy
        from dataclasses import replace

        eval_train = copy.copy(data.train)
        if hasattr(eval_train, "train"):
            eval_train.train = False
        data = replace(data, train=eval_train, train_sampler="sequential")
    loaders = dict(zip(("train", "val", "test"),
                       build_loaders(args, data, mesh)))
    loader = loaders[split]
    eval_step = make_eval_step(spec)

    # contract-faithful eval fusion over the reported stack:
    #   jprobas reports LOG-PROBS and fuses mean PROBABILITY;
    #   everything else (incl. ensemble) fuses the plain logits mean —
    #   mimic's w1/w2 weighting is TRAIN-only; its test step fuses
    #   (x1+x2)/2 (mimic/ensemble_model.py:234-239).
    prob_fusion = (spec.contract == "jprobas"
                   and (spec.eval_fusion or "probas") == "probas")

    def fuse(stack):
        if prob_fusion:
            return np.exp(stack).mean(axis=1)        # mean probability
        return stack.mean(axis=1)

    rows = []
    n_correct = 0
    for batch in loader:
        out = eval_step(state, batch)
        stack = np.asarray(out["logits_stack"], np.float32)  # (B, M, C)
        label = np.asarray(out["label"])
        valid = np.asarray(out["valid"]) > 0
        idx = np.asarray(jax.device_get(batch["idx"]))
        fused = fuse(stack)
        if prob_fusion:
            logp = np.log(np.maximum(fused, 1e-30))
        else:
            shifted = fused - fused.max(-1, keepdims=True)
            logp = shifted - np.log(np.exp(shifted).sum(-1, keepdims=True))
        pred = fused.argmax(-1)
        uni_preds = stack.argmax(-1)                 # (B, M)
        for b in range(len(label)):
            if not valid[b]:
                continue
            n_correct += int(pred[b] == label[b])
            rows.append([int(idx[b]), int(label[b]), int(pred[b]),
                         *[int(p) for p in uni_preds[b]],
                         float(logp[b, pred[b]])])
    acc = n_correct / max(len(rows), 1)
    return rows, {"n": len(rows), "acc": acc}


def main(argv=None):
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint dir (the trainer's <run_dir>/ckpt)")
    ap.add_argument("--split", choices=("train", "val", "test"),
                    default="test")
    ap.add_argument("--which", choices=("best", "last"), default="best")
    ap.add_argument("--out", default=None,
                    help="CSV path (default <ckpt>/predictions_<split>.csv)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--set", action="append", default=[],
                    metavar="key=value")
    a = ap.parse_args(argv)

    from multimodal_clinical_tpu.benchmarks import get_benchmark
    from multimodal_clinical_tpu.config import setup_configs

    cfg_argv = ["--dir", a.dir]
    if a.seed is not None:
        cfg_argv += ["--seed", str(a.seed)]
    for kv in a.set:
        cfg_argv += ["--set", kv]
    args = setup_configs(cfg_argv)
    benchmark = get_benchmark(args.dir)

    rows, summary = predict(args, benchmark, a.split, a.ckpt, a.which)
    num_mod = len(rows[0]) - 4 if rows else 2
    out_path = a.out or os.path.join(a.ckpt, f"predictions_{a.split}.csv")
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["idx", "label", "pred",
                    *[f"pred_x{m + 1}" for m in range(num_mod)],
                    "fused_logprob"])
        w.writerows(rows)
    print(f"[predict] {summary['n']} samples, {a.split} acc "
          f"{summary['acc']:.4f} -> {out_path}")
    return summary


if __name__ == "__main__":
    main()

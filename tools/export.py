"""Serving export: package a trained model as a portable StableHLO artifact.

The reference has no deployment surface (its flow ends at the test epoch).
This tool closes the loop TPU-natively via ``jax.export``: the eval-mode
forward — INCLUDING the contract-faithful fusion and any on-device
preprocessing (e.g. the VGGSound Pallas STFT) — is lowered once, weights
baked in as constants, and serialized to a self-contained artifact any
JAX runtime can execute without this codebase:

    python tools/export.py --dir mimic --ckpt data/mimic_ckpts/<g>/ckpt \\
        [--which best|last] [--batch 8] [--out <dir>] [--platforms cpu,tpu]

Artifact layout:
    <out>/serving.stablehlo   jax.export serialization (weights embedded)
    <out>/meta.json           input signature + contract + provenance

Loading (no framework needed beyond jax):
    from tools.export import load_artifact
    serve = load_artifact("<out>")
    out = serve(x1, x2)   # {"logprobs", "pred", "logits_stack"}

Serving numerics == eval numerics: the exported function is the same
fusion used by validation (jprobas fuses mean probability, everything else
— incl. ensemble; the mimic w1/w2 weighting is train-only — the plain
logits mean; utils/BaseModel.py + mimic/ensemble_model.py:234-239
semantics preserved via engine/contracts.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

import numpy as np


def build_serving_fn(spec, state, input_keys):
    """Eval-mode forward + contract fusion as a pure function of the raw
    modality inputs (weights closed over -> baked into the export).
    ``input_keys`` are the loader batch keys (e.g. ``x1_waveform`` for
    corpora whose DSP runs on-device)."""
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.engine import contracts as C
    from multimodal_clinical_tpu.engine.steps import _forward

    prob_fusion = (spec.contract == "jprobas"
                   and (spec.eval_fusion or "probas") == "probas")

    def serve(*inputs):
        batch = dict(zip(input_keys, inputs))
        n = inputs[0].shape[0]
        batch["label"] = jnp.zeros((n,), jnp.int32)
        batch["valid"] = jnp.ones((n,), jnp.float32)
        batch["idx"] = jnp.arange(n, dtype=jnp.int32)
        if spec.device_preprocess is not None:
            batch = spec.device_preprocess(batch, jax.random.PRNGKey(0),
                                           False)
        out, _ = _forward(state, state.params, batch, spec, False, None)
        logits = out["logits"]
        # match make_eval_step's logits_stack semantics exactly: jprobas
        # reports per-modality LOG-PROBS (steps.py eval path), everything
        # else raw logits — so artifact consumers and predict.py agree
        report = C.to_logprobs(logits) if prob_fusion else logits
        stack = jnp.stack([r.astype(jnp.float32) for r in report], axis=1)
        if prob_fusion:
            fused = C.fuse_probas(logits)
            logp = jax.nn.log_softmax(fused)
        else:
            # plain logits mean — the mimic w1/w2 weighting is train-only
            # (mimic/ensemble_model.py:234-239 test step fuses (x1+x2)/2)
            fused = C.fuse_logits(logits)
            logp = jax.nn.log_softmax(fused.astype(jnp.float32))
        return {
            "logprobs": logp,
            "pred": jnp.argmax(logp, axis=-1).astype(jnp.int32),
            "logits_stack": stack,
        }

    return serve


def input_signature(spec, args, data, batch: int):
    """(keys, ShapeDtypeStructs) of the raw per-modality inputs, drawn from
    one real (or synthetic-twin) sample so the export matches the loader."""
    import jax

    sample = data.test.gather(np.arange(min(2, len(data.test))))
    keys, sig = [], []
    for i in range(spec.num_inputs or spec.num_modality):
        wf = f"x{i + 1}_waveform"
        key = wf if wf in sample else f"x{i + 1}"
        arr = sample[key]
        keys.append(key)
        sig.append(jax.ShapeDtypeStruct((batch,) + arr.shape[1:], arr.dtype))
    return keys, sig


def export_benchmark(args, benchmark, ckpt_dir, which, batch, out_dir,
                     platforms):
    import jax

    from multimodal_clinical_tpu.engine.checkpoint import BestCheckpointer
    from multimodal_clinical_tpu.engine.run import init_state_on_mesh
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(getattr(args, "mesh_shape", None) or None)
    data = benchmark.get_data(args)
    spec, opt_kwargs = benchmark.get_model_spec(args, n_train=len(data.train))
    state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    if ckpt_dir:
        ck = BestCheckpointer(ckpt_dir)
        if which == "last":
            restored = ck.restore_last(state)
            if restored is None:
                raise FileNotFoundError(
                    f"no rolling checkpoint under {ckpt_dir}")
            state = restored
        else:
            # restore_best returns the input state unchanged when nothing
            # exists — guard via best_path so a typo'd --ckpt can't silently
            # export fresh-init weights
            state = ck.restore_best(state)
            if ck.best_path is None:
                raise FileNotFoundError(
                    f"no best checkpoint under {ckpt_dir}")
    else:
        print("[export] WARNING: no --ckpt given, exporting fresh-init "
              "weights (shape/pipeline artifact only)")

    keys, sig = input_signature(spec, args, data,
                                2 if batch == "sym" else int(batch))
    if batch == "sym":
        # batch-polymorphic artifact: one export serves any batch size
        bdim = jax.export.symbolic_shape("b")[0]
        sig = [jax.ShapeDtypeStruct((bdim,) + s.shape[1:], s.dtype)
               for s in sig]
    serve = build_serving_fn(spec, state, keys)
    exp = jax.export.export(jax.jit(serve),
                            platforms=tuple(platforms))(*sig)
    blob = exp.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "serving.stablehlo"), "wb") as f:
        f.write(blob)
    meta = {
        "benchmark": args.dir,
        "model_type": getattr(args, "model_type", None),
        "contract": spec.contract,
        "num_classes": int(args.num_classes),
        "batch": batch,  # "sym" = batch-polymorphic
        "platforms": list(platforms),
        "checkpoint": ckpt_dir or None,
        "inputs": [{"name": k,
                    "shape": [str(d) if not isinstance(d, int) else d
                              for d in s.shape],
                    "dtype": str(np.dtype(s.dtype))}
                   for k, s in zip(keys, sig)],
        "outputs": ["logprobs", "pred", "logits_stack"],
        "logits_stack_semantics": (
            "per_modality_logprobs"
            if (spec.contract == "jprobas"
                and (spec.eval_fusion or "probas") == "probas")
            else "per_modality_logits"),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"[export] {len(blob) / 1e6:.1f} MB artifact -> {out_dir} "
          f"(platforms {','.join(platforms)})")
    return out_dir


def load_artifact(out_dir: str):
    """Deserialize a serving artifact; returns a callable(*inputs)."""
    import jax

    with open(os.path.join(out_dir, "serving.stablehlo"), "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    return lambda *inputs: exp.call(*inputs)


def main(argv=None):
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (the trainer's <run_dir>/ckpt)")
    ap.add_argument("--which", choices=("best", "last"), default="best")
    ap.add_argument("--batch", default="8",
                    help="export batch size, or 'sym' for a "
                         "batch-polymorphic artifact")
    ap.add_argument("--out", default=None,
                    help="artifact dir (default <ckpt|.>/serving_<ds>)")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. cpu,tpu (default: current)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--set", action="append", default=[], metavar="k=v")
    a = ap.parse_args(argv)

    import jax

    from multimodal_clinical_tpu.benchmarks import get_benchmark
    from multimodal_clinical_tpu.config import setup_configs

    cfg_argv = ["--dir", a.dir]
    if a.seed is not None:
        cfg_argv += ["--seed", str(a.seed)]
    for kv in a.set:
        cfg_argv += ["--set", kv]
    args = setup_configs(cfg_argv)
    benchmark = get_benchmark(args.dir)
    platforms = ([p.strip() for p in a.platforms.split(",") if p.strip()]
                 if a.platforms else [jax.default_backend()])
    out_dir = a.out or os.path.join(a.ckpt or ".", f"serving_{args.dir}")
    return export_benchmark(args, benchmark, a.ckpt, a.which, a.batch,
                            out_dir, platforms)


if __name__ == "__main__":
    main()

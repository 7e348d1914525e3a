"""Serving export (tools/export.py): StableHLO artifact round-trip.

Exports an eval program (synthetic-twin data, fresh or trained weights),
deserializes it with nothing but jax.export, and checks the served
outputs bit-match the in-framework eval fusion."""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.export import export_benchmark, load_artifact


def _args(dir_, **over):
    from multimodal_clinical_tpu.config import setup_configs

    argv = ["--dir", dir_]
    for k, v in over.items():
        argv += ["--set", f"{k}={v}"]
    return setup_configs(argv)


@pytest.mark.parametrize("ds,model_type", [
    ("mimic", "jlogits"),
    ("mimic", "jprobas"),
])
def test_export_round_trip(tmp_path, ds, model_type):
    from multimodal_clinical_tpu.benchmarks import get_benchmark
    from multimodal_clinical_tpu.engine.run import init_state_on_mesh
    from multimodal_clinical_tpu.parallel.mesh import make_mesh
    from tools.export import build_serving_fn, input_signature

    args = _args(ds, model_type=model_type, batch_size=8)
    benchmark = get_benchmark(ds)
    out_dir = str(tmp_path / "artifact")
    export_benchmark(args, benchmark, ckpt_dir=None, which="best", batch=4,
                     out_dir=out_dir, platforms=["cpu"])

    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    assert meta["contract"] in ("jlogits", "jprobas")
    assert [i["name"] for i in meta["inputs"]] == ["x1", "x2"]

    # rebuild the same fresh-init state (seeded) for the reference outputs
    mesh = make_mesh(None)
    data = benchmark.get_data(args)
    spec, opt_kwargs = benchmark.get_model_spec(args, n_train=len(data.train))
    state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    keys, sig = input_signature(spec, args, data, 4)
    serve_direct = jax.jit(build_serving_fn(spec, state, keys))

    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.normal(size=s.shape).astype(s.dtype))
              for s in sig]
    direct = serve_direct(*inputs)

    served = load_artifact(out_dir)(*inputs)
    np.testing.assert_allclose(np.asarray(served["logprobs"]),
                               np.asarray(direct["logprobs"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(served["pred"]),
                                  np.asarray(direct["pred"]))
    np.testing.assert_allclose(np.asarray(served["logits_stack"]),
                               np.asarray(direct["logits_stack"]),
                               rtol=1e-6, atol=1e-6)
    assert meta["logits_stack_semantics"] == (
        "per_modality_logprobs" if model_type == "jprobas"
        else "per_modality_logits")
    if model_type == "jprobas":
        # eval-step parity: jprobas stack rows are log(softmax + eps),
        # i.e. per-row exp-sum ~= 1 (steps.py eval path semantics)
        stack = np.asarray(served["logits_stack"], np.float64)
        np.testing.assert_allclose(np.exp(stack).sum(-1), 1.0, atol=1e-3)


def test_export_cli_smoke(tmp_path):
    """End-to-end CLI invocation (no ckpt -> fresh-init warning path)."""
    from tools.export import main

    out = str(tmp_path / "cli_artifact")
    main(["--dir", "avmnist", "--batch", "2", "--out", out,
          "--platforms", "cpu", "--set", "batch_size=8"])
    assert os.path.exists(os.path.join(out, "serving.stablehlo"))
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["benchmark"] == "avmnist"
    served = load_artifact(out)
    rng = np.random.default_rng(1)
    ins = [jnp.asarray(rng.normal(size=i["shape"]).astype(i["dtype"]))
           for i in meta["inputs"]]
    out_d = served(*ins)
    assert np.asarray(out_d["pred"]).shape == (2,)
    assert np.isfinite(np.asarray(out_d["logprobs"])).all()


def test_export_symbolic_batch(tmp_path):
    """--batch sym: one artifact serves any batch size."""
    from tools.export import main

    out = str(tmp_path / "sym_artifact")
    main(["--dir", "mimic", "--batch", "sym", "--out", out,
          "--platforms", "cpu", "--set", "batch_size=8"])
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["batch"] == "sym"
    assert meta["inputs"][0]["shape"][0] == "b"
    served = load_artifact(out)
    rng = np.random.default_rng(2)
    for n in (1, 3, 9):
        ins = [jnp.asarray(
            rng.normal(size=[n] + i["shape"][1:]).astype(i["dtype"]))
            for i in meta["inputs"]]
        out_d = served(*ins)
        assert np.asarray(out_d["pred"]).shape == (n,)

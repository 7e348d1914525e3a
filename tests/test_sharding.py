"""Sharded-execution tests: DPxTP meshes produce the same math as a single
device, and the multi-chip dry run executes."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_clinical_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
)
from multimodal_clinical_tpu.parallel.sharding import param_spec


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    assert mesh.shape[MODEL_AXIS] == 1
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 2


def test_param_spec_rules():
    class FakePath:
        def __init__(self, key):
            self.key = key

    kernel2d = np.zeros((16, 8))
    assert param_spec((FakePath("dense"), FakePath("kernel")), kernel2d, 2) \
        == P(None, MODEL_AXIS)
    conv4d = np.zeros((3, 3, 4, 8))
    assert param_spec((FakePath("conv"), FakePath("kernel")), conv4d, 2) == P()
    # odd output dim: replicate
    kernel_odd = np.zeros((16, 7))
    assert param_spec((FakePath("dense"), FakePath("kernel")), kernel_odd, 2) \
        == P()


def test_dp_matches_single_device_math():
    """Sharded train step == unsharded train step (same inputs, same init)."""
    from types import SimpleNamespace

    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet

    args = SimpleNamespace(num_classes=4, batch_size=16, learning_rate=0.1,
                           num_epochs=1, use_scheduler=False, seed=0)
    spec = ModelSpec(module=MimicFusionNet(num_classes=4))
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(16, 5)).astype(np.float32)
    x2 = rng.normal(size=(16, 24, 12)).astype(np.float32)
    label = rng.integers(0, 4, 16).astype(np.int32)
    batch_np = {"x1": x1, "x2": x2, "label": label,
                "idx": np.arange(16, dtype=np.int32),
                "valid": np.ones(16, np.float32)}

    def run(mesh):
        state = create_train_state(spec, args, jax.random.PRNGKey(0),
                                   [jnp.asarray(x1[:2]), jnp.asarray(x2[:2])],
                                   steps_per_epoch=4)
        if mesh is not None:
            rep = replicated(mesh)
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
                state)
            bs = batch_sharding(mesh)
            batch = {k: jax.device_put(v, bs) for k, v in batch_np.items()}
        else:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        step = make_train_step(spec)
        _, metrics = step(state, batch)
        return {k: float(v) for k, v in metrics.items()}

    single = run(None)
    sharded = run(make_mesh())
    for k in single:
        assert abs(single[k] - sharded[k]) < 1e-4, (k, single[k], sharded[k])


def test_tp_mesh_runs_train_step():
    """2-way tensor-parallel classifier heads: step executes and matches DP."""
    from types import SimpleNamespace

    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet

    args = SimpleNamespace(num_classes=4, batch_size=8, learning_rate=0.1,
                           num_epochs=1, use_scheduler=False, seed=0)
    spec = ModelSpec(module=MimicFusionNet(num_classes=4))
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(8, 5)).astype(np.float32)
    x2 = rng.normal(size=(8, 24, 12)).astype(np.float32)
    batch_np = {"x1": x1, "x2": x2,
                "label": rng.integers(0, 4, 8).astype(np.int32),
                "idx": np.arange(8, dtype=np.int32),
                "valid": np.ones(8, np.float32)}

    mesh = make_mesh({"data": 4, "model": 2})
    state = create_train_state(spec, args, jax.random.PRNGKey(0),
                               [jnp.asarray(x1[:2]), jnp.asarray(x2[:2])],
                               steps_per_epoch=4)
    mp = mesh.shape[MODEL_AXIS]
    state = state.replace(
        params=jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(
                leaf, NamedSharding(mesh, param_spec(path, leaf, mp))),
            state.params),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), state.opt_state),
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), state.batch_stats),
        step=jax.device_put(state.step, replicated(mesh)),
        ema=jax.device_put(state.ema, replicated(mesh)),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )
    bs = batch_sharding(mesh)
    batch = {k: jax.device_put(v, bs) for k, v in batch_np.items()}
    step = make_train_step(spec)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train_loss"]))
    assert float(metrics["valid_count"]) == 8.0


def test_dryrun_multichip_entry():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    mod_spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_dryrun_multichip_under_driver_env():
    """Regression for MULTICHIP r01/r02: the driver invokes the hook in a
    fresh process with JAX_PLATFORMS=cpu +
    --xla_force_host_platform_device_count=8 in the ENVIRONMENT — which this
    image's sitecustomize plugin overrides to the axon TPU platform.  The
    hook must not trust that env promise; it must self-provision a real
    virtual-CPU backend (subprocess re-exec) and pass."""
    import os
    import re
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("_MMCT_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count=8".strip())
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=1700,
    )
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout[-2000:]


def test_param_spec_fsdp_rules():
    class FakePath:
        def __init__(self, key):
            self.key = key

    big_conv = np.zeros((3, 3, 256, 256))      # 589k elements
    small_conv = np.zeros((3, 3, 8, 8))        # below _FSDP_MIN_SIZE
    spec = param_spec((FakePath("conv"), FakePath("kernel")), big_conv,
                      model_axis_size=1, fsdp_axis_size=4)
    assert spec == P(None, None, None, DATA_AXIS)
    spec = param_spec((FakePath("conv"), FakePath("kernel")), small_conv,
                      model_axis_size=1, fsdp_axis_size=4)
    assert spec == P()
    # TP + FSDP compose: model axis takes the last dim, data axis the next
    big_dense = np.zeros((1024, 512))
    spec = param_spec((FakePath("dense"), FakePath("kernel")), big_dense,
                      model_axis_size=2, fsdp_axis_size=4)
    assert spec == P(DATA_AXIS, MODEL_AXIS)


def test_fsdp_matches_single_device_math():
    """FSDP-sharded params + momentum produce the same step math as a
    single device (ZeRO-3 is a layout, not an algorithm change)."""
    from types import SimpleNamespace

    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet
    from multimodal_clinical_tpu.parallel import sharding as shmod
    from multimodal_clinical_tpu.parallel.sharding import place_state

    args = SimpleNamespace(num_classes=4, batch_size=16, learning_rate=0.1,
                           num_epochs=1, use_scheduler=False, seed=0)
    spec = ModelSpec(module=MimicFusionNet(num_classes=4))
    rng = np.random.default_rng(3)
    x1 = rng.normal(size=(16, 5)).astype(np.float32)
    x2 = rng.normal(size=(16, 24, 12)).astype(np.float32)
    batch_np = {"x1": x1, "x2": x2,
                "label": rng.integers(0, 4, 16).astype(np.int32),
                "idx": np.arange(16, dtype=np.int32),
                "valid": np.ones(16, np.float32)}

    def run(mesh, min_size):
        state = create_train_state(spec, args, jax.random.PRNGKey(0),
                                   [jnp.asarray(x1[:2]), jnp.asarray(x2[:2])],
                                   steps_per_epoch=4)
        if mesh is not None:
            old = shmod._FSDP_MIN_SIZE
            shmod._FSDP_MIN_SIZE = min_size  # tiny test model: force shards
            try:
                state = place_state(state, mesh, fsdp=True)
            finally:
                shmod._FSDP_MIN_SIZE = old
            # at least one param leaf must actually be distributed
            shards = [
                leaf.sharding.spec for leaf in jax.tree_util.tree_leaves(
                    state.params)
                if hasattr(leaf, "sharding")
            ]
            assert any(DATA_AXIS in str(s) for s in shards), shards
            bs = batch_sharding(mesh)
            batch = {k: jax.device_put(v, bs) for k, v in batch_np.items()}
        else:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        step = make_train_step(spec)
        new_state, metrics = step(state, batch)
        return {k: float(v) for k, v in metrics.items()}

    single = run(None, None)
    fsdp = run(make_mesh(), min_size=1)
    for k in single:
        assert abs(single[k] - fsdp[k]) < 1e-4, (k, single[k], fsdp[k])


def test_fsdp_e2e_with_checkpointing(tmp_path):
    """`fsdp: true` through the FULL trainer: sharded params + momentum
    survive best-checkpoint save, reload-best-then-test, and produce a
    learning trajectory (covers orbax/msgpack handling of distributed
    arrays)."""
    from multimodal_clinical_tpu.benchmarks import get_benchmark
    from multimodal_clinical_tpu.config import setup_configs
    from multimodal_clinical_tpu.engine.run import run_benchmark

    args = setup_configs([
        "--dir", "mimic", "--set", "fsdp=true", "--set", "num_epochs=2",
        "--set", "batch_size=16",
        "--set", f"data_path={tmp_path}/nonexistent.pk",
    ])
    summary = run_benchmark(args, get_benchmark("mimic"))
    assert summary["test_epoch/test_avg_acc"] > 0.5  # synthetic twin learns


def test_dp_qmf_history_matches_single_device():
    """QMF under data parallelism: the (M, n_train) history tables are
    replicated while ``idx`` is batch-sharded — the scatter update and the
    history-dependent reg_loss must reproduce single-device math exactly,
    including a padded tail batch (pad rows scatter to out-of-bounds and
    are dropped)."""
    from types import SimpleNamespace

    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet

    n_train, batch = 32, 16
    args = SimpleNamespace(num_classes=4, batch_size=batch, learning_rate=0.1,
                           num_epochs=1, use_scheduler=False, seed=0)
    spec = ModelSpec(module=MimicFusionNet(num_classes=4), contract="qmf",
                     n_train_samples=n_train)
    rng = np.random.default_rng(1)
    steps_np = []
    for s, valid_n in ((0, batch), (1, batch - 3)):  # full + padded tail
        x1 = rng.normal(size=(batch, 5)).astype(np.float32)
        x2 = rng.normal(size=(batch, 24, 12)).astype(np.float32)
        label = rng.integers(0, 4, batch).astype(np.int32)
        idx = np.arange(s * batch, s * batch + batch, dtype=np.int32)
        valid = np.zeros(batch, np.float32)
        valid[:valid_n] = 1.0
        idx[valid_n:] = idx[valid_n - 1]  # loader pads by repeating last idx
        steps_np.append({"x1": x1, "x2": x2, "label": label,
                         "idx": idx, "valid": valid})

    def run(mesh):
        state = create_train_state(
            spec, args, jax.random.PRNGKey(0),
            [jnp.asarray(steps_np[0]["x1"][:2]),
             jnp.asarray(steps_np[0]["x2"][:2])],
            steps_per_epoch=2)
        step = make_train_step(spec)
        out_metrics = []
        for batch_np in steps_np:
            if mesh is not None:
                rep = replicated(mesh)
                state = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, rep)
                    if hasattr(x, "shape") else x, state)
                bs = batch_sharding(mesh)
                b = {k: jax.device_put(v, bs) for k, v in batch_np.items()}
            else:
                b = {k: jnp.asarray(v) for k, v in batch_np.items()}
            state, metrics = step(state, b)
            out_metrics.append({k: float(v) for k, v in metrics.items()})
        return (out_metrics, np.asarray(state.qmf_correctness),
                np.asarray(state.qmf_confidence))

    m_single, corr_single, conf_single = run(None)
    m_dp, corr_dp, conf_dp = run(make_mesh())
    for ms, md in zip(m_single, m_dp):
        for k in ms:
            assert abs(ms[k] - md[k]) < 1e-4, (k, ms[k], md[k])
    np.testing.assert_allclose(corr_dp, corr_single, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(conf_dp, conf_single, rtol=1e-5, atol=1e-6)
    # padded rows never touched the tables: indices past the last real
    # sample of step 2 stayed at init
    assert np.all(corr_single[:, batch + (batch - 3):] == 0.0)


def _fake_child(calls):
    def fake_run_child(n, env):
        calls.append(env["MMCT_JAX_CACHE"])

        class P:
            returncode = 0
            stdout = (
                "E0819 cpu_aot_loader.cc:210] feature mismatch ... SIGILL.\n"
                if len(calls) == 1 else "dryrun_multichip ok (fake)\n")

        return P()

    return fake_run_child


def test_dryrun_never_purges_inherited_cache(tmp_path, monkeypatch):
    """A user-provided MMCT_JAX_CACHE (possibly the shared TPU compile
    cache with its 1-10-minute entries) must NEVER be rmtree'd: when its
    entries trip the cpu_aot_loader feature check (SIGILL risk — they
    must not be loaded through), the retry swaps to a throwaway dir
    instead (round-4 review fix; the dryrun-OWNED CPU cache dir was
    removed outright in round 5 — see test_cache_hygiene)."""
    import __graft_entry__ as g

    assert g._cpu_cache_unsafe(
        "E0819 12:01:25 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result."
        " ... This could lead to execution errors such as SIGILL.")
    assert not g._cpu_cache_unsafe("dryrun_multichip ok: ...")

    cache = tmp_path / "shared_cache"
    cache.mkdir()
    (cache / "tpu_entry.bin").write_bytes(b"expensive TPU executable")
    monkeypatch.setenv("MMCT_JAX_CACHE", str(cache))

    calls = []
    monkeypatch.setattr(g, "_run_child", _fake_child(calls))
    g.dryrun_multichip(16)
    assert len(calls) == 2
    assert calls[0] == str(cache)
    assert calls[1] != str(cache)             # rerun on a throwaway dir
    assert (cache / "tpu_entry.bin").exists()  # inherited dir untouched
    assert not os.path.exists(calls[1])        # throwaway cleaned up


def test_siglip_sequence_sharding_matches_unsharded():
    """SP (sequence parallelism): token/patch dims constrained to
    P(None, 'model') inside the towers — GSPMD inserts the attention
    collectives; outputs equal the unsharded forward, and a TP x SP
    train step runs finite on the mesh."""
    from types import SimpleNamespace

    from flax import linen as nn
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.siglip import SigLIPModel
    from multimodal_clinical_tpu.parallel.mesh import (
        batch_sharding, make_mesh,
    )
    from multimodal_clinical_tpu.parallel.sharding import place_state

    tiny = dict(width=16, layers=2, heads=2, mlp_dim=32, patch=8,
                image_size=16, text_len=8, vocab=50)
    mesh = make_mesh({"data": 4, "model": 2})
    plain = SigLIPModel(**tiny)
    sp = SigLIPModel(sequence_sharding=True, mesh=mesh, **tiny)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 50, (8, 8)).astype(np.int32))
    px = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    variables = plain.init(jax.random.PRNGKey(0), ids, px)
    want_t, want_i = plain.apply(variables, ids, px)
    got_t, got_i = jax.jit(lambda v, a, b: sp.apply(v, a, b))(
        variables, ids, px)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               atol=1e-5, rtol=1e-5)

    class SPFusion(nn.Module):
        num_classes: int = 3

        @nn.compact
        def __call__(self, x1, x2, train=True):
            t, i = SigLIPModel(sequence_sharding=True, mesh=mesh,
                               name="model", **tiny)(x1, x2, train)
            return {"logits": [nn.Dense(self.num_classes,
                                        name="x1_model")(t),
                               nn.Dense(self.num_classes,
                                        name="x2_model")(i)]}

    args = SimpleNamespace(num_classes=3, batch_size=8, learning_rate=0.05,
                           num_epochs=1, use_scheduler=False, seed=0)
    spec = ModelSpec(module=SPFusion(), contract="jlogits")
    state = create_train_state(spec, args, jax.random.PRNGKey(0),
                               [ids[:2], px[:2]], steps_per_epoch=2)
    state = place_state(state, mesh)
    label = rng.integers(0, 3, 8).astype(np.int32)
    bs = batch_sharding(mesh)
    db = {"x1": jax.device_put(np.asarray(ids), bs),
          "x2": jax.device_put(np.asarray(px), bs),
          "label": jax.device_put(label, bs),
          "idx": jax.device_put(np.arange(8, dtype=np.int32), bs),
          "valid": jax.device_put(np.ones(8, np.float32), bs)}
    with mesh:
        _, m = make_train_step(spec)(state, db)
    assert np.isfinite(float(m["train_loss"]))


def test_param_spec_stage_rules():
    """Stacked GPipe stage params: leading dim over 'stage'; FSDP composes
    on a later dim for large leaves; non-matching leading dims and
    non-stage paths are untouched."""
    class FakePath:
        def __init__(self, key):
            self.key = key

    path = (FakePath("pipeline"), FakePath("stages"), FakePath("mlp_fc1"),
            FakePath("kernel"))
    stacked = np.zeros((4, 16, 8192))
    assert param_spec(path, stacked, model_axis_size=1,
                      stage_axis_size=4) == P("stage", None, None)
    # FSDP shards a non-stage dim (prefers the last divisible one)
    assert param_spec(path, stacked, model_axis_size=1, fsdp_axis_size=2,
                      stage_axis_size=4) == P("stage", None, DATA_AXIS)
    # leading dim != stage-axis size: not a stage stack, normal rules
    not_stacked = np.zeros((3, 16, 64))
    assert param_spec(path, not_stacked, model_axis_size=1,
                      stage_axis_size=4) == P()
    # same shape but outside a "stages" subtree: normal rules
    plain_path = (FakePath("tower"), FakePath("mlp_fc1"), FakePath("kernel"))
    assert param_spec(plain_path, stacked, model_axis_size=1,
                      stage_axis_size=4) == P()

"""Pipeline parallelism (parallel/pipeline.py): math equivalence of the
GPipe schedule vs plain sequential block application, forward AND grads,
alone and composed with data parallelism — on the virtual CPU mesh.

The reference has nothing to compare against here (single GPU,
SURVEY §2.4); the contract is exact equivalence with the unpipelined
computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_clinical_tpu.parallel.pipeline import (
    pipeline_apply, stack_stage_params, stage_sharding,
)

N_STAGES = 4
DIM = 16


def _block(params, x):
    # residual MLP block: shape-preserving, nonlinear, parameterized
    return x + jnp.tanh(x @ params["w"] + params["b"])


def _make_params(rng, n_stages=N_STAGES):
    keys = jax.random.split(rng, n_stages)
    return [
        {"w": jax.random.normal(k, (DIM, DIM)) * 0.3,
         "b": jax.random.normal(jax.random.fold_in(k, 1), (DIM,)) * 0.1}
        for k in keys
    ]


def _sequential(params_list, x):
    for p in params_list:
        x = _block(p, x)
    return x


def _stage_mesh(extra_axis=None):
    devs = jax.devices()
    if extra_axis:
        dp = len(devs) // N_STAGES
        return Mesh(np.asarray(devs).reshape(N_STAGES, dp),
                    ("stage", extra_axis))
    return Mesh(np.asarray(devs[:N_STAGES]), ("stage",))


def test_pipeline_forward_matches_sequential():
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(0))
    stacked = jax.device_put(stack_stage_params(params_list),
                             stage_sharding(mesh))
    x = jax.random.normal(jax.random.PRNGKey(1), (24, DIM))

    want = _sequential(params_list, x)
    got = jax.jit(
        lambda p, v: pipeline_apply(mesh, _block, p, v, n_micro=6)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_single_microbatch_and_full_microbatching():
    """Degenerate schedules: M=1 (no pipelining, pure fill/drain) and
    M=B (one sample per microbatch) both reproduce the sequential
    math."""
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(2))
    stacked = jax.device_put(stack_stage_params(params_list),
                             stage_sharding(mesh))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, DIM))
    want = _sequential(params_list, x)
    for n_micro in (1, 8):
        got = jax.jit(
            lambda p, v, m=n_micro: pipeline_apply(mesh, _block, p, v,
                                                   n_micro=m)
        )(stacked, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_grads_match_sequential():
    """jax.grad through the scan + ppermute schedule equals the
    sequential gradients — the whole point: the reverse pipeline comes
    from autodiff, not hand-written schedules."""
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(4))
    stacked = jax.device_put(stack_stage_params(params_list),
                             stage_sharding(mesh))
    x = jax.random.normal(jax.random.PRNGKey(5), (12, DIM))
    y = jax.random.normal(jax.random.PRNGKey(6), (12, DIM))

    def pp_loss(p, v):
        return jnp.mean((pipeline_apply(mesh, _block, p, v, n_micro=4)
                         - y) ** 2)

    def seq_loss(plist, v):
        return jnp.mean((_sequential(plist, v) - y) ** 2)

    g_pp = jax.jit(jax.grad(pp_loss))(stacked, x)
    g_seq = jax.grad(seq_loss)(params_list, x)
    g_seq_stacked = stack_stage_params(g_seq)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(g_pp[k]),
                                   np.asarray(g_seq_stacked[k]),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_composes_with_data_parallel():
    """DP x PP: microbatches sharded over the data axis while flowing
    through the stage axis; output equals sequential on the full
    batch."""
    mesh = _stage_mesh(extra_axis="data")
    params_list = _make_params(jax.random.PRNGKey(7))
    stacked = jax.device_put(stack_stage_params(params_list),
                             stage_sharding(mesh))
    x = jax.random.normal(jax.random.PRNGKey(8), (16, DIM))
    x = jax.device_put(x, NamedSharding(mesh, P("data")))

    want = _sequential(params_list, x)
    got = jax.jit(
        lambda p, v: pipeline_apply(mesh, _block, p, v, n_micro=4,
                                    data_axis="data")
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_rejects_indivisible_microbatching():
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(9))
    stacked = stack_stage_params(params_list)
    x = jnp.zeros((10, DIM))
    with pytest.raises(ValueError, match="divide batch"):
        pipeline_apply(mesh, _block, stacked, x, n_micro=3)


def test_pipeline_rejects_stage_count_mismatch():
    """S != mesh stage-axis size must be a loud error: with S a larger
    multiple, shard_map would give each device several stages and the
    per-device squeeze would silently drop all but the first."""
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(10),
                               n_stages=2 * N_STAGES)
    stacked = stack_stage_params(params_list)
    x = jnp.zeros((8, DIM))
    with pytest.raises(ValueError, match="must match 1:1"):
        pipeline_apply(mesh, _block, stacked, x, n_micro=4)


# ---------------------------------------------------------------------------
# User surface: pipelined SigLIP towers (models/siglip.PipelinedEncoderStack)
# reachable from config via mesh_shape: {data, model, stage} +
# pipeline_stages (benchmarks/food101.get_model_spec).

TINY = dict(width=16, layers=4, heads=2, mlp_dim=32, patch=8,
            image_size=16, text_len=8, vocab=50)


def _pp_mesh():
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    return make_mesh({"data": 2, "model": 1, "stage": 4})


def test_make_mesh_stage_axis():
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 2, "model": 1, "stage": 4})
    assert dict(mesh.shape) == {"data": 2, "model": 1, "stage": 4}
    # stage axis only materializes when requested: 2-axis layout unchanged
    assert tuple(make_mesh({"data": 4, "model": 2}).axis_names) == (
        "data", "model")


def test_pipelined_siglip_matches_sequential_scan():
    """Same params: GPipe'd towers (mesh with stage axis) == the sequential
    lax.scan fallback (mesh=None) — the flax-level analog of the
    pipeline_apply equivalence tests above."""
    from multimodal_clinical_tpu.models.siglip import SigLIPModel

    mesh = _pp_mesh()
    seq = SigLIPModel(pipeline_stages=4, mesh=None, **TINY)
    pp = SigLIPModel(pipeline_stages=4, mesh=mesh, pipeline_microbatches=4,
                     **TINY)
    ids = jnp.zeros((8, 8), jnp.int32)
    px = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    variables = seq.init(jax.random.PRNGKey(1), ids, px)
    t_seq, i_seq = seq.apply(variables, ids, px)
    t_pp, i_pp = jax.jit(lambda v, a, b: pp.apply(v, a, b))(
        variables, ids, px)
    np.testing.assert_allclose(np.asarray(t_pp), np.asarray(t_seq),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(i_pp), np.asarray(i_seq),
                               atol=1e-5, rtol=1e-5)


def test_stack_tower_layers_ports_loop_params():
    """Per-layer params (the unpipelined layout ported from HF checkpoints)
    stack into the pipelined layout with identical forward output."""
    from multimodal_clinical_tpu.models.siglip import (
        SigLIPTextTower, stack_tower_layers,
    )

    tiny_text = {k: v for k, v in TINY.items()
                 if k not in ("patch", "image_size")}
    loop = SigLIPTextTower(**tiny_text)
    pp = SigLIPTextTower(pipeline_stages=2, mesh=None, **tiny_text)
    ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % TINY["vocab"]
    loop_vars = loop.init(jax.random.PRNGKey(2), ids)
    want = loop.apply(loop_vars, ids)
    stacked = stack_tower_layers(loop_vars["params"], stages=2)
    got = pp.apply({"params": stacked}, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)



def _tiny_siglip_fusion(mesh, vocab=TINY["vocab"], num_classes=4):
    """Dual-tower SigLIP (TINY geometry, 4 GPipe stages on ``mesh``) + the
    reference's two Dense heads — shared by the step-level and Trainer-level
    PP tests."""
    from flax import linen as nn
    from multimodal_clinical_tpu.models.siglip import SigLIPModel

    tiny = dict(TINY, vocab=vocab)

    class TinyFusion(nn.Module):
        num_classes: int = 4

        @nn.compact
        def __call__(self, x1, x2, train=True):
            text, img = SigLIPModel(pipeline_stages=4, mesh=mesh,
                                    name="model", **tiny)(x1, x2, train)
            l1 = nn.Dense(self.num_classes, name="x1_model")(text)
            l2 = nn.Dense(self.num_classes, name="x2_model")(img)
            return {"logits": [l1, l2]}

    return TinyFusion(num_classes=num_classes)


def test_dp_pp_train_step_on_stage_mesh():
    """Full train step (forward, loss, backward, update) of a pipelined
    dual-tower fusion net on a DP x PP mesh: stage params sharded P('stage'),
    loss finite and decreasing."""
    from types import SimpleNamespace

    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.parallel.mesh import batch_sharding
    from multimodal_clinical_tpu.parallel.sharding import place_state

    mesh = _pp_mesh()
    rng = np.random.default_rng(0)
    batch = 8
    ids = (rng.integers(0, TINY["vocab"], (batch, 8))).astype(np.int32)
    px = rng.normal(size=(batch, 16, 16, 3)).astype(np.float32)
    label = rng.integers(0, 4, batch).astype(np.int32)

    args = SimpleNamespace(num_classes=4, batch_size=batch,
                           learning_rate=0.1, num_epochs=1,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=_tiny_siglip_fusion(mesh), contract="jlogits")
    state = create_train_state(spec, args, jax.random.PRNGKey(0),
                               [jnp.asarray(ids[:2]), jnp.asarray(px[:2])],
                               steps_per_epoch=2)
    state = place_state(state, mesh)

    # the stacked stage params landed sharded over the stage axis
    stage_leaf = jax.tree.leaves(
        state.params["model"]["text_model"]["pipeline"]["stages"])[0]
    assert "stage" in str(stage_leaf.sharding.spec)

    bs = batch_sharding(mesh)
    device_batch = {
        "x1": jax.device_put(ids, bs), "x2": jax.device_put(px, bs),
        "label": jax.device_put(label, bs),
        "idx": jax.device_put(np.arange(batch, dtype=np.int32), bs),
        "valid": jax.device_put(np.ones(batch, np.float32), bs),
    }
    with mesh:
        step = make_train_step(spec)
        state1, m1 = step(state, device_batch)
        _, m2 = step(state1, device_batch)
    l1, l2 = float(m1["train_loss"]), float(m2["train_loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1  # same batch twice: the pipelined grads update params


def test_pipelined_training_trajectory_matches_loop_model():
    """Strongest PP pin: per-step train losses of the GPipe'd tower on a
    DP x PP mesh equal the plain per-layer loop model's, from identical
    (converted) inits on identical batches — pipelining changes the
    schedule, not the math."""
    from types import SimpleNamespace

    from flax import linen as nn
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.siglip import (
        SigLIPTextTower, stack_tower_layers,
    )
    from multimodal_clinical_tpu.parallel.mesh import batch_sharding, make_mesh
    from multimodal_clinical_tpu.parallel.sharding import place_state

    tiny_text = {k: v for k, v in TINY.items()
                 if k not in ("patch", "image_size")}
    mesh_pp = _pp_mesh()
    mesh_dp = make_mesh({"data": 8, "model": 1})

    def fusion(pipelined):
        class Net(nn.Module):
            num_classes: int = 3

            @nn.compact
            def __call__(self, x1, x2, train=True):
                tower = SigLIPTextTower(
                    pipeline_stages=4 if pipelined else 0,
                    mesh=mesh_pp if pipelined else None,
                    name="tower", **tiny_text)
                l1 = nn.Dense(self.num_classes, name="x1_model")(tower(x1))
                l2 = nn.Dense(self.num_classes, name="x2_model")(tower(x2))
                return {"logits": [l1, l2]}

        return Net()

    rng = np.random.default_rng(2)
    batch = 8
    ids1 = rng.integers(0, TINY["vocab"], (batch, 8)).astype(np.int32)
    ids2 = rng.integers(0, TINY["vocab"], (batch, 8)).astype(np.int32)
    label = rng.integers(0, 3, batch).astype(np.int32)
    args = SimpleNamespace(num_classes=3, batch_size=batch,
                           learning_rate=0.05, num_epochs=1,
                           use_scheduler=False, seed=0)

    spec_loop = ModelSpec(module=fusion(False), contract="jlogits")
    spec_pp = ModelSpec(module=fusion(True), contract="jlogits")
    sample = [jnp.asarray(ids1[:2]), jnp.asarray(ids2[:2])]
    state_loop = create_train_state(spec_loop, args, jax.random.PRNGKey(0),
                                    sample, steps_per_epoch=2)
    state_pp = create_train_state(spec_pp, args, jax.random.PRNGKey(0),
                                  sample, steps_per_epoch=2)
    # identical weights: convert the loop init into the stacked layout
    # (fresh copies: the train step donates its input state, so shared
    # leaves would be deleted by whichever model steps first)
    params = dict(state_loop.params)
    params["tower"] = stack_tower_layers(state_loop.params["tower"], 4)
    state_pp = state_pp.replace(params=jax.tree.map(jnp.array, params))
    state_pp = place_state(state_pp, mesh_pp)
    state_loop = place_state(state_loop, mesh_dp)

    def device_batch(mesh):
        bs = batch_sharding(mesh)
        return {
            "x1": jax.device_put(ids1, bs), "x2": jax.device_put(ids2, bs),
            "label": jax.device_put(label, bs),
            "idx": jax.device_put(np.arange(batch, dtype=np.int32), bs),
            "valid": jax.device_put(np.ones(batch, np.float32), bs),
        }

    losses = {}
    for name, spec, state, mesh in (
            ("loop", spec_loop, state_loop, mesh_dp),
            ("pp", spec_pp, state_pp, mesh_pp)):
        with mesh:
            step = make_train_step(spec)
            ls = []
            db = device_batch(mesh)
            for _ in range(3):
                state, m = step(state, db)
                ls.append(float(m["train_loss"]))
        losses[name] = ls
    np.testing.assert_allclose(losses["pp"], losses["loop"],
                               rtol=1e-4, atol=1e-5)


def test_full_trainer_cycle_on_pp_mesh(tmp_path):
    """The whole production loop on a DP x PP mesh: loaders, fit (train +
    val + best-ckpt), reload-best, test — not just one step.  Closes the
    integration gap between pipeline_apply and the Trainer."""
    from types import SimpleNamespace

    from multimodal_clinical_tpu.data.synthetic import make_synthetic_splits
    from multimodal_clinical_tpu.engine.run import (
        DataBundle, build_loaders, init_state_on_mesh,
    )
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.trainer import Trainer
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 2, "model": 1, "stage": 4})
    # vocab 128: the synthetic token twin draws ids below SYNTH_VOCAB=100
    args = SimpleNamespace(
        num_classes=4, batch_size=8, learning_rate=0.05, num_epochs=2,
        dropout_p=0.0, data_path="/nonexistent", num_cpus=1,
        use_wandb=False, model_type="jlogits", group_name="pp", seed=0,
        use_scheduler=False, grad_mod_type=None, alpha=0.1,
        mesh_shape=None, ckpt_dir=str(tmp_path), log_every_n_steps=0,
    )
    data = DataBundle(
        *make_synthetic_splits("food101", 4, n_train=16, n_val=8, n_test=8,
                               shapes=[(8,), (16, 16, 3)]),
        synthetic=True)
    spec = ModelSpec(module=_tiny_siglip_fusion(mesh, vocab=128),
                     contract="jlogits")
    loaders = build_loaders(args, data, mesh)
    state = init_state_on_mesh(spec, args, data, mesh)
    trainer = Trainer(args, spec, state, *loaders)
    trainer.fit()
    summary = trainer.test()
    assert np.isfinite(summary["test_epoch/test_avg_loss"])
    assert "test_epoch/test_avg_acc" in summary
    # losses actually moved across the 2 epochs
    assert (trainer.history[-1]["train_epoch/train_avg_loss"]
            < trainer.history[0]["train_epoch/train_avg_loss"] + 1e-6)

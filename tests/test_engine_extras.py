"""Analysis streams (min-loss counts, ensemble_probas) and exact resume."""

from types import SimpleNamespace

import numpy as np

from multimodal_clinical_tpu.benchmarks import avmnist, enrico
from multimodal_clinical_tpu.data.synthetic import make_synthetic_dataset
from multimodal_clinical_tpu.engine.run import (
    DataBundle,
    build_loaders,
    init_state_on_mesh,
)
from multimodal_clinical_tpu.engine.trainer import Trainer
from multimodal_clinical_tpu.parallel.mesh import make_mesh


def make_args(**overrides):
    base = dict(
        num_classes=4, batch_size=16, learning_rate=0.05, num_epochs=2,
        dropout_p=0.1, data_path="/nonexistent", num_cpus=1, use_wandb=False,
        model_type="jlogits", group_name="t", seed=0, use_scheduler=False,
        grad_mod_type=None, alpha=0.1, mesh_shape=None, ckpt_dir=None,
        log_every_n_steps=0, noise_p=0.0, label_noise_p=0.0,
    )
    base.update(overrides)
    return SimpleNamespace(**base)


def small_enrico_bundle():
    small = [make_synthetic_dataset("enrico", 32, 4, seed=i, dirs_seed=0,
                                    shapes=[(32, 16, 3), (32, 16, 3)])
             for i in range(3)]
    return DataBundle(*small, train_sampler="weighted", synthetic=True)


def build_trainer(benchmark, args, data=None):
    mesh = make_mesh()
    data = data or benchmark.get_data(args)
    spec, opt_kwargs = benchmark.get_model_spec(args, n_train=len(data.train))
    loaders = build_loaders(args, data, mesh)
    state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    return Trainer(args, spec, state, *loaders), data


def test_min_loss_counts_streams(tmp_path):
    args = make_args(model_type="ensemble_counts", num_epochs=1,
                     batch_size=8, ckpt_dir=str(tmp_path))
    trainer, data = build_trainer(enrico, args, small_enrico_bundle())
    trainer.fit()
    epoch = trainer.history[-1]
    total = sum(epoch[f"train_epoch/{k}_count"]
                for k in ("joint", "x1", "x2"))
    # every sample contributes >= 1 count (ties can contribute more)
    assert total >= len(data.train)
    summary = trainer.test()
    assert "test_epoch/joint_count" in summary
    assert "test_epoch/x1_count" in summary


def test_ensemble_probas_reports(tmp_path):
    args = make_args(model_type="ensemble_probas", num_classes=4,
                     num_epochs=1, ckpt_dir=str(tmp_path))
    trainer, _ = build_trainer(avmnist, args)
    trainer.fit()
    summary = trainer.test()
    assert "test_epoch/test_avg_x1_acc" in summary


def test_exact_resume_continues_from_step(tmp_path):
    args = make_args(num_epochs=2, ckpt_dir=str(tmp_path))
    trainer, data = build_trainer(avmnist, args)
    trainer.fit()
    step_after_2 = int(trainer.state.step)
    assert step_after_2 > 0

    # new trainer, same ckpt dir: resume should land at the same step and
    # fit() should be a no-op (start_epoch == num_epochs)
    args2 = make_args(num_epochs=2, ckpt_dir=str(tmp_path))
    trainer2, _ = build_trainer(avmnist, args2)
    assert trainer2.resume()
    assert int(trainer2.state.step) == step_after_2
    trainer2.fit()
    assert int(trainer2.state.step) == step_after_2

    # extending num_epochs continues training from the restored state
    args3 = make_args(num_epochs=3, ckpt_dir=str(tmp_path))
    trainer3, _ = build_trainer(avmnist, args3)
    assert trainer3.resume()
    trainer3.fit()
    assert int(trainer3.state.step) > step_after_2
    # EMA state survived the round trip (non-zero after training)
    assert float(np.abs(np.asarray(trainer3.state.ema)).sum()) > 0


def test_multiseed_vmapped_sweep():
    from multimodal_clinical_tpu.engine.multiseed import run_multiseed

    args = make_args(num_classes=4, num_epochs=2, batch_size=16,
                     learning_rate=0.1)
    summary = run_multiseed(args, avmnist, seeds=[0, 1, 2, 3])
    assert "test_epoch/test_avg_acc" in summary
    assert "test_epoch/test_avg_acc_std" in summary
    # per-seed streams exposed (analyze_data.py-style aggregation)
    assert "test_epoch/test_avg_acc_seed0" in summary
    assert "test_epoch/test_avg_acc_seed3" in summary
    # seeds actually differ (independent inits + data orders)
    per_seed = [summary[f"test_epoch/test_avg_loss_seed{s}"] for s in range(4)]
    assert len({round(v, 6) for v in per_seed}) > 1
    # planted-signal data should still be learnable on average
    assert summary["test_epoch/test_avg_acc"] > 0.3


def test_init_ckpt_warm_start(tmp_path):
    from multimodal_clinical_tpu.engine.run import run_benchmark

    # train once to produce a checkpoint
    args = make_args(num_epochs=1, ckpt_dir=str(tmp_path / "first"))
    trainer, _ = build_trainer(avmnist, args)
    trainer.fit()
    ckpt_dir = trainer.ckpt.ckpt_dir

    # warm-start a fresh run from those weights
    args2 = make_args(num_epochs=1, ckpt_dir=str(tmp_path / "second"))
    args2.init_ckpt = ckpt_dir
    summary = run_benchmark(args2, avmnist)
    assert "test_epoch/test_avg_acc" in summary


def test_scan_dispatch_matches_single_steps(tmp_path):
    """K-steps-per-dispatch must produce exactly the same training math."""
    import jax

    def run(steps_per_dispatch):
        args = make_args(num_epochs=1, batch_size=16,
                         ckpt_dir=str(tmp_path / f"k{steps_per_dispatch}"))
        args.steps_per_dispatch = steps_per_dispatch
        trainer, _ = build_trainer(avmnist, args)
        trainer.fit()
        params = jax.tree_util.tree_leaves(trainer.state.params)
        return trainer.history[-1], [np.asarray(p) for p in params]

    hist1, params1 = run(1)
    hist4, params4 = run(4)
    # scan vs unrolled programs reassociate bf16 reductions differently;
    # the math is the same K sequential steps, so differences stay at
    # compiler-rounding scale
    assert abs(hist1["train_epoch/train_avg_loss"]
               - hist4["train_epoch/train_avg_loss"]) < 1e-2
    assert abs(hist1["val_epoch/val_avg_acc"]
               - hist4["val_epoch/val_avg_acc"]) < 0.1
    # param trajectories diverge at bf16-rounding scale and compound over
    # the 16 SGD steps; assert they stay in the same neighborhood
    for a, b in zip(params1, params4):
        np.testing.assert_allclose(a, b, atol=8e-3)


def test_fakenews_dialogue_three_modality(tmp_path):
    from multimodal_clinical_tpu.benchmarks import fakenews

    args = make_args(num_classes=6, model_type="jlogits_dialogue",
                     num_epochs=1, batch_size=16, ckpt_dir=str(tmp_path))
    args.max_seq_len = 16
    args.vocab_size = 1000
    trainer, data = build_trainer(fakenews, args)
    trainer.fit()
    summary = trainer.test()
    assert "test_epoch/test_avg_x3_acc" in summary or \
        "test_epoch/test_avg_x3_acc_uncal" in summary


def test_orbax_checkpoint_backend_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.engine.checkpoint import BestCheckpointer
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet

    args = make_args(num_classes=4)
    spec = ModelSpec(module=MimicFusionNet(num_classes=4))
    state = create_train_state(spec, args, jax.random.PRNGKey(0),
                               [jnp.zeros((2, 5)), jnp.zeros((2, 24, 12))],
                               steps_per_epoch=2)
    ck = BestCheckpointer(str(tmp_path), backend="orbax")
    assert ck.maybe_save(state, 0.5)
    zeroed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, state.params))
    restored = ck.restore_best(zeroed)
    a = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(restored.params)[0])
    np.testing.assert_array_equal(a, b)


def test_multiseed_with_qmf_history_tables():
    """vmapped multi-seed training with per-seed QMF history state."""
    from multimodal_clinical_tpu.engine.multiseed import run_multiseed
    from multimodal_clinical_tpu.benchmarks import mimic

    args = make_args(num_classes=6, model_type="qmf", num_epochs=1,
                     batch_size=16, learning_rate=0.05)
    summary = run_multiseed(args, mimic, seeds=[0, 1])
    assert "test_epoch/test_avg_df_acc" in summary
    assert "test_epoch/test_avg_df_acc_std" in summary


def test_loader_propagates_producer_errors():
    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler

    class BrokenDataset:
        labels = np.zeros(8, np.int32)

        def __len__(self):
            return 8

        def gather(self, indices):
            raise RuntimeError("disk exploded")

    loader = Loader(BrokenDataset(), 4, SequentialSampler(8))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="disk exploded"):
        list(loader)


def test_profiler_trace_capture(tmp_path):
    from multimodal_clinical_tpu.engine.run import run_benchmark

    args = make_args(num_epochs=2, batch_size=16, ckpt_dir=str(tmp_path))
    summary = run_benchmark(args, avmnist,
                            profile_dir=str(tmp_path / "trace"))
    assert "test_epoch/test_avg_acc" in summary
    import glob

    files = glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
    assert any(f.endswith((".pb", ".json.gz")) for f in files), files

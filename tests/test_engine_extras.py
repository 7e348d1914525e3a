"""Analysis streams (min-loss counts, ensemble_probas) and exact resume."""

import os
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


def test_resume_epoch_survives_batch_size_change(tmp_path):
    """Resume uses the RECORDED epoch count, not step // steps_per_epoch —
    a changed batch size between runs must not replay or skip epochs."""
    args = make_args(num_epochs=2, batch_size=16, ckpt_dir=str(tmp_path))
    trainer, _ = build_trainer(avmnist, args)
    trainer.fit()
    assert trainer.ckpt.epochs_done == 2

    # halved batch size doubles steps_per_epoch; the old step count would
    # derive epoch 1 and replay — the recorded count resumes at epoch 2
    args2 = make_args(num_epochs=2, batch_size=8, ckpt_dir=str(tmp_path))
    trainer2, _ = build_trainer(avmnist, args2)
    assert trainer2.resume()
    step_before = int(trainer2.state.step)
    trainer2.fit()  # must be a no-op: both epochs already done
    assert int(trainer2.state.step) == step_before


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


def test_multiseed_per_seed_data_and_sampler_policy():
    """The vmapped sweep mirrors the reference's per-RUN protocol: each
    seed's process calls seed_everything(seed) BEFORE get_data, so every
    run draws its own construction shuffle and split (mimic/get_data.py:86)
    and its own val/test sets.  run_multiseed must (a) build one bundle per
    seed with that seed, (b) evaluate each seed on ITS OWN val/test split
    (in_axes=0 superbatches, not a broadcast), (c) honor the bundle's
    declared val-sampler policy instead of hardcoding sequential, and
    (d) refuse unequal per-seed split sizes loudly."""
    import pytest as _pytest

    from multimodal_clinical_tpu.data.synthetic import make_synthetic_splits
    from multimodal_clinical_tpu.engine.multiseed import run_multiseed
    from multimodal_clinical_tpu.engine.run import DataBundle

    calls = []

    class FakeBench:
        """Seed-dependent synthetic twin with a weighted val policy."""

        @staticmethod
        def get_data(args):
            calls.append(int(args.seed))
            splits = make_synthetic_splits(
                "avmnist", int(args.num_classes), seed=int(args.seed),
                n_train=32, n_val=16, n_test=16)
            return DataBundle(*splits, train_sampler="sequential",
                              val_sampler="weighted", synthetic=True)

        get_model_spec = staticmethod(avmnist.get_model_spec)

    args = make_args(num_classes=4, num_epochs=1, batch_size=16,
                     learning_rate=0.1)
    summary = run_multiseed(args, FakeBench, seeds=[5, 9])
    # (a) one get_data per seed, with that seed
    assert calls == [5, 9]
    # (b) per-seed eval data: the two seeds trained AND evaluated on
    # different draws, so their test losses differ even at equal batch
    # geometry (init differences alone would too — the call log above is
    # the per-seed-data pin; this asserts the sweep ran end to end)
    l0 = summary["test_epoch/test_avg_loss_seed0"]
    l1 = summary["test_epoch/test_avg_loss_seed1"]
    assert np.isfinite(l0) and np.isfinite(l1) and l0 != l1

    # (d) unequal per-seed splits must refuse, not truncate
    class UnevenBench(FakeBench):
        @staticmethod
        def get_data(args):
            n = 16 + 8 * int(args.seed)
            splits = make_synthetic_splits(
                "avmnist", int(args.num_classes), seed=int(args.seed),
                n_train=32, n_val=n, n_test=16)
            return DataBundle(*splits, synthetic=True)

    with _pytest.raises(NotImplementedError, match="unequal split sizes"):
        run_multiseed(args, UnevenBench, seeds=[0, 1])

    # shared-data opt-out: one get_data call, broadcast eval still works
    calls.clear()
    args_shared = make_args(num_classes=4, num_epochs=1, batch_size=16,
                            learning_rate=0.1, multiseed_shared_data=True)
    summary = run_multiseed(args_shared, FakeBench, seeds=[5, 9])
    assert calls == [0]  # args.seed untouched, called once
    assert "test_epoch/test_avg_acc" in summary


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
    """K-steps-per-dispatch performs exactly K sequential raw train steps.

    The decisive assertion is BIT-EXACT: a scan-of-1 dispatched 4 times must
    equal one scan-of-4 dispatch — same XLA scan body, so any drift there is
    a semantic bug in the wrapper (batch stacking order, RNG fold chain,
    state threading, donation aliasing).  Measured on this host (round 5
    diagnosis): scan1x4 vs scan4 param maxdiff is exactly 0.0.

    Single raw steps vs the scan are two DIFFERENT XLA programs, so they
    only agree to f32 program-rounding: `jit(step)` and `jit(scan(body))`
    fuse differently, the rounding flips ReLU gates, and the flip compounds
    through SGD.  Measured on this host: param maxdiff 7.0e-4 abs / 1.75%
    rel after 4 steps (run-to-run deterministic: two single-step runs agree
    to 0.0), while the smallest semantic bug — feeding the 4 batches in
    reverse order — measures 1.6e-2, a 23x separation.  Tolerances are set
    at the geometric middle: atol 4e-3 / rtol 4e-2 (5.7x above measured
    rounding, 4x below measured bug scale).
    """
    import jax
    from multimodal_clinical_tpu.engine.steps import (
        make_scan_train_step, make_train_step,
    )

    args = make_args(num_epochs=1, batch_size=16, ckpt_dir=str(tmp_path))
    mesh = make_mesh()
    data = avmnist.get_data(args)
    spec, opt_kwargs = avmnist.get_model_spec(args, n_train=len(data.train))

    train_loader, _, _ = build_loaders(args, data, mesh)
    batches = []
    for batch in train_loader:
        batches.append(batch)
        if len(batches) == 4:
            break

    def param_leaves(s):
        return [np.asarray(p) for p in jax.tree_util.tree_leaves(s.params)]

    single = make_train_step(spec)
    s = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    per_step_losses = []
    for b in batches:
        s, m = single(s, b)
        per_step_losses.append(float(m["train_loss"]))
    params_single = param_leaves(s)

    # scan-of-1, dispatched once per batch (each init re-done: steps donate)
    scan1 = make_scan_train_step(spec, 1)
    s1 = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    for b in batches:
        s1, _ = scan1(s1, b)
    params_scan1 = param_leaves(s1)

    scan4 = make_scan_train_step(spec, 4)
    s4, m4 = scan4(init_state_on_mesh(spec, args, data, mesh, opt_kwargs),
                   *batches)
    params_scan4 = param_leaves(s4)

    assert int(s4.step) == 4
    # metrics come back stacked with a leading (K,) axis, one row per step
    scan_losses = np.asarray(m4["train_loss"])
    assert scan_losses.shape == (4,)

    # 1) the semantic claim, bit-exact: scan-of-4 == scan-of-1 four times
    #    (identical scan-body program => identical rounding; any difference
    #    is real: wrong stacking order / RNG fold / state threading)
    for a, b in zip(params_scan1, params_scan4):
        np.testing.assert_array_equal(a, b)

    # 2) step-1 loss bit-matches the raw step (same state, same batch —
    #    first-step forward math agrees before rounding can compound)
    np.testing.assert_allclose(scan_losses[0], per_step_losses[0], rtol=1e-6)

    # 3) cross-program agreement at the derived rounding tolerance
    #    (see docstring: measured rounding 7e-4 / bug floor 1.6e-2)
    np.testing.assert_allclose(scan_losses, per_step_losses, rtol=4e-2,
                               atol=4e-3)
    for a, b in zip(params_single, params_scan4):
        np.testing.assert_allclose(a, b, rtol=4e-2, atol=4e-3)


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


def test_fit_commits_final_checkpoint_before_returning(tmp_path):
    """fit() must leave the final rolling checkpoint COMMITTED (no
    .pending debris): a checkpointer constructed afterwards runs
    _recover_pending, which sweeps uncommitted pendings as crash debris —
    an in-flight final save would be silently destroyed (the race that
    made resume() flaky under load)."""
    args = make_args(num_epochs=1, batch_size=16, ckpt_dir=str(tmp_path))
    trainer, _ = build_trainer(avmnist, args)
    trainer.fit()
    names = os.listdir(trainer.ckpt.ckpt_dir)
    assert not [n for n in names if n.endswith(".pending")], names
    assert [n for n in names if n.startswith("last-")], names


def test_resume_ignores_meta_ahead_of_checkpoint(tmp_path):
    """Crash between the meta.json write and the (async) checkpoint
    commit: metadata describes a NEWER step than any restorable state.
    Resume must fall back to the step-derived epoch instead of trusting
    epochs_done and silently skipping an epoch."""
    import json

    args = make_args(num_epochs=1, batch_size=16, ckpt_dir=str(tmp_path))
    trainer, _ = build_trainer(avmnist, args)
    trainer.fit()
    steps_per_epoch = len(trainer.train_loader)

    # simulate the torn write: meta claims 2 epochs done at a step whose
    # checkpoint never committed
    meta_path = os.path.join(trainer.ckpt.ckpt_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["epochs_done"] = 2
    meta["meta_step"] = int(trainer.state.step) + steps_per_epoch
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    args2 = make_args(num_epochs=2, batch_size=16, ckpt_dir=str(tmp_path))
    trainer2, _ = build_trainer(avmnist, args2)
    assert trainer2.resume()
    step_restored = int(trainer2.state.step)
    trainer2.fit()
    # epoch 1 must RUN (meta said both done, but state only has epoch 0)
    assert int(trainer2.state.step) == step_restored + steps_per_epoch


def test_overfit_batches_pins_subset_and_converges(tmp_path):
    """Reference sanity mode (utils/run_trainer.py:6,54): overfit_batches
    trains AND validates on the same fixed first-k train batches, and a
    working model drives accuracy on that subset toward 1.0."""
    args = make_args(model_type="jlogits", ckpt_dir=str(tmp_path),
                     batch_size=8, num_epochs=8, learning_rate=0.1,
                     overfit_batches=1)
    trainer, _ = build_trainer(avmnist, args)
    trainer.fit()
    assert len(trainer.train_loader) == 1
    assert trainer.val_loader is trainer.train_loader
    accs = [h["train_epoch/train_avg_acc"] for h in trainer.history]
    assert accs[-1] > 0.9, f"failed to overfit one batch: {accs}"
    # val ran on the identical pinned batch
    assert "val_epoch/val_avg_acc" in trainer.history[-1]


def test_overfit_batches_fraction_selects_count(tmp_path):
    """Lightning float semantics: a fraction in (0, 1] of the train batches."""
    args = make_args(model_type="jlogits", ckpt_dir=str(tmp_path),
                     batch_size=8, num_epochs=1, overfit_batches=0.5)
    trainer, data = build_trainer(avmnist, args)
    n_batches = len(trainer.train_loader)
    trainer.fit()
    assert len(trainer.train_loader) == max(1, round(0.5 * n_batches))


def test_lr_sgd_stream_reports_steplr_decay(tmp_path):
    """LearningRateMonitor parity (utils/run_trainer.py:20): every train
    epoch reports the in-effect LR under Lightning's ``lr-SGD`` key, and a
    StepLR boundary shows up as a gamma decay in the stream."""
    import dataclasses

    from multimodal_clinical_tpu.benchmarks import avmnist as bm

    args = make_args(model_type="jlogits", ckpt_dir=str(tmp_path),
                     batch_size=8, num_epochs=2, use_scheduler=True,
                     learning_rate=0.05)
    mesh = make_mesh()
    data = bm.get_data(args)
    spec, opt_kwargs = bm.get_model_spec(args, n_train=len(data.train))
    spec = dataclasses.replace(spec, sched_step_size=1, sched_gamma=0.1)
    loaders = build_loaders(args, data, mesh)
    state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    trainer = Trainer(args, spec, state, *loaders)
    trainer.fit()
    lrs = [h["lr-SGD"] for h in trainer.history]
    assert lrs[0] == np.float32(0.05) * 0.1  # after epoch 0's boundary
    assert np.isclose(lrs[1], 0.05 * 0.01)


def test_lr_sgd_in_per_step_stream(tmp_path):
    """The per-step metric rows carry lr-SGD too (LearningRateMonitor logs
    at step granularity)."""
    import json

    args = make_args(model_type="jlogits", ckpt_dir=str(tmp_path),
                     batch_size=8, num_epochs=1, log_every_n_steps=2,
                     use_scheduler=True, learning_rate=0.05)
    trainer, _ = build_trainer(avmnist, args)
    trainer.fit()
    rows = [json.loads(line)
            for line in open(os.path.join(trainer.run_dir, "metrics.jsonl"))]
    step_rows = [r for r in rows if "train_step/train_loss" in r]
    assert step_rows and all(r.get("lr-SGD") == np.float32(0.05)
                             for r in step_rows)


def test_lr_stream_named_after_the_optimizer():
    """Lightning's LearningRateMonitor names the stream after the torch
    optimizer CLASS: SGD variants log ``lr-SGD``, the Adam variants
    (mustard, mimic jprobas, fakenews — see the optimizer-protocol test)
    log ``lr-Adam``."""
    import jax
    import numpy as np

    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet

    args = make_args(num_classes=2, batch_size=4, learning_rate=1e-3,
                     num_epochs=1, use_scheduler=False)
    spec = ModelSpec(module=MimicFusionNet(num_classes=2), num_modality=2)
    sample = [np.zeros((2, 5), np.float32), np.zeros((2, 24, 12), np.float32)]
    for opt, key in (("sgd", "lr-SGD"), ("adam", "lr-Adam")):
        state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                                   steps_per_epoch=1, optimizer=opt)
        assert state.lr_metric_name == key, (opt, state.lr_metric_name)


class _InterruptAfter:
    """Loader wrapper that runs ``action`` when batch n is reached."""

    def __init__(self, inner, n, action):
        self.inner, self.n, self.action = inner, n, action

    def set_epoch(self, epoch):
        self.inner.set_epoch(epoch)

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        for i, b in enumerate(self.inner):
            if i == self.n:
                self.action()
            yield b


def _raise_crash():
    raise RuntimeError("simulated crash")


def test_mid_epoch_resume_is_exact(tmp_path):
    """ckpt_every_n_steps + crash mid-epoch: resume skips the already-
    trained batches of the interrupted epoch and the final parameters match
    an uninterrupted run exactly (deterministic per-(seed, epoch) sampling
    + full-state checkpoints)."""
    def args_for(d):
        return make_args(model_type="jlogits", ckpt_dir=d, batch_size=8,
                         num_epochs=2, ckpt_every_n_steps=2)

    # uninterrupted reference run
    ref_dir = str(tmp_path / "ref")
    trainer0, _ = build_trainer(avmnist, args_for(ref_dir))
    trainer0.fit()

    # crashed run: dies after 5 batches of epoch 0; last mid-epoch save at
    # global step 4 (epochs_done=0, steps_into_epoch=4)
    crash_dir = str(tmp_path / "crash")
    trainer1, _ = build_trainer(avmnist, args_for(crash_dir))
    trainer1.train_loader = _InterruptAfter(trainer1.train_loader, 5,
                                           _raise_crash)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        trainer1.fit()
    # the simulated crash is an exception, not process death: the async
    # step-4 save may still be in flight — let it commit before a second
    # BestCheckpointer scans (and sweeps) pending dirs
    trainer1.ckpt.wait()

    trainer2, _ = build_trainer(avmnist, args_for(crash_dir))
    assert trainer2.resume()
    assert int(trainer2.state.step) == 4
    assert trainer2.ckpt.steps_into_epoch == 4
    trainer2.fit()

    assert int(trainer2.state.step) == int(trainer0.state.step)
    import jax

    ref_params = jax.tree_util.tree_leaves(trainer0.state.params)
    res_params = jax.tree_util.tree_leaves(trainer2.state.params)
    for a, b in zip(ref_params, res_params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7)
    # EMA calibration state also replayed exactly
    np.testing.assert_allclose(np.asarray(trainer0.state.ema),
                               np.asarray(trainer2.state.ema),
                               rtol=0, atol=1e-7)


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path):
    """Preemption semantics: SIGTERM mid-training saves a mid-epoch
    exact-resume checkpoint and raises Preempted(143); a --resume run
    continues from that exact point and ends identical to an
    uninterrupted run."""
    from multimodal_clinical_tpu.engine.trainer import Preempted

    def args_for(d):
        return make_args(model_type="jlogits", ckpt_dir=d, batch_size=8,
                         num_epochs=2)

    ref_dir = str(tmp_path / "ref")
    trainer0, _ = build_trainer(avmnist, args_for(ref_dir))
    trainer0.fit()

    pre_dir = str(tmp_path / "pre")
    trainer1, _ = build_trainer(avmnist, args_for(pre_dir))
    import signal

    trainer1.train_loader = _InterruptAfter(
        trainer1.train_loader, 5,
        lambda: os.kill(os.getpid(), signal.SIGTERM))
    import pytest as _pytest

    with _pytest.raises(Preempted) as exc:
        trainer1.fit()
    assert exc.value.code == 143
    # the signal fired while batch 5 was being produced; the checkpoint
    # landed at the first step boundary after it (6 batches into epoch 0)
    assert exc.value.step == 6

    trainer2, _ = build_trainer(avmnist, args_for(pre_dir))
    assert trainer2.resume()
    assert int(trainer2.state.step) == 6
    assert trainer2.ckpt.steps_into_epoch == 6
    trainer2.fit()

    import jax

    assert int(trainer2.state.step) == int(trainer0.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(trainer0.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7)


def test_multiseed_refuses_pp_and_sp():
    """The vmapped sweep runs mesh-less seed replicas: pipeline/sequence
    sharding flags must refuse loudly instead of silently falling back to
    the sequential/replicated paths."""
    import pytest

    from multimodal_clinical_tpu.benchmarks import food101
    from multimodal_clinical_tpu.engine.multiseed import run_multiseed

    args = make_args(pipeline_stages=4)
    with pytest.raises(NotImplementedError, match="mesh-less"):
        run_multiseed(args, food101, seeds=[0, 1])
    args = make_args(sequence_sharding=True)
    with pytest.raises(NotImplementedError, match="mesh-less"):
        run_multiseed(args, food101, seeds=[0, 1])


def test_legacy_dirs_test_final_weights(tmp_path):
    """The legacy standalone runners have NO ModelCheckpoint: trainer.test
    runs on the FINAL-epoch weights (avmnist/run_training.py:109-128; same
    shape in ave/vggsound/mustard), while new-style dirs reload the best
    val_avg_acc checkpoint (utils/run_trainer.py:27-33,65).  Pins both the
    per-benchmark spec wiring and the Trainer mechanism."""
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.benchmarks import (ave, cremad, food101,
                                                    mimic, mustard, vggsound)

    # spec wiring: legacy dirs final-weights, new-style dirs reload-best
    legacy = [(avmnist, {}), (ave, {"num_classes": 4}),
              (vggsound, {"num_classes": 4}), (mustard, {"num_classes": 2})]
    for mod, kw in legacy:
        spec, _ = mod.get_model_spec(make_args(**kw), n_train=32)
        assert spec.test_restore_best is False, mod.__name__
    for mod in (cremad, mimic, enrico):
        spec, _ = mod.get_model_spec(make_args(), n_train=32)
        assert spec.test_restore_best is True, mod.__name__
    spec, _ = food101.get_model_spec(make_args(model_type="qmf"), n_train=32)
    assert spec.test_restore_best is True

    # mechanism: after fit, zero the live weights; restore_best=False must
    # test the zeroed (final) weights, restore_best=True the checkpoint
    args = make_args(num_epochs=1, ckpt_dir=str(tmp_path))
    trainer, _ = build_trainer(avmnist, args)
    trainer.fit()
    trainer.state = trainer.state.replace(
        params=jax.tree.map(jnp.zeros_like, trainer.state.params))
    final = trainer.test(restore_best=False)
    # zeroed weights -> identical logits for every class -> argmax 0
    assert final["test_epoch/test_avg_acc"] <= 0.5
    restored = trainer.test(restore_best=True)
    assert restored["test_epoch/test_avg_acc"] != final[
        "test_epoch/test_avg_acc"]


def test_multiseed_best_val_tracker():
    """BestValTracker snapshots exactly the improving seeds' slices and
    keeps the earlier epoch on ties (checkpoint.py's strictly-greater
    best, mirroring ModelCheckpoint max mode)."""
    import jax.numpy as jnp

    from multimodal_clinical_tpu.engine.multiseed import BestValTracker

    def state_like(scale):
        p = {"w": jnp.arange(6, dtype=jnp.float32).reshape(3, 2) * scale}
        s = {"bn": jnp.ones((3, 4), jnp.float32) * scale}
        return p, s

    tr = BestValTracker(3)
    p1, s1 = state_like(1.0)
    improved = tr.update(np.array([0.5, 0.6, 0.7], np.float32), p1, s1)
    assert improved.all()

    # seed 1 improves, seed 0 degrades, seed 2 TIES (keeps epoch-1 weights)
    p2, s2 = state_like(2.0)
    improved = tr.update(np.array([0.4, 0.9, 0.7], np.float32), p2, s2)
    assert improved.tolist() == [False, True, False]
    np.testing.assert_allclose(tr.acc, [0.5, 0.9, 0.7])
    want_w = np.stack([np.asarray(p1["w"][0]), np.asarray(p2["w"][1]),
                       np.asarray(p1["w"][2])])
    np.testing.assert_allclose(np.asarray(tr.params["w"]), want_w)
    want_bn = np.stack([np.asarray(s1["bn"][0]), np.asarray(s2["bn"][1]),
                        np.asarray(s1["bn"][2])])
    np.testing.assert_allclose(np.asarray(tr.stats["bn"]), want_bn)

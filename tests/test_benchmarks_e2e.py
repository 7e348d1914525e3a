"""End-to-end smoke: every remaining benchmark trains+evals on the 8-device
mesh with tiny synthetic twins (avmnist/mimic/enrico/cremad covered in
test_engine*.py)."""

from types import SimpleNamespace

import pytest

from multimodal_clinical_tpu.benchmarks import ave, food101, mustard, vggsound
from multimodal_clinical_tpu.data.synthetic import make_synthetic_splits
from multimodal_clinical_tpu.engine.run import (
    DataBundle,
    build_loaders,
    init_state_on_mesh,
)
from multimodal_clinical_tpu.engine.trainer import Trainer
from multimodal_clinical_tpu.parallel.mesh import make_mesh


def make_args(**overrides):
    base = dict(
        num_classes=4, batch_size=8, learning_rate=0.01, num_epochs=1,
        dropout_p=0.1, data_path="/nonexistent", num_cpus=1, use_wandb=False,
        model_type="jlogits", group_name="t", seed=0, use_scheduler=False,
        grad_mod_type=None, alpha=0.1, mesh_shape=None, ckpt_dir=None,
        log_every_n_steps=0, use_video_frames=2, max_seq_len=8,
        vocab_size=500,
    )
    base.update(overrides)
    return SimpleNamespace(**base)


def run_tiny(benchmark, args, shapes):
    data = DataBundle(
        *make_synthetic_splits(args._synth_name, args.num_classes,
                               n_train=16, n_val=8, n_test=8, shapes=shapes),
        train_sampler="random", synthetic=True,
    )
    mesh = make_mesh()
    spec, opt_kwargs = benchmark.get_model_spec(args, n_train=len(data.train))
    loaders = build_loaders(args, data, mesh)
    state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    trainer = Trainer(args, spec, state, *loaders)
    trainer.fit()
    return trainer.test()


@pytest.mark.parametrize("model_type", ["jlogits", "jprobas", "ensemble"])
def test_ave_trains_with_on_device_specaugment(tmp_path, model_type):
    args = make_args(model_type=model_type, ckpt_dir=str(tmp_path))
    args._synth_name = "ave"
    summary = run_tiny(ave, args, shapes=[(33, 40, 1), (2, 32, 32, 3)])
    assert "test_epoch/test_avg_acc" in summary


def test_vggsound_waveform_to_spectrogram_path(tmp_path):
    """Raw-waveform batches go through the on-device STFT preprocess
    (XLA fallback on CPU)."""
    import numpy as np

    from multimodal_clinical_tpu.data.core import ArrayDataset

    args = make_args(model_type="jprobas", ckpt_dir=str(tmp_path))
    rng = np.random.default_rng(0)
    n = 16

    class WaveDataset(ArrayDataset):
        def gather(self, indices):
            out = super().gather(indices)
            out["x1_waveform"] = out.pop("x1")
            return out

    def make(n, seed):
        wave = rng.normal(scale=0.1, size=(n, 4000)).astype(np.float32)
        frames = rng.normal(size=(n, 2, 32, 32, 3)).astype(np.float32)
        labels = rng.integers(0, 4, n).astype(np.int32)
        return WaveDataset([wave, frames], labels)

    data = DataBundle(make(n, 0), make(8, 1), make(8, 2),
                      train_sampler="random", synthetic=True)
    mesh = make_mesh()
    spec, opt_kwargs = vggsound.get_model_spec(args, n_train=n)
    loaders = build_loaders(args, data, mesh)

    # init with the post-STFT spectrogram shape: 4000 samples @ hop 128 -> 32
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.engine.state import create_train_state

    x1s = jnp.zeros((2, 129, 32, 1))
    x2s = jnp.zeros((2, 2, 32, 32, 3))
    state = create_train_state(spec, args, jax.random.PRNGKey(0), [x1s, x2s],
                               steps_per_epoch=2)
    trainer = Trainer(args, spec, state, *loaders,
                      run_dir=str(tmp_path / "run"))
    trainer.fit()
    summary = trainer.test()
    assert "test_epoch/test_avg_acc" in summary


def test_mustard_three_modality_trains(tmp_path):
    args = make_args(num_classes=2, ckpt_dir=str(tmp_path))
    args._synth_name = "mustard"
    summary = run_tiny(mustard, args,
                       shapes=[(8, 371), (8, 81), (8, 300)])
    assert "test_epoch/test_avg_x3_acc_uncal" in summary


@pytest.mark.slow
def test_food101_siglip_trains_one_step(tmp_path):
    args = make_args(num_classes=4, model_type="jlogits", batch_size=8,
                     ckpt_dir=str(tmp_path))
    args._synth_name = "food101"
    summary = run_tiny(food101, args, shapes=[(64,), (224, 224, 3)])
    assert "test_epoch/test_avg_acc" in summary


def test_sampler_policy_matches_reference_loader_wiring():
    """DataBundle sampler policy per benchmark == the reference runners'
    ACTUAL DataLoader wiring.  'weighted' only where a sampler is PASSED
    to the loader: cremad train+val (cremad/run_trainer.py:40-61), enrico
    train (enrico/run_training.py:39-45), ave train+val
    (ave/run_training.py:62-81), vggsound train+val
    (vggsound/run_training.py:62-80).  Everywhere a loader gets neither a
    sampler nor shuffle=True, iteration is sequential (torch defaults
    shuffle=False): the avmnist/mustard/fakenews/food101/mimic TRAIN
    loaders (mimic builds a balanced sampler it never passes,
    mimic/run_training.py:39-46), and the ave/vggsound TEST loaders
    (their test samplers are likewise built but never passed,
    ave/run_training.py:84-92, vggsound/run_training.py:84-92)."""
    from multimodal_clinical_tpu.benchmarks import (avmnist, cremad, enrico,
                                                    fakenews, mimic)

    expect = {
        avmnist: ("sequential", "sequential", "sequential"),
        mimic: ("sequential", "sequential", "sequential"),
        mustard: ("sequential", "sequential", "sequential"),
        fakenews: ("sequential", "sequential", "sequential"),
        food101: ("sequential", "sequential", "sequential"),
        cremad: ("weighted", "weighted", "sequential"),
        enrico: ("weighted", "sequential", "sequential"),
        ave: ("weighted", "weighted", "sequential"),
        vggsound: ("weighted", "weighted", "sequential"),
    }
    for mod, policy in expect.items():
        args = make_args()
        data = mod.get_data(args)
        got = (data.train_sampler, data.val_sampler, data.test_sampler)
        assert got == policy, f"{mod.__name__}: {got} != {policy}"

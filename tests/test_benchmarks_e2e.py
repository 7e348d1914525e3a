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


def test_fakenews_embed_fusion_trains(tmp_path):
    """The reference-architecture embed variant (fakenews/model.py:34-257):
    precomputed text+dialogue embeddings + bottleneck image tower, single
    fused head under jlogits/num_modality=1, Adam(1e-4)."""
    from multimodal_clinical_tpu.benchmarks import fakenews

    args = make_args(model_type="jlogits_embed_dialogue", num_classes=3,
                     ckpt_dir=str(tmp_path), embed_stage_sizes=(1, 1, 1, 1),
                     text_embed_dim=16)
    args._synth_name = "fakenews_embed_dialogue"
    summary = run_tiny(fakenews, args,
                       shapes=[(16,), (32, 32, 3), (16,)])
    assert "test_epoch/test_avg_acc" in summary
    # legacy flat aliases (model.py:207-226 test_epoch_end namespace)
    assert "avg_test_acc" in summary


def test_fakenews_embed_resnet152_weights_port(tmp_path):
    """`resnet152_weights` injects a local torchvision-style checkpoint
    into the embed variant's image tower (the reference builds it with
    torchvision.models.resnet152(pretrained=True), fakenews/model.py:238
    — zero-egress here, so the state dict must be a local file)."""
    import os
    import sys

    import numpy as np
    import torch

    reference = "/root/reference"
    if not os.path.isdir(reference):
        pytest.skip("reference checkout not present")
    sys.path.insert(0, os.path.join(reference, "cremad"))
    try:
        import backbone as ref_backbone  # type: ignore
    finally:
        sys.path.pop(0)

    import jax

    from multimodal_clinical_tpu.benchmarks import fakenews
    from multimodal_clinical_tpu.engine.state import create_train_state

    torch.manual_seed(3)
    r152 = ref_backbone.ResNet(ref_backbone.Bottleneck, [1, 1, 1, 1],
                               "visual")
    torch.save(r152.state_dict(), tmp_path / "r152.pth")

    args = make_args(model_type="jlogits_embed", num_classes=3,
                     text_embed_dim=16, embed_stage_sizes=(1, 1, 1, 1),
                     resnet152_weights=str(tmp_path / "r152.pth"))
    spec, opt_kwargs = fakenews.get_model_spec(args, n_train=8)
    sample = [np.zeros((2, 16), np.float32),
              np.zeros((2, 32, 32, 3), np.float32)]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=1, **opt_kwargs)
    state = fakenews.load_pretrained(args, state)
    want = r152.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(state.params["image_module"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got, want)
    # wrong variant refuses loudly
    args2 = make_args(model_type="jlogits",
                      resnet152_weights=str(tmp_path / "r152.pth"))
    spec2, ok2 = fakenews.get_model_spec(args2, n_train=8)
    sample2 = [np.zeros((2, 8), np.int32),
               np.zeros((2, 32, 32, 3), np.float32)]
    state2 = create_train_state(spec2, args2, jax.random.PRNGKey(0), sample2,
                                steps_per_epoch=1, **ok2)
    with pytest.raises(ValueError, match="jlogits_embed"):
        fakenews.load_pretrained(args2, state2)


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


def test_optimizer_protocol_matches_reference_configure_optimizers():
    """Every reachable variant's opt_kwargs == the reference model file's
    configure_optimizers.  Three protocols exist in the reference:

    * bare Adam(lr), torch defaults, no scheduler — mustard
      (mustard/joint_model.py:276), mimic jprobas
      (mimic/joint_model_proba.py:315), fakenews with the module-scope
      LEARNING_RATE=1e-4 constant that ignores args.lr
      (fakenews/model.py:18,230).  (enrico/joint_model_proba.py:282 also
      uses Adam but is unreachable — no jprobas branch in
      enrico/__init__.py.)
    * plain SGD(lr) — no momentum, no wd, no scheduler — all five avmnist
      model files (avmnist/joint_model.py:340-342 et al).
    * SGD(lr, momentum=0.9, wd=1e-4) + StepLR — everything else
      (utils/BaseModel.py:276-279 and the per-file overrides; the StepLR
      step_size/gamma live on ModelSpec and are asserted here too).
    """
    from multimodal_clinical_tpu.benchmarks import (avmnist, cremad, enrico,
                                                    fakenews, mimic)

    def kwargs_of(mod, model_type, **extra):
        args = make_args(model_type=model_type, **extra)
        _, opt_kwargs = mod.get_model_spec(args, n_train=32)
        return opt_kwargs

    # bare Adam(lr)
    assert kwargs_of(mustard, "jlogits", num_classes=2) == {
        "optimizer": "adam"}
    assert kwargs_of(mimic, "jprobas") == {"optimizer": "adam"}
    assert kwargs_of(fakenews, "jlogits") == {
        "optimizer": "adam", "lr_override": 1.0e-4}
    # the embed-fusion variants share model.py's module-scope constant
    for mt in ("jlogits_embed", "jlogits_embed_dialogue"):
        assert kwargs_of(fakenews, mt) == {
            "optimizer": "adam", "lr_override": 1.0e-4}, mt

    # plain SGD(lr): avmnist, every variant
    for mt in ("jlogits", "jprobas", "jprobas_jlogits", "ensemble",
               "ensemble_probas"):
        assert kwargs_of(avmnist, mt) == {"momentum": 0.0,
                                          "weight_decay": 0.0}, mt

    # SGD(0.9, 1e-4) + StepLR: the rest use create_train_state defaults
    # (momentum=0.9, wd=1e-4 — utils/BaseModel.py:276) with per-file StepLR
    for mod, mt, step, gamma in [
        (mimic, "jlogits", 70, 0.1),     # mimic/joint_model.py:257-260
        (mimic, "ensemble", 70, 0.1),    # mimic/ensemble_model.py:254-257
        (mimic, "qmf", 70, 0.1),         # mimic/qmf_model.py:266-269
        (cremad, "jlogits", 70, 0.1),    # utils/BaseModel.py:276-279
        (enrico, "jlogits", 10, 0.5),    # enrico/joint_model.py:101-104
        (enrico, "ensemble", 70, 0.5),   # enrico/ensemble_model.py:90-93
        (ave, "jlogits", 10, 0.5),       # ave/joint_model.py:251-254
        (vggsound, "jlogits", 30, 0.5),  # vggsound/joint_model.py:250-253
        (food101, "jlogits", 50, 0.5),   # food101/joint_model.py:80-83
    ]:
        args = make_args(model_type=mt)
        spec, opt_kwargs = mod.get_model_spec(args, n_train=32)
        assert "optimizer" not in opt_kwargs and \
            "momentum" not in opt_kwargs, (mod.__name__, mt, opt_kwargs)
        assert (spec.sched_step_size, spec.sched_gamma) == (step, gamma), (
            mod.__name__, mt, spec.sched_step_size, spec.sched_gamma)
    # food101 jprobas variants carry their own StepLR(500, 0.75)
    # (food101/joint_model_proba.py:266-269)
    spec, _ = food101.get_model_spec(make_args(model_type="jprobas"),
                                     n_train=32)
    assert (spec.sched_step_size, spec.sched_gamma) == (500, 0.75)


def test_adam_matches_torch_adam_stepwise():
    """make_optimizer('adam') == torch.optim.Adam numerically: 5 steps on
    identical params/grads, bit-level agreement to f32 tolerance.  Pins
    eps OUTSIDE the sqrt (optax eps_root=0 vs eps) and the bias-correction
    ordering against the actual torch implementation the reference calls
    (mustard/joint_model.py:276)."""
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    from multimodal_clinical_tpu.engine.state import make_optimizer

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads = [rng.normal(size=(7, 5)).astype(np.float32) for _ in range(5)]
    lr = 3e-3

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tw], lr=lr)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    tx = make_optimizer(optax.constant_schedule(lr), optimizer="adam")
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-6, atol=1e-6)

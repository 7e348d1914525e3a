"""food101 legacy towers: Bottleneck-ResNet + BERT parity and e2e runs.

Covers VERDICT missing #2: the frozen ResNet50+BERT jprobas towers
(food101/joint_model_proba.py / joint_model_proba_logits.py:30-90).
Numerical parity is pinned against the reference's own Bottleneck ResNet
(cremad/backbone.py, imported read-only) and HF's torch BertModel.
"""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch

REFERENCE = "/root/reference"


def _load_reference_backbone():
    sys.path.insert(0, os.path.join(REFERENCE, "cremad"))
    try:
        import backbone as ref_backbone  # type: ignore
    finally:
        sys.path.pop(0)
    return ref_backbone


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not present")
def test_bottleneck_encoder_matches_reference_forward():
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.models.resnet import BottleneckResNetEncoder
    from multimodal_clinical_tpu.models.torch_port import (
        port_bottleneck_encoder,
    )

    ref = _load_reference_backbone()
    torch.manual_seed(0)
    net = ref.ResNet(ref.Bottleneck, [1, 1, 1, 1], "audio")
    net.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    params, stats = port_bottleneck_encoder(net.state_dict(),
                                            stage_sizes=(1, 1, 1, 1))
    enc = BottleneckResNetEncoder(stage_sizes=(1, 1, 1, 1))
    ours = enc.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False)
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_nchw, ref_out, rtol=1e-4, atol=1e-4)


def test_bert_encoder_matches_hf_torch():
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from multimodal_clinical_tpu.models.bert import BertEncoder
    from multimodal_clinical_tpu.models.torch_port import port_bert

    cfg = transformers.BertConfig(
        vocab_size=500, hidden_size=96, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=384,
        max_position_embeddings=64)
    torch.manual_seed(1)
    hf = transformers.BertModel(cfg)
    hf.eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(5, 500, size=(3, 10)).astype(np.int32)
    ids[0, 7:] = 0  # right padding in one row
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        t_out = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                   attention_mask=torch.tensor(mask)
                   ).last_hidden_state.numpy()

    params = port_bert(hf.state_dict(), num_layers=2, num_heads=4)
    enc = BertEncoder(vocab_size=500, width=96, num_layers=2, heads=4,
                      mlp_dim=384, max_pos=64)
    ours = np.asarray(enc.apply({"params": params}, jnp.asarray(ids),
                                train=False))
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], t_out[valid], rtol=1e-4,
                               atol=2e-5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not present")
def test_load_pretrained_ports_local_tower_checkpoints(tmp_path):
    """`resnet50_weights` / `bert_weights` config keys inject local torch
    checkpoints into the legacy towers (food101/joint_model_proba_logits
    .py:52-66 downloads them; zero-egress here, so files are local)."""
    transformers = pytest.importorskip("transformers")
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.benchmarks import food101
    from multimodal_clinical_tpu.engine.state import create_train_state

    ref = _load_reference_backbone()
    torch.manual_seed(0)
    r50 = ref.ResNet(ref.Bottleneck, [1, 1, 1, 1], "visual")
    torch.save(r50.state_dict(), tmp_path / "resnet50.pth")
    cfg = transformers.BertConfig(
        vocab_size=500, hidden_size=96, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=384)
    torch.manual_seed(1)
    hf = transformers.BertModel(cfg)
    torch.save(hf.state_dict(), tmp_path / "bert.pth")

    args = SimpleNamespace(
        num_classes=4, batch_size=8, learning_rate=0.05, num_epochs=1,
        use_scheduler=True, seed=0, model_type="jprobas",
        legacy_stages=(1, 1, 1, 1), legacy_bert_layers=2,
        legacy_bert_width=96, legacy_bert_heads=4, legacy_bert_vocab=500,
        resnet50_weights=str(tmp_path / "resnet50.pth"),
        bert_weights=str(tmp_path / "bert.pth"),
    )
    spec, _ = food101.get_model_spec(args, n_train=8)
    sample = [np.zeros((2, 32, 32, 3), np.float32),
              np.zeros((2, 10), np.int32)]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=1)
    state = food101.load_pretrained(args, state)

    from multimodal_clinical_tpu.models.torch_port import (
        port_bert, port_bottleneck_encoder,
    )

    want_p, want_s = port_bottleneck_encoder(r50.state_dict(),
                                             stage_sizes=(1, 1, 1, 1))
    np.testing.assert_array_equal(
        np.asarray(state.params["x1_model"]["features"]["Conv_0"]["kernel"]),
        want_p["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(state.batch_stats["x1_model"]["features"]["_BN_0"]
                   ["BatchNorm_0"]["mean"]),
        want_s["_BN_0"]["BatchNorm_0"]["mean"])
    want_bert = port_bert(hf.state_dict(), num_layers=2, num_heads=4)
    np.testing.assert_array_equal(
        np.asarray(state.params["x2_model"]["model"]["word_embeddings"]
                   ["embedding"]),
        want_bert["word_embeddings"]["embedding"])
    # the injected trees still run a forward pass
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.zeros((2, 32, 32, 3), jnp.float32),
        jnp.zeros((2, 10), jnp.int32), train=False)
    assert np.asarray(out["logits"][0]).shape == (2, 4)

    # the keys only make sense for the legacy variants
    args.model_type = "qmf"
    spec2, _ = food101.get_model_spec(args, n_train=8)
    state2 = create_train_state(
        spec2, args, jax.random.PRNGKey(0),
        [np.zeros((2, 10), np.int32),
         np.zeros((2, 224, 224, 3), np.float32)],  # SigLIP pos table is 14x14
        steps_per_epoch=1)
    with pytest.raises(ValueError, match="legacy"):
        food101.load_pretrained(args, state2)


def test_legacy_model_types_run_e2e(tmp_path):
    """Both legacy model_types train end-to-end on the synthetic twin
    (shrunken towers for CPU speed)."""
    from multimodal_clinical_tpu.benchmarks import food101
    from multimodal_clinical_tpu.engine.run import (
        build_loaders, init_state_on_mesh,
    )
    from multimodal_clinical_tpu.engine.trainer import Trainer
    from multimodal_clinical_tpu.parallel.mesh import make_mesh

    for model_type in ("jprobas", "jprobas_jlogits"):
        args = SimpleNamespace(
            num_classes=4, batch_size=16, learning_rate=0.05, num_epochs=1,
            dropout_p=0.1, data_path=str(tmp_path), num_cpus=1,
            use_wandb=False, model_type=model_type, group_name="t", seed=0,
            use_scheduler=True, grad_mod_type=None, alpha=0.1,
            mesh_shape=None, ckpt_dir=str(tmp_path / model_type),
            log_every_n_steps=0,
            legacy_stages=(1, 1), legacy_bert_layers=1,
            legacy_bert_width=32, legacy_bert_heads=4,
            legacy_bert_vocab=200, max_seq_len=16,
        )
        mesh = make_mesh()
        data = food101.get_data(args)
        # shrink the synthetic twin inputs to the tiny towers
        spec, opt_kwargs = food101.get_model_spec(args,
                                                  n_train=len(data.train))
        loaders = build_loaders(args, data, mesh)
        state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
        trainer = Trainer(args, spec, state, *loaders)
        trainer.fit()
        summary = trainer.test()
        assert "test_epoch/test_avg_acc" in summary
        # StepLR(500, 0.75) wired (food101/joint_model_proba_logits.py:282)
        assert spec.sched_step_size == 500
        assert spec.sched_gamma == 0.75


def test_frozen_towers_stay_bit_exact_under_training():
    """requires_grad=False parity: the frozen towers must not move AT ALL
    (torch SGD skips grad-less params, so weight decay never touches them
    — enrico/ensemble_model.py:37-38).  stop_gradient alone would leak a
    wd*param update through optax.add_decayed_weights each step."""
    import jax
    import jax.numpy as jnp

    from multimodal_clinical_tpu.benchmarks import food101
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step

    args = SimpleNamespace(
        num_classes=3, batch_size=8, learning_rate=0.1, num_epochs=2,
        use_scheduler=False, seed=0, model_type="jprobas",
        legacy_stages=(1, 1), legacy_bert_layers=1, legacy_bert_width=32,
        legacy_bert_heads=4, legacy_bert_vocab=64,
    )
    spec, _ = food101.get_model_spec(args, n_train=8)
    assert spec.frozen_prefixes  # the contract under test
    rng = np.random.default_rng(0)
    sample = [rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
              rng.integers(1, 64, size=(2, 12)).astype(np.int32)]
    state = create_train_state(spec, args, jax.random.PRNGKey(0), sample,
                               steps_per_epoch=4)
    frozen_before = jax.tree_util.tree_map(
        np.array, state.params["x1_model"]["features"])
    bert_before = jax.tree_util.tree_map(
        np.array, state.params["x2_model"]["model"])
    head_before = np.array(
        state.params["x1_model"]["fc"]["Dense_0"]["kernel"])

    step = make_train_step(spec)
    batch = {
        "x1": jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32),
        "x2": jnp.asarray(rng.integers(1, 64, size=(8, 12)), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 3, size=8), jnp.int32),
        "idx": jnp.arange(8, dtype=jnp.int32),
        "valid": jnp.ones(8, jnp.float32),
    }
    for _ in range(3):
        state, _metrics = step(state, batch)

    for before, after in (
        (frozen_before, state.params["x1_model"]["features"]),
        (bert_before, state.params["x2_model"]["model"]),
    ):
        jax.tree_util.tree_map(
            lambda b, a: np.testing.assert_array_equal(b, np.asarray(a)),
            before, after)
    assert not np.array_equal(head_before,
                              np.asarray(state.params["x1_model"]["fc"]
                                         ["Dense_0"]["kernel"]))

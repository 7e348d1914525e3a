"""Model shape/contract tests for every fusion net (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_clinical_tpu.models import (
    AVMnistFusionNet,
    CremadFusionNet,
    EnricoFusionNet,
    FakeNewsFusionNet,
    LeNet,
    MimicFusionNet,
    MustardFusionNet,
)


def init_and_apply(module, *inputs, train=False):
    variables = module.init(jax.random.PRNGKey(0), *inputs, train=train)
    if train:
        out, _ = module.apply(variables, *inputs, train=True,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(1)})
    else:
        out = module.apply(variables, *inputs, train=False)
    return out, variables


def test_lenet_output_dims_match_reference():
    # avmnist x1: LeNet(6, 3) on 28x28 -> 48 dims; x2: LeNet(6, 5) on
    # 112x112 -> 192 dims (avmnist/joint_model.py:107-110)
    x = jnp.zeros((2, 28, 28, 1))
    out, _ = init_and_apply(LeNet(6, 3), x)
    assert out.shape == (2, 48)
    x = jnp.zeros((2, 112, 112, 1))
    out, _ = init_and_apply(LeNet(6, 5), x)
    assert out.shape == (2, 192)


def test_avmnist_fusion_net():
    x1 = jnp.zeros((2, 28, 28, 1))
    x2 = jnp.zeros((2, 112, 112, 1))
    out, variables = init_and_apply(AVMnistFusionNet(10), x1, x2)
    assert [l.shape for l in out["logits"]] == [(2, 10), (2, 10)]
    assert "x1_model" in variables["params"]
    assert "x2_model" in variables["params"]


def test_mimic_fusion_net():
    x1 = jnp.zeros((2, 5))
    x2 = jnp.zeros((2, 24, 12))
    out, variables = init_and_apply(MimicFusionNet(6), x1, x2)
    assert [l.shape for l in out["logits"]] == [(2, 6), (2, 6)]
    # MLP/GRU have no 4-D params => OGM-GE no-op holds structurally
    leaves = jax.tree_util.tree_leaves(variables["params"]["x1_model"])
    assert all(l.ndim < 4 for l in leaves)


def test_cremad_fusion_net_shapes_and_conv_params():
    x1 = jnp.zeros((2, 65, 80, 1))      # small spectrogram
    x2 = jnp.zeros((2, 2, 32, 32, 3))   # 2 frames
    out, variables = init_and_apply(CremadFusionNet(6), x1, x2, train=True)
    assert [l.shape for l in out["logits"]] == [(2, 6), (2, 6)]
    # conv (4-D) params exist in both encoder subtrees (OGM-GE targets)
    for key in ("x1_model", "x2_model"):
        leaves = jax.tree_util.tree_leaves(variables["params"][key])
        assert any(l.ndim == 4 for l in leaves), key


def test_enrico_fusion_net_embeddings():
    x = jnp.zeros((2, 64, 32, 3))
    out, _ = init_and_apply(EnricoFusionNet(20), x, x)
    assert [l.shape for l in out["logits"]] == [(2, 20), (2, 20)]
    assert [e.shape for e in out["embeddings"]] == [(2, 512), (2, 512)]


def test_enrico_frozen_features_stop_gradient():
    module = EnricoFusionNet(4, freeze_features=True)
    x = jnp.ones((2, 32, 32, 3))
    variables = module.init(jax.random.PRNGKey(0), x, x, train=False)

    def loss(params):
        out = module.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           x, x, train=False)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in out["logits"])

    grads = jax.grad(loss)(variables["params"])
    feat_grads = jax.tree_util.tree_leaves(
        grads["x1_model"]["features"])
    cls_grads = jax.tree_util.tree_leaves(grads["x1_model"]["classifier"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in feat_grads)
    assert any(float(jnp.abs(g).max()) > 0.0 for g in cls_grads)


def test_mustard_three_modality():
    xs = [jnp.zeros((2, 8, d)) for d in (371, 81, 300)]
    out, _ = init_and_apply(MustardFusionNet(2), *xs)
    assert len(out["logits"]) == 3
    assert all(l.shape == (2, 2) for l in out["logits"])


def test_fakenews_fusion_net():
    x1 = jnp.zeros((2, 16), jnp.int32)
    x2 = jnp.zeros((2, 32, 32, 3))
    out, _ = init_and_apply(FakeNewsFusionNet(6, vocab_size=1000), x1, x2,
                            train=True)
    assert [l.shape for l in out["logits"]] == [(2, 6), (2, 6)]


@pytest.mark.slow
def test_siglip_towers_shapes():
    from multimodal_clinical_tpu.models.siglip import SigLIPModel

    module = SigLIPModel()
    ids = jnp.zeros((1, 64), jnp.int32)
    px = jnp.zeros((1, 224, 224, 3))
    variables = module.init(jax.random.PRNGKey(0), ids, px, train=False)
    text, image = module.apply(variables, ids, px, train=False)
    assert text.shape == (1, 768)
    assert image.shape == (1, 768)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(variables["params"]))
    # siglip-base is ~203M params; architecture should be in that ballpark
    assert 150e6 < n_params < 260e6, n_params


def test_stem_space_to_depth_matches_plain_conv():
    import numpy as np
    from multimodal_clinical_tpu.models.resnet import StemConv

    for (h, w, c) in [(65, 81, 1), (32, 32, 3)]:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, h, w, c)
                                            ).astype(np.float32))
        plain = StemConv(64, space_to_depth=False)
        variables = plain.init(jax.random.PRNGKey(0), x)
        y_plain = plain.apply(variables, x)
        y_s2d = StemConv(64, space_to_depth=True).apply(variables, x)
        assert y_plain.shape == y_s2d.shape == (2, (h - 1) // 2 + 1,
                                                (w - 1) // 2 + 1, 64)
        np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_s2d),
                                   atol=2e-5)


def test_resnet_remat_is_math_identical():
    """remat variants keep the param tree AND the loss/grads identical
    (the remat wrapper is pinned to the BasicBlock_i naming)."""
    import numpy as np
    from multimodal_clinical_tpu.models.resnet import ResNetEncoder

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)

    def loss_and_grads(remat):
        enc = ResNetEncoder(dtype=jnp.float32, remat=remat)
        v = enc.init(jax.random.PRNGKey(0), x, True)

        def loss(p):
            out, _ = enc.apply({"params": p,
                                "batch_stats": v["batch_stats"]},
                               x, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(loss))(v["params"])

    l0, g0 = loss_and_grads(None)
    for remat in ("convs", "none"):
        l1, g1 = loss_and_grads(remat)
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

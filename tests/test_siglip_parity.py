"""SigLIP architecture parity vs HF torch SiglipModel (random init, ported
weights, forward comparison) — the "hard part" flagged by SURVEY §7."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow


def test_siglip_towers_match_hf_torch():
    from transformers import SiglipConfig, SiglipModel

    from multimodal_clinical_tpu.models.siglip import (
        SigLIPModel,
        port_siglip_state_dict,
    )

    torch.manual_seed(0)
    tm = SiglipModel(SiglipConfig()).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 32000, size=(2, 64)).astype(np.int64)
    px = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        out = tm(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(px))
    want_text = out.text_embeds.numpy()
    want_image = out.image_embeds.numpy()

    module = SigLIPModel()  # fp32 for the comparison
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.asarray(ids.astype(np.int32)),
                            jnp.zeros((2, 224, 224, 3)), train=False)
    params = port_siglip_state_dict(tm.state_dict(), variables["params"])
    got_text, got_image = module.apply(
        {"params": params},
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(px.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got_text), want_text,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_image), want_image,
                               rtol=5e-3, atol=5e-3)


_TINY = dict(width=64, layers=2, heads=2, mlp_dim=128, patch=16,
             image_size=32, text_len=16, vocab=1000)


def test_siglip_train_step_trajectory_matches_torch():
    """TRAINING parity for the food101 north-star tower — not just forward.

    A tiny-geometry SigLIP (2 layers, width 64) + the reference's MLP heads
    (food101/joint_model.py:10-24, dropout p=0 for determinism), identical
    ported initialization, identical batches, the reference's optimizer
    SGD(momentum=0.9, wd=1e-4) (food101/joint_model.py:80) and jlogits loss
    (avg-logits CE, food101/joint_model.py:59-62): per-step train losses of
    HF-torch and our jlogits step factory must agree to float-rounding —
    this pins LayerNorm/attention/MAP-head GRADIENTS, which the forward test
    above cannot."""
    from transformers import SiglipConfig, SiglipModel

    from multimodal_clinical_tpu.models.siglip import (
        SigLIPModel,
        port_siglip_state_dict,
    )

    num_classes, batch, steps, lr, hidden = 11, 8, 6, 0.05, 32

    cfg = SiglipConfig(
        text_config=dict(hidden_size=_TINY["width"],
                         intermediate_size=_TINY["mlp_dim"],
                         num_hidden_layers=_TINY["layers"],
                         num_attention_heads=_TINY["heads"],
                         vocab_size=_TINY["vocab"],
                         max_position_embeddings=_TINY["text_len"]),
        vision_config=dict(hidden_size=_TINY["width"],
                           intermediate_size=_TINY["mlp_dim"],
                           num_hidden_layers=_TINY["layers"],
                           num_attention_heads=_TINY["heads"],
                           image_size=_TINY["image_size"],
                           patch_size=_TINY["patch"]),
    )
    torch.manual_seed(0)

    class RefMLP(torch.nn.Module):  # food101/joint_model.py:10-24
        def __init__(self):
            super().__init__()
            self.mlp = torch.nn.Sequential(
                torch.nn.Linear(_TINY["width"], hidden), torch.nn.ReLU(),
                torch.nn.Dropout(0.0),
                torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
                torch.nn.Dropout(0.0),
                torch.nn.Linear(hidden, num_classes))

        def forward(self, x):
            return self.mlp(x)

    class RefFusion(torch.nn.Module):  # food101/joint_model.py:26-66
        def __init__(self):
            super().__init__()
            self.model = SiglipModel(cfg)
            self.x1_model = RefMLP()
            self.x2_model = RefMLP()
            self.loss_fn = torch.nn.CrossEntropyLoss()

        def forward(self, ids, px, label):
            out = self.model(input_ids=ids, pixel_values=px)
            l1 = self.x1_model(out.text_embeds)
            l2 = self.x2_model(out.image_embeds)
            avg = (l1 + l2) / 2
            return self.loss_fn(avg, label)

    net = RefFusion().train()
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9,
                          weight_decay=1.0e-4)

    rng = np.random.default_rng(3)
    ids = rng.integers(1, _TINY["vocab"],
                       size=(steps, batch, _TINY["text_len"])).astype(np.int64)
    px = rng.normal(size=(steps, batch, 3, _TINY["image_size"],
                          _TINY["image_size"])).astype(np.float32) * 0.25
    labels = rng.integers(0, num_classes, size=(steps, batch)).astype(np.int64)

    torch_losses = []
    for s in range(steps):
        opt.zero_grad()
        loss = net(torch.tensor(ids[s]), torch.tensor(px[s]),
                   torch.tensor(labels[s]))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- our engine, initialized from the SAME torch weights ----
    from types import SimpleNamespace

    import jax.numpy as jnp
    from flax import linen as nn

    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models import torch_port
    from multimodal_clinical_tpu.models.mlp import HeadMLP

    class TinyFood101Net(nn.Module):  # Food101FusionNet, tiny geometry
        num_classes: int

        @nn.compact
        def __call__(self, x1, x2, train=True):
            text, image = SigLIPModel(name="model", **_TINY)(x1, x2, train)
            l1 = HeadMLP(self.num_classes, hidden_dim=hidden, dropout_p=0.0,
                         name="x1_model")(text, train)
            l2 = HeadMLP(self.num_classes, hidden_dim=hidden, dropout_p=0.0,
                         name="x2_model")(image, train)
            return {"logits": [l1, l2]}

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=lr, num_epochs=1,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(module=TinyFood101Net(num_classes=num_classes))
    state = create_train_state(
        spec, args, jax.random.PRNGKey(0),
        [jnp.asarray(ids[0][:2].astype(np.int32)),
         jnp.asarray(px[0][:2].transpose(0, 2, 3, 1))],
        steps_per_epoch=steps, momentum=0.9, weight_decay=1.0e-4)

    torch.manual_seed(0)
    sd = RefFusion().state_dict()  # fresh copy of the same init
    params = dict(state.params)
    params["model"] = port_siglip_state_dict(
        {k[len("model."):]: v for k, v in sd.items()
         if k.startswith("model.")},
        state.params["model"], width=_TINY["width"], heads=_TINY["heads"],
        layers=_TINY["layers"])
    for head in ("x1_model", "x2_model"):
        ported = dict(params[head])
        for dst, src in (("TorchDense_0", "mlp.0"), ("TorchDense_1", "mlp.3"),
                         ("TorchDense_2", "mlp.6")):
            ported[dst] = torch_port.port_torch_linear(
                sd[f"{head}.{src}.weight"], sd[f"{head}.{src}.bias"])
        params[head] = ported
    state = state.replace(params=params)

    step = make_train_step(spec)
    ours_losses = []
    for s in range(steps):
        b = {"x1": jnp.asarray(ids[s].astype(np.int32)),
             "x2": jnp.asarray(px[s].transpose(0, 2, 3, 1)),
             "label": jnp.asarray(labels[s].astype(np.int32)),
             "idx": jnp.arange(batch, dtype=jnp.int32),
             "valid": jnp.ones(batch, jnp.float32)}
        state, metrics = step(state, b)
        ours_losses.append(float(metrics["train_loss"]))

    np.testing.assert_allclose(ours_losses, torch_losses, rtol=0, atol=5e-3)


def test_siglip_porting_into_pipelined_layout():
    """HF weights port into the PIPELINED tower layout (stage-stacked
    params, models/siglip.unstack_tower_layers round-trip inside
    port_siglip_state_dict) with the same forward as the loop layout —
    GPipe'd towers keep local-checkpoint support (round-4 review fix)."""
    from transformers import SiglipConfig, SiglipModel as TorchSiglip

    from multimodal_clinical_tpu.models.siglip import (
        SigLIPModel, port_siglip_state_dict,
    )

    cfg = SiglipConfig(
        text_config=dict(hidden_size=_TINY["width"],
                         intermediate_size=_TINY["mlp_dim"],
                         num_hidden_layers=_TINY["layers"],
                         num_attention_heads=_TINY["heads"],
                         vocab_size=_TINY["vocab"],
                         max_position_embeddings=_TINY["text_len"]),
        vision_config=dict(hidden_size=_TINY["width"],
                           intermediate_size=_TINY["mlp_dim"],
                           num_hidden_layers=_TINY["layers"],
                           num_attention_heads=_TINY["heads"],
                           image_size=_TINY["image_size"],
                           patch_size=_TINY["patch"]),
    )
    torch.manual_seed(1)
    tm = TorchSiglip(cfg).eval()
    rng = np.random.default_rng(1)
    ids = rng.integers(1, _TINY["vocab"], size=(2, _TINY["text_len"]))
    px = rng.normal(size=(2, _TINY["image_size"], _TINY["image_size"], 3)
                    ).astype(np.float32)

    loop = SigLIPModel(**_TINY)
    pp = SigLIPModel(pipeline_stages=2, mesh=None, **_TINY)
    ids_j = jnp.asarray(ids.astype(np.int32))
    px_j = jnp.asarray(px)
    kw = dict(width=_TINY["width"], heads=_TINY["heads"],
              layers=_TINY["layers"])
    loop_params = port_siglip_state_dict(
        tm.state_dict(),
        loop.init(jax.random.PRNGKey(0), ids_j, px_j, train=False)["params"],
        **kw)
    pp_params = port_siglip_state_dict(
        tm.state_dict(),
        pp.init(jax.random.PRNGKey(0), ids_j, px_j, train=False)["params"],
        **kw)
    # pipelined tree really is stage-stacked
    assert "pipeline" in pp_params["text_model"]
    want_t, want_i = loop.apply({"params": loop_params}, ids_j, px_j,
                                train=False)
    got_t, got_i = pp.apply({"params": pp_params}, ids_j, px_j, train=False)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-5, atol=1e-5)

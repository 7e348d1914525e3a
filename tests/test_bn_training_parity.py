"""Conv+BatchNorm training-trajectory parity vs torch (VERDICT weak #6).

The LeNet-scale trajectory tests cover the optimizer/loss/EMA math; this
covers the exact place silent drift lives in conv nets: BatchNorm batch
statistics, running-stat momentum (torch 0.1 == flax 0.9), eps ordering,
UNBIASED running-var semantics, and eval-mode BN — on a dual tiny-ResNet
fusion net (the Crema-D/VGGSound architecture family, cremad/backbone.py)
trained from a torch-ported init on identical data in identical order with
the reference optimizer (SGD momentum 0.9, wd 1e-4 — utils/BaseModel.py:
275-285).
"""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

NUM_CLASSES = 4
WIDTH = 8
STAGES = (1, 1)
BATCH = 32
N_TRAIN = 128
EPOCHS = 2
LR = 0.05


class _TorchBlock(torch.nn.Module):
    """cremad/backbone.py:16-55 BasicBlock (named for port_resnet_encoder)."""

    def __init__(self, cin, planes, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, planes, 1, stride, bias=False),
                torch.nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idn)


class _TorchEncoder(torch.nn.Module):
    """Stem + stages matching ResNetEncoder(stage_sizes=STAGES, width=W)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(1, WIDTH, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(WIDTH)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        planes = WIDTH
        cin = WIDTH
        layers = []
        for stage, blocks in enumerate(STAGES):
            stride = 2 if stage > 0 else 1
            layers.append(torch.nn.Sequential(
                _TorchBlock(cin, planes, stride)))
            cin = planes
            planes *= 2
        self.layer1, self.layer2 = layers

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        return x.mean(dim=(2, 3))


class _TorchFusion(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.x1_model = _TorchEncoder()
        self.x2_model = _TorchEncoder()
        feat = WIDTH * 2
        self.classifier_x1 = torch.nn.Linear(feat, NUM_CLASSES)
        self.classifier_x2 = torch.nn.Linear(feat, NUM_CLASSES)
        self.loss_fn = torch.nn.CrossEntropyLoss()

    def forward(self, x1, x2, label):
        l1 = self.classifier_x1(self.x1_model(x1))
        l2 = self.classifier_x2(self.x2_model(x2))
        avg = (l1 + l2) / 2
        return l1, l2, avg, self.loss_fn(avg, label)


def _make_data(seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, NUM_CLASSES, size=N_TRAIN).astype(np.int64)
    # planted signal so training moves
    x1 = rng.normal(size=(N_TRAIN, 16, 16, 1)).astype(np.float32)
    x2 = rng.normal(size=(N_TRAIN, 16, 16, 1)).astype(np.float32)
    x1[np.arange(N_TRAIN), labels, labels, 0] += 3.0
    x2[np.arange(N_TRAIN), labels + 4, labels, 0] += 3.0
    return x1, x2, labels


def test_conv_bn_exact_trajectory_with_ported_init():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_eval_step, make_train_step
    from multimodal_clinical_tpu.models.common import TorchDense, global_avg_pool
    from multimodal_clinical_tpu.models.resnet import ResNetEncoder
    from multimodal_clinical_tpu.models.torch_port import (
        port_resnet_encoder, port_torch_linear,
    )

    x1, x2, labels = _make_data()

    # ---------------- torch reference loop ----------------
    torch.manual_seed(3)
    net = _TorchFusion()
    opt = torch.optim.SGD(net.parameters(), lr=LR, momentum=0.9,
                          weight_decay=1e-4)
    tx1 = torch.tensor(x1.transpose(0, 3, 1, 2))
    tx2 = torch.tensor(x2.transpose(0, 3, 1, 2))
    ty = torch.tensor(labels)
    net.train()
    torch_losses = []
    for _ in range(EPOCHS):
        for start in range(0, N_TRAIN, BATCH):
            sl = slice(start, start + BATCH)
            opt.zero_grad()
            _, _, _, loss = net(tx1[sl], tx2[sl], ty[sl])
            loss.backward()
            opt.step()
            torch_losses.append(float(loss))
    net.eval()
    with torch.no_grad():
        _, _, t_eval_logits, _ = net(tx1[:BATCH], tx2[:BATCH], ty[:BATCH])

    # ---------------- our engine, ported init ----------------
    class TinyFusion(nn.Module):
        @nn.compact
        def __call__(self, x1, x2, train=True):
            enc = dict(stage_sizes=STAGES, width=WIDTH, bn_fused=True)
            h1 = global_avg_pool(ResNetEncoder(**enc, name="x1_model")(
                x1, train))
            h2 = global_avg_pool(ResNetEncoder(**enc, name="x2_model")(
                x2, train))
            l1 = TorchDense(NUM_CLASSES, name="classifier_x1")(h1)
            l2 = TorchDense(NUM_CLASSES, name="classifier_x2")(h2)
            return {"logits": [l1, l2]}

    spec = ModelSpec(module=TinyFusion(), contract="jlogits")
    args = SimpleNamespace(num_classes=NUM_CLASSES, batch_size=BATCH,
                           learning_rate=LR, num_epochs=EPOCHS,
                           use_scheduler=False, seed=0)
    state = create_train_state(
        spec, args, jax.random.PRNGKey(0),
        [jnp.asarray(x1[:2]), jnp.asarray(x2[:2])],
        steps_per_epoch=N_TRAIN // BATCH)

    # fresh torch init == fresh BN stats (zeros mean / ones var): re-init
    # the torch net was already trained, so port from a pristine clone
    torch.manual_seed(3)
    fresh = _TorchFusion()
    sdf = fresh.state_dict()
    f1, fs1 = port_resnet_encoder(sdf, "x1_model.", stage_sizes=STAGES)
    f2, fs2 = port_resnet_encoder(sdf, "x2_model.", stage_sizes=STAGES)
    fparams = {
        "x1_model": f1, "x2_model": f2,
        "classifier_x1": port_torch_linear(
            sdf["classifier_x1.weight"], sdf["classifier_x1.bias"]),
        "classifier_x2": port_torch_linear(
            sdf["classifier_x2.weight"], sdf["classifier_x2.bias"]),
    }
    fstats = {"x1_model": fs1, "x2_model": fs2}
    to_f32 = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), t)
    state = state.replace(params=to_f32(fparams),
                          batch_stats=to_f32(fstats))

    train_step = make_train_step(spec)
    ours_losses = []
    for _ in range(EPOCHS):
        for start in range(0, N_TRAIN, BATCH):
            sl = slice(start, start + BATCH)
            batch = {
                "x1": jnp.asarray(x1[sl]), "x2": jnp.asarray(x2[sl]),
                "label": jnp.asarray(labels[sl].astype(np.int32)),
                "idx": jnp.asarray(np.arange(BATCH, dtype=np.int32)),
                "valid": jnp.ones((BATCH,), jnp.float32),
            }
            state, metrics = train_step(state, batch)
            ours_losses.append(float(metrics["train_loss"]))

    # per-step loss trajectories track to float-rounding scale
    torch_losses = np.asarray(torch_losses)
    ours_losses = np.asarray(ours_losses)
    assert abs(torch_losses[0] - ours_losses[0]) < 1e-4, (
        torch_losses[0], ours_losses[0])
    np.testing.assert_allclose(ours_losses, torch_losses, rtol=0.02,
                               atol=5e-3)

    # running statistics after training: torch momentum 0.1 recursion with
    # the UNBIASED variance estimator must match exactly
    bn_mean = np.asarray(
        state.batch_stats["x1_model"]["_BN_0"]["BatchNorm_0"]["mean"])
    bn_var = np.asarray(
        state.batch_stats["x1_model"]["_BN_0"]["BatchNorm_0"]["var"])
    t_mean = net.x1_model.bn1.running_mean.numpy()
    t_var = net.x1_model.bn1.running_var.numpy()
    np.testing.assert_allclose(bn_mean, t_mean, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(bn_var, t_var, rtol=5e-3, atol=1e-4)

    # eval-mode (running-stat BN) fused logits match torch eval
    eval_step = make_eval_step(spec)
    batch0 = {
        "x1": jnp.asarray(x1[:BATCH]), "x2": jnp.asarray(x2[:BATCH]),
        "label": jnp.asarray(labels[:BATCH].astype(np.int32)),
        "idx": jnp.asarray(np.arange(BATCH, dtype=np.int32)),
        "valid": jnp.ones((BATCH,), jnp.float32),
    }
    out = eval_step(state, batch0)
    fused = np.asarray(out["logits_stack"]).mean(axis=1)  # (B, C)
    np.testing.assert_allclose(fused, t_eval_logits.numpy(),
                               rtol=0.02, atol=2e-2)

"""Numerical parity: our Flax backbones vs torch references.

Random torch modules are constructed (the reference's own backbone from
/root/reference when present, or inline torch replicas of the torchvision
architectures — torchvision itself is not installed here), their
state_dicts ported via models/torch_port, and both forwards compared in
fp32 eval mode."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from multimodal_clinical_tpu.models import torch_port
from multimodal_clinical_tpu.models.pretrained import VGG11Slim
from multimodal_clinical_tpu.models.resnet import ResNetEncoder

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                     reason="reference checkout not present")


def to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def _import_reference_backbone():
    sys.path.insert(0, os.path.join(REFERENCE, "cremad"))
    try:
        import backbone as ref_backbone  # type: ignore
    finally:
        sys.path.pop(0)
    return ref_backbone


@needs_reference
def test_encoder_matches_reference_audio_backbone():
    """Reference scratch ResNet18, audio (1-ch) stem (cremad/backbone.py)."""
    ref = _import_reference_backbone()
    tm = ref.resnet18(modality="audio").eval()
    x = np.random.default_rng(4).normal(size=(2, 1, 64, 80)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    params, stats = torch_port.port_resnet_encoder(tm.state_dict())
    got = ResNetEncoder().apply({"params": params, "batch_stats": stats},
                                jnp.asarray(to_nhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want),
                               rtol=2e-3, atol=2e-3)


@needs_reference
def test_encoder_matches_reference_visual_backbone():
    """3-channel stem; torch layers called manually to skip the 5-D fold
    (backbone.py:178-181)."""
    ref = _import_reference_backbone()
    tm = ref.resnet18(modality="visual").eval()
    x = np.random.default_rng(5).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        h = tm.maxpool(tm.relu(tm.bn1(tm.conv1(torch.tensor(x)))))
        want = tm.layer4(tm.layer3(tm.layer2(tm.layer1(h)))).numpy()
    params, stats = torch_port.port_resnet_encoder(tm.state_dict())
    got = ResNetEncoder().apply({"params": params, "batch_stats": stats},
                                jnp.asarray(to_nhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want),
                               rtol=2e-3, atol=2e-3)


def _torch_vgg11_bn(hiddim: int) -> tnn.Module:
    """Inline replica of torchvision vgg11_bn with identical state_dict
    naming (features.N.* / classifier.*) and a single-Linear classifier as
    in the reference's VGG11Slim (enrico/joint_model_counts.py:33)."""
    cfg = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1),
                       tnn.BatchNorm2d(v), tnn.ReLU(inplace=True)]
            in_ch = v

    class VGG(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*layers)
            self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
            self.classifier = tnn.Linear(512 * 7 * 7, hiddim)

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return VGG()


def test_vgg11_slim_matches_torch_replica():
    tm = _torch_vgg11_bn(11).eval()
    x = np.random.default_rng(2).normal(size=(2, 3, 224, 224)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    params, stats = torch_port.port_vgg11_slim(tm.state_dict())
    m = VGG11Slim(hiddim=11, dropout=False, freeze_features=True)
    got = m.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(to_nhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_gru_cell_matches_torch_gru():
    tm = torch.nn.GRU(12, 32, 1, batch_first=True).eval()
    x = np.random.default_rng(3).normal(size=(2, 24, 12)).astype(np.float32)
    with torch.no_grad():
        _, h = tm(torch.tensor(x))
    want = h[-1].numpy()

    from flax import linen as nn

    cell_params = torch_port.port_gru_cell(tm.state_dict(), prefix="")
    rnn = nn.RNN(nn.GRUCell(features=32))
    got = rnn.apply({"params": {"cell": cell_params}}, jnp.asarray(x))[:, -1]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@needs_reference
def test_lenet_matches_reference():
    sys.path.insert(0, os.path.join(REFERENCE, "avmnist"))
    os.environ.setdefault("MPLBACKEND", "Agg")
    # stub the reference file's unused heavyweight imports
    import types

    for name in ("pytorch_lightning", "torchvision", "torchvision.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["pytorch_lightning"].LightningModule = object
    sys.modules.pop("joint_model", None)  # evict another dir's cached module
    try:
        from joint_model import LeNet as RefLeNet  # type: ignore
    finally:
        sys.modules.pop("joint_model", None)
        sys.path.pop(0)
    tm = RefLeNet(1, 6, 3).eval()
    x = np.random.default_rng(5).normal(size=(2, 1, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()

    from multimodal_clinical_tpu.models.lenet import LeNet

    params, stats = torch_port.port_lenet(tm.state_dict(), num_blocks=4)
    got = LeNet(6, 3).apply({"params": params, "batch_stats": stats},
                            jnp.asarray(to_nhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_lstm_cell_matches_torch_lstm():
    tm = torch.nn.LSTM(16, 24, 1, batch_first=True).eval()
    x = np.random.default_rng(6).normal(size=(2, 40, 16)).astype(np.float32)
    with torch.no_grad():
        _, (h, _) = tm(torch.tensor(x))
    want = h[-1].numpy()

    from flax import linen as nn

    cell_params = torch_port.port_lstm_cell(tm.state_dict(), prefix="")
    rnn = nn.RNN(nn.OptimizedLSTMCell(features=24))
    got = rnn.apply({"params": {"cell": cell_params}}, jnp.asarray(x))[:, -1]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@needs_reference
def test_lstm_classifier_matches_reference():
    """Full MUsTARD LstmClassifier (mustard/joint_model.py:9-43):
    fc1 -> LSTM -> last hidden -> fc2 -> relu -> fc3."""
    sys.path.insert(0, os.path.join(REFERENCE, "mustard"))
    import types

    for name in ("pytorch_lightning", "torchvision", "torchvision.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["pytorch_lightning"].LightningModule = object
    sys.modules.pop("joint_model", None)  # evict another dir's cached module
    try:
        from joint_model import LstmClassifier as RefLstm  # type: ignore
    finally:
        sys.modules.pop("joint_model", None)
        sys.path.pop(0)
    tm = RefLstm(81, 2).eval()
    x = np.random.default_rng(7).normal(size=(3, 40, 81)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()

    from multimodal_clinical_tpu.models.rnn import LstmClassifier

    params = torch_port.port_lstm_classifier(tm.state_dict())
    got = LstmClassifier(num_classes=2).apply({"params": params},
                                              jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

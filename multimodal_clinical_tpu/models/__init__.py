from .common import TorchBatchNorm, TorchDense, adaptive_avg_pool2d, global_avg_pool
from .lenet import LeNet
from .mlp import HeadMLP, MimicMLP
from .pretrained import ResNet18Slim, VGG11Slim
from .resnet import (
    BasicBlock,
    BottleneckResNetEncoder,
    ResNetEncoder,
    resnet18_encoder,
    resnet34_encoder,
    resnet50_encoder,
    resnet101_encoder,
)
from .rnn import GRUNet, LstmClassifier
from .zoo import (
    AVMnistFusionNet,
    CremadFusionNet,
    EnricoFusionNet,
    EnricoVGGFusionNet,
    FakeNewsFusionNet,
    Food101FusionNet,
    Food101LegacyFusionNet,
    MimicFusionNet,
    MustardFusionNet,
)

__all__ = [
    "TorchBatchNorm",
    "TorchDense",
    "adaptive_avg_pool2d",
    "global_avg_pool",
    "LeNet",
    "HeadMLP",
    "MimicMLP",
    "ResNet18Slim",
    "VGG11Slim",
    "BasicBlock",
    "BottleneckResNetEncoder",
    "ResNetEncoder",
    "resnet18_encoder",
    "resnet34_encoder",
    "resnet50_encoder",
    "resnet101_encoder",
    "GRUNet",
    "LstmClassifier",
    "AVMnistFusionNet",
    "CremadFusionNet",
    "EnricoFusionNet",
    "EnricoVGGFusionNet",
    "FakeNewsFusionNet",
    "Food101FusionNet",
    "Food101LegacyFusionNet",
    "MimicFusionNet",
    "MustardFusionNet",
]

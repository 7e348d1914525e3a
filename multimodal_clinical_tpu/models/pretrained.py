"""Torchvision-style encoders used by Enrico: ResNet18Slim and VGG11Slim.

Reference: enrico/joint_model.py:12-52 (ResNet18Slim — torchvision resnet18
minus the fc, AdaptiveAvgPool, Linear(512, hiddim) classifier, optionally
frozen features) and enrico/joint_model_counts.py:14-55 (VGG11Slim —
torchvision vgg11_bn features with Dropout after every ReLU, 7x7 adaptive
pool, Linear(512*7*7, hiddim)).

The reference downloads ImageNet weights at construction; this environment
has zero egress, so weights are loaded from a local torchvision checkpoint
when ``weights_path`` is provided to ``load_torchvision_resnet18`` /
``load_torchvision_vgg11_bn`` (see engine/pretrained_io.py), and randomly
initialized otherwise (documented divergence — affects Enrico absolute
accuracy, not framework mechanics).

``freeze_features`` is realized with ``jax.lax.stop_gradient`` on the
feature output — the functional equivalent of ``requires_grad=False``
(torch still updates BN running stats in train mode, and so do we, since
mutable batch_stats collection updates are orthogonal to gradients).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import (
    TorchBatchNorm, TorchDense, adaptive_avg_pool2d, global_avg_pool,
    kaiming_normal_fan_out,
)
from .resnet import ResNetEncoder


class ResNet18Slim(nn.Module):
    hiddim: int
    freeze_features: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, H, W, 3) -> (embedding (B, 512), logits (B, hiddim))."""
        feats = ResNetEncoder(
            stage_sizes=(2, 2, 2, 2),
            dtype=self.dtype,
            bn_scale_init=nn.initializers.ones,  # torchvision BN init
            name="features",
        )(x, train)
        embedding = global_avg_pool(feats)
        if self.freeze_features:
            embedding = jax.lax.stop_gradient(embedding)
        logits = TorchDense(self.hiddim, dtype=self.dtype, name="classifier")(
            embedding
        )
        return embedding, logits


_VGG11_CFG = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


class VGG11Slim(nn.Module):
    hiddim: int
    dropout: bool = True
    dropout_p: float = 0.2
    freeze_features: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, H, W, 3) -> (B, hiddim)."""
        for v in _VGG11_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                # torchvision VGG._initialize_weights: kaiming_normal
                # (fan_out, relu) conv kernels, zero bias
                x = nn.Conv(
                    int(v),
                    (3, 3),
                    padding=[(1, 1), (1, 1)],
                    kernel_init=kaiming_normal_fan_out,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                )(x)
                x = TorchBatchNorm(use_running_average=not train,
                                   dtype=self.dtype)(x)
                x = nn.relu(x)
                if self.dropout:
                    x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = adaptive_avg_pool2d(x, (7, 7))
        if self.freeze_features:
            x = jax.lax.stop_gradient(x)
        x = x.reshape(x.shape[0], -1)
        return TorchDense(self.hiddim, dtype=self.dtype, name="classifier")(x)

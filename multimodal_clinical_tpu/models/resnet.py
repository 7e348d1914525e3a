"""From-scratch ResNet encoders (audio / visual), TPU-native NHWC.

Functional equivalent of the reference's scratch ResNet
(cremad/backbone.py — same file duplicated in ave/ and vggsound/):
BasicBlock residual stages [2,2,2,2] (resnet18) with a modality-specific
7x7/stride-2 stem (1-channel audio spectrogram / 3-channel video frames),
3x3/stride-2 max-pool, and a (B, h, w, 512) feature-map output.  The unused
``compress/recover`` path (backbone.py:95-128) is intentionally omitted.

Initialization matches cremad/backbone.py:136-142: kaiming_normal(fan_out)
convs, BN scale ~ N(1, 0.02), BN bias 0.

Layout: NHWC (TPU-preferred).  Video inputs arrive as (B, T, H, W, 3) and
time is folded into the batch before the stem (backbone.py:178-181); the
caller un-folds for pooling.  Compute dtype is bfloat16 on the MXU with
float32 params and BN statistics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import kaiming_normal_fan_out, normal_init

_bn_scale_init = normal_init(1.0, 0.02)


class _BN(nn.Module):
    use_running_average: bool
    dtype: Optional[Any] = None
    scale_init: Any = _bn_scale_init

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=self.scale_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def _conv(features: int, kernel: int, stride: int = 1, dtype=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        kernel_init=kaiming_normal_fan_out,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None
    bn_scale_init: Any = _bn_scale_init

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = _conv(self.planes, 3, self.stride, self.dtype)(x)
        out = _BN(not train, self.dtype, self.bn_scale_init)(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dtype)(out)
        out = _BN(not train, self.dtype, self.bn_scale_init)(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, self.dtype)(x)
            identity = _BN(not train, self.dtype, self.bn_scale_init)(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Residual feature extractor; returns the stage-4 feature map (NHWC)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    dtype: Optional[Any] = None
    bn_scale_init: Any = _bn_scale_init

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Conv(
            self.width,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = _BN(not train, self.dtype, self.bn_scale_init)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])
        planes = self.width
        for stage, blocks in enumerate(self.stage_sizes):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                # BasicBlock nets change width exactly when striding, so the
                # projection shortcut is needed iff stride != 1.
                down = stride != 1
                x = BasicBlock(
                    planes,
                    stride=stride,
                    downsample=down,
                    dtype=self.dtype,
                    bn_scale_init=self.bn_scale_init,
                )(x, train)
            planes *= 2
        return x


# Named constructors mirroring cremad/backbone.py:261-271 (note the reference's
# "resnet101" is BasicBlock [3,4,23,3], not a true Bottleneck-101 — preserved).
resnet18_encoder = partial(ResNetEncoder, stage_sizes=(2, 2, 2, 2))
resnet34_encoder = partial(ResNetEncoder, stage_sizes=(3, 4, 6, 3))
resnet101_encoder = partial(ResNetEncoder, stage_sizes=(3, 4, 23, 3))

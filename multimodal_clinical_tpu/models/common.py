"""Shared building blocks: torch-matched initializers, pooling, Dense/Conv wrappers.

The reference's backbones rely on torch's default / explicit initializers;
accuracy parity within run-to-run noise requires matching those
distributions (not RNG streams).  All modules here compute in a configurable
``dtype`` (bfloat16 on the MXU by default) with float32 parameters.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu') — used by the
# scratch ResNet convs (cremad/backbone.py:137-139).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)

# torch kaiming_uniform_(a=0) — used by LeNet convs/linears
# (avmnist/joint_model.py:69-71): bound = sqrt(6 / fan_in).
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def normal_init(mean: float, std: float) -> Callable:
    """N(mean, std) initializer — reference BN scale init N(1, 0.02)
    (cremad/backbone.py:140-142)."""

    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def _torch_default_bound(fan_in: int) -> float:
    # torch Linear/Conv default: kaiming_uniform(a=sqrt(5)) => U(-1/sqrt(fan_in), ...)
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = _torch_default_bound(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchDense(nn.Module):
    """nn.Dense with torch.nn.Linear's default init (kernel AND bias
    ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)))."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = _torch_default_bound(fan_in)

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch defaults (momentum 0.1 => flax 0.9, eps 1e-5).

    ``scale_init`` is overridable for the reference ResNet's N(1, 0.02) BN
    init.  Statistics are computed over the global (mesh-wide) batch under
    jit automatic partitioning — sync-BN semantics, which equal the
    reference's single-device BN when the global batch matches.
    """

    use_running_average: bool
    scale_init: Callable = nn.initializers.ones
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=self.scale_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class FusedBatchNorm(nn.Module):
    """BatchNorm over all-but-channel axes with the Pallas fused-reduction
    training path (ops/fused_bn.py) and torch running-stat semantics.

    Variable layout matches ``nn.BatchNorm`` exactly (params ``scale`` /
    ``bias``; batch_stats ``mean`` / ``var``), so swapping it in keeps param
    trees, checkpoints, and the OGM-GE conv-only filter stable.

    Divergence fix vs round 1: the running variance update uses torch's
    UNBIASED estimator (``var * M / (M - 1)``, torch ``_BatchNorm.forward``)
    rather than flax's biased one; normalization stays biased in both.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Dtype] = None
    use_pallas: Optional[bool] = None  # None = auto (TPU backend only)

    @nn.compact
    def __call__(self, x):
        from ..ops.fused_bn import batch_norm_inference, batch_norm_train_stats

        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", self.bias_init, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.use_running_average:
            return batch_norm_inference(x, scale, bias, ra_mean.value,
                                        ra_var.value, self.epsilon)
        y, mean, var = batch_norm_train_stats(
            x, scale, bias, self.epsilon, use_pallas=self.use_pallas)
        if not self.is_initializing():
            m = x.size // c
            unbiased = var * (m / max(m - 1, 1))
            mom = self.momentum
            ra_mean.value = mom * ra_mean.value + (1.0 - mom) * mean
            ra_var.value = mom * ra_var.value + (1.0 - mom) * unbiased
        return y


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C) mean over all spatial dims (NHWC)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))


def max_pool(x: jnp.ndarray, window: int = 2, stride: Optional[int] = None,
             padding="VALID") -> jnp.ndarray:
    stride = stride or window
    return nn.max_pool(x, (window, window), (stride, stride), padding)


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """torch F.adaptive_avg_pool2d for NHWC inputs with static shapes.

    Matches torch bin edges: bin i covers [floor(i*L/out), ceil((i+1)*L/out)).
    Used by the VGG11Slim 7x7 pre-classifier pool (torchvision vgg forward).
    """
    b, h, w, c = x.shape
    oh, ow = output_size
    if (h, w) == (oh, ow):
        return x
    if h % oh == 0 and w % ow == 0:
        return nn.avg_pool(x, (h // oh, w // ow), (h // oh, w // ow), "VALID")
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)

"""LeNet encoder for AV-MNIST (reference: avmnist/joint_model.py:32-97).

Structure: a 5x5 conv (pad 2) followed by ``additional_layers`` 3x3 convs
(pad 1), channels doubling each block, each block = conv(no bias) -> BN ->
ReLU -> 2x2 max-pool.  The reference returns the final feature map squeezed
— which after the pooling cascade is spatially 1x1 for the AV-MNIST input
sizes — so global average pooling is the shape-safe equivalent.
Initialization: kaiming_uniform on convs (avmnist/joint_model.py:69-71).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .common import TorchBatchNorm, global_avg_pool, kaiming_uniform, max_pool


class LeNet(nn.Module):
    channels: int = 6
    additional_layers: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, H, W, C_in) NHWC -> (B, channels * 2**additional_layers)."""
        ch = self.channels
        for i in range(self.additional_layers + 1):
            out_ch = ch * (2 ** i)
            kernel = (5, 5) if i == 0 else (3, 3)
            x = nn.Conv(
                out_ch,
                kernel,
                padding="SAME" if i == 0 else ((1, 1), (1, 1)),
                use_bias=False,
                kernel_init=kaiming_uniform,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            x = TorchBatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = max_pool(x, 2)
        return global_avg_pool(x)

"""MLP encoders.

``MimicMLP`` — static-EHR head, reference mimic/joint_model.py:11-38
(5 -> 128 -> 64 -> 32 -> C, ReLU between, torch-default Linear init).

``HeadMLP`` — Food101 classification head, reference
food101/joint_model.py:10-24 (in -> hidden -> hidden -> C with ReLU +
Dropout(0.2) after each hidden layer).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import TorchDense


class MimicMLP(nn.Module):
    num_classes: int
    hidden: Sequence[int] = (128, 64, 32)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for h in self.hidden:
            x = nn.relu(TorchDense(h, dtype=self.dtype)(x))
        return TorchDense(self.num_classes, dtype=self.dtype)(x)


class HeadMLP(nn.Module):
    num_classes: int
    hidden_dim: int = 512
    dropout_p: float = 0.2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for _ in range(2):
            x = nn.relu(TorchDense(self.hidden_dim, dtype=self.dtype)(x))
            x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        return TorchDense(self.num_classes, dtype=self.dtype)(x)

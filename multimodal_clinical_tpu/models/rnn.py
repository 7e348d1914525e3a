"""Recurrent encoders — GRU (MIMIC time series) and LSTM (MUsTARD affect).

``GRUNet`` — reference mimic/joint_model.py:40-70: 1-layer GRU over the
(B, 24, 12) time series, last hidden state -> 64 -> 32 -> C MLP.

``LstmClassifier`` — reference mustard/joint_model.py:9-43: input projection
to 384, 1-layer LSTM, last hidden state -> 100 -> ReLU -> C.

TPU notes: the recurrence uses flax ``nn.RNN`` (``lax.scan`` under jit —
static trip count, compiler-schedulable).  Gate math of flax GRUCell /
OptimizedLSTMCell matches torch's nn.GRU / nn.LSTM formulations.  torch
initializes all recurrent weights U(-1/sqrt(hidden), 1/sqrt(hidden)); we
pass that bound explicitly.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import TorchDense


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GRUNet(nn.Module):
    hidden_dim: int = 32
    num_classes: int = 6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, T, F) -> (B, num_classes)."""
        bound = 1.0 / math.sqrt(self.hidden_dim)
        cell = nn.GRUCell(
            features=self.hidden_dim,
            kernel_init=_uniform_init(bound),
            recurrent_kernel_init=_uniform_init(bound),
            bias_init=_uniform_init(bound),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        h = nn.RNN(cell)(x)[:, -1, :]  # last hidden state (h[-1] in torch)
        h = nn.relu(TorchDense(64, dtype=self.dtype)(h))
        h = nn.relu(TorchDense(32, dtype=self.dtype)(h))
        return TorchDense(self.num_classes, dtype=self.dtype)(h)


class LstmClassifier(nn.Module):
    num_classes: int
    hidden_dim: int = 384
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, S, F) -> (B, num_classes)."""
        x = TorchDense(self.hidden_dim, dtype=self.dtype)(x)
        bound = 1.0 / math.sqrt(self.hidden_dim)
        cell = nn.OptimizedLSTMCell(
            features=self.hidden_dim,
            kernel_init=_uniform_init(bound),
            recurrent_kernel_init=_uniform_init(bound),
            bias_init=_uniform_init(bound),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        h = nn.RNN(cell)(x)[:, -1, :]
        h = nn.relu(TorchDense(100, dtype=self.dtype)(h))
        return TorchDense(self.num_classes, dtype=self.dtype)(h)

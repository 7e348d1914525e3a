"""Probe: does a (H, W, C, N)-transposed pallas_call avoid relayout copies?

XLA stores the conv feature maps batch-minor ({0,3,2,1}), while a Pallas
custom call fixes default (row-major) layouts on its operands.  The
standalone fused-BN kernel lost 2x to the resulting relayout copies.  If
``jnp.transpose(t, (1, 2, 3, 0))`` of a batch-minor NHWC tensor lowers to
a BITCAST (its row-major layout equals the source's physical layout), a
Pallas kernel over the transposed view sees the bytes in place and custom
TPU kernels (maxpool backward, stem wgrad) become viable.

Measures three jitted programs on the visual-stem geometry:
  A) conv -> relu -> maxpool                      (baseline)
  B) conv -> relu -> T -> pallas identity -> T' -> maxpool
  C) conv -> relu -> pallas identity (NHWC direct) -> maxpool

identity kernel traffic is ~2x the tensor (read+write ~= 5.8 GB @ bf16
here): B ~= A + kernel cost if the transposes are bitcasts; B >> C would
instead mean the transposed view forces copies.

Usage: python tools/probe_pallas_layout.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache


def _identity_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def pallas_identity(x, split=4):
    """(dim0, dim1/split)-blocked identity (keeps blocks < ~4 MB)."""
    n0, n1 = x.shape[0], x.shape[1]
    while n1 % split:
        split -= 1
    blk = (1, n1 // split) + x.shape[2:]
    return pl.pallas_call(
        _identity_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n0, split),
        in_specs=[pl.BlockSpec(blk, lambda i, j: (i, j) + (0,) *
                               (x.ndim - 2), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk, lambda i, j: (i, j) + (0,) *
                               (x.ndim - 2), memory_space=pltpu.VMEM),
    )(x)


def build(variant: str):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(896, 112, 112, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 64)) * 0.1, jnp.bfloat16)

    def fn(x, w):
        t = jax.nn.relu(jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        if variant == "B":
            tt = jnp.transpose(t, (1, 2, 3, 0))     # (H, W, C, N)
            tt = pallas_identity(tt)
            t = jnp.transpose(tt, (3, 0, 1, 2))
        elif variant == "C":
            t = pallas_identity(t)                   # NHWC direct
        y = nn.max_pool(t, (3, 3), (2, 2), [(1, 1), (1, 1)])
        return jnp.sum(y.astype(jnp.float32))

    return jax.jit(fn), x, w


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    for variant in ("A", "B", "C"):
        try:
            f, x, w = build(variant)
            float(f(x, w))
            float(f(x, w))
            tic = time.perf_counter()
            K = 10
            for _ in range(K):
                out = f(x, w)
            float(out)
            dt = (time.perf_counter() - tic) / K
            print(f"variant {variant}: {dt * 1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"variant {variant}: FAIL {repr(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()

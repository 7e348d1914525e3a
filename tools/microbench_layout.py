"""Measure elementwise HBM throughput vs trailing-dim (lane) width.

TPU HBM buffers are stored in (8, 128)-tiled layout; a trailing dim of 64
would waste half of every tile and halve effective elementwise bandwidth.
This microbench times y = x * a + b (read 1, write 1) over equal-byte
arrays with trailing dims 64 / 128 / 256 and over the actual VGGSound
stage-1 feature-map shapes, reporting effective GB/s (v5e peak ~819).

Also times a 3x3 s2 maxpool fwd+bwd and its separable (3,1)+(1,3)
rewrite to size the select-and-scatter lever.

Usage: python tools/microbench_layout.py
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

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache


def timeit(fn, *args, iters=20):
    out = fn(*args)
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(
        jnp.float32))
    tic = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(
        jnp.float32))
    return (time.perf_counter() - tic) / iters


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    total = 896 * 56 * 56 * 64  # stage-1 visual element count

    print("== elementwise y = x*a+b (bf16), equal bytes ==")
    for c in (64, 128, 256):
        shape = (total // (56 * 56 * c), 56, 56, c)
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        a = jnp.asarray(rng.normal(size=(c,)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(c,)), jnp.bfloat16)
        f = jax.jit(lambda x, a, b: x * a + b)
        dt = timeit(f, x, a, b)
        gb = 2 * x.size * 2 / 1e9
        print(f"  C={c:4d} {dt * 1e3:7.3f} ms  {gb / dt:7.1f} GB/s")

    print("== channel-wise reduce (BN-stat shape) ==")
    for c in (64, 128, 256):
        shape = (total // (56 * 56 * c), 56, 56, c)
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        f = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32), axis=(0, 1, 2)))
        dt = timeit(f, x)
        gb = x.size * 2 / 1e9
        print(f"  C={c:4d} {dt * 1e3:7.3f} ms  {gb / dt:7.1f} GB/s")

    print("== maxpool 3x3 s2 fwd+bwd: fused vs separable ==")
    x = jnp.asarray(rng.normal(size=(896, 112, 112, 64)), jnp.bfloat16)

    def pool_loss(x):
        y = nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def pool_sep_loss(x):
        y = nn.max_pool(x, (3, 1), (2, 1), [(1, 1), (0, 0)])
        y = nn.max_pool(y, (1, 3), (1, 2), [(0, 0), (1, 1)])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    for name, f in (("fused", pool_loss), ("separable", pool_sep_loss)):
        g = jax.jit(jax.grad(f))
        dt = timeit(g, x, iters=10)
        print(f"  {name:10s} {dt * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()

"""Microbench: Pallas stored-index max-pool vs XLA select-and-scatter.

Measures the pool's fwd+bwd embedded in a realistic producer/consumer
context (conv -> BN-ish scale -> relu -> pool -> grad) at both bench stem
geometries, chaining K passes in-program (sub-5 ms kernels through the
remote-TPU tunnel are dispatch-polluted otherwise — CLAUDE.md).

Usage: python tools/microbench_maxpool.py [--k 8] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

from multimodal_clinical_tpu.ops.maxpool_pallas import max_pool_3x3_s2_pallas


def build(pool, n, h, w, c_in, k):
    """k chained (conv->relu->pool->conv->reduce) passes, grad wrt the conv
    kernels.  The consumer conv makes the pool's incoming cotangent a real
    conv-produced tensor (in-model layout), not a broadcast constant."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, c_in)), jnp.bfloat16)
    wconv = jnp.asarray(rng.normal(size=(3, 3, c_in, 64)) * 0.1, jnp.bfloat16)
    wout = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.1, jnp.bfloat16)

    def loss(wc, wo, x):
        acc = jnp.float32(0)
        for i in range(k):
            t = jax.lax.conv_general_dilated(
                x + jnp.bfloat16(i), wc, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            t = jax.nn.relu(t)
            p = pool(t)
            q = jax.lax.conv_general_dilated(
                p, wo, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = acc + jnp.sum(q.astype(jnp.float32)) * 1e-6
        return acc

    f = jax.jit(jax.grad(loss, argnums=(0, 1)))
    return f, wconv, wout, x


def timeit(f, *args, iters=8):
    g = f(*args)[0]
    float(jnp.sum(g.astype(jnp.float32)))  # warm compile + barrier
    tic = time.perf_counter()
    for _ in range(iters):
        g = f(*args)[0]
    float(jnp.sum(g.astype(jnp.float32)))
    return (time.perf_counter() - tic) / iters


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    a = ap.parse_args()

    xla_pool = lambda t: nn.max_pool(t, (3, 3), (2, 2), [(1, 1), (1, 1)])
    geoms = [
        ("visual stem (896,224,224,3->112^2x64)", 896, 224, 224, 3),
        ("audio stem  (224,129,626,1->65x313x64)", 224, 129, 626, 1),
    ]
    for name, n, h, w, c in geoms:
        for label, pool in (("xla   ", xla_pool),
                            ("pallas", max_pool_3x3_s2_pallas)):
            f, wc, wo, x = build(pool, n, h, w, c, a.k)
            dt = timeit(f, wc, wo, x, iters=a.iters)
            print(f"{name}  {label}: {dt * 1e3 / a.k:8.3f} ms/pass "
                  f"({dt * 1e3:.1f} ms / {a.k} chained)", flush=True)


if __name__ == "__main__":
    main()

"""A/B: materialized vs rematerialized BN-apply+ReLU feeding maxpool.

The stem's relu output (vis: 1.44 GB bf16) has exactly two consumers —
maxpool fwd and maxpool bwd (select-and-scatter operand).  If the
elementwise producer is rematerialized, XLA may fuse it into the
reduce-window input and into the s&s operand, never materializing the
tensor: saves a full write+read of the biggest activation in the model.

Usage: python tools/microbench_stempool.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache


def run(shape, label):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=shape[-1:]) * 0.1 + 1.0, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=shape[-1:]) * 0.1, jnp.bfloat16)

    def block(x, g, b, remat):
        def elt(x):
            return jax.nn.relu(x * g + b)
        if remat:
            elt = jax.checkpoint(elt,
                                 policy=jax.checkpoint_policies.nothing_saveable,
                                 prevent_cse=True)
        y = nn.max_pool(elt(x), (3, 3), (2, 2), [(1, 1), (1, 1)])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    for remat in (False, True):
        f = jax.jit(jax.grad(functools.partial(block, remat=remat),
                             argnums=(0, 1, 2)))
        out = f(x, g, b)
        float(jnp.sum(out[1]))
        K = 12
        tic = time.perf_counter()
        for _ in range(K):
            out = f(x, g, b)
        float(jnp.sum(out[1]))
        dt = (time.perf_counter() - tic) / K
        print(f"  {label} remat={remat!s:5s} {dt * 1e3:8.3f} ms")


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    print("== stem BN-apply+ReLU -> maxpool 3x3s2, fwd+bwd ==")
    run((896, 112, 112, 64), "visual")
    run((224, 65, 313, 64), "audio ")


if __name__ == "__main__":
    main()

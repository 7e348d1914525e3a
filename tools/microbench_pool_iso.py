"""Isolated timings of the stored-index pool kernels vs XLA.

Times (a) pool forward alone, (b) pool backward alone, each chained K
passes in-program, at both stem geometries — pinpoints whether an
in-context loss comes from the fwd kernel, the bwd kernel, or boundary
relayouts.  Block sizes come from MMCT_POOL_{BI,BJ,NB}.

Usage: python tools/microbench_pool_iso.py [--k 16] [--iters 8]
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

from multimodal_clinical_tpu.ops import maxpool_pallas as mp


def timeit(f, *args, iters=8):
    out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    tic = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - tic) / iters


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    a = ap.parse_args()
    k = a.k

    xla_pool = lambda t: nn.max_pool(t, (3, 3), (2, 2), [(1, 1), (1, 1)])
    rng = np.random.default_rng(0)

    for name, (n, h, w, c) in (("visual", (896, 112, 112, 64)),
                               ("audio", (224, 65, 313, 64))):
        ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.bfloat16)
        dy = jnp.asarray(rng.normal(size=(n, ho, wo, c)), jnp.bfloat16)

        # ---- forward alone (via jax.vjp so the custom_vjp FWD RULE runs —
        # the undifferentiated pallas primal is deliberately XLA)
        def fwd_chain(pool):
            def f(x):
                acc = jnp.float32(0)
                for i in range(k):
                    y, _ = jax.vjp(pool, x + jnp.bfloat16(i))
                    acc += jnp.sum(y.astype(jnp.float32))
                return acc
            return jax.jit(f)

        t_x = timeit(fwd_chain(xla_pool), x, iters=a.iters)
        t_p = timeit(fwd_chain(mp.max_pool_3x3_s2_pallas), x, iters=a.iters)
        print(f"{name} fwd : xla {t_x / k * 1e3:7.3f}  "
              f"pallas(+idx) {t_p / k * 1e3:7.3f} ms", flush=True)

        # ---- backward alone (vjp applied to k shifted cotangents)
        def bwd_chain(pool):
            def f(x, dy):
                _, pull = jax.vjp(pool, x)
                acc = jnp.zeros_like(x, jnp.float32)
                for i in range(k):
                    acc += pull(dy + jnp.bfloat16(i))[0].astype(jnp.float32)
                return acc
            return jax.jit(f)

        t_x = timeit(bwd_chain(xla_pool), x, dy, iters=a.iters)
        t_p = timeit(bwd_chain(mp.max_pool_3x3_s2_pallas), x, dy,
                     iters=a.iters)
        print(f"{name} bwd : xla {t_x / k * 1e3:7.3f}  "
              f"pallas {t_p / k * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Steady-state HBM bandwidth via an in-program chained loop.

Per-call microbenches through the remote-TPU tunnel are dispatch-polluted
(a 2 ms kernel pays ~ms of host latency per call).  Here K iterations are
chained *inside* one jitted program (serial data dependence prevents CSE),
so the wall time divides into per-pass device time.

Usage: python tools/microbench_hbm.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

K = 24


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    total = 896 * 56 * 56 * 64  # stage-1 visual element count (360 MB bf16)

    print(f"== chained elementwise x = x*a+b, K={K} passes in-program ==")
    for c in (64, 128, 256):
        shape = (total // (56 * 56 * c), 56, 56, c)
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        a = jnp.asarray(rng.normal(size=(c,)) * 1e-3 + 1.0, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(c,)) * 1e-3, jnp.bfloat16)

        @jax.jit
        def chain(x, a, b):
            def body(i, x):
                return x * a + b
            return jax.lax.fori_loop(0, K, body, x)

        y = chain(x, a, b)
        float(jnp.sum(y[:1, :1, :1].astype(jnp.float32)))
        tic = time.perf_counter()
        y = chain(x, a, b)
        float(jnp.sum(y[:1, :1, :1].astype(jnp.float32)))
        dt = (time.perf_counter() - tic) / K
        gb = 2 * x.size * 2 / 1e9  # read + write bf16
        print(f"  C={c:4d} {dt * 1e3:7.3f} ms/pass  {gb / dt:7.1f} GB/s")

    print(f"== chained BN-stat reduce (sum + sumsq, f32 acc), K={K} ==")
    for c in (64, 128):
        shape = (total // (56 * 56 * c), 56, 56, c)
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

        @jax.jit
        def chain_red(x):
            def body(i, carry):
                # the reduction source must depend on the carry: with a
                # loop-invariant x, XLA's while-loop LICM hoists the big
                # sums out of the loop and the probe divides ONE
                # reduction's time by K (up to K-times-overstated GB/s).
                # 1e-38*carry perturbs values by ~0 but defeats hoisting
                # while keeping traffic at exactly one read of x per pass.
                xi = x.astype(jnp.float32) + carry[:1] * 1e-38
                s = jnp.sum(xi, axis=(0, 1, 2))
                q = jnp.sum(jnp.square(xi), axis=(0, 1, 2))
                return carry + s + q * 1e-6
            return jax.lax.fori_loop(0, K, body,
                                     jnp.zeros((c,), jnp.float32))

        y = chain_red(x)
        float(jnp.sum(y))
        tic = time.perf_counter()
        y = chain_red(x)
        float(jnp.sum(y))
        dt = (time.perf_counter() - tic) / K
        gb = x.size * 2 / 1e9  # one read
        print(f"  C={c:4d} {dt * 1e3:7.3f} ms/pass  {gb / dt:7.1f} GB/s")


if __name__ == "__main__":
    main()

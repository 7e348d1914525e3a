"""Microbenchmark XLA convolutions at the VGGSound ResNet18 geometries.

For each (input, kernel, stride) this times forward, input-grad, and
weight-grad convolutions on the real chip and reports achieved TFLOP/s
and effective GB/s against the v5e roofline (197 bf16 TFLOP/s, 819 GB/s),
to locate where the conv emitter sits and what a Pallas conv must beat.

Usage: python tools/microbench_conv.py [--iters 20]
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

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

PEAK_TFLOPS = 197.0
PEAK_GBPS = 819.0

# (name, B, H, W, Cin, Cout, k, stride) — both towers' distinct conv shapes
GEOMS = [
    ("vis_stem", 896, 224, 224, 3, 64, 7, 2),
    ("vis_l1", 896, 56, 56, 64, 64, 3, 1),
    ("vis_l2a", 896, 56, 56, 64, 128, 3, 2),
    ("vis_l2", 896, 28, 28, 128, 128, 3, 1),
    ("vis_l3a", 896, 28, 28, 128, 256, 3, 2),
    ("vis_l3", 896, 14, 14, 256, 256, 3, 1),
    ("vis_l4a", 896, 14, 14, 256, 512, 3, 2),
    ("vis_l4", 896, 7, 7, 512, 512, 3, 1),
    ("aud_stem", 224, 129, 626, 1, 64, 7, 2),
    ("aud_l1", 224, 33, 157, 64, 64, 3, 1),
    ("aud_l2", 224, 17, 79, 128, 128, 3, 1),
    ("aud_l3", 224, 9, 40, 256, 256, 3, 1),
    ("aud_l4", 224, 5, 20, 512, 512, 3, 1),
]


def conv(x, w, stride):
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def timeit(fn, args, iters):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # tunnel-safe barrier
    tic = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - tic) / iters


def main(iters):
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    print(f"{'geom':9s} {'dir':5s} {'ms':>8s} {'TF/s':>7s} {'%MXU':>6s} "
          f"{'GB/s':>7s} {'%BW':>5s}")
    for name, b, h, w_, cin, cout, k, s in GEOMS:
        x = jnp.asarray(rng.normal(size=(b, h, w_, cin)).astype(np.float32),
                        dtype=jnp.bfloat16)
        wt = jnp.asarray(
            rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.05,
            dtype=jnp.bfloat16)
        ho, wo = -(-h // s), -(-w_ // s)
        flops = 2 * b * ho * wo * cout * cin * k * k
        bytes_min = 2 * (b * h * w_ * cin + b * ho * wo * cout
                         + k * k * cin * cout)

        fwd = jax.jit(lambda x, wt: conv(x, wt, s))

        def vjp_fn(x, wt, dy):
            _, pull = jax.vjp(lambda x, wt: conv(x, wt, s), x, wt)
            return pull(dy)

        dy = jnp.asarray(rng.normal(size=(b, ho, wo, cout))
                         .astype(np.float32), dtype=jnp.bfloat16)
        both = jax.jit(vjp_fn)

        t_f = timeit(fwd, (x, wt), iters)
        t_b = timeit(both, (x, wt, dy), iters)

        for tag, t, fl, by in (
            ("fwd", t_f, flops, bytes_min),
            ("bwd2", t_b, 2 * flops, 2 * bytes_min),
        ):
            tf = fl / t / 1e12
            gb = by / t / 1e9
            print(f"{name:9s} {tag:5s} {t * 1e3:8.2f} {tf:7.1f} "
                  f"{tf / PEAK_TFLOPS * 100:6.1f} {gb:7.0f} "
                  f"{gb / PEAK_GBPS * 100:5.1f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    main(ap.parse_args().iters)

"""Split conv backward timings: autodiff dgrad/wgrad vs explicit rewrites.

The step profile shows conv fwd at ~75% MXU but dgrad ~50% and stage-1
wgrads ~48% (ROADMAP.md).  This probe separates the three conv directions
per ResNet geometry and A/Bs algebraically-identical explicit forms:

  * dgrad-as-conv: dx = conv(dy, rot180(W)^T) — stride-1 case (what the
    autodiff transpose should already be; detects fusion/layout losses)
  * dgrad-parity: stride-2 case decomposed into 4 parity sub-convs over
    the UNDILATED dy (skips the 75% zeros a lhs-dilated conv computes on
    if the emitter doesn't) + interleave
  * wgrad-as-conv: dW = conv(x^T, dy^T) batch-contraction form

Usage: python tools/microbench_convbwd.py [--iters 10]
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

GEOMS = [
    ("vis_l1", 896, 56, 56, 64, 64, 3, 1),
    ("vis_l2a", 896, 56, 56, 64, 128, 3, 2),
    ("vis_l2", 896, 28, 28, 128, 128, 3, 1),
    ("vis_l3a", 896, 28, 28, 128, 256, 3, 2),
    ("vis_l3", 896, 14, 14, 256, 256, 3, 1),
    ("vis_l4a", 896, 14, 14, 256, 512, 3, 2),
    ("vis_l4", 896, 7, 7, 512, 512, 3, 1),
    ("aud_l1", 224, 33, 157, 64, 64, 3, 1),
]


def conv(x, w, stride, lhs_dilation=None):
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(p, p), (p, p)],
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def timeit(fn, args, iters):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    tic = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - tic) / iters


def dgrad_explicit_s1(dy, w):
    """stride-1 SAME dgrad as a plain forward-style conv."""
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # rot180, swap io
    return conv(dy, wt, 1)


def dgrad_parity_s2(dy, w, h, wd):
    """stride-2 k=3 pad=1 dgrad via 4 parity sub-convs on UNDILATED dy.

    dx[2i+a-1, 2j+b-1] collects tap (a, b); parity p=(a+1)%2, q=(b+1)%2.
    Even parity rows use tap a=1 only; odd rows taps {0, 2}.
    """
    n, ho, wo, co = dy.shape
    ci = w.shape[2]
    wt = jnp.transpose(w, (0, 1, 3, 2))  # (3,3,Cout,Cin), taps in order
    # dx[u] = sum over (i, a) with u = 2i + a - 1 of dy[i] * w[a]:
    #   u = 2m     -> dx = dy[m] * w[1]               (taps [1],    pad 0,0)
    #   u = 2m + 1 -> dx = dy[m] * w[2] + dy[m+1] * w[0]
    #                                     (taps [2, 0], pad 0,1)
    out = {}
    for p, (rows, pad_r) in enumerate((([1], (0, 0)), ([2, 0], (0, 1)))):
        for q, (cols, pad_c) in enumerate((([1], (0, 0)), ([2, 0], (0, 1)))):
            sub = wt[jnp.asarray(rows)][:, jnp.asarray(cols)]
            o = jax.lax.conv_general_dilated(
                dy, sub, (1, 1), [pad_r, pad_c],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            out[(p, q)] = o
    # interleave parities: dx[2i+p? ...] — dx row u: u%2==0 -> p=0 at i=u//2
    ee, eo = out[(0, 0)], out[(0, 1)]
    oe, oo = out[(1, 0)], out[(1, 1)]
    n_, hi, wi, _ = ee.shape
    even = jnp.stack([ee, eo], axis=3).reshape(n_, hi, 2 * wi, ci)
    odd = jnp.stack([oe, oo], axis=3).reshape(n_, hi, 2 * wi, ci)
    dx = jnp.stack([even, odd], axis=2).reshape(n_, 2 * hi, 2 * wi, ci)
    return dx[:, :h, :wd, :]


def main(iters):
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    hdr = (f"{'geom':8s} {'kind':14s} {'ms':>8s} {'TF/s':>7s} {'%MXU':>6s}")
    print(hdr)
    for name, b, h, w_, cin, cout, k, s in GEOMS:
        x = jnp.asarray(rng.normal(size=(b, h, w_, cin)), jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05,
                         jnp.bfloat16)
        ho, wo = -(-h // s), -(-w_ // s)
        dy = jnp.asarray(rng.normal(size=(b, ho, wo, cout)), jnp.bfloat16)
        flops = 2 * b * ho * wo * cout * cin * k * k

        runs = []
        runs.append(("fwd", jax.jit(lambda x, wt: conv(x, wt, s)), (x, wt)))
        runs.append(("dgrad_auto", jax.jit(
            lambda x, wt, dy: jax.vjp(lambda x: conv(x, wt, s), x)[1](dy)),
            (x, wt, dy)))
        if s == 1:
            runs.append(("dgrad_conv", jax.jit(dgrad_explicit_s1), (dy, wt)))
        else:
            runs.append(("dgrad_parity", jax.jit(
                lambda dy, wt: dgrad_parity_s2(dy, wt, h, w_)), (dy, wt)))
        runs.append(("wgrad_auto", jax.jit(
            lambda x, wt, dy: jax.vjp(lambda wt: conv(x, wt, s), wt)[1](dy)),
            (x, wt, dy)))

        for kind, fn, args in runs:
            try:
                t = timeit(fn, args, iters)
                tf = flops / t / 1e12
                print(f"{name:8s} {kind:14s} {t * 1e3:8.2f} {tf:7.1f} "
                      f"{tf / PEAK_TFLOPS * 100:6.1f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:8s} {kind:14s} FAIL {repr(e)[:80]}",
                      flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    main(ap.parse_args().iters)

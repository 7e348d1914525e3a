"""Prototype: single-pass Pallas BN-stats over the (H, W, C, N) bitcast view.

The LAST unmeasured kernel candidate from ROADMAP (round 3 item 1 /
VERDICT r3 missing #1): training-mode BatchNorm makes a stats pass over
each conv output (stage-1 visual feature maps are ~360 MB at bf16 for the
bench geometry).  flax computes mean(x) and mean(x*x) — if XLA lowers those
as TWO passes over HBM, a fused single-pass sum+sumsq kernel saves one full
read per BN layer; if XLA multi-output-fuses them (one pass), the kernel
can only lose (it adds its own dispatch and cannot fuse with neighbors).

The kernel reads the conv output through the (H, W, C, N) transposed view,
which is a BITCAST of the batch-minor NHWC layout (measured:
tools/probe_pallas_layout.py) — N=896 is lane-exact, C sublane-exact — so
it pays only its own traffic, no relayout copies.

Measures, on the bench's stage-1/stage-2 geometries, the in-context step
time of  conv -> stats -> scale+shift+relu -> sum  with

  A) XLA stats:     mu = mean(x), mu2 = mean(x*x)   (flax BN's math)
  B) Pallas stats:  one pass emitting per-channel sum and sumsq

plus a correctness check (B's mean/var == A's to fp32 tolerance).

Usage: python tools/proto_bn_stats.py
Result (v5e-1, round 4): see ROADMAP.md "dead ends" — XLA's stats are
already one fused pass at the HBM floor.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache


def _stats_kernel(x_ref, sum_ref, sq_ref):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    x = x_ref[...].astype(jnp.float32)
    sum_ref[0, :] += jnp.sum(x, axis=(0, 1, 3))
    sq_ref[0, :] += jnp.sum(x * x, axis=(0, 1, 3))


def pallas_bn_stats(t_nhwc: jnp.ndarray, wblk: int = 8):
    """(N, H, W, C) bf16 feature map -> per-channel (mean, var) in fp32,
    computed in ONE pass over the (H, W, C, N) bitcast view."""
    x = jnp.transpose(t_nhwc, (1, 2, 3, 0))  # bitcast on batch-minor maps
    h, w, c, n = x.shape
    while w % wblk:
        wblk -= 1
    blk = (1, wblk, c, n)
    out = jax.ShapeDtypeStruct((1, c), jnp.float32)
    s, sq = pl.pallas_call(
        _stats_kernel,
        out_shape=(out, out),
        grid=(h, w // wblk),
        in_specs=[pl.BlockSpec(blk, lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, c), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)),
    )(x)
    cnt = float(h * w * n)
    mean = s[0] / cnt
    var = sq[0] / cnt - mean * mean
    return mean, var


def build(variant: str, geom):
    n, h, w, cin, cout = geom
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(size=(cout,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    def fn(x, k, gamma, beta):
        t = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        if variant == "pallas":
            mean, var = pallas_bn_stats(t)
        else:  # flax BatchNorm's stats math (mean + mean-of-squares)
            tf = t.astype(jnp.float32)
            mean = jnp.mean(tf, axis=(0, 1, 2))
            mu2 = jnp.mean(tf * tf, axis=(0, 1, 2))
            var = mu2 - mean * mean
        inv = gamma * jax.lax.rsqrt(var + 1e-5)
        y = jax.nn.relu((t.astype(jnp.float32) - mean) * inv + beta)
        return jnp.sum(y), mean, var

    return jax.jit(fn), (x, k, gamma, beta)


def timed(fn, args, iters=20):
    out = fn(*args)
    float(out[0])  # compile + tunnel barrier (CLAUDE.md: block_until_ready
    # does not sync under the remote tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out[0])
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    geoms = {
        # bench geometries: batch 224, 4 frames -> N=896 visual;
        # audio tower N=224, (65, 157) after stem
        "visual_stage1": (896, 56, 56, 64, 64),
        "visual_stage2": (896, 28, 28, 128, 128),
        "audio_stage1": (224, 33, 157, 64, 64),
    }
    for name, geom in geoms.items():
        fn_a, args = build("xla", geom)
        fn_b, _ = build("pallas", geom)
        ms_a, out_a = timed(fn_a, args)
        ms_b, out_b = timed(fn_b, args)
        np.testing.assert_allclose(np.asarray(out_b[1]), np.asarray(out_a[1]),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out_b[2]), np.asarray(out_a[2]),
                                   rtol=2e-2, atol=2e-2)
        print(f"{name}: xla {ms_a:.2f} ms  pallas {ms_b:.2f} ms  "
              f"({'pallas wins' if ms_b < ms_a else 'xla wins'}, "
              f"{ms_b / ms_a:.2f}x)")


if __name__ == "__main__":
    main()

"""Prototype: Pallas 3x3/stride-1 SAME conv vs XLA, per ResNet geometry.

Flat formulation: the padded image is passed as (B, P, C) with
P = (H+2) * (W+2) rows.  For output row q = y * (W+2) + x the tap
(ky, kx) contribution reads input row q + ky*(W+2) + kx — a CONSTANT
offset, so each tap is one contiguous row-slice and no Mosaic-hostile
reshapes are needed.  The kernel computes H*(W+2) output rows per image
((W+2)/W overcompute; junk columns sliced off in XLA).

Two MXU paths:
  * Cin >= 128: 9 accumulating per-tap dots (k = Cin fills the MXU).
  * Cin < 128 (layer1): im2col into a VMEM scratch (M, 9*Cin) and one
    dot with k = 9*Cin = 576 (per-tap k=64 would cap the MXU at 25%).

Usage: python tools/proto_pallas_conv.py [--check] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
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

PEAK_TFLOPS = 197.0


def _tap_kernel(xp_ref, w_ref, y_ref, *, nb, h, wp, cin, cout):
    m = h * wp
    for img in range(nb):
        acc = jnp.zeros((m, cout), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = ky * wp + kx
                t = ky * 3 + kx
                xt = xp_ref[img, off:off + m, :]
                acc = acc + jnp.dot(
                    xt, w_ref[t * cin:(t + 1) * cin, :],
                    preferred_element_type=jnp.float32)
        y_ref[img, :, :] = acc.astype(y_ref.dtype)


def _im2col_kernel(xp_ref, w_ref, y_ref, col_ref, *, nb, h, wp, cin, cout):
    m = h * wp
    for img in range(nb):
        for ky in range(3):
            for kx in range(3):
                off = ky * wp + kx
                t = ky * 3 + kx
                col_ref[:, t * cin:(t + 1) * cin] = xp_ref[img,
                                                           off:off + m, :]
        y_ref[img, :, :] = jnp.dot(
            col_ref[:], w_ref[:],
            preferred_element_type=jnp.float32).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nb",))
def conv_pallas(x, w, nb):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    wp = wd + 2
    m = h * wp
    # max row read = m - 1 + 2*wp + 2, so pad the flat buffer past
    # (h+2)*wp by a sublane-aligned tail
    p = (h + 2) * wp + 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(
        b, (h + 2) * wp, cin)
    xp = jnp.pad(xp, ((0, 0), (0, 8), (0, 0)))
    w2 = w.reshape(9 * cin, cout)
    grid = b // nb
    use_im2col = cin < 128
    kern = _im2col_kernel if use_im2col else _tap_kernel
    out = pl.pallas_call(
        functools.partial(kern, nb=nb, h=h, wp=wp, cin=cin, cout=cout),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((nb, p, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, m, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, cout), x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((m, 9 * cin), x.dtype)] if use_im2col else []),
    )(xp, w2)
    return out.reshape(b, h, wp, cout)[:, :, :wd, :]


@jax.jit
def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


GEOMS = [  # name, B, H, W, Cin, Cout, images/step
    ("vis_l1", 896, 56, 56, 64, 64, 1),
    ("vis_l2", 896, 28, 28, 128, 128, 4),
    ("vis_l3", 896, 14, 14, 256, 256, 8),
    ("vis_l4", 896, 7, 7, 512, 512, 16),
    ("aud_l1", 224, 33, 157, 64, 64, 1),
    ("aud_l2", 224, 17, 79, 128, 128, 2),
    ("aud_l3", 224, 9, 40, 256, 256, 8),
    ("aud_l4", 224, 5, 20, 512, 512, 16),
]


def timeit(fn, args, iters):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    tic = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - tic) / iters


def main(check, iters):
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    for name, b, h, wd, cin, cout, nb in GEOMS:
        while b % nb:
            nb //= 2
        x = jnp.asarray(rng.normal(size=(b, h, wd, cin)).astype(np.float32),
                        dtype=jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.05,
            dtype=jnp.bfloat16)
        flops = 2 * b * h * wd * cout * cin * 9
        if check:
            yp = np.asarray(conv_pallas(x, w, nb).astype(jnp.float32))
            yx = np.asarray(conv_xla(x, w).astype(jnp.float32))
            err = np.abs(yp - yx).max() / (np.abs(yx).max() + 1e-6)
            print(f"{name}: rel err {err:.2e}")
            continue
        t_p = timeit(lambda x, w: conv_pallas(x, w, nb), (x, w), iters)
        t_x = timeit(conv_xla, (x, w), iters)
        print(f"{name:8s} nb={nb:<3d} pallas {t_p * 1e3:7.2f} ms "
              f"({flops / t_p / 1e12:6.1f} TF/s "
              f"{flops / t_p / 1e12 / PEAK_TFLOPS * 100:5.1f}%)  "
              f"xla {t_x * 1e3:7.2f} ms ({flops / t_x / 1e12:6.1f} TF/s)  "
              f"speedup {t_x / t_p:5.2f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    main(a.check, a.iters)

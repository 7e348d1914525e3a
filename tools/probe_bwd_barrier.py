"""Probe: does ISOLATING conv backward ops from their fusion context help?

The per-op profile (ROADMAP.md) shows stride-1 dgrads at ~50% MXU in the
step vs ~75% isolated (tools/microbench_convbwd.py) — a fusion-context
effect: XLA fuses the BN-backward elementwise producers/consumers into the
conv-bearing fusion, and the fused kernel's MXU occupancy drops.  The
fusion saves HBM traffic, so it is NOT obvious which way the trade goes.

This probe monkeypatches ``jax.lax.conv_general_dilated`` with a
``jax.custom_vjp`` wrapper whose backward inserts
``lax.optimization_barrier`` around chosen operands:

  * ``g``   — barrier the incoming cotangent before dgrad/wgrad
              (prevents producer fusion into the backward convs)
  * ``dx``  — barrier the computed input-gradient
              (prevents consumer fusion into dgrad)
  * ``dw``  — barrier the computed filter-gradient

and times the full VGGSound bench step per variant.  The ``none`` variant
(wrapper installed, no barriers) checks the custom_vjp itself is neutral.

Usage: python tools/probe_bwd_barrier.py [--variants none,g,dx,gdx] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

_ORIG_CONV = jax.lax.conv_general_dilated


def _install(barrier_g: bool, barrier_dx: bool, barrier_dw: bool) -> None:
    def patched(lhs, rhs, *args, **kwargs):
        def conv(l, r):
            return _ORIG_CONV(l, r, *args, **kwargs)

        @jax.custom_vjp
        def f(l, r):
            return conv(l, r)

        def fwd(l, r):
            return conv(l, r), (l, r)

        def bwd(res, g):
            l, r = res
            if barrier_g:
                g = jax.lax.optimization_barrier(g)
            # vjp of the ORIGINAL conv: the unused primal output is DCE'd,
            # leaving exactly the standard dgrad + wgrad convolutions
            _, pullback = jax.vjp(conv, l, r)
            dl, dr = pullback(g)
            if barrier_dx:
                dl = jax.lax.optimization_barrier(dl)
            if barrier_dw:
                dr = jax.lax.optimization_barrier(dr)
            return dl, dr

        f.defvjp(fwd, bwd)
        return f(lhs, rhs)

    jax.lax.conv_general_dilated = patched


def _uninstall() -> None:
    jax.lax.conv_general_dilated = _ORIG_CONV


def time_variant(variant: str, iters: int, batch: int = 224) -> float:
    from multimodal_clinical_tpu.benchmarks.vggsound_fixture import (
        build_vggsound_bench,
    )

    if variant != "baseline":
        _install("g" in variant, "dx" in variant, "dw" in variant)
    try:
        train_step, state, batch_dict, _ = build_vggsound_bench(batch)
        for _ in range(3):
            state, metrics = train_step(state, batch_dict)
        float(metrics["train_loss"])
        tic = time.perf_counter()
        for _ in range(iters):
            state, metrics = train_step(state, batch_dict)
        float(metrics["train_loss"])
        return batch * iters / (time.perf_counter() - tic)
    finally:
        _uninstall()


def main() -> None:
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="baseline,none,g,dx,gdx,gdxdw")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=224)
    args = ap.parse_args()
    for variant in args.variants.split(","):
        sps = time_variant(variant, args.iters, args.batch)
        print(f"{variant:10s} {sps:9.1f} samples/s "
              f"({args.batch * 1e3 / sps:6.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

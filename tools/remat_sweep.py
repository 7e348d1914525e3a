"""Measure block-level remat variants of the VGGSound train step.

The round-1 profile (ROADMAP.md) shows ~49 ms/step of BN/elementwise HBM
traffic on top of 89 ms of conv.  Block remat with a save-only-conv-outputs
policy trades that traffic for cheap recompute fused into the backward
fusions.  This sweep measures each variant on the real chip with the
production compiler options.

Usage: python tools/remat_sweep.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

VARIANTS = [None, "convs", "none"]


def build(remat):
    # the production bench program (shared fixture), remat knob applied
    from multimodal_clinical_tpu.benchmarks.vggsound_fixture import (
        build_vggsound_bench,
    )

    train_step, state, batch_dict, _spec = build_vggsound_bench(remat=remat)
    return train_step, state, batch_dict


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    for remat in VARIANTS:
        tag = f"remat={remat}"
        try:
            step, state, batch = build(remat)
            state, m = step(state, batch)
            for _ in range(2):
                state, m = step(state, batch)
            float(m["train_loss"])
            tic = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, batch)
            float(m["train_loss"])
            dt = (time.perf_counter() - tic) / iters
            print(f"{tag:15s} {dt * 1e3:7.2f} ms/step "
                  f"{224 / dt:7.1f} samples/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:15s} FAIL {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

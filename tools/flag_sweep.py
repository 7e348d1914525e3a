"""Sweep per-compile XLA TPU options on the bench train step.

Client-side XLA_FLAGS can't carry TPU-only flags here (the local parser
dies on unknown flags before the axon tunnel forwards them), but
``lower().compile(compiler_options=...)`` is proto-backed and forwarded
per-compile — so options are swept that way.

Usage: python tools/flag_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

# round 1 measured (10 iters, v5e): baseline 158.1ms; scoped_vmem 32768
# -> 153.2, 65536 -> 152.2; experimental_fusion_cost_model REGRESSES
# (167.0); others neutral.
# round 2 (base = scoped_vmem 65536, the production option): sweep
# scheduler/fusion/layout knobs; unknown option names COMPILE-FAIL and
# are skipped harmlessly.
_BASE = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
CANDIDATES = [
    dict(_BASE),
    {"xla_tpu_scoped_vmem_limit_kib": "81920"},
    {**_BASE, "xla_tpu_enable_latency_hiding_scheduler": "true"},
    {**_BASE, "xla_tpu_memory_limit_slop_factor": "98"},
    {**_BASE, "xla_tpu_enable_dot_strength_reduction": "false"},
    {**_BASE, "xla_tpu_async_copy_bandwidth_scaling_factor": "1.0"},
    {**_BASE, "xla_tpu_licm_size_inflation_ratio": "2"},
    {**_BASE, "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    {**_BASE, "xla_tpu_vector_load_fusion_window": "1024"},
    {**_BASE, "xla_tpu_reduce_loop_fusion_dup_with_unfusable_user": "true"},
    {**_BASE, "xla_tpu_enable_aggressive_broadcast_priority_update": "true"},
    {**_BASE, "xla_tpu_dot_dot_fusion": "true"},
    {**_BASE, "xla_tpu_perform_spmd_cse_prevention": "false"},
]


def build():
    # the production bench program, from the one shared fixture; this
    # sweep re-lowers the RAW step so compiler_options apply per-compile
    from multimodal_clinical_tpu.benchmarks.vggsound_fixture import (
        build_vggsound_bench,
    )
    from multimodal_clinical_tpu.engine.steps import make_train_step

    _jitted, state, batch_dict, spec = build_vggsound_bench()
    step = make_train_step(spec, jit=False)
    return step, state, batch_dict


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    step, state0, batch = build()
    jitted = jax.jit(step)  # no donation: state reused across variants
    lowered = jitted.lower(state0, batch)
    for opts in CANDIDATES:
        tag = ",".join(f"{k.replace('xla_tpu_', '')}={v}"
                       for k, v in opts.items()) or "baseline"
        try:
            compiled = lowered.compile(
                compiler_options=opts if opts else None)
        except Exception as e:
            print(f"{tag:55s} COMPILE-FAIL {repr(e)[:80]}")
            continue
        try:
            st, m = compiled(state0, batch)
            for _ in range(2):
                st, m = compiled(st, batch)
            float(m["train_loss"])
            tic = time.perf_counter()
            n = 10
            for _ in range(n):
                st, m = compiled(st, batch)
            float(m["train_loss"])
            dt = (time.perf_counter() - tic) / n
            print(f"{tag:55s} {dt * 1e3:7.2f} ms/step "
                  f"{224 / dt:7.1f} samples/s")
        except Exception as e:
            print(f"{tag:55s} RUN-FAIL {repr(e)[:80]}")


if __name__ == "__main__":
    main()

"""Batch-size scaling study for the VGGSound headline bench.

The north-star target is *per-chip samples/sec*, not fixed-batch latency
(BASELINE.md: >=5x the reference's 392 samples/s at batch 224,
vggsound/README.md:5-6).  Every round-2 perf experiment kept the
reference's batch 224; this sweep measures 224 / 448 / 672 / 896 — larger
batches enlarge the implicit-GEMM M dimension exactly where the profile
says MXU efficiency is lost (stride-1 dgrad ~50%, stage-1 wgrads ~48%,
stem wgrad ~19% — ROADMAP.md per-op table).

Per batch: try remat=None first; on device OOM retry remat="convs"
(saves only conv outputs, recomputes BN/ReLU in backward).

Usage:  python tools/batch_scaling.py [--batches 224,448,672,896] [--iters 12]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache


def measure(batch: int, iters: int, warmup: int, remat):
    from multimodal_clinical_tpu.benchmarks.vggsound_fixture import (
        build_vggsound_bench,
    )

    train_step, state, batch_dict, _ = build_vggsound_bench(batch, remat=remat)
    metrics = None
    for _ in range(warmup):
        state, metrics = train_step(state, batch_dict)
    float(metrics["train_loss"])  # host fetch = real tunnel barrier
    tic = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch_dict)
    float(metrics["train_loss"])
    wall = time.perf_counter() - tic
    return batch * iters / wall, wall / iters * 1e3


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="224,448,672,896")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    results = []
    for batch in [int(b) for b in args.batches.split(",")]:
        for remat in (None, "convs"):
            try:
                sps, ms = measure(batch, args.iters, args.warmup, remat)
                row = {"batch": batch, "remat": remat,
                       "samples_per_sec": round(sps, 1),
                       "ms_per_step": round(ms, 2),
                       "vs_baseline": round(sps / 392.0, 3)}
                results.append(row)
                print(json.dumps(row), flush=True)
                break  # no OOM: skip the remat fallback
            except Exception as exc:  # noqa: BLE001
                msg = str(exc)
                oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg \
                    or "exceeds the limit" in msg
                print(json.dumps({"batch": batch, "remat": remat,
                                  "error": msg[:300], "oom": oom}),
                      flush=True)
                if not oom:
                    break  # real failure: don't mask it with remat
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()

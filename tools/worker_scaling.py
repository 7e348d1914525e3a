"""Loader worker-scaling curve: Crema-D end-to-end samples/sec at 1/2/4
workers on THIS host.

The e2e numbers in BENCH are bound by this image's 1-core host + ~50 MB/s
remote-TPU tunnel; "the loader scales with workers on a real host" needs
DATA even here — decode/H2D overlap helps a little on one core, and the
curve's shape (flat on 1 core, rising with cores) is the evidence the
claim rests on.  Results land in ROADMAP.md.

Usage: python tools/worker_scaling.py [--workers 1,2,4] [--steps 12]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache


def main():
    # entry-point convention (CLAUDE.md): enable the persistent
    # compile cache at RUN time, never at import time — importing
    # a tool (e.g. from tests) must not repoint the process cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from bench import bench_cremad_e2e

    results = []
    for w in [int(x) for x in args.workers.split(",")]:
        sps = bench_cremad_e2e(steps=args.steps, warmup=args.warmup,
                               workers=w)
        row = {"workers": w, "cremad_e2e_samples_per_sec": round(sps, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"curve": results}))


if __name__ == "__main__":
    main()

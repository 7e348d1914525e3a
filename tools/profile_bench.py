"""Capture + parse a jax.profiler trace of the bench train step.

Usage:
    python tools/profile_bench.py [--steps 3] [--out /tmp/mmct_prof]
    python tools/profile_bench.py --parse /tmp/mmct_prof   # re-parse only

Aggregates device-op durations by HLO category (conv fwd/dgrad/wgrad,
fusion kinds, select-and-scatter, ...) from the vm.trace.json.gz the
profiler writes (no TensorBoard in this image — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, steps: int, s2d: bool = False,
            pool: str = "xla") -> None:
    import jax

    from multimodal_clinical_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    # the production bench program (shared fixture), s2d/pool knobs applied
    from multimodal_clinical_tpu.benchmarks.vggsound_fixture import (
        build_vggsound_bench,
    )

    train_step, state, batch_dict, _spec = build_vggsound_bench(
        stem_space_to_depth=s2d, pool_kernel=pool)
    for _ in range(3):
        state, metrics = train_step(state, batch_dict)
    float(metrics["train_loss"])  # barrier (tunnel-safe)

    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, metrics = train_step(state, batch_dict)
    float(metrics["train_loss"])
    jax.profiler.stop_trace()
    print(f"trace written under {out_dir}")


_CATEGORIES = [
    ("conv wgrad", re.compile(r"conv.*(wgrad|filter_backprop|"
                              r"backward_filter)|transpose.*conv")),
    ("conv", re.compile(r"%?(conv|convolution)")),
    ("select-and-scatter (maxpool bwd)", re.compile(r"select-and-scatter")),
    ("reduce-window (maxpool fwd)", re.compile(r"reduce-window")),
    ("pallas", re.compile(r"(custom-call|pallas|tpu_custom_call)")),
    ("dynamic-update-slice", re.compile(r"dynamic-update-slice")),
    ("scatter", re.compile(r"scatter")),
    ("reduce fusion", re.compile(r"fusion.*reduce|reduce")),
    ("fusion (elementwise etc)", re.compile(r"(fusion|multiply|add|divide|"
                                            r"subtract|maximum|select|copy|"
                                            r"bitcast|transpose|broadcast)")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in _CATEGORIES:
        if pat.search(low):
            return cat
    return "other"


def parse(out_dir: str, top: int = 30) -> None:
    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {out_dir}")
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device-op events live on TensorCore pids; host threads have names
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "Chip" in n}

    op_tot = collections.Counter()
    op_cnt = collections.Counter()
    cat_tot = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        args = e.get("args") or {}
        lname = (args.get("long_name") or name)
        dur = float(e.get("dur", 0.0))
        # skip enclosing module/program events
        if name.startswith("jit_") or "module" in name.lower():
            continue
        op_tot[name] += dur
        op_cnt[name] += 1
        cat_tot[categorize(lname if lname else name)] += dur
        total += dur

    print(f"== {os.path.basename(path)}  device op time total "
          f"{total / 1e3:.2f} ms ==")
    print("\n-- by category --")
    for cat, dur in cat_tot.most_common():
        print(f"{dur / 1e3:9.2f} ms  {dur / total * 100:5.1f}%  {cat}")
    print(f"\n-- top {top} ops --")
    for name, dur in op_tot.most_common(top):
        print(f"{dur / 1e3:9.2f} ms  x{op_cnt[name]:<4d} "
              f"{dur / total * 100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/mmct_prof")
    ap.add_argument("--parse", metavar="DIR", default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stems (per-op A/B)")
    ap.add_argument("--pool", default="xla", choices=("xla", "pallas"),
                    help="stem max-pool backend (per-op A/B)")
    a = ap.parse_args()
    if a.parse:
        parse(a.parse, a.top)
    else:
        capture(a.out, a.steps, s2d=a.s2d, pool=a.pool)
        parse(a.out, a.top)

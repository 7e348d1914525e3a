"""Probe: does feeding frames in the compiled program's preferred device
layout save the step's input relayout copy?

ROADMAP's per-op profile attributes ~2.6 ms of the 149 ms headline step to
copy/convert fusions, and the last unshipped lever on the list is "feeding
frames in bf16/target layout (~1 ms)".  Frames already ship bf16
(vggsound_fixture); this probe measures the LAYOUT half: it compiles the
headline train step, reads the executable's preferred input layouts
(`compiled.input_formats`, jax.experimental.layout), re-stages any batch
operand whose preferred major_to_minor differs from the default row-major
device_put layout, and times the step both ways on the real chip.

Run:  python tools/probe_input_layout.py [--batch 224 --iters 20]
Prints one JSON line per variant; "delta_ms" is default minus relaid.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache


def main(argv=None):
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)

    import jax

    from multimodal_clinical_tpu.benchmarks.vggsound_fixture import (
        build_vggsound_bench,
    )

    train_step, state, batch_dict, _spec = build_vggsound_bench(args.batch)

    # the jitted step's lowered executable exposes per-arg preferred
    # layouts; arg order is (state, batch) flattened
    lowered = train_step.lower(state, batch_dict)
    compiled = lowered.compile()
    # input_formats mirrors the (args, kwargs) pytree of the traced call;
    # flatten it the same way as the operands and take the batch's tail
    in_formats, _kw = compiled.input_formats
    flat_formats = jax.tree_util.tree_leaves(in_formats)
    flat_state = jax.tree_util.tree_leaves(state)
    n_state = len(flat_state)
    flat_batch, batch_tree = jax.tree_util.tree_flatten(batch_dict)
    if len(flat_formats) != n_state + len(flat_batch):
        raise SystemExit(
            f"format count {len(flat_formats)} != state {n_state} + "
            f"batch {len(flat_batch)} leaves")
    batch_formats = flat_formats[n_state:]
    keys = [str(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(batch_dict)[0]]

    default_m2m = {}
    relaid_flat = []
    moved = []
    for key, arr, fmt in zip(keys, flat_batch, batch_formats):
        # a None layout means the compiler accepted the default layout
        have = tuple(range(arr.ndim))  # device_put default: row-major
        want = (tuple(fmt.layout.major_to_minor)
                if getattr(fmt, "layout", None) is not None else have)
        default_m2m[key] = {"have": have, "want": want}
        if want != have:
            relaid_flat.append(jax.device_put(arr, fmt))
            moved.append(key)
        else:
            relaid_flat.append(arr)
    relaid_batch = jax.tree_util.tree_unflatten(batch_tree, relaid_flat)
    print(json.dumps({"preferred_layouts": {
        k: {"have": list(v["have"]), "want": list(v["want"])}
        for k, v in default_m2m.items()}, "restaged": moved}))

    def timed(batch):
        s = state
        metrics = None
        for _ in range(args.warmup):
            s, metrics = train_step(s, batch)
        float(metrics["train_loss"])
        best = float("inf")
        for _ in range(args.repeats):
            tic = time.perf_counter()
            for _ in range(args.iters):
                s, metrics = train_step(s, batch)
            float(metrics["train_loss"])
            best = min(best, (time.perf_counter() - tic) / args.iters)
        return best * 1e3

    # NB: train_step donates state — rebuild per variant
    base_ms = timed(batch_dict)
    train_step, state, batch_dict, _spec = build_vggsound_bench(args.batch)
    relaid_ms = timed(relaid_batch) if moved else base_ms
    print(json.dumps({
        "default_ms_per_step": round(base_ms, 3),
        "relaid_ms_per_step": round(relaid_ms, 3),
        "delta_ms": round(base_ms - relaid_ms, 3),
        "note": ("no operand wanted a non-default layout — the lever "
                 "does not exist on this program" if not moved else
                 f"restaged {moved} into the executable's preferred "
                 "layout before the loop"),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

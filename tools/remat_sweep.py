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
import jax.numpy as jnp
import numpy as np
from types import SimpleNamespace

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

VARIANTS = [None, "convs", "none"]


def build(remat):
    from multimodal_clinical_tpu.benchmarks.vggsound import device_preprocess
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.zoo import CremadFusionNet

    batch, num_classes = 224, 309
    rng = np.random.default_rng(0)
    wave = rng.normal(scale=0.1, size=(batch, 80000)).astype(np.float32)
    frames = rng.normal(size=(batch, 4, 224, 224, 3)).astype(np.float32)
    label = rng.integers(0, num_classes, size=batch).astype(np.int32)
    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=1e-2, num_epochs=60,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(
        module=CremadFusionNet(num_classes=num_classes, dtype=jnp.bfloat16,
                               remat=remat),
        contract="jprobas", device_preprocess=device_preprocess)
    spec_sample = rng.normal(size=(2, 129, 626, 1)).astype(np.float32)
    state = create_train_state(
        spec, args, jax.random.PRNGKey(0),
        [jnp.asarray(spec_sample), jnp.asarray(frames[:2])],
        steps_per_epoch=100)
    batch_dict = {
        "x1_waveform": jax.device_put(wave),
        "x2": jax.device_put(frames),
        "label": jax.device_put(label),
        "idx": jax.device_put(np.arange(batch, dtype=np.int32)),
        "valid": jax.device_put(np.ones(batch, np.float32)),
    }
    return make_train_step(spec), state, batch_dict


def main():
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

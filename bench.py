"""Benchmark: VGGSound end-to-end train-step throughput on one chip.

This is the apples-to-apples comparison against the only throughput number
the reference publishes: VGGSound training at 1.75 it/s with batch 224
(~392 samples/s) on a ~24 GB-class GPU (vggsound/README.md:5-6,
BASELINE.md).  Same benchmark, same geometry, same batch size:

  * model: dual scratch ResNet18 (audio 129x626 log-spectrogram stem +
    4x224x224 frame stack), 309 classes, jprobas contract — the
    reference's configured model_type (vggsound/vggsound.yaml)
  * the step includes everything the reference does per iteration ON TOP
    of its DataLoader: forward, loss, backward, SGD+momentum update, EMA
    calibration — PLUS the audio DSP (STFT log-spectrogram via the Pallas
    kernel + SpecAugment), which the reference runs on host CPU workers
    (vggsound/get_data.py:106-128) and we run inside the jitted step.
    Host-side JPEG decode is outside the step for both systems.

Timing uses a host scalar fetch as the barrier (jax.block_until_ready does
not synchronize under this image's remote-TPU tunnel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from multimodal_clinical_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np

BASELINE_SAMPLES_PER_SEC = 392.0  # vggsound/README.md:5-6 (1.75 it/s @ 224)


def main(batch=224, warmup=3, iters=12):
    from multimodal_clinical_tpu.benchmarks.vggsound import device_preprocess
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.zoo import CremadFusionNet

    num_classes = 309
    rng = np.random.default_rng(0)
    wave = rng.normal(scale=0.1, size=(batch, 80000)).astype(np.float32)
    frames = rng.normal(size=(batch, 4, 224, 224, 3)).astype(np.float32)
    label = rng.integers(0, num_classes, size=batch).astype(np.int32)

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=1e-2, num_epochs=60,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(
        module=CremadFusionNet(num_classes=num_classes, dtype=jnp.bfloat16),
        contract="jprobas",
        device_preprocess=device_preprocess,
    )
    spec_sample = rng.normal(size=(2, 129, 626, 1)).astype(np.float32)
    state = create_train_state(
        spec, args, jax.random.PRNGKey(0),
        [jnp.asarray(spec_sample), jnp.asarray(frames[:2])],
        steps_per_epoch=100,
    )
    batch_dict = {
        "x1_waveform": jax.device_put(wave),
        "x2": jax.device_put(frames),
        "label": jax.device_put(label),
        "idx": jax.device_put(np.arange(batch, dtype=np.int32)),
        "valid": jax.device_put(np.ones(batch, np.float32)),
    }
    train_step = make_train_step(spec)

    for _ in range(warmup):
        state, metrics = train_step(state, batch_dict)
    float(metrics["train_loss"])  # host fetch = real barrier on the tunnel

    tic = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch_dict)
    float(metrics["train_loss"])
    wall = time.perf_counter() - tic

    samples_per_sec = batch * iters / wall
    print(json.dumps({
        "metric": "vggsound_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

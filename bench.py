"""Benchmark: Crema-D end-to-end train-step throughput on one chip.

Measures steady-state samples/sec of the FULL jlogits training step (dual
scratch-ResNet18 forward, CE loss, backward, SGD+momentum update, EMA
calibration) at the reference geometry: audio (B, 257, 1004, 1)
log-spectrograms + (B, 3, 224, 224, 3) frame stacks, batch 64, bf16 compute.

Baseline (BASELINE.md): the reference's published throughput number is
VGGSound at 392 samples/s on a ~24 GB-class GPU (vggsound/README.md:5-6);
the driver's north star is >=5x per-chip samples/sec on Crema-D/Food101
end-to-end train steps vs the "A100 PyTorch" baseline.  ``vs_baseline``
below reports against the 392 samples/s figure (the only throughput number
the reference publishes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC = 392.0  # vggsound/README.md:5-6 (1.75 it/s @ 224)


def main(batch=64, warmup=3, iters=20):
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import make_train_step
    from multimodal_clinical_tpu.models.zoo import CremadFusionNet

    num_classes = 6
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(batch, 257, 1004, 1)).astype(np.float32)
    x2 = rng.normal(size=(batch, 3, 224, 224, 3)).astype(np.float32)
    label = rng.integers(0, num_classes, size=batch).astype(np.int32)

    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=1e-3, num_epochs=100,
                           use_scheduler=True, seed=5)
    spec = ModelSpec(
        module=CremadFusionNet(num_classes=num_classes, dtype=jnp.bfloat16),
        contract="jlogits",
    )
    state = create_train_state(
        spec, args, jax.random.PRNGKey(0),
        [jnp.asarray(x1[:2]), jnp.asarray(x2[:2])], steps_per_epoch=100,
    )
    batch_dict = {
        "x1": jax.device_put(x1),
        "x2": jax.device_put(x2),
        "label": jax.device_put(label),
        "idx": jax.device_put(np.arange(batch, dtype=np.int32)),
        "valid": jax.device_put(np.ones(batch, np.float32)),
    }
    train_step = make_train_step(spec)

    for _ in range(warmup):
        state, metrics = train_step(state, batch_dict)
    float(metrics["train_loss"])  # host fetch: forces the full chain
    # (block_until_ready alone does not synchronize under the remote-TPU
    # tunnel in this image — a scalar D2H fetch is the reliable barrier)

    tic = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch_dict)
    float(metrics["train_loss"])
    wall = time.perf_counter() - tic

    samples_per_sec = batch * iters / wall
    print(json.dumps({
        "metric": "cremad_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

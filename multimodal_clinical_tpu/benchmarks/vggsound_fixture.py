"""The canonical VGGSound bench fixture, in ONE place.

bench.py (the headline number) and the perf tools (tools/flag_sweep.py,
tools/remat_sweep.py, tools/profile_bench.py) all need the same train-step
program; copy-pasted fixtures drifted (the tools shipped f32 frames while
the production bench ships bf16, so sweeps measured a slightly different
program).  Geometry: the reference's published VGGSound configuration —
batch 224, 309 classes, dual scratch ResNet18, jprobas contract, on-device
STFT/SpecAugment (vggsound/README.md:5-6, vggsound/vggsound.yaml).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_vggsound_bench(batch: int = 224, num_classes: int = 309, *,
                         pool_kernel: str = "xla",
                         stem_space_to_depth: bool = False,
                         remat: Optional[str] = None,
                         frames_bf16: bool = True):
    """(train_step, state, device_batch, spec) for the headline bench
    program (``spec`` so sweeps can re-lower the raw step with
    per-compile options via ``make_train_step(spec, jit=False)``).

    ``frames_bf16`` mirrors the production Loader's transfer cast (half
    the H2D bytes; math-identical — the stem casts to bf16 anyway).  The
    model knobs (``pool_kernel``, ``stem_space_to_depth``, ``remat``) are
    the flag-gated variants the sweeps compare.
    """
    from ..engine.spec import ModelSpec
    from ..engine.state import create_train_state
    from ..engine.steps import make_train_step
    from ..models.zoo import CremadFusionNet
    from .vggsound import device_preprocess

    rng = np.random.default_rng(0)
    wave = rng.normal(scale=0.1, size=(batch, 80000)).astype(np.float32)
    frames = rng.normal(size=(batch, 4, 224, 224, 3)).astype(np.float32)
    label = rng.integers(0, num_classes, size=batch).astype(np.int32)
    args = SimpleNamespace(num_classes=num_classes, batch_size=batch,
                           learning_rate=1e-2, num_epochs=60,
                           use_scheduler=False, seed=0)
    spec = ModelSpec(
        module=CremadFusionNet(num_classes=num_classes, dtype=jnp.bfloat16,
                               pool_kernel=pool_kernel,
                               stem_space_to_depth=stem_space_to_depth,
                               remat=remat),
        contract="jprobas",
        device_preprocess=device_preprocess,
    )
    spec_sample = rng.normal(size=(2, 129, 626, 1)).astype(np.float32)
    state = create_train_state(
        spec, args, jax.random.PRNGKey(0),
        [jnp.asarray(spec_sample), jnp.asarray(frames[:2])],
        steps_per_epoch=100,
    )
    if frames_bf16:
        import ml_dtypes

        frames = frames.astype(ml_dtypes.bfloat16)
    device_batch = {
        "x1_waveform": jax.device_put(wave),  # f32: Pallas STFT input
        "x2": jax.device_put(frames),
        "label": jax.device_put(label),
        "idx": jax.device_put(np.arange(batch, dtype=np.int32)),
        "valid": jax.device_put(np.ones(batch, np.float32)),
    }
    return make_train_step(spec), state, device_batch, spec

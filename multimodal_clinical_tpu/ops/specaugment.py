"""On-device SpecAugment (frequency + time masking).

The reference applies SpecAugment on the host per sample inside DataLoader
workers (vggsound/get_data.py:18-45 via torchaudio transforms;
ave/get_data.py:148-155 active at train; cremad/get_data.py:17-48 dormant).
Here it is a jitted batched op: masks are built from ``jax.random`` with
static mask counts (compiler-friendly — no dynamic shapes), applied as a
multiply that XLA fuses into the input pipeline graph.

torchaudio semantics: each mask picks width ~ U[0, param) and a start
~ U[0, dim - width); masked bins are zeroed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _axis_mask(rng, batch, dim, mask_param, num_masks):
    """(B, dim) multiplicative mask with ``num_masks`` random zero bands."""
    keys = jax.random.split(rng, 2)
    widths = jax.random.randint(keys[0], (batch, num_masks), 0, mask_param)
    starts = jax.random.uniform(keys[1], (batch, num_masks)) * jnp.maximum(
        dim - widths, 1
    )
    starts = starts.astype(jnp.int32)
    pos = jnp.arange(dim)[None, None, :]
    banded = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return 1.0 - jnp.any(banded, axis=1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("freq_mask_param", "time_mask_param",
                                   "num_freq_masks", "num_time_masks"))
def spec_augment(
    rng: jax.Array,
    spectrogram: jnp.ndarray,
    freq_mask_param: int = 30,
    time_mask_param: int = 120,
    num_freq_masks: int = 2,
    num_time_masks: int = 3,
) -> jnp.ndarray:
    """spectrogram: (B, F, T[, C]) -> same shape with masked bands zeroed."""
    squeeze = False
    if spectrogram.ndim == 4:
        x = spectrogram
    else:
        x = spectrogram[..., None]
        squeeze = True
    b, f, t, _ = x.shape
    k1, k2 = jax.random.split(rng)
    fmask = _axis_mask(k1, b, f, freq_mask_param, num_freq_masks)
    tmask = _axis_mask(k2, b, t, time_mask_param, num_time_masks)
    out = x * fmask[:, :, None, None] * tmask[:, None, :, None]
    return out[..., 0] if squeeze else out

"""On-device EMA logit-offset calibration.

Reimplements the reference EMA calibrator (utils/EMA.py:3-38) as pure
functions over a ``(num_modality, num_classes)`` float32 state array that
lives inside the TrainState pytree.  The reference syncs logits to host every
training step (``.detach().cpu()`` at EMA.py:32 / BaseModel.py:84-85); here
the update and the offset are fused into the jitted train step — zero D2H
traffic.

Semantics (matched to the reference):
  * ``update``: ``ema = new * beta + ema * (1 - beta)`` with beta = 0.05,
    where ``new`` is the per-modality batch-mean logits.
  * ``offset``: ``mean over modalities of ema  -  ema`` (shape (M, C)),
    added to unimodal logits before argmax to de-bias modality accuracy.
  * The update runs *before* the calibrated accuracies are computed
    (BaseModel.py:83-89), so the offset includes the current batch.
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_SMOOTHING = 0.05


def ema_update(ema_x: jnp.ndarray, batch_mean_logits: jnp.ndarray,
               smoothing: float = DEFAULT_SMOOTHING) -> jnp.ndarray:
    """One EMA step. Both arrays are (M, C); accumulation in float32."""
    new = batch_mean_logits.astype(jnp.float32)
    return new * smoothing + ema_x * (1.0 - smoothing)


def ema_offset(ema_x: jnp.ndarray) -> jnp.ndarray:
    """Per-modality calibration offset: mean-over-modalities minus modality mean."""
    return jnp.mean(ema_x, axis=0, keepdims=True) - ema_x


def masked_batch_mean(logits: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean over the batch axis counting only valid (non-padding) rows.

    logits: (B, C); valid: (B,) in {0, 1}.  With full batches this equals the
    reference's plain ``mean(dim=1)`` (BaseModel.py:83).
    """
    valid = valid.astype(logits.dtype)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(logits * valid[:, None], axis=0) / denom

"""VICReg (variance + invariance + covariance) regularizer.

Matches the reference formula (enrico/ensemble_model_vicreg.py:13-45); the
train loss adds it at weight 0.1 on top of the ensemble losses
(ensemble_model_vicreg.py:151).

``valid`` masks padded tail-batch rows out of every statistic so the
result equals the reference's math on its smaller last batch (the
reference ships a short batch; we pad to the static batch size with
repeats of the last row — see data/loader._pad_batch).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax.nn import relu


def vicreg_loss(z_a: jnp.ndarray, z_b: jnp.ndarray,
                valid: Optional[jnp.ndarray] = None,
                eps: float = 1e-8) -> jnp.ndarray:
    """VICReg between two (N, D) embedding batches (Bessel-corrected
    variance).  ``valid``: optional (N,) 0/1 mask of real rows."""
    z_a = z_a.astype(jnp.float32)
    z_b = z_b.astype(jnp.float32)
    n, d = z_a.shape
    if valid is None:
        v = jnp.ones((n,), jnp.float32)
    else:
        v = valid.astype(jnp.float32)
    vcol = v[:, None]
    k = jnp.sum(v)

    mean_a = jnp.sum(z_a * vcol, axis=0) / k
    mean_b = jnp.sum(z_b * vcol, axis=0) / k
    var_a = jnp.sum(vcol * (z_a - mean_a) ** 2, axis=0) / (k - 1.0)
    var_b = jnp.sum(vcol * (z_b - mean_b) ** 2, axis=0) / (k - 1.0)
    loss_var = jnp.mean(relu(1.0 - jnp.sqrt(var_a + eps))) \
        + jnp.mean(relu(1.0 - jnp.sqrt(var_b + eps)))

    loss_inv = jnp.sum(vcol * (z_a - z_b) ** 2) / (k * d)

    za_c = (z_a - mean_a) * vcol
    zb_c = (z_b - mean_b) * vcol
    cov_a = jnp.square(za_c.T @ za_c / (k - 1.0))
    cov_b = jnp.square(zb_c.T @ zb_c / (k - 1.0))
    loss_cov = (jnp.sum(cov_a) - jnp.sum(jnp.diag(cov_a))) / d \
             + (jnp.sum(cov_b) - jnp.sum(jnp.diag(cov_b))) / d

    return loss_var + loss_inv + loss_cov

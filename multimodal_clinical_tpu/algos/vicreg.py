"""VICReg (variance + invariance + covariance) regularizer.

Matches the reference formula (enrico/ensemble_model_vicreg.py:13-45); the
train loss adds it at weight 0.1 on top of the ensemble losses
(ensemble_model_vicreg.py:151).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import relu


def vicreg_loss(z_a: jnp.ndarray, z_b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """VICReg between two (N, D) embedding batches (Bessel-corrected variance)."""
    z_a = z_a.astype(jnp.float32)
    z_b = z_b.astype(jnp.float32)

    std_z_a = jnp.sqrt(jnp.var(z_a, axis=0, ddof=1) + eps)
    std_z_b = jnp.sqrt(jnp.var(z_b, axis=0, ddof=1) + eps)
    loss_var = jnp.mean(relu(1.0 - std_z_a)) + jnp.mean(relu(1.0 - std_z_b))

    loss_inv = jnp.mean((z_a - z_b) ** 2)

    n, d = z_a.shape
    za_c = z_a - jnp.mean(z_a, axis=0)
    zb_c = z_b - jnp.mean(z_b, axis=0)
    cov_a = jnp.square(za_c.T @ za_c / (n - 1))
    cov_b = jnp.square(zb_c.T @ zb_c / (n - 1))
    loss_cov = (jnp.sum(cov_a) - jnp.sum(jnp.diag(cov_a))) / d \
             + (jnp.sum(cov_b) - jnp.sum(jnp.diag(cov_b))) / d

    return loss_var + loss_inv + loss_cov

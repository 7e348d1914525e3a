"""Custom max-pool backward (ops/maxpool.py) vs XLA select-and-scatter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_clinical_tpu.ops.maxpool import max_pool_3x3_s2


def _ref_pool(x):
    return nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 4),      # even H/W
    (2, 9, 13, 4),     # odd H/W
    (3, 65, 157, 8),   # the audio-stem geometry class (odd, asymmetric)
])
def test_forward_matches_reduce_window(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(max_pool_3x3_s2(x)),
                                  np.asarray(_ref_pool(x)))


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 4),
    (2, 9, 13, 4),
    (3, 16, 22, 8),
])
def test_backward_matches_select_and_scatter(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    t = jnp.asarray(rng.normal(size=_ref_pool(x).shape).astype(np.float32))

    g_custom = jax.grad(lambda x: jnp.sum(max_pool_3x3_s2(x) * t))(x)
    g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x) * t))(x)
    # identical routing; summation order may differ by 1 ulp when one input
    # position collects gradient from several overlapping windows
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-7)


def test_backward_ties_route_to_first():
    """Gradient goes to the FIRST max in window scan order on exact ties
    (torch / select-and-scatter semantics), incl. the ReLU-zero-plateau
    case that dominates real post-ReLU feature maps."""
    x = jnp.zeros((1, 4, 4, 1), jnp.float32)  # all ties
    t = jnp.ones_like(_ref_pool(x))
    g_custom = jax.grad(lambda x: jnp.sum(max_pool_3x3_s2(x) * t))(x)
    g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x) * t))(x)
    np.testing.assert_array_equal(np.asarray(g_custom), np.asarray(g_ref))


def test_backward_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 8)).astype(np.float32),
                    dtype=jnp.bfloat16)
    t = jnp.asarray(
        rng.normal(size=(2, 6, 6, 8)).astype(np.float32), dtype=jnp.bfloat16)
    g_custom = jax.grad(
        lambda x: jnp.sum((max_pool_3x3_s2(x) * t).astype(jnp.float32)))(x)
    g_ref = jax.grad(
        lambda x: jnp.sum((_ref_pool(x) * t).astype(jnp.float32)))(x)
    # bf16 accumulation order differs where windows overlap: 1-ulp scale
    np.testing.assert_allclose(
        np.asarray(g_custom, np.float32), np.asarray(g_ref, np.float32),
        rtol=0.05, atol=0.02)

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


# ---------------------------------------------------------------- pallas op

from multimodal_clinical_tpu.ops.maxpool_pallas import max_pool_3x3_s2_pallas


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 8),      # even H/W
    (3, 9, 11, 16),    # odd H/W, uneven blocks
    (1, 65, 13, 8),    # tall odd (audio-stem geometry class)
    (4, 12, 12, 4),
])
@pytest.mark.parametrize("ties", [False, True])
def test_pallas_pool_matches_xla(shape, ties):
    """Stored-index Pallas kernels (interpret mode on CPU) vs XLA
    reduce_window / select-and-scatter: forward (both the undifferentiated
    primal and the vjp-forward), backward routing incl. tie plateaus."""
    rng = np.random.default_rng(42)
    x = rng.normal(size=shape).astype(np.float32)
    if ties:
        x = np.maximum(np.round(x * 2) / 2, 0)  # ReLU-like tie plateaus
    xj = jnp.asarray(x)
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2_pallas(xj)), np.asarray(_ref_pool(xj)))

    ct = jnp.asarray(rng.normal(size=_ref_pool(xj).shape).astype(np.float32))
    y, vjp = jax.vjp(max_pool_3x3_s2_pallas, xj)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(_ref_pool(xj)))
    (dx,) = vjp(ct)
    yr, vjpr = jax.vjp(_ref_pool, xj)
    (dxr,) = vjpr(ct)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dxr),
                               rtol=1e-6, atol=1e-7)


def test_pallas_pool_bf16():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32),
                    dtype=jnp.bfloat16)
    t = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32),
                    dtype=jnp.bfloat16)
    g = jax.grad(lambda x: jnp.sum(
        (max_pool_3x3_s2_pallas(x) * t).astype(jnp.float32)))(x)
    g_ref = jax.grad(
        lambda x: jnp.sum((_ref_pool(x) * t).astype(jnp.float32)))(x)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(g_ref, np.float32),
        rtol=0.05, atol=0.02)


def test_encoder_pool_kernel_flag_matches():
    """ResNetEncoder(pool_kernel="pallas") is math-identical to the XLA
    pool path — same params, same output, same grads."""
    from multimodal_clinical_tpu.models.resnet import ResNetEncoder

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 33, 37, 1)).astype(np.float32))
    enc_x = ResNetEncoder(stage_sizes=(1, 1), width=8)
    enc_p = ResNetEncoder(stage_sizes=(1, 1), width=8, pool_kernel="pallas")
    params = enc_x.init(jax.random.PRNGKey(0), x, train=False)

    def loss(module, params):
        out, _ = module.apply(params, x, train=True,
                              mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    lx, gx = jax.value_and_grad(lambda p: loss(enc_x, p))(params)
    lp, gp = jax.value_and_grad(lambda p: loss(enc_p, p))(params)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), gx, gp)

"""Fused BatchNorm (ops/fused_bn.py): numerics, gradients, torch parity.

The Pallas kernels are exercised in interpret mode on CPU; the jnp
fallback is the same custom_vjp math, so these tests pin the exact
semantics the TPU hot path runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_clinical_tpu.ops.fused_bn import (
    _bwd_sums_jnp,
    _bwd_sums_pallas,
    _channel_sums_jnp,
    _channel_sums_pallas,
    batch_norm_inference,
    batch_norm_train_stats,
)


def _ref_bn(x, scale, bias, eps=1e-5):
    """Plain-jnp training BN for autodiff comparison."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = x32.mean(axes)
    var = ((x32 - mean) ** 2).mean(axes)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype), mean, var


@pytest.mark.parametrize("c", [64, 128])
def test_channel_sums_pallas_matches_jnp(c):
    rng = np.random.default_rng(0)
    # M deliberately NOT a multiple of the block size (masking path)
    x = jnp.asarray(rng.normal(size=(1003, c)).astype(np.float32))
    s_p, s2_p = _channel_sums_pallas(x, interpret=True)
    s_j, s2_j = _channel_sums_jnp(x)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_j), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2_p), np.asarray(s2_j), rtol=1e-5)


def test_bwd_sums_pallas_matches_jnp():
    rng = np.random.default_rng(1)
    c = 64
    x = jnp.asarray(rng.normal(size=(514, c)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(514, c)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    rstd = jnp.asarray(rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32))
    a_p, b_p = _bwd_sums_pallas(dy, x, mean, rstd, interpret=True)
    a_j, b_j = _bwd_sums_jnp(dy, x, mean, rstd)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_j), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_j), rtol=1e-4,
                               atol=1e-4)


def test_train_forward_matches_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(8, 7, 9, 32))
                    .astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(32,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    y, mean, var = batch_norm_train_stats(x, scale, bias, use_pallas=False)
    y_r, mean_r, var_r = _ref_bn(x, scale, bias)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 5, 6, 16)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

    def loss_fused(x, s, b):
        y, _, _ = batch_norm_train_stats(x, s, b, use_pallas=False)
        return jnp.sum(jnp.tanh(y) * t)

    def loss_ref(x, s, b):
        y, _, _ = _ref_bn(x, s, b)
        return jnp.sum(jnp.tanh(y) * t)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_custom_vjp_pallas_interpret_matches_jnp_path():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)

    def loss(x, use_pallas):
        y, _, _ = batch_norm_train_stats(x, scale, bias,
                                         use_pallas=use_pallas,
                                         interpret=True)
        return jnp.sum(y * y)

    g_p = jax.grad(lambda x: loss(x, True))(x)
    g_j = jax.grad(lambda x: loss(x, False))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j),
                               rtol=1e-4, atol=1e-5)


def test_module_running_stats_match_torch():
    """FusedBatchNorm running mean/var track torch BatchNorm2d exactly
    (incl. the UNBIASED running-var estimator torch uses)."""
    torch = pytest.importorskip("torch")
    from multimodal_clinical_tpu.models.common import FusedBatchNorm

    rng = np.random.default_rng(5)
    xs = [rng.normal(1.0, 2.0, size=(4, 5, 5, 8)).astype(np.float32)
          for _ in range(3)]

    tbn = torch.nn.BatchNorm2d(8)  # momentum 0.1 == flax 0.9
    tbn.train()
    with torch.no_grad():
        for x in xs:
            tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    mod = FusedBatchNorm(use_running_average=False, use_pallas=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]))
    state = variables["batch_stats"]
    params = variables["params"]
    ys = []
    for x in xs:
        y, mut = mod.apply({"params": params, "batch_stats": state},
                           jnp.asarray(x), mutable=["batch_stats"])
        state = mut["batch_stats"]
        ys.append(y)

    np.testing.assert_allclose(np.asarray(state["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["var"]),
                               tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # eval-mode outputs from those stats also match torch
    tbn.eval()
    with torch.no_grad():
        t_out = tbn(torch.from_numpy(xs[0].transpose(0, 3, 1, 2))).numpy()
    j_out = mod.bind({"params": params, "batch_stats": state})
    y_eval = FusedBatchNorm(use_running_average=True, use_pallas=False).apply(
        {"params": params, "batch_stats": state}, jnp.asarray(xs[0]))
    np.testing.assert_allclose(
        np.asarray(y_eval).transpose(0, 3, 1, 2), t_out, rtol=1e-4, atol=1e-4)


def test_inference_matches_reference():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 16)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, size=(16,)).astype(np.float32))
    y = batch_norm_inference(x, scale, bias, mean, var)
    y_r = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)

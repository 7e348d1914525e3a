"""Pipeline parallelism (parallel/pipeline.py): math equivalence of the
GPipe schedule vs plain sequential block application, forward AND grads,
alone and composed with data parallelism — on the virtual CPU mesh.

The reference has nothing to compare against here (single GPU,
SURVEY §2.4); the contract is exact equivalence with the unpipelined
computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_clinical_tpu.parallel.pipeline import (
    pipeline_apply, stack_stage_params, stage_sharding,
)

N_STAGES = 4
DIM = 16


def _block(params, x):
    # residual MLP block: shape-preserving, nonlinear, parameterized
    return x + jnp.tanh(x @ params["w"] + params["b"])


def _make_params(rng, n_stages=N_STAGES):
    keys = jax.random.split(rng, n_stages)
    return [
        {"w": jax.random.normal(k, (DIM, DIM)) * 0.3,
         "b": jax.random.normal(jax.random.fold_in(k, 1), (DIM,)) * 0.1}
        for k in keys
    ]


def _sequential(params_list, x):
    for p in params_list:
        x = _block(p, x)
    return x


def _stage_mesh(extra_axis=None):
    devs = jax.devices()
    if extra_axis:
        dp = len(devs) // N_STAGES
        return Mesh(np.asarray(devs).reshape(N_STAGES, dp),
                    ("stage", extra_axis))
    return Mesh(np.asarray(devs[:N_STAGES]), ("stage",))


def test_pipeline_forward_matches_sequential():
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(0))
    stacked = jax.device_put(stack_stage_params(params_list),
                             stage_sharding(mesh))
    x = jax.random.normal(jax.random.PRNGKey(1), (24, DIM))

    want = _sequential(params_list, x)
    got = jax.jit(
        lambda p, v: pipeline_apply(mesh, _block, p, v, n_micro=6)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_single_microbatch_and_full_microbatching():
    """Degenerate schedules: M=1 (no pipelining, pure fill/drain) and
    M=B (one sample per microbatch) both reproduce the sequential
    math."""
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(2))
    stacked = jax.device_put(stack_stage_params(params_list),
                             stage_sharding(mesh))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, DIM))
    want = _sequential(params_list, x)
    for n_micro in (1, 8):
        got = jax.jit(
            lambda p, v, m=n_micro: pipeline_apply(mesh, _block, p, v,
                                                   n_micro=m)
        )(stacked, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_grads_match_sequential():
    """jax.grad through the scan + ppermute schedule equals the
    sequential gradients — the whole point: the reverse pipeline comes
    from autodiff, not hand-written schedules."""
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(4))
    stacked = jax.device_put(stack_stage_params(params_list),
                             stage_sharding(mesh))
    x = jax.random.normal(jax.random.PRNGKey(5), (12, DIM))
    y = jax.random.normal(jax.random.PRNGKey(6), (12, DIM))

    def pp_loss(p, v):
        return jnp.mean((pipeline_apply(mesh, _block, p, v, n_micro=4)
                         - y) ** 2)

    def seq_loss(plist, v):
        return jnp.mean((_sequential(plist, v) - y) ** 2)

    g_pp = jax.jit(jax.grad(pp_loss))(stacked, x)
    g_seq = jax.grad(seq_loss)(params_list, x)
    g_seq_stacked = stack_stage_params(g_seq)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(g_pp[k]),
                                   np.asarray(g_seq_stacked[k]),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_composes_with_data_parallel():
    """DP x PP: microbatches sharded over the data axis while flowing
    through the stage axis; output equals sequential on the full
    batch."""
    mesh = _stage_mesh(extra_axis="data")
    params_list = _make_params(jax.random.PRNGKey(7))
    stacked = jax.device_put(stack_stage_params(params_list),
                             stage_sharding(mesh))
    x = jax.random.normal(jax.random.PRNGKey(8), (16, DIM))
    x = jax.device_put(x, NamedSharding(mesh, P("data")))

    want = _sequential(params_list, x)
    got = jax.jit(
        lambda p, v: pipeline_apply(mesh, _block, p, v, n_micro=4,
                                    data_axis="data")
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_rejects_indivisible_microbatching():
    mesh = _stage_mesh()
    params_list = _make_params(jax.random.PRNGKey(9))
    stacked = stack_stage_params(params_list)
    x = jnp.zeros((10, DIM))
    with pytest.raises(ValueError, match="divide batch"):
        pipeline_apply(mesh, _block, stacked, x, n_micro=3)

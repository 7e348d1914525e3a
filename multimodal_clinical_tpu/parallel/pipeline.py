"""GPipe-style pipeline parallelism over a named ``stage`` mesh axis.

The reference has no pipeline (or any) parallelism — it is a
single-GPU Lightning suite (utils/run_trainer.py:42, SURVEY §2.4) and its
models are shallow classifiers that fit one chip.  This module is the
TPU-native scaling surface for when they don't: a stack of S
shape-preserving blocks is laid out one-per-device along a ``stage`` mesh
axis, a batch is cut into M microbatches, and activations hop
stage -> stage+1 over ICI via ``lax.ppermute`` inside a ``lax.scan``
schedule (the classic GPipe fill/compute/drain, M + S - 1 ticks, bubble
fraction (S-1)/(M+S-1)).  Everything is differentiable: ``jax.grad``
through the scan + ppermute yields the reverse pipeline automatically,
so the same train-step factories work unchanged.

Composes with the data axis: microbatches may be sharded over ``data``
while flowing through ``stage`` (tested in tests/test_pipeline.py).

Design notes (TPU-first):
  * one jitted program; no per-microbatch dispatch from Python
  * the stage loop is a ``lax.scan`` -> compiled once, O(1) program size
    in M
  * ppermute rides the ICI ring; XLA overlaps it with the next tick's
    compute where the schedule allows
  * blocks must be SHAPE-PRESERVING (x and y same shape/dtype) — the
    standard homogeneous-pipeline constraint; put input/output
    projections outside the pipelined region
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"


def stack_stage_params(params_list: Sequence):
    """Stack S per-stage param pytrees along a new leading stage axis
    (shard it with ``stage_sharding``)."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *params_list)


def stage_sharding(mesh: Mesh, axis: str = STAGE_AXIS) -> NamedSharding:
    """Sharding for stacked stage params: leading dim split over the
    stage axis (each device holds exactly its stage's weights)."""
    return NamedSharding(mesh, P(axis))


def pipeline_spmd(block_fn: Callable, params, x_micro: jnp.ndarray,
                  axis: str = STAGE_AXIS) -> jnp.ndarray:
    """Per-device (inside-``shard_map``) GPipe forward.

    ``block_fn(params, x) -> y`` with ``y.shape == x.shape``;
    ``params`` is THIS stage's param tree (stage dim already squeezed);
    ``x_micro`` is the (M, mb, ...) microbatch stream (stage 0 consumes
    it; later stages ignore it).  Returns the last stage's (M, mb, ...)
    outputs, replicated to every stage via a masked ``psum``.
    """
    n_stages = jax.lax.psum(1, axis)
    stage = jax.lax.axis_index(axis)
    n_micro = x_micro.shape[0]
    zero_mb = jnp.zeros_like(x_micro[0])

    def tick(carry, t):
        recv, outs = carry
        # fill: stage 0 pulls microbatch t from the stream while t < M
        feed = jnp.where(t < n_micro,
                         x_micro[jnp.minimum(t, n_micro - 1)], zero_mb)
        x_in = jnp.where(stage == 0, feed, recv)
        y = block_fn(params, x_in)
        # shift activations one stage down the ring; the wrap edge
        # (S-1 -> 0) carries garbage but stage 0 never reads ``recv``
        nxt = jax.lax.ppermute(
            y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)])
        # drain: the last stage finishes microbatch j at tick j + S - 1
        j = t - (n_stages - 1)
        take = (stage == n_stages - 1) & (j >= 0)
        jc = jnp.clip(j, 0, n_micro - 1)
        outs = outs.at[jc].set(jnp.where(take, y, outs[jc]))
        return (nxt, outs), None

    ticks = jnp.arange(n_micro + n_stages - 1)
    (_, outs), _ = jax.lax.scan(tick, (zero_mb, jnp.zeros_like(x_micro)),
                                ticks)
    # replicate the last stage's outputs everywhere (masked psum)
    return jax.lax.psum(
        jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), axis)


def pipeline_apply(mesh: Mesh, block_fn: Callable, stacked_params,
                   x: jnp.ndarray, n_micro: int,
                   axis: str = STAGE_AXIS,
                   data_axis: str | None = None) -> jnp.ndarray:
    """Run ``x`` (B, ...) through the S-stage pipeline on ``mesh``.

    ``stacked_params``: per-stage trees stacked on a leading S dim
    (``stack_stage_params``), sharded or shardable over ``axis``.
    ``n_micro`` microbatches must divide B.  When ``data_axis`` is given
    the microbatch dim stays sharded over it (DP x PP).  Returns the
    (B, ...) output of the final stage (replicated over ``axis``).
    """
    shard_map = jax.shard_map

    batch = x.shape[0]
    if batch % n_micro:
        raise ValueError(f"n_micro {n_micro} must divide batch {batch}")
    n_stages = mesh.shape[axis]
    leaves = jax.tree.leaves(stacked_params)
    if leaves and leaves[0].shape[0] != n_stages:
        # a larger multiple would silently drop all stages but the first
        # per device (spmd() squeezes with a[0])
        raise ValueError(
            f"stacked_params has {leaves[0].shape[0]} stages but mesh axis "
            f"{axis!r} has {n_stages} devices; they must match 1:1")
    x_micro = x.reshape(n_micro, batch // n_micro, *x.shape[1:])

    def spmd(params_stk, xm):
        params = jax.tree.map(lambda a: a[0], params_stk)
        return pipeline_spmd(block_fn, params, xm, axis=axis)

    batch_spec = P(None, data_axis) if data_axis else P()
    out = shard_map(spmd, mesh=mesh, in_specs=(P(axis), batch_spec),
                    out_specs=batch_spec, check_vma=False)(
                        stacked_params, x_micro)
    return out.reshape(batch, *out.shape[2:])

"""Parameter sharding rules over the ("data", "model") mesh.

Data parallelism: batches sharded on "data", params replicated.  Tensor
parallelism: 2-D Dense kernels (and their biases) are sharded on their
output feature dim over "model" when it divides evenly — classifier heads
and MLP widths partition across the model axis and XLA inserts the
all-gathers/reduce-scatters over ICI.  Conv kernels and BN/scalar leaves are
replicated (the reference models' conv towers are small; their FLOPs win
comes from batch sharding).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def param_spec(path: tuple, leaf: Any, model_axis_size: int) -> P:
    """PartitionSpec for one parameter leaf based on its role and shape."""
    if model_axis_size <= 1 or not hasattr(leaf, "ndim"):
        return P()
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    is_kernel = bool(names) and names[-1] == "kernel"
    if is_kernel and leaf.ndim == 2 and leaf.shape[-1] % model_axis_size == 0:
        return P(None, MODEL_AXIS)
    if (bool(names) and names[-1] == "bias" and leaf.ndim == 1
            and leaf.shape[0] % model_axis_size == 0):
        return P(MODEL_AXIS)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh under the TP rules."""
    mp = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        spec = param_spec(path, leaf, mp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a TrainState: params/opt under TP rules,
    everything else replicated."""
    mp = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())

    def for_params(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, mp)),
            tree,
        )

    return state.replace(
        params=for_params(state.params),
        # momentum buffers mirror the param layout; other opt leaves replicate
        opt_state=jax.tree_util.tree_map(lambda _: rep, state.opt_state),
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        step=rep, ema=rep, rng=rep,
        qmf_correctness=None if state.qmf_correctness is None else rep,
        qmf_confidence=None if state.qmf_confidence is None else rep,
    )

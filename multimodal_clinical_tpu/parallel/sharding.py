"""Parameter sharding rules over the ("data", "model") mesh.

Three composable placements (the reference is strictly single-GPU —
SURVEY §2.4 — so all of this is TPU-native scaling surface):

  * Data parallelism: batches sharded on "data"; XLA inserts gradient
    psums over ICI.
  * Tensor parallelism: 2-D Dense kernels (and their biases) shard their
    output-feature dim over "model" when it divides evenly — classifier
    heads and MLP widths partition across the model axis and XLA inserts
    the all-gathers/reduce-scatters.
  * FSDP (ZeRO-3 style, ``fsdp: true``): every large leaf additionally
    shards one dimension over the *data* axis — parameters and their
    momentum live distributed, XLA all-gathers them at use and
    reduce-scatters the grads.  Small leaves (BN scales, biases, stem
    kernels) stay replicated below ``_FSDP_MIN_SIZE`` elements: sharding
    them would trade negligible memory for extra collective launches.

Conv kernels and BN/scalar leaves are replicated under plain TP (the
reference models' conv towers are small; their FLOPs win comes from batch
sharding) and shard their output-channel dim under FSDP.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS, STAGE_AXIS

#: leaves smaller than this many elements stay replicated under FSDP
_FSDP_MIN_SIZE = 65536


def _fsdp_dim(leaf, fsdp: int, taken_dim: int = -1) -> int:
    """Dim to shard over the data axis, or -1.  Prefers the last dim,
    then the largest divisible one; never the TP-taken dim."""
    if fsdp <= 1 or not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return -1
    if int(np.prod(leaf.shape)) < _FSDP_MIN_SIZE:
        return -1
    dims = sorted(range(leaf.ndim),
                  key=lambda d: (d != leaf.ndim - 1, -leaf.shape[d]))
    for d in dims:
        if d != taken_dim and leaf.shape[d] % fsdp == 0:
            return d
    return -1


def param_spec(path: tuple, leaf: Any, model_axis_size: int,
               fsdp_axis_size: int = 1, stage_axis_size: int = 1) -> P:
    """PartitionSpec for one parameter leaf based on its role and shape."""
    if not hasattr(leaf, "ndim"):
        return P()
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    is_kernel = bool(names) and names[-1] == "kernel"
    mp = model_axis_size
    # GPipe stacked stage params (parallel/pipeline.py): every leaf under a
    # PipelinedEncoderStack's "stages" param carries the S-stage dim first —
    # each device on the stage axis holds exactly its stage's slice
    if stage_axis_size > 1 and "stages" in names and leaf.ndim >= 1 \
            and leaf.shape[0] == stage_axis_size:
        spec = [None] * leaf.ndim
        spec[0] = STAGE_AXIS
        d = _fsdp_dim(leaf, fsdp_axis_size, 0)
        if d > 0:
            spec[d] = DATA_AXIS
        return P(*spec)
    spec = [None] * leaf.ndim
    taken = -1
    if mp > 1:
        if (is_kernel and leaf.ndim == 2
                and leaf.shape[-1] % mp == 0):
            spec[-1] = MODEL_AXIS
            taken = leaf.ndim - 1
        elif (bool(names) and names[-1] == "bias" and leaf.ndim == 1
                and leaf.shape[0] % mp == 0):
            spec[0] = MODEL_AXIS
            taken = 0
    d = _fsdp_dim(leaf, fsdp_axis_size, taken)
    if d >= 0:
        spec[d] = DATA_AXIS
    return P(*spec) if any(s is not None for s in spec) else P()


def _axis_sizes(mesh: Mesh, fsdp: bool):
    mp = mesh.shape[MODEL_AXIS]
    fs = mesh.shape[DATA_AXIS] if fsdp else 1
    pp = dict(mesh.shape).get(STAGE_AXIS, 1)
    return mp, fs, pp


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """Place a parameter pytree on the mesh under the TP(+FSDP) rules."""
    mp, fs, pp = _axis_sizes(mesh, fsdp)

    def place(path, leaf):
        spec = param_spec(path, leaf, mp, fs, pp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def state_shardings(state, mesh: Mesh, fsdp: bool = False):
    """NamedSharding tree for a TrainState: params AND optimizer state under
    the TP(+FSDP) rules (optax momentum trees embed the param pytree, so
    path suffixes match and momentum mirrors its parameter's layout);
    everything else replicated."""
    mp, fs, pp = _axis_sizes(mesh, fsdp)
    rep = NamedSharding(mesh, P())

    def for_params(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(
                mesh, param_spec(path, leaf, mp, fs, pp)),
            tree,
        )

    return state.replace(
        params=for_params(state.params),
        opt_state=for_params(state.opt_state),
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        step=rep, ema=rep, rng=rep,
        qmf_correctness=None if state.qmf_correctness is None else rep,
        qmf_confidence=None if state.qmf_confidence is None else rep,
    )


def place_state(state, mesh: Mesh, fsdp: bool = False):
    """Device-put a freshly created TrainState onto the mesh under
    ``state_shardings``."""
    sh = state_shardings(state, mesh, fsdp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
        state, sh,
    )

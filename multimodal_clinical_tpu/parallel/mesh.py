"""Device-mesh construction and sharding helpers.

The reference runs strictly single-GPU (utils/run_trainer.py:42 uses
``strategy="auto"`` with ``gpus: [0]`` in every config; NCCL is installed but
never exercised).  Here parallelism is first-class: every train/eval step is
jitted over a named ``("data", "model")`` mesh.

  * ``data``  — batch (DP) axis.  Batches are sharded along it; XLA inserts
    the gradient/metric all-reduces over ICI automatically.
  * ``model`` — tensor-parallel axis.  Classifier-head and wide MLP kernels
    carry a PartitionSpec over it (models opt in via
    ``shard_dense_kernel``); size 1 by default since the reference models
    are small classifiers, but the mesh design leaves room (SURVEY §5.7).

We rely on jit's automatic partitioning (GSPMD) rather than hand-written
collectives: shardings are declared on inputs and constrained on params;
XLA chooses psum/all-gather placement over the ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"


def make_mesh(
    mesh_shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model"[, "stage"]) mesh.

    ``mesh_shape`` maps axis name -> size, e.g. ``{"data": 4, "model": 2}``
    or ``{"data": 2, "stage": 4}`` (GPipe pipeline stages over the trailing
    axis — parallel/pipeline.py).  Defaults to all local devices on the
    data axis; the stage axis only exists when requested with size > 1 so
    existing 2-axis checkpoint/sharding layouts are untouched.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape:
        mp = int(mesh_shape.get(MODEL_AXIS, 1)) or 1
        pp = int(mesh_shape.get(STAGE_AXIS, 1)) or 1
        dp = int(mesh_shape.get(DATA_AXIS, 0)) or max(1, n // (mp * pp))
    else:
        dp, mp, pp = n, 1, 1
    if dp * mp * pp != n:
        raise ValueError(f"mesh {dp}x{mp}x{pp} != {n} devices")
    if pp > 1:
        dev_array = np.asarray(devices).reshape(dp, mp, pp)
        return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, STAGE_AXIS))
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch leaf: leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_specs(batch_tree) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec tree for a batch: every array sharded on dim 0."""
    return jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch_tree)


def put_batch(batch, mesh: Mesh):
    """Transfer a host batch to the mesh, sharded along the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def constrain_model_parallel(x, spec: P):
    """Annotate an intermediate with a sharding constraint inside jit."""
    return jax.lax.with_sharding_constraint(x, spec)


def local_device_count() -> int:
    return jax.local_device_count()

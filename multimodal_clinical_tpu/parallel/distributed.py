"""Multi-host runtime bring-up: ``jax.distributed`` initialization.

The reference never exercises a communication backend (NCCL is an unused
wheel, SURVEY §2.4); the TPU-native story is the JAX distributed runtime —
every host calls ``jax.distributed.initialize()``, after which
``jax.devices()`` spans the full slice, collectives ride ICI within the
slice and DCN across hosts, and the per-host input sharding in
``engine/run.py::build_loaders`` partitions the global sample stream.

On TPU pods the coordinator/process-id/device-count triplet is inferred
from the TPU metadata; explicit values can be forced via config keys
(``dist_coordinator``, ``dist_num_processes``, ``dist_process_id``) for
CPU/GPU fleets or tests.
"""

from __future__ import annotations

import jax

_initialized = False


def initialize_if_requested(args) -> bool:
    """Bring up the distributed runtime when configured; returns True if
    multi-process.  Safe to call unconditionally: no-ops single-process
    runs (``dist_init`` unset and no coordinator configured)."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    want = bool(getattr(args, "dist_init", False))
    coordinator = getattr(args, "dist_coordinator", None)
    if not want and coordinator is None:
        return False
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = str(coordinator)
    num = getattr(args, "dist_num_processes", None)
    pid = getattr(args, "dist_process_id", None)
    if num is not None:
        kwargs["num_processes"] = int(num)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    print(f"[dist] initialized: process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.device_count()} devices "
          f"({jax.local_device_count()} local)")
    return jax.process_count() > 1

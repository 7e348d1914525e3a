"""End-to-end run wiring: mesh -> data -> state -> Trainer -> fit -> test.

The TPU-native equivalent of the reference's per-dataset ``run_training``
functions (e.g. cremad/run_trainer.py:24-73): resolve config, build the
device mesh, construct loaders with the dataset's sampler policy, initialize
the TrainState (placed on the mesh by parallel/sharding.place_state —
TP-sharded Dense kernels, optional FSDP, rest replicated), fit with
best-checkpointing, and test from the best checkpoint.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..data.loader import Loader
from ..data.sampler import RandomSampler, SequentialSampler, WeightedSampler
from ..parallel.mesh import DATA_AXIS, make_mesh
from .spec import ModelSpec
from .state import create_train_state
from .trainer import Trainer


@dataclass
class DataBundle:
    train: Any
    val: Any
    test: Any
    # sampler policy per split: 'weighted' | 'random' | 'sequential'
    train_sampler: str = "random"
    val_sampler: str = "sequential"
    test_sampler: str = "sequential"
    synthetic: bool = False


def _make_sampler(kind: str, dataset, seed: int, process_index: int = 0,
                  process_count: int = 1):
    proc = dict(process_index=process_index, process_count=process_count)
    if kind == "weighted":
        return WeightedSampler(dataset.labels, seed=seed, **proc)
    if kind == "random":
        return RandomSampler(len(dataset), seed=seed, **proc)
    return SequentialSampler(len(dataset), **proc)


def resolve_loader_workers(args) -> int:
    """Loader decode-thread count.  Default: the config's ``num_cpus`` (the
    reference maps it to 12 DataLoader workers, cremad/run_trainer.py:41-49)
    capped at host cores; ``loader_workers`` overrides explicitly."""
    workers = getattr(args, "loader_workers", None)
    if workers is None:
        host_cores = os.cpu_count() or 1
        workers = min(int(getattr(args, "num_cpus", 1) or 1), host_cores)
    return max(1, int(workers))


def build_loaders(args, data: DataBundle, mesh) -> Tuple[Loader, Loader, Loader]:
    """Per-split loaders.  Multi-host: every process derives the same
    global per-epoch index stream and loads only its strided shard
    (``stream[process_index::process_count]``) — the per-host input
    sharding the reference lists as a TODO (vggsound/vggsound.yaml:1).
    Each process feeds ``batch_size / process_count`` rows per step; the
    data-axis sharding assembles the global batch across hosts."""
    bs = int(args.batch_size)
    dp = mesh.shape[DATA_AXIS]
    if bs % dp != 0:
        raise ValueError(f"batch_size {bs} not divisible by data-axis size {dp}")
    pi, pc = jax.process_index(), jax.process_count()
    per_host_bs = bs if pc == 1 else bs // pc
    if pc > 1 and bs % pc != 0:
        raise ValueError(f"batch_size {bs} not divisible by process count {pc}")
    seed = int(getattr(args, "seed", 0))
    # disk gathers are stateless (per-(seed, epoch, index) augmentation
    # rng — data/core.sample_rng) so any worker count yields identical
    # batches; workers parallelize JPEG decode (GIL-releasing native path)
    workers = resolve_loader_workers(args)
    # bf16 feature transfer (half the H2D bytes) when the model computes
    # in bf16 anyway; config key transfer_dtype=float32 opts out
    transfer_dtype = None
    if (getattr(args, "compute_dtype", None) == "bfloat16"
            and getattr(args, "transfer_dtype", "auto") != "float32"):
        import ml_dtypes

        transfer_dtype = ml_dtypes.bfloat16

    def loader(split, kind, seed_offset):
        return Loader(split, per_host_bs,
                      _make_sampler(kind, split, seed + seed_offset, pi, pc),
                      mesh=mesh, workers=workers,
                      transfer_dtype=transfer_dtype)

    return (
        loader(data.train, data.train_sampler, 0),
        loader(data.val, data.val_sampler, 1),
        loader(data.test, data.test_sampler, 2),
    )


def sample_inputs_for_init(spec: ModelSpec, data: DataBundle):
    """First train rows mapped through ``spec.device_preprocess`` (eval
    mode): ``module.init`` must see POST-preprocess geometry/dtype — the
    vggsound adapter ships raw waveforms that become the (129, 626, 1)
    spectrogram on device, and uint8-shipped frames become normalized
    floats.  Returns host arrays ordered x1..xM."""
    import jax.numpy as jnp

    sample = data.train.gather(np.arange(min(2, len(data.train))))
    if spec.device_preprocess is not None:
        dev = spec.device_preprocess(
            {k: jnp.asarray(v) for k, v in sample.items()},
            jax.random.PRNGKey(0), False)
        sample = {k: np.asarray(v) for k, v in dev.items()}
    return [sample[f"x{i + 1}"]
            for i in range(spec.num_inputs or spec.num_modality)]


def init_state_on_mesh(spec: ModelSpec, args, data: DataBundle, mesh,
                       opt_kwargs: Optional[Dict] = None):
    sample_inputs = sample_inputs_for_init(spec, data)
    steps_per_epoch = max(1, -(-len(data.train) // int(args.batch_size)))
    rng = jax.random.PRNGKey(int(getattr(args, "seed", 0)))
    state = create_train_state(spec, args, rng, sample_inputs, steps_per_epoch,
                               **(opt_kwargs or {}))
    from ..parallel.sharding import place_state

    # TP rules apply when the mesh has a model axis; `fsdp: true`
    # additionally distributes large params + momentum over the data axis
    # (ZeRO-3 style; parallel/sharding.py)
    return place_state(state, mesh, fsdp=bool(getattr(args, "fsdp", False)))


def run_benchmark(args, benchmark_module, profile_dir: Optional[str] = None
                  ) -> Dict[str, float]:
    """Full fit+test for one benchmark; returns the test-epoch summary."""
    mesh = make_mesh(getattr(args, "mesh_shape", None) or None)
    data: DataBundle = benchmark_module.get_data(args)
    # benchmarks with a mesh-aware model (pipeline parallelism) opt in by
    # accepting a ``mesh`` kwarg (benchmarks/food101.py); **kwargs also
    # counts, and a pipeline_stages config on a benchmark that accepts
    # neither is a loud error rather than a silently-ignored setting
    import inspect

    sig_params = inspect.signature(benchmark_module.get_model_spec).parameters
    accepts_mesh = "mesh" in sig_params or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in sig_params.values())
    if int(getattr(args, "pipeline_stages", 0) or 0) > 1 and not accepts_mesh:
        raise NotImplementedError(
            f"pipeline_stages is set but the {args.dir!r} benchmark's "
            "get_model_spec does not accept a mesh — pipeline parallelism "
            "is wired for benchmarks that opt in (food101)")
    spec_kwargs = {"mesh": mesh} if accepts_mesh else {}
    spec, opt_kwargs = benchmark_module.get_model_spec(
        args, n_train=len(data.train), **spec_kwargs)
    train_loader, val_loader, test_loader = build_loaders(args, data, mesh)
    state = init_state_on_mesh(spec, args, data, mesh, opt_kwargs)
    # optional pretrained-weight injection (local checkpoints only —
    # replaces the reference's at-construction downloads,
    # enrico/joint_model.py:28, food101/joint_model.py:36)
    load_pretrained = getattr(benchmark_module, "load_pretrained", None)
    if load_pretrained is not None:
        state = load_pretrained(args, state)
    # optional warm start from a saved checkpoint's weights (the reference's
    # analysis variants load a fixed ensemble ckpt by path,
    # enrico/joint_model_counts.py:100-107)
    init_ckpt = getattr(args, "init_ckpt", None)
    if init_ckpt:
        from .checkpoint import BestCheckpointer

        loader_ckpt = BestCheckpointer(init_ckpt)
        restored = loader_ckpt.restore_last(state)
        if restored is None:
            restored = loader_ckpt.restore_best(state)
        if restored is not state:
            state = state.replace(params=restored.params,
                                  batch_stats=restored.batch_stats)
            print(f"[run] warm-started weights from {init_ckpt}")
    trainer = Trainer(args, spec, state, train_loader, val_loader, test_loader,
                      profile_dir=profile_dir)
    if getattr(args, "resume", False):
        trainer.resume()
    trainer.fit()
    # legacy standalone runners test the final-epoch weights (no
    # ModelCheckpoint — avmnist/run_training.py:109-128); new-style dirs
    # reload the best-val checkpoint first (utils/run_trainer.py:65)
    return trainer.test(restore_best=spec.test_restore_best)

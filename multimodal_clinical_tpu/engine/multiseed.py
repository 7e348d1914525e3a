"""Vmapped multi-seed training: S independent seeds on one chip.

The reference runs seed sweeps as parallel OS processes
(enrico/run_parallel.sh:1-12, mimic/run_parallel.sh — 20 background python
jobs) and aggregates exported CSVs offline (mimic/analyze_data.py:4-23).
On TPU the natural design is ``jax.vmap`` over the TrainState: S model
replicas train in ONE XLA program, each with its own init, dropout stream,
and data order (per-seed samplers stack to an (S, B, ...) superbatch).
For the small reference models this multiplies MXU utilization instead of
multiplying processes.

Eval shares the val/test data across seeds (broadcast via in_axes=None) and
reports per-seed metrics plus mean/std — the analyze_data.py aggregation,
live instead of offline.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import Loader
from .metrics import eval_epoch_summary, train_epoch_summary
from .spec import ModelSpec
from .state import create_train_state
from .steps import make_eval_step, make_train_step


def create_multiseed_state(spec: ModelSpec, args, sample_inputs,
                           steps_per_epoch: int, seeds: List[int],
                           opt_kwargs: Optional[Dict] = None):
    """Stack S independently-initialized TrainStates into one leading axis."""
    states = [
        create_train_state(spec, args, jax.random.PRNGKey(int(s)),
                           sample_inputs, steps_per_epoch, **(opt_kwargs or {}))
        for s in seeds
    ]
    # static fields (apply_fn bound method, optax/schedule closures) are
    # fresh objects per state; unify them so the pytrees share one treedef
    # for stacking
    states = [s.replace(apply_fn=states[0].apply_fn, tx=states[0].tx,
                        lr_schedule=states[0].lr_schedule)
              for s in states]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


class MultiSeedLoader:
    """Stacks S per-seed index streams into (S, B, ...) superbatches.

    ``datasets`` is either ONE dataset shared by every seed or a list of S
    per-seed datasets (the reference's 50-seed protocol re-seeds the global
    RNG per run, so each run's get_data() draws a DIFFERENT construction
    shuffle and split — mimic/get_data.py:86; run_multiseed builds per-seed
    bundles to match).

    Reuses Loader's producer-thread prefetch so the next superbatch's
    gather + stack + H2D overlaps the current vmapped device step
    (superbatches are S× a normal batch — on the ~50 MB/s tunnel that
    overlap is the difference between compute- and transfer-bound)."""

    def __init__(self, datasets, batch_size: int, samplers,
                 prefetch: int = 2, workers: int = 1):
        if not isinstance(datasets, (list, tuple)):
            datasets = [datasets] * len(samplers)
        if len(datasets) != len(samplers):
            raise ValueError(f"{len(datasets)} datasets vs "
                             f"{len(samplers)} samplers")
        self.loaders = [
            Loader(dataset, batch_size, sampler, mesh=None, prefetch=1,
                   workers=workers)
            for dataset, sampler in zip(datasets, samplers)
        ]
        self.prefetch = max(1, int(prefetch))

    def set_epoch(self, epoch: int) -> None:
        for loader in self.loaders:
            loader.set_epoch(epoch)

    def __len__(self) -> int:
        return min(len(l) for l in self.loaders)

    def _host_superbatches(self):
        iters = [iter(l._host_batches()) for l in self.loaders]
        while True:
            try:
                batches = [next(it) for it in iters]
            except StopIteration:
                return
            yield {
                k: np.stack([b[k] for b in batches]) for k in batches[0]
            }

    def __iter__(self):
        from ..data.loader import prefetched_iter

        return prefetched_iter(
            self._host_superbatches(),
            lambda b: {k: jax.device_put(v) for k, v in b.items()},
            self.prefetch)


def make_multiseed_steps(spec: ModelSpec, per_seed_eval_data: bool = False):
    """(train_step, eval_step) vmapped over the seed axis and jitted.

    train: state and batch both carry a leading S axis.
    eval:  state carries S; the batch is shared (broadcast, in_axes=None)
    unless ``per_seed_eval_data`` — per-seed splits stack to an (S, B, ...)
    superbatch (in_axes=0), the reference's per-run val/test sets.
    """
    train_raw = make_train_step(spec, jit=False)
    eval_raw = make_eval_step(spec, jit=False)
    train_v = jax.jit(jax.vmap(train_raw), donate_argnums=0)
    eval_v = jax.jit(
        jax.vmap(eval_raw, in_axes=(0, 0 if per_seed_eval_data else None)))
    return train_v, eval_v


def multiseed_eval_summary(outputs: List[Dict], num_seeds: int, prefix: str
                           ) -> Dict[str, float]:
    """Per-seed epoch summaries + cross-seed mean/std (analyze_data.py)."""
    per_seed: List[Dict[str, float]] = []
    for s in range(num_seeds):
        seed_outputs = [
            {k: np.asarray(v)[s] for k, v in o.items()} for o in outputs
        ]
        per_seed.append(eval_epoch_summary(seed_outputs, prefix))
    summary: Dict[str, float] = {}
    for key in per_seed[0]:
        values = np.asarray([p[key] for p in per_seed])
        summary[key] = float(values.mean())
        summary[key + "_std"] = float(values.std())
        for s, v in enumerate(values):
            summary[f"{key}_seed{s}"] = float(v)
    return summary


class BestValTracker:
    """Per-seed best-val weight snapshots for the vmapped sweep.

    Mirrors the reference's per-run ModelCheckpoint(top-1 val_avg_acc,
    max) + reload-best-then-test flow (utils/run_trainer.py:27-33,65) on
    the stacked (S, ...) state: after each val epoch, seeds whose val
    accuracy strictly improved (ties keep the earlier epoch, like
    checkpoint.py's strictly-greater best) snapshot their param /
    batch-stat slices via a masked ``jnp.where`` over the leading seed
    dim."""

    def __init__(self, n_seeds: int):
        self.n_seeds = n_seeds
        self.acc: Optional[np.ndarray] = None
        self.params = None
        self.stats = None

    def update(self, val_accs: np.ndarray, params, stats) -> np.ndarray:
        if self.acc is None:
            improved = np.ones(self.n_seeds, bool)
            self.acc = np.asarray(val_accs, np.float32).copy()
        else:
            improved = np.asarray(val_accs) > self.acc
            self.acc = np.where(improved, val_accs, self.acc)
        if improved.any():
            if self.params is None:
                self.params, self.stats = params, stats
            else:
                mask = jnp.asarray(improved)

                def pick(new, old):
                    m = mask.reshape((-1,) + (1,) * (new.ndim - 1))
                    return jnp.where(m, new, old)

                self.params = jax.tree.map(pick, params, self.params)
                self.stats = jax.tree.map(pick, stats, self.stats)
        return improved


def run_multiseed(args, benchmark_module, seeds: List[int]
                  ) -> Dict[str, float]:
    """Train S seeds simultaneously; returns the cross-seed test summary."""
    from .metrics import EpochAccumulator
    from .run import DataBundle, _make_sampler

    if jax.process_count() > 1:
        # the vmapped sweep replicates each seed's full batch on the local
        # host (Loader runs mesh-less); per-host strided input sharding
        # would feed different rows to each process's copy of a seed.
        # Refuse loudly — multi-host wants one seed per job instead.
        raise NotImplementedError(
            "num_seeds>1 is a single-process sweep (vmap over seeds); "
            "run one seed per process under jax.distributed")
    if getattr(args, "overfit_batches", 0):
        # the vmapped sweep trains per-seed data orders in one program;
        # pinning "the first k batches" is seed-ambiguous here.  Refuse
        # loudly rather than silently training on the full dataset.
        raise NotImplementedError(
            "overfit_batches is a single-run sanity mode "
            "(utils/run_trainer.py:54); run it without num_seeds>1")
    if (int(getattr(args, "pipeline_stages", 0) or 0) > 1
            or getattr(args, "sequence_sharding", False)):
        # the sweep's get_model_spec runs mesh-less, so the PP/SP flags
        # would silently fall back to the sequential/replicated paths —
        # refuse loudly instead of quietly dropping the user's sharding
        raise NotImplementedError(
            "pipeline_stages / sequence_sharding need a device mesh; the "
            "vmapped multi-seed sweep runs mesh-less seed replicas — run "
            "one seed per job for pipelined/sequence-sharded models")

    # Per-seed data: the reference's 50-seed protocol runs seed_everything
    # per process BEFORE get_data, so every run draws its own construction
    # shuffle AND split (mimic/get_data.py:86; run_parallel.sh) — each seed
    # here gets its own bundle.  Seed-independent adapters return identical
    # bundles (only the samplers then differ); `multiseed_shared_data: true`
    # opts out for corpora too large to materialize S times.
    import copy

    shared_data = bool(getattr(args, "multiseed_shared_data", False))
    if shared_data:
        bundles = [benchmark_module.get_data(args)] * len(seeds)
    else:
        bundles = []
        for s in seeds:
            a = copy.copy(args)
            a.seed = int(s)
            bundles.append(benchmark_module.get_data(a))
        lens = {(len(b.train), len(b.val), len(b.test)) for b in bundles}
        if len(lens) > 1:
            # unequal splits can't stack into (S, B, ...) superbatches;
            # refuse loudly instead of silently truncating eval data
            raise NotImplementedError(
                f"per-seed get_data() produced unequal split sizes {lens}; "
                "run one seed per job, or set multiseed_shared_data: true")
    data: DataBundle = bundles[0]
    per_seed_eval = not shared_data
    spec, opt_kwargs = benchmark_module.get_model_spec(
        args, n_train=len(data.train))
    bs = int(args.batch_size)
    steps_per_epoch = max(1, -(-len(data.train) // bs))

    from .run import sample_inputs_for_init

    sample_inputs = sample_inputs_for_init(spec, data)
    state = create_multiseed_state(spec, args, sample_inputs, steps_per_epoch,
                                   seeds, opt_kwargs)

    from .run import resolve_loader_workers

    workers = resolve_loader_workers(args)
    train_loader = MultiSeedLoader(
        [b.train for b in bundles], bs,
        [_make_sampler(b.train_sampler, b.train, int(s))
         for s, b in zip(seeds, bundles)],
        workers=workers,
    )
    if per_seed_eval:
        # per-seed val/test supersets stack like the train superbatches;
        # samplers honor the bundle's declared policy (vggsound/cremad/ave
        # use WEIGHTED val loaders — run.py build_loaders parity) with the
        # same +1/+2 seed offsets as the single-run path
        val_loader = MultiSeedLoader(
            [b.val for b in bundles], bs,
            [_make_sampler(b.val_sampler, b.val, int(s) + 1)
             for s, b in zip(seeds, bundles)],
            workers=workers,
        )
        test_loader = MultiSeedLoader(
            [b.test for b in bundles], bs,
            [_make_sampler(b.test_sampler, b.test, int(s) + 2)
             for s, b in zip(seeds, bundles)],
            workers=workers,
        )
    else:
        val_loader = Loader(
            data.val, bs,
            _make_sampler(data.val_sampler, data.val,
                          int(getattr(args, "seed", 0)) + 1),
            workers=workers)
        test_loader = Loader(
            data.test, bs,
            _make_sampler(data.test_sampler, data.test,
                          int(getattr(args, "seed", 0)) + 2),
            workers=workers)

    train_step, eval_step = make_multiseed_steps(
        spec, per_seed_eval_data=per_seed_eval)

    def eval_epoch(loader, prefix):
        outputs = [eval_step(state, batch) for batch in loader]
        return multiseed_eval_summary(outputs, len(seeds), prefix)

    # per-seed best-val weight tracking — the reference's new-style sweep
    # reloads each run's top-1 val_avg_acc checkpoint before test
    # (utils/run_trainer.py:27-33,65); legacy dirs test final weights
    # (spec.test_restore_best=False, avmnist/run_training.py:109-128)
    tracker = BestValTracker(len(seeds)) if spec.test_restore_best else None

    last_val = {}
    for epoch in range(int(args.num_epochs)):
        train_loader.set_epoch(epoch)
        acc = EpochAccumulator()
        for batch in train_loader:
            state, metrics = train_step(state, batch)
            # (S,) device vectors appended as-is: no per-step dispatch;
            # the one host fetch happens in the epoch summary below
            acc.append(metrics)
        # cross-seed & cross-step means (summary() flattens the S axis)
        train_summary = train_epoch_summary(acc)
        last_val = eval_epoch(val_loader, "val")
        if tracker is not None:
            tracker.update(
                np.array([last_val[f"val_epoch/val_avg_acc_seed{s}"]
                          for s in range(len(seeds))], np.float32),
                state.params, state.batch_stats)
        print(f"[multiseed epoch {epoch}] "
              f"train_avg_loss="
              f"{train_summary.get('train_epoch/train_avg_loss', 0):.4f}  "
              f"val_avg_acc={last_val.get('val_epoch/val_avg_acc', 0):.4f}"
              f" ± {last_val.get('val_epoch/val_avg_acc_std', 0):.4f}")
    if tracker is not None and tracker.params is not None:
        # weights-only restore: QMF history tables keep their final-epoch
        # values, exactly like the reference's state_dict reload (History
        # lives outside the checkpoint, existing_algos/QMF.py:12-29)
        state = state.replace(params=tracker.params,
                              batch_stats=tracker.stats)
    summary = eval_epoch(test_loader, "test")
    _write_seed_csv(args, seeds, summary)
    return summary


def _write_seed_csv(args, seeds, summary) -> None:
    """Persist per-seed test metrics as CSV — the artifact shape the
    reference exports from W&B for offline comparison
    (mimic/mimic_{ensemble,jlogits}.csv, mimic/analyze_data.py:4-23)."""
    import csv
    import os

    data_path = str(getattr(args, "data_path", "runs")).rstrip("/")
    run_dir = (getattr(args, "ckpt_dir", None)
               or f"{data_path}_ckpts")
    run_dir = os.path.join(run_dir, str(getattr(args, "group_name", "run")))
    os.makedirs(run_dir, exist_ok=True)
    base_keys = sorted({k.rsplit("_seed", 1)[0] for k in summary
                        if "_seed" in k})
    path = os.path.join(run_dir, "seeds.csv")
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["seed"] + base_keys)
        for s_pos, seed in enumerate(seeds):
            writer.writerow(
                [seed] + [summary.get(f"{k}_seed{s_pos}", "") for k in base_keys]
            )
        writer.writerow(["mean"] + [summary.get(k, "") for k in base_keys])
        writer.writerow(["std"] + [summary.get(k + "_std", "")
                                   for k in base_keys])
    print(f"[multiseed] wrote per-seed metrics to {path}")

"""Best-checkpoint management: save top-1 on val accuracy, reload before test.

Mirrors the reference flow (utils/run_trainer.py:23-33, 65): a single best
checkpoint keyed on ``val_epoch/val_avg_acc`` (max), reloaded before the
test pass.  Unlike the reference (weights only via Lightning), the FULL
train state is saved — params, BN statistics, optimizer buffers, EMA
calibration, QMF history — so training can also *resume* exactly, which the
reference cannot do (SURVEY §5.4: "No mid-epoch resume, no optimizer-state
restore usage").

Backends:
  * ``orbax`` (default when importable): async saves via
    ``ocp.AsyncCheckpointer`` — serialization runs on a background thread
    so the epoch loop never blocks on disk — plus step-stamped rolling
    checkpoints with garbage collection (``keep_last``).
  * ``msgpack``: synchronous flax serialization, zero extra deps,
    byte-exact round trip including python-tuple optimizer states.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from .state import TrainState


def state_to_tree(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema": state.ema,
        "rng": state.rng,
        "qmf_correctness": state.qmf_correctness,
        "qmf_confidence": state.qmf_confidence,
    }


def tree_into_state(state: TrainState, tree: Dict[str, Any]) -> TrainState:
    return state.replace(**tree)


def _host_fetch(tree):
    """``np.asarray`` for every leaf, with multi-host awareness: a leaf
    sharded across PROCESSES (multi-host DP/FSDP) is not fully addressable,
    so it is first allgathered to a fully-replicated value (one jit identity
    reshard — DCN traffic proportional to state size, paid only at
    checkpoint cadence).  Single-process trees take the plain fast path."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x,
                                                                tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def _default_backend() -> str:
    try:
        import orbax.checkpoint  # noqa: F401

        return "orbax"
    except Exception:
        return "msgpack"


class BestCheckpointer:
    """Keeps the best checkpoint by a max-metric plus a GC'd rolling tail.

    ``backend="auto"`` (the default) picks orbax when importable —
    the TPU-native standard: async save, directory format — and msgpack
    otherwise.  Both write the same logical layout:

        <ckpt_dir>/best            top-1 on the tracked metric
        <ckpt_dir>/last-<step>     rolling exact-resume checkpoints,
                                   pruned to ``keep_last``
        <ckpt_dir>/meta.json       best-metric bookkeeping
    """

    def __init__(self, ckpt_dir: str, backend: str = "auto",
                 keep_last: int = 2) -> None:
        # orbax/tensorstore requires absolute paths
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.best_metric: float = float("-inf")
        self.best_path: Optional[str] = None
        # resume bookkeeping: epochs completed at save time + the epoch
        # geometry they were measured in.  Deriving the epoch from
        # step // steps_per_epoch alone mis-resumes when batch size or
        # dataset size changed between runs (trainer guards on these).
        # meta_step stamps which checkpoint step the metadata describes:
        # the async state save may not have committed when a crash hits,
        # so resume trusts epochs_done only when meta_step matches the
        # restored step (crash consistency).
        self.epochs_done: Optional[int] = None
        self.steps_per_epoch: Optional[int] = None
        self.meta_step: Optional[int] = None
        # batches already consumed within epoch `epochs_done` at save time
        # (0 for epoch-boundary saves) — enables mid-epoch exact resume
        self.steps_into_epoch: int = 0
        self.keep_last = max(1, int(keep_last))
        # multi-host: every process computes/fetches symmetrically, but only
        # process 0 writes files (shared ckpt_dir would race otherwise);
        # restore reads on every process (ckpt_dir must be host-readable)
        try:
            self._primary = jax.process_index() == 0
        except Exception:  # backend not initialized yet: single-process
            self._primary = True
        os.makedirs(ckpt_dir, exist_ok=True)
        if backend == "auto":
            backend = _default_backend()
        self.backend = backend
        self._orbax = None
        # (tmp, final) renames deferred until the async save committed:
        # the old artifact is only replaced once the new one is fully on
        # disk, so a crash can never destroy the sole intact checkpoint
        self._pending: list = []
        if backend == "orbax":
            import orbax.checkpoint as ocp  # type: ignore

            try:
                self._orbax = ocp.AsyncCheckpointer(
                    ocp.PyTreeCheckpointHandler())
            except Exception:  # older orbax: synchronous fallback
                self._orbax = ocp.PyTreeCheckpointer()
            atexit.register(self._wait_quiet)
            self._recover_pending()

    # -- async plumbing --------------------------------------------------
    @staticmethod
    def _committed(path: str) -> bool:
        """True once orbax's own atomic-rename/commit finished for path."""
        if not os.path.isdir(path):
            return False
        try:
            from orbax.checkpoint import utils as ocp_utils  # type: ignore

            return bool(ocp_utils.is_checkpoint_finalized(path))
        except Exception:
            return True  # orbax versions that rename-on-commit: dir==done

    def _recover_pending(self) -> None:
        """Crash recovery: a committed '<name>.pending' dir is a save that
        finished after the old artifact was slated for replacement —
        promote it; sweep uncommitted debris."""
        if not self._primary:
            return
        for name in sorted(os.listdir(self.ckpt_dir)):
            if not name.endswith(".pending"):
                continue
            tmp = os.path.join(self.ckpt_dir, name)
            final = tmp[: -len(".pending")]
            if self._committed(tmp):
                if os.path.isdir(final):
                    shutil.rmtree(final, ignore_errors=True)
                os.replace(tmp, final)
            else:
                shutil.rmtree(tmp, ignore_errors=True)

    def wait(self) -> None:
        """Block until any in-flight async save has committed, then swap
        committed pendings over their final names.  Re-raises a failed
        async save — silently losing checkpoints is worse than crashing
        the epoch loop."""
        if self._orbax is not None and hasattr(self._orbax,
                                               "wait_until_finished"):
            self._orbax.wait_until_finished()  # every process: orbax's
            # async commit involves cross-process barriers of its own
        pending, self._pending = self._pending, []
        if not self._primary:
            return  # the swap below is primary-only filesystem surgery
        for tmp, final in pending:
            if not self._committed(tmp):
                continue  # failed save: leave the old artifact intact
            if os.path.isdir(final):
                shutil.rmtree(final, ignore_errors=True)
            os.replace(tmp, final)

    def _wait_quiet(self) -> None:
        try:
            self.wait()
        except Exception:
            pass  # interpreter teardown: nothing actionable

    def _save(self, path: str, tree: Dict[str, Any]) -> None:
        # Multi-host: ALL processes fetch (the allgather inside _host_fetch
        # is a collective every process must join) and ALL processes call
        # the orbax save (orbax runs its own cross-process save/commit
        # barriers; numpy leaves are written by the primary process only).
        # Our extra filesystem ops (stale-tmp sweep, pending swap, msgpack
        # writes) stay primary-only — concurrent writers to a shared
        # ckpt_dir would race.  Restore expects ckpt_dir readable by every
        # host (shared storage on real fleets).
        host_tree = _host_fetch(tree)
        if self._orbax is not None:
            self.wait()  # one in-flight save at a time; finalizes pendings
            tmp = path + ".pending"
            if self._primary and os.path.exists(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
            self._orbax.save(tmp, host_tree)
            # swapped over `path` at the next wait(), once committed
            self._pending.append((tmp, path))
        else:
            if not self._primary:
                return
            tmp = path + ".msgpack.tmp"
            with open(tmp, "wb") as f:
                f.write(serialization.to_bytes(host_tree))
            os.replace(tmp, path + ".msgpack")  # atomic on POSIX

    def _restore(self, path: str, template: Dict[str, Any]) -> Dict[str, Any]:
        self.wait()
        if self._orbax is not None and os.path.isdir(path):
            restored = self._orbax.restore(path)
            # conform structure (orbax turns tuples into lists) and dtypes
            # to the live template: leaf order is canonical in both trees.
            t_leaves, t_def = jax.tree_util.tree_flatten(template)
            r_leaves = jax.tree_util.tree_leaves(restored)
            if len(t_leaves) != len(r_leaves):
                raise ValueError("checkpoint/template structure mismatch")
            leaves = [np.asarray(r, dtype=np.asarray(t).dtype)
                      for t, r in zip(t_leaves, r_leaves)]
            return jax.tree_util.tree_unflatten(t_def, leaves)
        with open(path + ".msgpack", "rb") as f:
            return serialization.from_bytes(template, f.read())

    def _exists(self, path: str) -> bool:
        self.wait()  # finalize an in-flight save of this very path first
        return os.path.isdir(path) or os.path.exists(path + ".msgpack")

    # -- metadata ---------------------------------------------------------
    def _write_meta(self) -> None:
        import json

        if not self._primary:
            return
        with open(os.path.join(self.ckpt_dir, "meta.json"), "w") as f:
            json.dump({"best_metric": self.best_metric,
                       "epochs_done": self.epochs_done,
                       "steps_per_epoch": self.steps_per_epoch,
                       "steps_into_epoch": self.steps_into_epoch,
                       "meta_step": self.meta_step}, f)

    def _read_meta(self) -> None:
        import json

        path = os.path.join(self.ckpt_dir, "meta.json")
        if os.path.exists(path):
            with open(path) as f:
                meta = json.load(f)
            self.best_metric = float(meta["best_metric"])
            self.epochs_done = meta.get("epochs_done")
            self.steps_per_epoch = meta.get("steps_per_epoch")
            self.steps_into_epoch = int(meta.get("steps_into_epoch") or 0)
            self.meta_step = meta.get("meta_step")
            # meta is written before the async best-save commits: if the
            # save died, forget the phantom metric so maybe_save re-saves
            # instead of never beating a best that has no artifact
            if not self._exists(os.path.join(self.ckpt_dir, "best")):
                self.best_metric = float("-inf")

    # -- public API --------------------------------------------------------
    def maybe_save(self, state: TrainState, metric: float) -> bool:
        """Save iff ``metric`` improves on the best so far; returns True if saved."""
        if metric <= self.best_metric:
            return False
        self.best_metric = metric
        path = os.path.join(self.ckpt_dir, "best")
        self._save(path, state_to_tree(state))
        self.best_path = path
        self._write_meta()
        return True

    def _last_candidates(self):
        """[(step, path)] of rolling checkpoints, oldest first.  Includes
        the un-stamped legacy name 'last' (step -1) for back-compat."""
        out = []
        for name in os.listdir(self.ckpt_dir):
            stem = name[:-len(".msgpack")] if name.endswith(".msgpack") else name
            m = re.fullmatch(r"last-(\d+)", stem)
            if m:
                out.append((int(m.group(1)),
                            os.path.join(self.ckpt_dir, stem)))
            elif stem == "last":
                out.append((-1, os.path.join(self.ckpt_dir, stem)))
        return sorted(set(out))

    def save_last(self, state: TrainState,
                  epochs_done: Optional[int] = None,
                  steps_per_epoch: Optional[int] = None,
                  steps_into_epoch: int = 0) -> str:
        """Step-stamped rolling checkpoint; prunes beyond ``keep_last``.

        ``steps_into_epoch`` > 0 marks a MID-epoch save: ``epochs_done``
        epochs are complete plus that many batches of the next one (the
        trainer's ``ckpt_every_n_steps`` path)."""
        step = int(jax.device_get(state.step))
        path = os.path.join(self.ckpt_dir, f"last-{step}")
        if epochs_done is not None:
            self.epochs_done = int(epochs_done)
            self.steps_per_epoch = (int(steps_per_epoch)
                                    if steps_per_epoch else None)
            self.steps_into_epoch = int(steps_into_epoch)
            self.meta_step = step
            self._write_meta()
        # GC BEFORE saving: pruning after would wait() on the checkpoint
        # just enqueued, turning every async save into a synchronous one
        # (the ckpt_every_n_steps hot path).  The wait here covers only the
        # PREVIOUS save — it has had a whole inter-checkpoint interval to
        # commit — and also makes it visible to the candidate listing.
        self.wait()
        if self._primary:
            candidates = [p for _, p in self._last_candidates() if p != path]
            keep_prior = self.keep_last - 1
            stale_list = candidates[:-keep_prior] if keep_prior else candidates
            for stale in stale_list:
                if os.path.isdir(stale):
                    shutil.rmtree(stale, ignore_errors=True)
                elif os.path.exists(stale + ".msgpack"):
                    os.remove(stale + ".msgpack")
        self._save(path, state_to_tree(state))
        return path

    def restore_last(self, state: TrainState) -> Optional[TrainState]:
        """Restore the full state from the newest rolling checkpoint for
        exact training resume (params, BN stats, optimizer buffers, EMA,
        QMF history, step counter). None if no checkpoint exists."""
        self.wait()  # surface step-stamped saves still in flight
        if jax.process_count() > 1:
            # the pending->final swap above is primary-only; make sure it
            # happened before ANY process lists candidates (restore_last is
            # called symmetrically — the later _host_fetch is a collective)
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ckpt_restore_listing")
        candidates = self._last_candidates()
        if not candidates:
            return None
        template = _host_fetch(state_to_tree(state))
        errors = []
        # newest first; a torn/corrupt newest falls back to the older
        # intact rolling checkpoint instead of failing the resume
        for _, path in reversed(candidates):
            try:
                tree = self._restore(path, template)
                break
            except Exception as exc:  # noqa: BLE001
                errors.append((path, exc))
        else:
            raise RuntimeError(
                f"all rolling checkpoints unreadable: {errors}")
        if errors:
            print(f"[checkpoint] WARNING: skipped unreadable {errors[0][0]} "
                  f"({errors[0][1]}); resumed from {path}")
        self._read_meta()
        return tree_into_state(state, tree)

    def restore_best(self, state: TrainState) -> TrainState:
        if self.best_path is None:
            candidate = os.path.join(self.ckpt_dir, "best")
            if self._exists(candidate):
                self.best_path = candidate
            else:
                return state
        template = _host_fetch(state_to_tree(state))
        tree = self._restore(self.best_path, template)
        return tree_into_state(state, tree)

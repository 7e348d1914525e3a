"""Best-checkpoint management: save top-1 on val accuracy, reload before test.

Mirrors the reference flow (utils/run_trainer.py:23-33, 65): a single best
checkpoint keyed on ``val_epoch/val_avg_acc`` (max), reloaded before the
test pass.  Unlike the reference (weights only via Lightning), the FULL
train state is saved — params, BN statistics, optimizer buffers, EMA
calibration, QMF history — so training can also *resume* exactly, which the
reference cannot do (SURVEY §5.4: "No mid-epoch resume, no optimizer-state
restore usage").

Serialization uses Orbax when available (async-capable, the JAX-native
standard) and falls back to flax msgpack otherwise.
"""

from __future__ import annotations

import os
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


class BestCheckpointer:
    """Keeps the single best checkpoint by a max-metric (val_epoch/val_avg_acc)."""

    def __init__(self, ckpt_dir: str, backend: str = "msgpack") -> None:
        # Default backend is flax msgpack: byte-exact round trip of the full
        # state INCLUDING python-tuple optimizer states (orbax restores
        # tuples as lists, which breaks structure-matched tree_map; the
        # orbax path conforms the restored tree to the live template).
        self.ckpt_dir = ckpt_dir
        self.best_metric: float = float("-inf")
        self.best_path: Optional[str] = None
        os.makedirs(ckpt_dir, exist_ok=True)
        self._orbax = None
        if backend == "orbax":
            import orbax.checkpoint as ocp  # type: ignore

            self._orbax = ocp.PyTreeCheckpointer()

    def _save(self, path: str, tree: Dict[str, Any]) -> None:
        host_tree = jax.tree_util.tree_map(np.asarray, tree)
        if self._orbax is not None:
            import shutil

            if os.path.exists(path):
                shutil.rmtree(path)
            self._orbax.save(path, host_tree)
        else:
            with open(path + ".msgpack", "wb") as f:
                f.write(serialization.to_bytes(host_tree))

    def _restore(self, path: str, template: Dict[str, Any]) -> Dict[str, Any]:
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

    def _write_meta(self) -> None:
        import json

        with open(os.path.join(self.ckpt_dir, "meta.json"), "w") as f:
            json.dump({"best_metric": self.best_metric}, f)

    def _read_meta(self) -> None:
        import json

        path = os.path.join(self.ckpt_dir, "meta.json")
        if os.path.exists(path):
            with open(path) as f:
                self.best_metric = float(json.load(f)["best_metric"])

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

    def save_last(self, state: TrainState) -> str:
        path = os.path.join(self.ckpt_dir, "last")
        self._save(path, state_to_tree(state))
        return path

    def restore_last(self, state: TrainState) -> Optional[TrainState]:
        """Restore the full state from the rolling 'last' checkpoint for
        exact training resume (params, BN stats, optimizer buffers, EMA,
        QMF history, step counter). None if no checkpoint exists."""
        path = os.path.join(self.ckpt_dir, "last")
        if not (os.path.isdir(path) or os.path.exists(path + ".msgpack")):
            return None
        template = jax.tree_util.tree_map(np.asarray, state_to_tree(state))
        tree = self._restore(path, template)
        self._read_meta()
        return tree_into_state(state, tree)

    def restore_best(self, state: TrainState) -> TrainState:
        if self.best_path is None:
            candidate = os.path.join(self.ckpt_dir, "best")
            if os.path.isdir(candidate) or os.path.exists(candidate + ".msgpack"):
                self.best_path = candidate
            else:
                return state
        template = jax.tree_util.tree_map(np.asarray, state_to_tree(state))
        tree = self._restore(self.best_path, template)
        return tree_into_state(state, tree)

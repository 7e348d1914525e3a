"""The training engine: epoch loop, eval, best-checkpoint, test.

Functional replacement for the reference's Lightning Trainer wrapper
(utils/run_trainer.py:6-70): fit over epochs with per-step metric streams,
epoch-end validation with full-epoch offset correction, top-1 checkpoint on
``val_epoch/val_avg_acc`` (max), then reload-best-and-test — plus what the
reference lacks: step-time/samples-per-sec telemetry and optional
``jax.profiler`` traces (SURVEY §5.1).

The step functions are jitted SPMD programs; the loop only moves host
batches (prefetched + sharded by the Loader) and fetches metric scalars at
epoch boundaries.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..utils.logging import RunLogger
from .checkpoint import BestCheckpointer
from .metrics import (
    EpochAccumulator,
    eval_epoch_summary,
    step_metric_name,
    train_epoch_summary,
)
from .spec import ModelSpec
from .state import TrainState
from .steps import make_eval_step, make_train_step


class Preempted(SystemExit):
    """Raised after a SIGTERM-triggered checkpoint: the state is safely on
    disk and the process should exit (preemptible/spot TPU semantics —
    ``--resume`` continues mid-epoch exactly)."""

    def __init__(self, step: int) -> None:
        super().__init__(143)  # conventional SIGTERM exit status
        self.step = step


class _FixedBatches:
    """Fixed set of already-placed device batches standing in for a Loader.

    Backs the ``overfit_batches`` sanity mode (reference
    utils/run_trainer.py:6,54 — Lightning's overfit knob, "use 1.0 to check
    if model is working"): train AND validate on the same first-k train
    batches, so a working model drives train/val accuracy to ~1.0."""

    def __init__(self, batches) -> None:
        self.batches = list(batches)

    def set_epoch(self, epoch: int) -> None:  # same subset every epoch
        pass

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


class Trainer:
    def __init__(
        self,
        args: Any,
        spec: ModelSpec,
        state: TrainState,
        train_loader,
        val_loader,
        test_loader,
        run_dir: Optional[str] = None,
        logger: Optional[RunLogger] = None,
        profile_dir: Optional[str] = None,
    ) -> None:
        self.args = args
        self.spec = spec
        self.state = state
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader

        data_path = str(getattr(args, "data_path", "runs")).rstrip("/")
        group = getattr(args, "group_name", "run")
        self.run_dir = run_dir or os.path.join(
            getattr(args, "ckpt_dir", None) or f"{data_path}_ckpts", str(group)
        )
        os.makedirs(self.run_dir, exist_ok=True)
        self.logger = logger or RunLogger(
            self.run_dir,
            use_wandb=bool(getattr(args, "use_wandb", False)),
            wandb_config=vars(args) if hasattr(args, "__dict__") else None,
            group_name=str(group),
        )
        self.ckpt = BestCheckpointer(os.path.join(self.run_dir, "ckpt"))
        self.train_step = make_train_step(spec)
        self.eval_step = make_eval_step(spec)
        # K optimizer steps per dispatch (lax.scan device loop); tail
        # batches fall back to the single-step program
        self.steps_per_dispatch = int(
            getattr(args, "steps_per_dispatch", 1) or 1)
        if self.steps_per_dispatch > 1:
            from .steps import make_scan_train_step

            self.scan_train_step = make_scan_train_step(
                spec, self.steps_per_dispatch)
        self.log_every = int(getattr(args, "log_every_n_steps", 30) or 0)
        # mid-epoch rolling checkpoints every N optimizer steps (0 = off):
        # with exact resume this bounds lost work on long epochs (a
        # VGGSound epoch is ~7:45 min on the reference) — the reference
        # can only checkpoint at validation boundaries
        self.ckpt_every = int(getattr(args, "ckpt_every_n_steps", 0) or 0)
        # Lightning semantics (run_trainer.py:54): float in (0, 1] = that
        # fraction of the train batches, int >= 1 = that many batches
        self.overfit_batches = getattr(args, "overfit_batches", 0) or 0
        self.profile_dir = profile_dir
        self.history: List[Dict[str, float]] = []
        # preemption (SIGTERM) handling: flag checked at step boundaries;
        # fit() saves a mid-epoch exact-resume checkpoint and exits
        self._preempt_requested = False

    # ------------------------------------------------------------------
    def _run_eval(self, loader, prefix: str) -> Dict[str, float]:
        # tick the eval loader's epoch so per-(seed, epoch, index) draws
        # (e.g. vggsound's random eval-frame choice, get_data.py:148-152)
        # re-randomize each pass like the reference's stateful transforms
        self._eval_pass = getattr(self, "_eval_pass", -1) + 1
        loader.set_epoch(self._eval_pass)
        outputs = []
        for batch in loader:
            outputs.append(self.eval_step(self.state, batch))
        if not outputs:
            return {}
        if self.log_every:
            # per-batch eval streams under the reference's step namespace:
            # val_step/val_{acc,loss} (BaseModel.py:158-159), test_step/
            # test_{acc,loss} (227-228), QMF's extra logits_df_acc
            # (1033-1035, 1108-1110).  Logged after the loop from the
            # already-collected outputs — no extra device syncs inside the
            # eval pass; all rows carry the current global step (eval runs
            # at a fixed train step, like Lightning's eval-time
            # global_step).
            base = int(self.state.step)
            for o in outputs:
                row = {
                    f"{prefix}_step/{prefix}_acc": float(np.asarray(o["acc"])),
                    f"{prefix}_step/{prefix}_loss":
                        float(np.asarray(o["loss"])),
                }
                if "df_acc" in o:
                    row[f"{prefix}_step/logits_df_acc"] = float(
                        np.asarray(o["df_acc"]))
                if "vicreg_loss" in o:
                    # ensemble_model_vicreg.py:216 (val) / 268 (test)
                    row[f"{prefix}_step/{prefix}_vicreg_loss"] = float(
                        np.asarray(o["vicreg_loss"]))
                self.logger.log(row, step=base)
        summary = eval_epoch_summary(outputs, prefix)
        if self.spec.legacy_metric_aliases:
            from .metrics import legacy_alias_summary

            summary.update(legacy_alias_summary(summary, prefix))
        return summary

    def resume(self) -> bool:
        """Restore the full train state from the rolling 'last' checkpoint
        (exact resume — optimizer buffers, EMA, QMF history, step counter).
        Returns True if a checkpoint was found."""
        restored = self.ckpt.restore_last(self.state)
        if restored is None:
            return False
        self.state = restored
        print(f"[trainer] resumed from step {int(self.state.step)} "
              f"(best={self.ckpt.best_metric:.4f})")
        return True

    def _enter_overfit_mode(self) -> None:
        """Pin the first-k train batches as both train and val loaders."""
        n_batches = max(len(self.train_loader), 1)
        raw = self.overfit_batches
        if isinstance(raw, float) and raw <= 1.0:
            k = max(1, round(raw * n_batches))
        else:
            k = max(1, int(raw))
        self.train_loader.set_epoch(0)
        batches = []
        for batch in self.train_loader:
            batches.append(batch)
            if len(batches) >= k:
                break
        fixed = _FixedBatches(batches)
        self.train_loader = fixed
        self.val_loader = fixed
        print(f"[trainer] overfit_batches={raw}: training AND validating on "
              f"the same {len(batches)} fixed train batch(es)")

    def _handle_preempt_signal(self, signum, frame) -> None:
        print("[trainer] SIGTERM: will checkpoint at the next step boundary "
              "and exit (resume with --resume)")
        self._preempt_requested = True

    def _preempt_exit(self, epoch: int, steps_per_epoch: int,
                      into_epoch: int) -> None:
        self.ckpt.save_last(self.state, epochs_done=epoch,
                            steps_per_epoch=steps_per_epoch,
                            steps_into_epoch=into_epoch)
        self.ckpt.wait()  # the async commit must land before we exit
        step = int(self.state.step)
        print(f"[trainer] preempted: exact-resume checkpoint saved at step "
              f"{step} (epoch {epoch} + {into_epoch} batches)")
        raise Preempted(step)

    def fit(self) -> Dict[str, float]:
        import signal
        import threading

        # preemption-aware training: SIGTERM checkpoints then exits.  Only
        # the main thread may install handlers; elsewhere (e.g. a test
        # runner thread) training simply runs without the hook.
        installed = None
        if threading.current_thread() is threading.main_thread():
            installed = signal.signal(signal.SIGTERM,
                                      self._handle_preempt_signal)
        try:
            return self._fit_inner()
        finally:
            if installed is not None:
                signal.signal(signal.SIGTERM, installed)

    def _fit_inner(self) -> Dict[str, float]:
        num_epochs = int(getattr(self.args, "num_epochs", 1))
        if self.overfit_batches:
            self._enter_overfit_mode()
        steps_per_epoch = max(len(self.train_loader), 1)
        # Resume epoch: prefer the recorded epochs_done (exact even when
        # batch size / dataset size changed between runs); fall back to
        # the step-derived estimate for pre-metadata checkpoints OR when
        # the metadata is AHEAD of the restored state (a crash between
        # the meta write and the async checkpoint commit).
        meta_consistent = (self.ckpt.meta_step is None
                           or self.ckpt.meta_step == int(self.state.step))
        skip_batches = 0
        if self.ckpt.epochs_done is not None and meta_consistent:
            start_epoch = int(self.ckpt.epochs_done)
            if (self.ckpt.steps_per_epoch
                    and self.ckpt.steps_per_epoch != steps_per_epoch):
                print(f"[trainer] WARNING: epoch geometry changed since the "
                      f"checkpoint ({self.ckpt.steps_per_epoch} -> "
                      f"{steps_per_epoch} steps/epoch); resuming at epoch "
                      f"{start_epoch} from the recorded epoch count"
                      + (f"; the checkpoint's {self.ckpt.steps_into_epoch} "
                         f"mid-epoch batch(es) will be REPLAYED under the "
                         f"new geometry (resume is no longer exact)"
                         if self.ckpt.steps_into_epoch else ""))
            else:
                # mid-epoch save: the first resumed epoch replays its index
                # stream and skips the batches the checkpoint already saw
                # (deterministic per-(seed, epoch) sampling makes this exact)
                skip_batches = int(self.ckpt.steps_into_epoch or 0)
        else:
            # step-derived fallback (pre-metadata ckpt, or meta ahead of a
            # torn async save): the step counter itself carries the
            # mid-epoch offset — without it, the partial epoch's batches
            # would be silently re-trained
            start_epoch = int(self.state.step) // steps_per_epoch
            skip_batches = int(self.state.step) % steps_per_epoch
        global_step = int(self.state.step)
        # profile the run's SECOND epoch when there is one (the first pays
        # compilation), else its only epoch — a fixed `epoch == 1` test
        # would silently skip profiling for num_epochs=1 or a resume
        # landing past epoch 1
        profile_epoch = (start_epoch + 1
                         if num_epochs - start_epoch > 1 else start_epoch)
        last_val: Dict[str, float] = {}
        for epoch in range(start_epoch, num_epochs):
            self.train_loader.set_epoch(epoch)
            acc = EpochAccumulator()
            tic = time.perf_counter()
            samples = 0
            profiling = (self.profile_dir is not None
                         and epoch == profile_epoch)
            if profiling:
                jax.profiler.start_trace(self.profile_dir)
            pending = []
            into_epoch = 0
            if epoch == start_epoch and skip_batches:
                print(f"[trainer] mid-epoch resume: skipping the first "
                      f"{skip_batches} already-trained batch(es) of epoch "
                      f"{epoch}")
                into_epoch = skip_batches
            if into_epoch and hasattr(self.train_loader, "skip"):
                # index-level skip: the skipped batches are never decoded
                # or transferred (a consumed-iterator skip would pay the
                # full host+H2D pipeline for each one)
                self.train_loader.skip(into_epoch)
                batch_iter = iter(self.train_loader)
            else:
                batch_iter = iter(self.train_loader)
                for _ in range(into_epoch):
                    if next(batch_iter, None) is None:
                        break
            for batch in batch_iter:
                if self.steps_per_dispatch > 1:
                    pending.append(batch)
                    if len(pending) < self.steps_per_dispatch:
                        continue
                    self.state, metrics = self.scan_train_step(
                        self.state, *pending)
                    samples += sum(b["label"].shape[0] for b in pending)
                    advanced = len(pending)
                    global_step += advanced
                    pending = []
                else:
                    self.state, metrics = self.train_step(self.state, batch)
                    samples += batch["label"].shape[0]
                    advanced = 1
                    global_step += 1
                acc.append(metrics)
                # crossing test: with K-step dispatch global_step moves in
                # strides of K, so `% log_every == 0` would only fire every
                # lcm(K, log_every) steps
                if self.log_every and global_step % self.log_every < advanced:
                    row = {step_metric_name("train", k):
                           float(np.mean(np.asarray(v)))
                           for k, v in metrics.items() if k != "valid_count"}
                    if self.state.lr_schedule is not None:
                        # LearningRateMonitor parity (run_trainer.py:20):
                        # optax consumed schedule(count-before-increment),
                        # so the step that just ran used this LR
                        row[self.state.lr_metric_name] = float(
                            self.state.lr_schedule(global_step - advanced))
                    self.logger.log(row, step=global_step)
                into_epoch += advanced
                if self._preempt_requested:
                    self._preempt_exit(epoch, steps_per_epoch, into_epoch)
                if (self.ckpt_every and into_epoch < steps_per_epoch
                        and global_step % self.ckpt_every < advanced):
                    # (the epoch's final step is covered by the epoch-
                    # boundary save below — don't serialize it twice)
                    self.ckpt.save_last(
                        self.state, epochs_done=epoch,
                        steps_per_epoch=steps_per_epoch,
                        steps_into_epoch=into_epoch)
            for batch in pending:  # tail shorter than K: single steps
                self.state, metrics = self.train_step(self.state, batch)
                acc.append(metrics)
                samples += batch["label"].shape[0]
                global_step += 1
                into_epoch += 1
                if self._preempt_requested:
                    self._preempt_exit(epoch, steps_per_epoch, into_epoch)
            if profiling:
                # host scalar fetch of the last step's output — the real
                # device barrier here; block_until_ready does NOT
                # synchronize under the remote-TPU tunnel (CLAUDE.md)
                int(jax.device_get(self.state.step))
                jax.profiler.stop_trace()
            # one device sync per epoch, after the summary fetch
            epoch_summary = train_epoch_summary(acc)
            wall = time.perf_counter() - tic
            epoch_summary["train_epoch/samples_per_sec"] = samples / max(wall, 1e-9)
            epoch_summary["train_epoch/epoch_time_sec"] = wall
            # LearningRateMonitor parity (utils/run_trainer.py:20): report
            # the LR in effect after this epoch under Lightning's key
            if self.state.lr_schedule is not None:
                epoch_summary[self.state.lr_metric_name] = float(
                    self.state.lr_schedule(global_step))

            val_summary = self._run_eval(self.val_loader, "val")
            last_val = val_summary
            self.logger.log_epoch({**epoch_summary, **val_summary}, epoch,
                                  step=global_step)
            self.history.append({**epoch_summary, **val_summary})

            val_acc = val_summary.get("val_epoch/val_avg_acc")
            if val_acc is not None:
                self.ckpt.maybe_save(self.state, val_acc)
            self.ckpt.save_last(self.state, epochs_done=epoch + 1,
                                steps_per_epoch=steps_per_epoch)
        # fit() returning means the run's state is DURABLE: commit the
        # final async save and swap it over its final name now.  Without
        # this, a checkpointer constructed afterwards (a follow-up resume
        # in the same process, or another run sharing the ckpt_dir) sees
        # an uncommitted last-N.pending and _recover_pending sweeps the
        # still-in-flight save as crash debris.
        self.ckpt.wait()
        return last_val

    def test(self, restore_best: bool = True) -> Dict[str, float]:
        """Reload the best-val checkpoint and run the test epoch
        (run_trainer.py:65-70)."""
        if restore_best:
            self.state = self.ckpt.restore_best(self.state)
        summary = self._run_eval(self.test_loader, "test")
        self.logger.log_epoch(summary, epoch=-1)
        return summary

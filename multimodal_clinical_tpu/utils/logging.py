"""Run logging: stdout + JSONL, with optional Weights & Biases.

The reference logs exclusively through Lightning ``self.log`` into W&B
(utils/run_trainer.py:13-37).  Here the logger is explicit: every metric dict
is appended to ``metrics.jsonl`` in the run directory and mirrored to stdout;
if ``use_wandb`` is set and the wandb package is importable, metrics are
mirrored there too (gated — this environment has no egress).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(self, run_dir: str, use_wandb: bool = False,
                 wandb_config: Optional[Dict[str, Any]] = None,
                 group_name: str = "run", quiet: bool = False) -> None:
        self.run_dir = run_dir
        self.quiet = quiet
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project="multimodal_clinical_tpu",
                    group=group_name,
                    config=wandb_config or {},
                )
            except Exception as exc:  # no package / no network
                print(f"[logger] wandb disabled ({exc})", file=sys.stderr)

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        record = {"_time": time.time()}
        if step is not None:
            record["_step"] = int(step)
        record.update({k: _jsonable(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_epoch(self, metrics: Dict[str, float], epoch: int,
                  step: Optional[int] = None) -> None:
        self.log(dict(metrics, epoch=epoch), step=step)
        if not self.quiet:
            parts = "  ".join(f"{k.split('/')[-1]}={v:.4f}"
                              for k, v in sorted(metrics.items())
                              if isinstance(v, float))
            print(f"[epoch {epoch}] {parts}")

    def close(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()


def _jsonable(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)

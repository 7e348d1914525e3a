"""TrainState: the complete on-device training state pytree.

Everything the reference keeps as Python-side mutable objects — optimizer
buffers, the EMA calibrator (utils/EMA.py), QMF History tables
(existing_algos/QMF.py:12-29) — lives here as device arrays, so one jitted
``train_step`` owns the whole update with zero host round-trips.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..algos.qmf import init_history
from .spec import ModelSpec


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: jnp.ndarray                 # (M, C) float32 EMA of batch-mean logits
    rng: jax.Array                   # folded per step for dropout/noise
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    qmf_correctness: Optional[jnp.ndarray] = None   # (M, n_train) or None
    qmf_confidence: Optional[jnp.ndarray] = None
    # static copy of the LR schedule so the trainer can report the current
    # LR (the reference's LearningRateMonitor stream, utils/run_trainer.py:20)
    lr_schedule: Optional[Callable] = struct.field(
        pytree_node=False, default=None)
    # Lightning's LearningRateMonitor names the stream after the torch
    # optimizer class — "lr-SGD" or "lr-Adam" per variant
    lr_metric_name: str = struct.field(pytree_node=False, default="lr-SGD")


def make_lr_schedule(base_lr: float, use_scheduler: bool, steps_per_epoch: int,
                     step_size_epochs: int, gamma: float,
                     num_epochs: int) -> optax.Schedule:
    """StepLR-per-epoch as a per-step piecewise-constant schedule
    (utils/BaseModel.py:275-285)."""
    if not use_scheduler or step_size_epochs <= 0:
        return optax.constant_schedule(base_lr)
    boundaries = {}
    k = step_size_epochs
    while k <= max(num_epochs, step_size_epochs):
        boundaries[k * steps_per_epoch] = gamma
        k += step_size_epochs
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def _wd_mask_fn(frozen_prefixes):
    """params -> bool pytree: False on frozen subtrees.  Frozen modules
    realize requires_grad=False via stop_gradient, so their grads are
    exactly 0 — masking weight decay there makes the total update 0
    (momentum trace stays 0), i.e. torch's bit-exact freeze, instead of
    silently shrinking 'frozen' pretrained towers by wd each step."""
    from flax import traverse_util

    def mask(params):
        flat = traverse_util.flatten_dict(params)
        out = {
            k: not any("/".join(k).startswith(p) for p in frozen_prefixes)
            for k in flat
        }
        return traverse_util.unflatten_dict(out)

    return mask


def make_optimizer(schedule: optax.Schedule, momentum: float = 0.9,
                   weight_decay: float = 1.0e-4,
                   frozen_prefixes=(),
                   optimizer: str = "sgd") -> optax.GradientTransformation:
    """Per-variant optimizer matching the reference's configure_optimizers.

    ``optimizer="sgd"``: SGD(momentum, weight_decay) with torch ordering —
    wd is added to the gradient before the momentum buffer
    (torch.optim.SGD), i.e. AFTER any OGM-GE modulation of the raw loss
    gradient.

    ``optimizer="adam"``: torch.optim.Adam defaults — betas (0.9, 0.999),
    eps 1e-8 OUTSIDE the sqrt (optax ``eps_root=0``), weight_decay 0 —
    the protocol of the four reference model files that train with Adam:
    mustard/joint_model.py:276, mimic/joint_model_proba.py:315,
    fakenews/model.py:230, enrico/joint_model_proba.py:282.  Every
    reference Adam call passes only ``lr``, so torch defaults ARE the
    spec; ``momentum``/``weight_decay`` args are ignored for adam (a
    non-zero wd here would be a silent protocol divergence).

    ``frozen_prefixes`` (param-tree path prefixes, '/'-joined) exempt
    frozen subtrees from weight decay — torch optimizers never touch
    requires_grad=False params (p.grad is None), so wd on stop_gradient'd
    towers would be a silent divergence (enrico/ensemble_model.py:37-38).
    Under adam, zero grads already yield exactly-zero updates
    (mu=nu=0 -> 0/(sqrt(0)+eps)), so no mask is needed."""
    if optimizer == "adam":
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0),
            optax.scale_by_learning_rate(schedule),
        )
    if optimizer != "sgd":
        raise ValueError(f"unknown optimizer {optimizer!r}")
    parts = []
    if weight_decay:
        mask = _wd_mask_fn(tuple(frozen_prefixes)) if frozen_prefixes else None
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def create_train_state(
    spec: ModelSpec,
    args: Any,
    rng: jax.Array,
    sample_inputs: Any,
    steps_per_epoch: int,
    momentum: float = 0.9,
    weight_decay: float = 1.0e-4,
    optimizer: str = "sgd",
    lr_override: Optional[float] = None,
) -> TrainState:
    """Initialize params/state from a sample batch (list of modality arrays).

    ``lr_override`` pins the learning rate regardless of the config's
    ``learning_rate`` — the fakenews model hardcodes LEARNING_RATE=1e-4 at
    module scope and ignores args.lr entirely (fakenews/model.py:18,230)."""
    init_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
    variables = spec.module.init(
        {"params": init_rng, "dropout": dropout_rng},
        *sample_inputs,
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    base_lr = (float(args.learning_rate) if lr_override is None
               else float(lr_override))
    schedule = make_lr_schedule(
        base_lr,
        bool(getattr(args, "use_scheduler", False)),
        steps_per_epoch,
        spec.sched_step_size,
        spec.sched_gamma,
        int(getattr(args, "num_epochs", 1)),
    )
    tx = make_optimizer(schedule, momentum=momentum, weight_decay=weight_decay,
                        frozen_prefixes=spec.frozen_prefixes,
                        optimizer=optimizer)
    opt_state = tx.init(params)

    num_classes = int(args.num_classes)
    ema = jnp.zeros((spec.num_modality, num_classes), jnp.float32)

    qmf_corr = qmf_conf = None
    if spec.contract == "qmf":
        qmf_corr, qmf_conf = init_history(spec.num_modality, spec.n_train_samples)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        ema=ema,
        rng=state_rng,
        qmf_correctness=qmf_corr,
        qmf_confidence=qmf_conf,
        lr_schedule=schedule,
        lr_metric_name="lr-Adam" if optimizer == "adam" else "lr-SGD",
        apply_fn=spec.module.apply,
        tx=tx,
    )

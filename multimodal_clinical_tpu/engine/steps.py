"""Step-function factories: the five training contracts as jitted SPMD steps.

The reference's five Lightning base classes (utils/BaseModel.py:15-1162)
become factories producing a pair of jitted functions:

    train_step(state, batch) -> (state, metrics)
    eval_step(state, batch)  -> outputs        (logits stack, labels, metrics)

One XLA program owns the whole update: forward, loss, backward, OGM-GE
gradient modulation, the optimizer, EMA calibration, and QMF history
scatter — where the reference crosses the host boundary every step for EMA
(BaseModel.py:84-85) and QMF (QMF.py:23-29, 63-66).

Batches are dicts ``{"x1", "x2"[, "x3"], "label", "idx", "valid"}`` with
static shapes; ``valid`` masks padding rows of fixed-size batches.  Under a
("data", "model") mesh the batch is sharded on the data axis and the state
is replicated; jit's automatic partitioning inserts the gradient/metric
all-reduces over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..algos import ema as ema_lib
from ..algos import qmf as qmf_lib
from ..algos.ogm_ge import modulate_gradients
from ..algos.vicreg import vicreg_loss
from . import contracts as C
from .spec import ModelSpec
from .state import TrainState

Batch = Dict[str, jnp.ndarray]


def _model_inputs(batch: Batch, spec):
    n = spec.num_inputs or spec.num_modality
    return [batch[f"x{i + 1}"] for i in range(n)]


def _per_sample_ce(logits, label):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, label[:, None].astype(jnp.int32),
                                axis=-1)[:, 0]


def _min_loss_counts(logits, fused, label, valid):
    """Per-sample min-loss counters over {joint, x1, x2}
    (enrico/joint_model_counts.py:116-126)."""
    losses = [_per_sample_ce(fused, label)] + [
        _per_sample_ce(l, label) for l in logits
    ]
    stack = jnp.stack(losses)                     # (1+M, B)
    min_loss = jnp.min(stack, axis=0)
    v = valid.astype(jnp.float32)
    counts = {"count_joint": jnp.sum((stack[0] == min_loss) * v)}
    for i in range(len(logits)):
        counts[f"count_x{i + 1}"] = jnp.sum((stack[i + 1] == min_loss) * v)
    return counts


def _forward(state: TrainState, params, batch: Batch, spec: ModelSpec,
             train: bool, dropout_rng: Optional[jax.Array]):
    variables = {"params": params}
    has_bs = bool(state.batch_stats)
    if has_bs:
        variables["batch_stats"] = state.batch_stats
    kwargs = dict(train=train)
    rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
    inputs = _model_inputs(batch, spec)
    if train and has_bs:
        out, mutated = state.apply_fn(variables, *inputs, mutable=["batch_stats"],
                                      rngs=rngs, **kwargs)
        return out, mutated["batch_stats"]
    out = state.apply_fn(variables, *inputs, rngs=rngs, **kwargs)
    return out, state.batch_stats


def _qmf_terms(spec: ModelSpec, logits, label, valid, idx, corr_tab, conf_tab):
    """QMF loss terms + updated history (cremad/joint_model_qmf.py:60-70)."""
    stack = jnp.stack([l.astype(jnp.float32) for l in logits])  # (M, B, C)
    logits_df, conf = qmf_lib.df(stack)
    loss_uni = [C.cross_entropy(l, label, valid) for l in logits]
    new_corr, new_conf = [], []
    for n in range(spec.num_modality):
        cn, fn = qmf_lib.history_update(
            corr_tab[n], conf_tab[n], idx, loss_uni[n], conf[n], valid
        )
        new_corr.append(cn)
        new_conf.append(fn)
    new_corr = jnp.stack(new_corr)
    new_conf = jnp.stack(new_conf)
    loss_reg = qmf_lib.reg_loss(conf, idx, new_corr, valid)
    loss_joint = C.cross_entropy(logits_df, label, valid)
    return logits_df, loss_joint, loss_uni, loss_reg, new_corr, new_conf


def _train_loss(spec: ModelSpec, state: TrainState, batch: Batch, out, aux):
    """Contract-specific training loss; fills ``aux`` with reporting tensors."""
    logits = out["logits"]
    label, valid = batch["label"], batch["valid"]

    if spec.contract in ("jlogits", "ogm_ge"):
        fused = C.fuse_logits(logits)
        loss = C.cross_entropy(fused, label, valid)
        aux.update(report=logits, fused=fused)
        return loss

    if spec.contract == "jprobas":
        fused = C.fuse_probas(logits)
        loss = C.cross_entropy(fused, label, valid)
        aux.update(report=C.to_logprobs(logits), fused=fused)
        return loss

    if spec.contract == "ensemble":
        ce = [C.cross_entropy(l, label, valid) * spec.unimodal_loss_scale
              for l in logits]
        if spec.fusion_weights is not None:
            loss = sum(w * c for w, c in zip(spec.fusion_weights, ce))
        elif spec.ensemble_train_mean:
            # legacy ensemble dirs train on the MEAN
            # (avmnist/ensemble_model.py:195, ave/ensemble_model.py:115,
            # vggsound/ensemble_model.py:114, cremad/ensemble_model_noised.py:104)
            loss = sum(ce) / len(ce)
        else:
            loss = sum(ce)  # EnsembleBaseModel train loss is the SUM (BaseModel.py:353)
        fused = C.fuse_logits(logits, spec.fusion_weights)
        if spec.vicreg_weight:
            v = vicreg_loss(out["embeddings"][0], out["embeddings"][1],
                            valid)
            loss = loss + spec.vicreg_weight * v
            aux["vicreg"] = v
        aux.update(report=logits, fused=fused)
        return loss

    if spec.contract == "qmf":
        fused = C.fuse_logits(logits)
        if spec.qmf_ablate_train:
            # qmf_ablate: train is plain joint-logits; df only for metrics
            stack = jnp.stack([l.astype(jnp.float32) for l in logits])
            logits_df, _ = qmf_lib.df(stack)
            loss = C.cross_entropy(fused, label, valid)
            aux.update(report=logits, fused=fused, logits_df=logits_df,
                       new_corr=state.qmf_correctness,
                       new_conf=state.qmf_confidence)
            return loss
        logits_df, loss_joint, loss_uni, loss_reg, new_corr, new_conf = _qmf_terms(
            spec, logits, label, valid, batch["idx"],
            state.qmf_correctness, state.qmf_confidence,
        )
        loss = loss_reg
        if not spec.qmf_drop_joint:
            loss = loss + loss_joint
        if not spec.qmf_drop_unimodal:
            loss = loss + sum(loss_uni)
        aux.update(report=logits, fused=fused, logits_df=logits_df,
                   new_corr=new_corr, new_conf=new_conf)
        return loss

    raise ValueError(f"unknown contract {spec.contract!r}")


def _train_metrics(spec: ModelSpec, state: TrainState, aux, loss, label, valid
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Shared metric block; returns (new_ema, metrics dict)."""
    report = aux["report"]
    fused = aux["fused"]
    metrics = {
        "train_loss": loss,
        "train_acc": C.accuracy(fused, label, valid),
        "valid_count": jnp.sum(valid.astype(jnp.float32)),
    }
    if spec.track_min_loss_counts:
        metrics.update(_min_loss_counts(aux["report"], fused, label, valid))

    if spec.contract == "ensemble":
        if spec.report_logprobs:
            report = C.to_logprobs(report)
            metrics["train_acc"] = C.accuracy(C.fuse_probas(aux["report"]),
                                              label, valid)
        for i, r in enumerate(report):
            metrics[f"train_x{i + 1}_acc"] = C.accuracy(r, label, valid)
        if "vicreg" in aux:
            metrics["train_vicreg_loss"] = aux["vicreg"]
        return state.ema, metrics

    # jlogits family: uncalibrated + EMA-calibrated unimodal accuracies
    # (BaseModel.py:77-89) — update BEFORE reading the offset.
    batch_means = jnp.stack(
        [ema_lib.masked_batch_mean(r.astype(jnp.float32), valid) for r in report]
    )
    new_ema = ema_lib.ema_update(state.ema, batch_means)
    offset = ema_lib.ema_offset(new_ema)
    for i, r in enumerate(report):
        metrics[f"train_x{i + 1}_acc_uncal"] = C.accuracy(r, label, valid)
        metrics[f"train_x{i + 1}_acc"] = C.accuracy(
            r.astype(jnp.float32) + offset[i], label, valid
        )
    if spec.contract == "qmf":
        metrics["train_df_acc"] = C.accuracy(aux["logits_df"], label, valid)
    return new_ema, metrics


def make_train_step(spec: ModelSpec, jit: bool = True
                    ) -> Callable[[TrainState, Batch],
                                  Tuple[TrainState, Dict]]:
    def train_step(state: TrainState, batch: Batch):
        step_rng = jax.random.fold_in(state.rng, state.step)
        dropout_rng, mod_rng, prep_rng = jax.random.split(step_rng, 3)
        if spec.device_preprocess is not None:
            batch = spec.device_preprocess(batch, prep_rng, True)
        label, valid = batch["label"], batch["valid"]

        def loss_fn(params):
            out, new_bs = _forward(state, params, batch, spec, True, dropout_rng)
            aux: Dict[str, Any] = {"batch_stats": new_bs, "raw_logits": out["logits"]}
            loss = _train_loss(spec, state, batch, out, aux)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        if spec.apply_grad_mod and spec.grad_mod_type:
            raw = aux["raw_logits"]
            grads = modulate_gradients(
                grads, raw[0], raw[1], label, mod_rng,
                alpha=spec.ogm_alpha, modulation=spec.grad_mod_type, valid=valid,
            )

        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema, metrics = _train_metrics(spec, state, aux, loss, label, valid)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt_state,
            ema=new_ema,
            qmf_correctness=aux.get("new_corr", state.qmf_correctness),
            qmf_confidence=aux.get("new_conf", state.qmf_confidence),
        )
        return new_state, metrics

    if not jit:
        return train_step
    from ..utils.compile import tpu_compiler_options

    return jax.jit(train_step, donate_argnums=0,
                   compiler_options=tpu_compiler_options())


def make_scan_train_step(spec: ModelSpec, k: int):
    """K optimizer steps per dispatch via ``lax.scan`` (device loop).

    Takes K same-shape batches, stacks them on device, and scans the raw
    train step — one XLA program per K steps, amortizing host dispatch
    (which dominates small-model steps and remote-tunnel setups).  Metrics
    come back with a leading (K,) axis.  Semantics are EXACTLY K sequential
    steps — same optimizer updates, EMA, QMF scatters, per-step RNG folds.
    """
    raw = make_train_step(spec, jit=False)

    def multi(state: TrainState, *batches: Batch):
        stacked = {
            key: jnp.stack([b[key] for b in batches]) for key in batches[0]
        }

        def body(carry, batch):
            new_state, metrics = raw(carry, batch)
            return new_state, metrics

        return jax.lax.scan(body, state, stacked)

    from ..utils.compile import tpu_compiler_options

    return jax.jit(multi, donate_argnums=0,
                   compiler_options=tpu_compiler_options())


def make_eval_step(spec: ModelSpec, jit: bool = True
                   ) -> Callable[[TrainState, Batch], Dict]:
    eval_fusion = spec.eval_fusion or (
        "probas" if spec.contract == "jprobas" else "logits"
    )

    def eval_step(state: TrainState, batch: Batch):
        if spec.device_preprocess is not None:
            batch = spec.device_preprocess(batch, jax.random.PRNGKey(0), False)
        out, _ = _forward(state, state.params, batch, spec, False, None)
        logits = out["logits"]
        label, valid = batch["label"], batch["valid"]
        eval_vicreg = None

        if spec.contract == "jprobas" and eval_fusion == "probas":
            report = C.to_logprobs(logits)
            fused = C.fuse_probas(logits)
            loss = C.cross_entropy(fused, label, valid)
        elif spec.contract == "ensemble":
            report = logits
            # eval fuses the PLAIN logits mean for every ensemble variant
            # and averages the losses (BaseModel.py:410-412) — the mimic
            # w1/w2 weighting is TRAIN-only: its overridden validation and
            # test steps both fuse (x1+x2)/2 and mean the losses
            # (mimic/ensemble_model.py:197-199, 234-239)
            fused = C.fuse_logits(logits)
            ce = [C.cross_entropy(l, label, valid) * spec.unimodal_loss_scale
                  for l in logits]
            if spec.vicreg_weight:
                # the vicreg variant's overridden val/test steps eval the
                # SUM of the unimodal losses, not the base-class mean
                # (enrico/ensemble_model_vicreg.py:211, 270)
                v = vicreg_loss(out["embeddings"][0], out["embeddings"][1],
                                valid)
                loss = sum(ce) + spec.vicreg_weight * v
                eval_vicreg = v
            else:
                loss = sum(ce) / len(ce)
        else:
            report = logits
            fused = C.fuse_logits(logits)
            loss = C.cross_entropy(fused, label, valid)

        outputs = {
            "logits_stack": jnp.stack(
                [r.astype(jnp.float32) for r in report], axis=1
            ),  # (B, M, C)
            "label": label,
            "valid": valid,
            "loss": loss,
            "acc": C.accuracy(fused, label, valid),
        }
        if eval_vicreg is not None:
            # per-batch eval stream: the vicreg variant logs the RAW
            # (unweighted) vicreg loss each val/test batch
            # (enrico/ensemble_model_vicreg.py:216, 268)
            outputs["vicreg_loss"] = eval_vicreg
        if spec.track_min_loss_counts:
            outputs.update(_min_loss_counts(logits, fused, label, valid))
        if spec.contract == "ensemble":
            rep = C.to_logprobs(report) if spec.report_logprobs else report
            for i, r in enumerate(rep):
                outputs[f"x{i + 1}_acc"] = C.accuracy(r, label, valid)
        if spec.contract == "qmf":
            stack = jnp.stack([l.astype(jnp.float32) for l in logits])
            logits_df, conf = qmf_lib.df(stack)
            outputs["df_acc"] = C.accuracy(logits_df, label, valid)
            # Full QMF eval loss (joint + uni + reg).  Divergence from the
            # reference: we do NOT scatter val/test losses into the History
            # tables (the reference's val forward does, corrupting training
            # state with eval statistics — cremad/joint_model_qmf.py:62-65
            # called from BaseModel.py:1026).
            if not spec.qmf_ablate_train:
                loss_uni = [C.cross_entropy(l, label, valid) for l in logits]
                loss_joint = C.cross_entropy(logits_df, label, valid)
                loss_reg = qmf_lib.reg_loss(conf, batch["idx"],
                                            state.qmf_correctness, valid)
                outputs["loss"] = loss_joint + sum(loss_uni) + loss_reg
        return outputs

    if not jit:
        return eval_step
    from ..utils.compile import tpu_compiler_options

    return jax.jit(eval_step, compiler_options=tpu_compiler_options())

"""ModelSpec — the declarative description of one benchmark model variant.

A ModelSpec replaces the reference's (base-class, FusionNet-file) pair: it
names the flax module, the training contract, and the per-variant quirks
(loss scales, fusion weights, scheduler params) that the reference spreads
across ``<ds>/joint_model*.py`` files and ``configure_optimizers`` overrides.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

from flax import linen as nn

# Training contracts (the five reference base classes, utils/BaseModel.py):
#   jlogits  — JointLogitsBaseModel:    CE on mean logits
#   jprobas  — JointProbLogitsBaseModel: CE on log-mean-softmax
#   ensemble — EnsembleBaseModel:       per-modality CE losses
#   ogm_ge   — OGMGEBaseModel:          jlogits + gradient modulation
#   qmf      — QMFBaseModel:            dynamic fusion + uni + ranking reg
CONTRACTS = ("jlogits", "jprobas", "ensemble", "ogm_ge", "qmf")


def resolve_dtype(args) -> Optional[Any]:
    """Compute dtype from the ``compute_dtype`` config key (base_cfg.yaml):
    'bfloat16' -> jnp.bfloat16 on the MXU (the reference's bf16-mixed,
    utils/run_trainer.py:47); unset/'float32' -> None (modules compute in
    the input dtype).  Params and BN statistics stay fp32 either way."""
    name = getattr(args, "compute_dtype", None)
    if not name or str(name) == "float32":
        return None
    import jax.numpy as jnp

    return jnp.dtype(str(name))


@dataclasses.dataclass
class ModelSpec:
    module: nn.Module
    contract: str = "jlogits"
    num_modality: int = 2
    # input-modality count when it differs from the LOGIT-head count —
    # e.g. the fakenews embed-fusion model consumes 2-3 input modalities
    # but emits ONE fused head (fakenews/model.py:59-74), so
    # num_modality=1 (EMA/metric streams) with num_inputs=2|3.  None
    # means "same as num_modality" (every per-modality-head model).
    num_inputs: Optional[int] = None

    # --- fusion variants ---
    # eval fusion for jprobas models: "probas" (cremad jprobas default path —
    # istrain defaults True so eval also fuses probs) or "logits"
    # (jprobas_jlogits variants, avmnist/joint_model_proba_logits.py).
    eval_fusion: Optional[str] = None
    # ensemble TRAIN loss / train-metric fusion weights
    # (mimic/ensemble_model.py:157,160); eval always fuses the plain mean
    # (ensemble_model.py:197-199,234-239).
    fusion_weights: Optional[Sequence[float]] = None
    # per-modality CE scale (cremad/ensemble_model.py:54-55 uses 3.0).
    unimodal_loss_scale: float = 1.0
    # legacy ensemble dirs train on the MEAN of the per-modality losses
    # ((x1_loss + x2_loss) / 2 — avmnist/ensemble_model.py:195,
    # ave/ensemble_model.py:115, vggsound/ensemble_model.py:114,
    # cremad/ensemble_model_noised.py:104) where the new-style
    # EnsembleBaseModel trains on the SUM (utils/BaseModel.py:353).
    ensemble_train_mean: bool = False
    # new-style dirs reload the top-1 val_avg_acc checkpoint before the
    # test epoch (utils/run_trainer.py:27-33,65); the legacy standalone
    # runners have NO ModelCheckpoint and test the FINAL-epoch weights
    # (avmnist/run_training.py:109-128; same shape in ave/vggsound/
    # mustard run_training.py).
    test_restore_best: bool = True

    # --- OGM-GE (ogm_ge contract, or ensemble_ogm_ge hybrid) ---
    grad_mod_type: Optional[str] = None   # None|'OGM_GE'|'OGM'|'noise'
    ogm_alpha: float = 0.1
    # hybrid variants: apply OGM-GE on top of a non-jlogits contract
    # (cremad/ensemble_model_noised.py, cremad/joint_model_ogm_ge_lreg.py).
    apply_grad_mod: bool = False

    # --- QMF ---
    n_train_samples: int = 0       # sizes the History tables
    qmf_ablate_train: bool = False  # qmf_ablate: train plain jlogits, eval df
    qmf_drop_joint: bool = False    # ablate_Ljoint: loss_joint = 0
    qmf_drop_unimodal: bool = False  # ablate_Lunimodal: drop sum of L_uni

    # --- VICReg (enrico/ensemble_model_vicreg.py:151) ---
    vicreg_weight: float = 0.0

    # --- frozen towers (requires_grad=False equivalents) ---
    # '/'-joined param-tree path prefixes whose modules stop_gradient
    # their outputs; exempted from weight decay so the net update is
    # exactly 0, matching torch SGD's skip of grad-less params
    # (enrico/ensemble_model.py:37-38, food101/joint_model_proba.py).
    frozen_prefixes: Tuple[str, ...] = ()

    # legacy standalone dirs log FLAT epoch-end metric names (val_loss /
    # x{i}_val_acc / avg_test_acc ... — avmnist/joint_model.py:265-268)
    # instead of the utils/BaseModel val_epoch/* namespace; when set, the
    # trainer emits those aliases alongside the namespaced keys.
    legacy_metric_aliases: bool = False

    # --- analysis streams ---
    # per-sample min-loss counters over {joint, x1, x2}
    # (enrico/joint_model_counts.py:116-135, ensemble_model_counts.py)
    track_min_loss_counts: bool = False
    # ensemble trained on CE but metrics reported on log-probs
    # (avmnist/ensemble_model_probas.py:124-132)
    report_logprobs: bool = False

    # --- optimizer schedule (StepLR step_size/gamma per model file) ---
    sched_step_size: int = 70
    sched_gamma: float = 0.1

    # --- batching ---
    use_idx: bool = False  # batch carries global sample indices (QMF/lreg)

    # --- on-device input preprocessing ---
    # Runs INSIDE the jitted step: (batch, rng, train) -> batch.  Used for
    # fused input graphs (raw waveform -> STFT log-spectrogram, SpecAugment)
    # replacing the reference's host-side DataLoader DSP (SURVEY §7).
    device_preprocess: Optional[Callable] = None

    def __post_init__(self):
        base = self.contract
        if base not in CONTRACTS:
            raise ValueError(f"unknown contract {base!r}")
        if self.contract == "qmf" and self.n_train_samples <= 0:
            raise ValueError("qmf contract requires n_train_samples")
        if self.contract == "qmf":
            self.use_idx = True
        if self.contract == "ogm_ge":
            self.apply_grad_mod = True
            # a None/empty modulation would silently train as plain
            # jlogits (steps.py guards on both flags) — default to the
            # reference's OGM_GE rather than run a mislabeled baseline
            if not self.grad_mod_type:
                self.grad_mod_type = "OGM_GE"

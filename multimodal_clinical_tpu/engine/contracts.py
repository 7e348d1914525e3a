"""Pure fusion/loss/metric math shared by all step factories.

This module is the functional distillation of what the reference re-derives
in every ``<ds>/joint_model*.py`` FusionNet plus the five Lightning base
classes (utils/BaseModel.py): late fusion at the logit or probability level,
cross-entropy losses, masked accuracy, and the epoch-end unimodal offset
correction.  Everything is shape-static and jit-safe; padding rows (from
fixed-shape batching) are excluded via the ``valid`` mask.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

LOGPROB_EPS = 1e-9  # reference epsilon (cremad/joint_model_proba.py:26)


def masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean of per-sample values over valid rows."""
    valid = valid.astype(jnp.float32)
    return jnp.sum(x.astype(jnp.float32) * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def cross_entropy(logits: jnp.ndarray, label: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE with integer labels (torch nn.CrossEntropyLoss semantics).

    Note this is *softmax* cross-entropy even when ``logits`` are log-probs —
    faithful to the reference, which feeds log-probs back through
    nn.CrossEntropyLoss (cremad/joint_model_proba.py:64).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, label[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if valid is None:
        return jnp.mean(nll)
    return masked_mean(nll, valid)


def accuracy(logits: jnp.ndarray, label: jnp.ndarray,
             valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    correct = (jnp.argmax(logits, axis=-1) == label).astype(jnp.float32)
    if valid is None:
        return jnp.mean(correct)
    return masked_mean(correct, valid)


def fuse_logits(logits_list: Sequence[jnp.ndarray],
                weights: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """Late fusion of unimodal logits.

    Default: arithmetic mean (joint_model.py:56).  ``weights`` enables the
    MIMIC ensemble's weighted sum ``w1*l1 + w2*l2``
    (mimic/ensemble_model.py:127-128, 157).
    """
    stack = jnp.stack([l.astype(jnp.float32) for l in logits_list])
    if weights is None:
        return jnp.mean(stack, axis=0)
    w = jnp.asarray(weights, jnp.float32).reshape(-1, 1, 1)
    return jnp.sum(stack * w, axis=0)


def to_logprobs(logits_list: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Per-modality log(softmax + eps) (cremad/joint_model_proba.py:55-62)."""
    return [
        jnp.log(jax.nn.softmax(l.astype(jnp.float32), axis=-1) + LOGPROB_EPS)
        for l in logits_list
    ]


def fuse_probas(logits_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """log(mean of softmax probabilities + eps) — jprobas fused output."""
    probs = jnp.mean(
        jnp.stack([jax.nn.softmax(l.astype(jnp.float32), axis=-1)
                   for l in logits_list]),
        axis=0,
    )
    return jnp.log(probs + LOGPROB_EPS)


def offset_correct(logits_nmc: jnp.ndarray) -> jnp.ndarray:
    """Full-epoch unimodal offset correction (BaseModel.py:174-197).

    logits_nmc: (N, M, C).  offset = mean-over-modalities of per-modality
    mean logits, minus the per-modality mean; added to every sample.
    """
    m_out = jnp.mean(logits_nmc, axis=0)                       # (M, C)
    offset = jnp.mean(m_out, axis=0, keepdims=True) - m_out    # (M, C)
    return logits_nmc + offset

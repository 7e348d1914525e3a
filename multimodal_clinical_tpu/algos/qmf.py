"""QMF: Quality-aware Multimodal Fusion, fully on-device.

Reimplements the reference QMF machinery (existing_algos/QMF.py:5-141) with
the per-sample History kept as device arrays inside the TrainState — the
reference round-trips idx/loss/confidence through host numpy every step
(QMF.py:23-29, 45-66, with a hardcoded ``.cuda()`` re-upload); here the
scatter update and margin computation are fused into the jitted train step.

Components:
  * ``df`` — "dynamic fusion": energy-based confidence
    ``logsumexp(logits)/10`` per modality; fused logits are the
    confidence-weighted sum with the weights detached (QMF.py:109-117).
  * ``history_update`` — EMA (alpha=0.1) of per-sample "correctness".  NOTE
    (faithful to the reference): the value written is the *batch-mean*
    unimodal CE loss, broadcast to every sample index in the batch
    (cremad/joint_model_qmf.py:62-65 passes the scalar ``loss_uni[n]``).
  * ``target_margin`` — pairwise normalized-correctness target/margin
    (QMF.py:45-68), with min/max normalization over the full history table.
  * ``reg_loss`` — per-modality margin ranking loss against the batch rolled
    by -1 (QMF.py:119-141).  DOCUMENTED DIVERGENCE: the reference body has
    two indexing accidents — ``torch.roll(confidence, -1)`` rolls the
    flattened (M, B) matrix, and ``rank_margin[n]`` picks the scalar n-th
    *sample's* margin while ``rank_input2`` is rebound across loop
    iterations, broadcasting to (B, B).  We implement the intended per-
    modality semantics (as in the upstream QMF paper/repo): for modality n,
    input2 = roll(conf[n], -1) + margin / target_nonzero, and
    ``mean(relu(target * (input1 - input2)))`` (the expansion of torch
    MarginRankingLoss with y = -target, margin = 0).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

HISTORY_ALPHA = 0.1
ENERGY_SCALE = 10.0


def df(logits_stack: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic fusion.

    Args:
        logits_stack: (M, B, C) unimodal logits.
    Returns:
        (fused_logits (B, C), conf (M, B)); gradients do not flow through the
        confidence weights (QMF.py:116 ``.detach()``), but do flow through
        ``conf`` as returned (used by reg_loss, QMF.py:119).
    """
    x = logits_stack.astype(jnp.float32)
    energy = jax.scipy.special.logsumexp(x, axis=-1)
    conf = energy / ENERGY_SCALE
    fused = jnp.sum(x * jax.lax.stop_gradient(conf)[..., None], axis=0)
    return fused, conf


def history_update(
    correctness: jnp.ndarray,
    confidence: jnp.ndarray,
    idx: jnp.ndarray,
    batch_loss: jnp.ndarray,
    batch_conf: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    alpha: float = HISTORY_ALPHA,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EMA-update one modality's history rows at ``idx``.

    correctness/confidence: (n_data,) history tables.
    idx: (B,) global sample indices.  batch_loss: scalar (batch-mean unimodal
    CE — see module docstring).  batch_conf: (B,) confidences.

    With padded batches, invalid rows scatter to an out-of-bounds index with
    ``mode="drop"`` — they never touch the table.  (Masking the *values*
    instead is wrong: the loader pads by repeating the last real index, and
    a duplicate-index scatter has an implementation-defined winner, so a
    stale pad write could overwrite the last real sample's update.)
    """
    loss_val = jax.lax.stop_gradient(batch_loss).astype(correctness.dtype)
    conf_val = jax.lax.stop_gradient(batch_conf).astype(confidence.dtype)
    n = correctness.shape[0]
    if valid is not None:
        idx = jnp.where(valid.astype(bool), idx, n)  # n = out of bounds
    new_corr = (1.0 - alpha) * correctness.at[idx].get(mode="fill",
                                                       fill_value=0.0) \
        + alpha * loss_val
    correctness = correctness.at[idx].set(new_corr, mode="drop")
    confidence = confidence.at[idx].set(conf_val, mode="drop")
    return correctness, confidence


def _normalize(table: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Min/max normalization of values by the full table's range (QMF.py:36-43)."""
    t_min = jnp.min(table)
    t_max = jnp.max(table)
    return (values - t_min) / (t_max - t_min + 1e-12)


def target_margin(correctness: jnp.ndarray, idx1: jnp.ndarray,
                  idx2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise ranking target (+1/-1/0) and margin |t1 - t2| (QMF.py:45-68)."""
    t1 = _normalize(correctness, correctness[idx1])
    t2 = _normalize(correctness, correctness[idx2])
    target = jnp.sign(t1 - t2)
    margin = jnp.abs(t1 - t2)
    return target, margin


def reg_loss(
    conf: jnp.ndarray,
    idx: jnp.ndarray,
    correctness: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """History-based confidence ranking regularizer, summed over modalities.

    conf: (M, B) differentiable confidences from ``df``.
    correctness: (M, n_data) history tables (post-update, matching the
    reference call order at cremad/joint_model_qmf.py:62-67).
    """
    batch = idx.shape[0]
    if valid is not None:
        # Padded tail batch: the reference rolls within its SMALLER last
        # batch, so row i's ranking partner is row (i + 1) mod K over the
        # K real rows (valid rows are a prefix — data/loader._pad_batch).
        # A plain roll over the padded batch would pair the last real row
        # with a pad row and lose the wrap-around pair.
        k = jnp.maximum(jnp.sum(valid).astype(jnp.int32), 1)
        pos = jnp.arange(batch)
        partner = jnp.where(pos + 1 >= k, 0, pos + 1)
        pair_valid = valid
        denom = jnp.maximum(jnp.sum(valid), 1.0)
    else:
        partner = jnp.roll(jnp.arange(batch), -1)
        pair_valid = None
    idx2 = idx[partner]
    num_modality = conf.shape[0]
    losses = []
    for n in range(num_modality):
        tgt, mgn = target_margin(correctness[n], idx, idx2)
        tgt = jax.lax.stop_gradient(tgt)
        mgn = jax.lax.stop_gradient(mgn)
        input1 = conf[n]
        tgt_nonzero = jnp.where(tgt == 0, 1.0, tgt)
        input2 = conf[n][partner] + mgn / tgt_nonzero
        per_pair = jax.nn.relu(tgt * (input1 - input2))
        if pair_valid is not None:
            losses.append(jnp.sum(per_pair * pair_valid) / denom)
        else:
            losses.append(jnp.mean(per_pair))
    return jnp.sum(jnp.stack(losses))


def init_history(num_modality: int, n_data: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fresh (correctness, confidence) tables, shape (M, n_data) float32."""
    # two distinct buffers: they are donated separately inside the jitted
    # train step, and XLA rejects donating one buffer twice
    return (jnp.zeros((num_modality, n_data), jnp.float32),
            jnp.zeros((num_modality, n_data), jnp.float32))

"""OGM-GE: On-the-fly Gradient Modulation with Generalized noise Enhancement.

TPU-native reimplementation of the reference algorithm
(existing_algos/OGM_GE.py:4-57) as a *pure gradient transform* applied
between ``jax.grad`` and the optimizer update — the functional equivalent of
the reference's manual-optimization hook (utils/BaseModel.py:870-875), which
mutates ``.grad`` in place between ``backward()`` and ``opt.step()``.

Semantics matched to the reference, including its quirks:
  * Per-modality ground-truth softmax score sums (OGM_GE.py:21-22), computed
    vectorized instead of the reference's per-sample Python loop (a host hot
    spot there).
  * Coefficient ``1 - tanh(alpha * relu(ratio))`` applied only to the
    *dominant* modality (OGM_GE.py:35-40); the other modality keeps 1.
  * Only 4-D (conv-kernel) gradient leaves of the ``x1_model`` / ``x2_model``
    subtrees are modulated (OGM_GE.py:45-47) — BatchNorm/Linear leaves are
    untouched.  On models without conv kernels (food101 MLP heads, mimic
    MLP/GRU) the transform is therefore a documented no-op, exactly like the
    reference (SURVEY §2.3 latent-bug notes).
  * Gaussian noise uses std of the gradient leaf (Bessel-corrected, matching
    ``torch.Tensor.std``) + 1e-8 (OGM_GE.py:48-50).
  * Weight decay is *not* modulated: torch adds it inside ``opt.step()``
    after modulation, so this transform must run before
    ``optax.add_decayed_weights`` in the optimizer chain.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

MODULATION_MODES = ("OGM_GE", "OGM", "noise")
DEFAULT_ENCODER_KEYS = ("x1_model", "x2_model")


def gt_softmax_scores(logits: jnp.ndarray, label: jnp.ndarray,
                      valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sum over the batch of softmax probability at the true class.

    Vectorizes the reference's per-sample loop (OGM_GE.py:21-22).
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(probs, label[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if valid is not None:
        picked = picked * valid.astype(picked.dtype)
    return jnp.sum(picked)


def ogm_coefficients(x1_logits: jnp.ndarray, x2_logits: jnp.ndarray,
                     label: jnp.ndarray, alpha: float,
                     valid: jnp.ndarray | None = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-modality gradient scaling coefficients (coeff_1, coeff_2).

    Matches OGM_GE.py:24-40: modality 1 ("v") is x1, modality 2 ("a") is x2;
    the modality with the higher ground-truth score is suppressed.
    """
    score_v = gt_softmax_scores(x1_logits, label, valid)
    score_a = gt_softmax_scores(x2_logits, label, valid)
    ratio_v = score_v / score_a
    ratio_a = 1.0 / ratio_v

    suppress_v = 1.0 - jnp.tanh(alpha * jax.nn.relu(ratio_v))
    suppress_a = 1.0 - jnp.tanh(alpha * jax.nn.relu(ratio_a))
    v_dominant = ratio_v > 1.0
    coeff_v = jnp.where(v_dominant, suppress_v, 1.0)
    coeff_a = jnp.where(v_dominant, 1.0, suppress_a)
    return coeff_v, coeff_a


def _modulate_leaf(g: jnp.ndarray, coeff: jnp.ndarray, key: jax.Array,
                   modulation: str) -> jnp.ndarray:
    # torch .std() is Bessel-corrected; guard small leaves against NaN.
    n = g.size
    std = jnp.where(
        n > 1,
        jnp.std(g.astype(jnp.float32), ddof=1),
        jnp.float32(0.0),
    )
    if modulation == "OGM_GE":
        noise = jax.random.normal(key, g.shape, jnp.float32) * (std + 1e-8)
        return (g.astype(jnp.float32) * coeff + noise).astype(g.dtype)
    if modulation == "OGM":
        return (g.astype(jnp.float32) * coeff).astype(g.dtype)
    if modulation == "noise":
        noise = jax.random.normal(key, g.shape, jnp.float32) * (std + 1e-8)
        return (g.astype(jnp.float32) + noise).astype(g.dtype)
    raise ValueError(f"unknown modulation {modulation!r}")


def _modulate_subtree(subtree: Any, coeff: jnp.ndarray, rng: jax.Array,
                      modulation: str) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(subtree)
    keys = jax.random.split(rng, max(len(leaves), 1))
    new_leaves = []
    for i, g in enumerate(leaves):
        if hasattr(g, "ndim") and g.ndim == 4:
            new_leaves.append(_modulate_leaf(g, coeff, keys[i], modulation))
        else:
            new_leaves.append(g)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def modulate_gradients(
    grads: Dict[str, Any],
    x1_logits: jnp.ndarray,
    x2_logits: jnp.ndarray,
    label: jnp.ndarray,
    rng: jax.Array,
    alpha: float = 0.1,
    modulation: str = "OGM_GE",
    encoder_keys: Sequence[str] = DEFAULT_ENCODER_KEYS,
    valid: jnp.ndarray | None = None,
) -> Dict[str, Any]:
    """Apply OGM-GE modulation to the conv-kernel grads of the encoder subtrees.

    ``grads`` is the parameter-gradient pytree whose top level contains the
    per-modality encoder subtrees named by ``encoder_keys`` (the framework's
    model contract, mirroring the reference's ``model.x1_model`` /
    ``model.x2_model`` attribute contract at OGM_GE.py:56-57).
    """
    if modulation not in MODULATION_MODES:
        raise ValueError(f"modulation must be one of {MODULATION_MODES}")
    coeff_1, coeff_2 = ogm_coefficients(x1_logits, x2_logits, label, alpha, valid)
    coeffs = (coeff_1, coeff_2)
    out = dict(grads)
    for i, key_name in enumerate(encoder_keys):
        if key_name not in grads:
            continue
        sub_rng = jax.random.fold_in(rng, i)
        out[key_name] = _modulate_subtree(grads[key_name], coeffs[i], sub_rng,
                                          modulation)
    return out

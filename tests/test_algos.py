"""Algorithm goldens: EMA, offset correction, OGM-GE, QMF, VICReg vs the
reference formulas computed independently with torch/numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multimodal_clinical_tpu.algos import ema as ema_lib
from multimodal_clinical_tpu.algos import ogm_ge as ogm_lib
from multimodal_clinical_tpu.algos import qmf as qmf_lib
from multimodal_clinical_tpu.algos.vicreg import vicreg_loss
from multimodal_clinical_tpu.engine import contracts as C


def rnd(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


# ---------------------------------------------------------------- EMA
def test_ema_matches_reference_recursion():
    M, Cc = 2, 6
    ema = np.zeros((M, Cc), np.float32)
    x = jnp.asarray(ema)
    for t in range(5):
        batch = rnd(M, Cc, seed=t)
        ema = batch * 0.05 + ema * 0.95  # utils/EMA.py:29-34
        x = ema_lib.ema_update(x, jnp.asarray(batch))
        np.testing.assert_allclose(np.asarray(x), ema, rtol=1e-6)
    # offset = mean over modalities - per-modality (EMA.py:36-38)
    want = ema.mean(0, keepdims=True) - ema
    np.testing.assert_allclose(np.asarray(ema_lib.ema_offset(x)), want, rtol=1e-6)


def test_offset_correction_matches_reference():
    logits = rnd(40, 2, 6, seed=3)
    t = torch.tensor(logits)
    m_out = torch.mean(t, dim=0)
    offset = torch.mean(m_out, dim=0, keepdim=True) - m_out
    want = (t + offset).numpy()
    got = np.asarray(C.offset_correct(jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- losses
def test_cross_entropy_matches_torch():
    logits = rnd(16, 6, seed=1)
    label = np.random.default_rng(2).integers(0, 6, 16)
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(label)).item()
    got = float(C.cross_entropy(jnp.asarray(logits), jnp.asarray(label)))
    assert abs(got - want) < 1e-5


def test_masked_cross_entropy_ignores_padding():
    logits = rnd(8, 4, seed=5)
    label = np.random.default_rng(6).integers(0, 4, 8)
    valid = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    want = F.cross_entropy(torch.tensor(logits[:5]), torch.tensor(label[:5])).item()
    got = float(C.cross_entropy(jnp.asarray(logits), jnp.asarray(label),
                                jnp.asarray(valid)))
    assert abs(got - want) < 1e-5


def test_jprobas_fusion_matches_reference():
    l1, l2 = rnd(10, 6, seed=7), rnd(10, 6, seed=8)
    p1 = F.softmax(torch.tensor(l1), dim=1)
    p2 = F.softmax(torch.tensor(l2), dim=1)
    want = torch.log((p1 + p2) / 2 + 1e-9).numpy()
    got = np.asarray(C.fuse_probas([jnp.asarray(l1), jnp.asarray(l2)]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- OGM-GE
def _torch_ogm_coeffs(l1, l2, label, alpha):
    out_1, out_2 = torch.tensor(l1), torch.tensor(l2)
    label_t = torch.tensor(label)
    score_v = sum(F.softmax(out_1, dim=-1)[i][label_t[i]]
                  for i in range(out_1.size(0)))
    score_a = sum(F.softmax(out_2, dim=-1)[i][label_t[i]]
                  for i in range(out_2.size(0)))
    ratio_v = score_v / score_a
    if ratio_v > 1:
        return (1 - torch.tanh(alpha * F.relu(ratio_v))).item(), 1.0
    return 1.0, (1 - torch.tanh(alpha * F.relu(1 / ratio_v))).item()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ogm_coefficients_match_reference(seed):
    l1 = rnd(12, 6, seed=seed) * (2 if seed % 2 else 0.5)
    l2 = rnd(12, 6, seed=seed + 100)
    label = np.random.default_rng(seed).integers(0, 6, 12)
    want = _torch_ogm_coeffs(l1, l2, label, 0.8)
    c1, c2 = ogm_lib.ogm_coefficients(jnp.asarray(l1), jnp.asarray(l2),
                                      jnp.asarray(label), 0.8)
    np.testing.assert_allclose([float(c1), float(c2)], want, rtol=1e-4)


def test_ogm_modulates_only_4d_encoder_leaves():
    grads = {
        "x1_model": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))},
                     "bn": {"scale": jnp.ones((8,))}},
        "x2_model": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}},
        "x1_classifier": {"kernel": jnp.ones((8, 6))},
    }
    # make modality 1 dominant
    l1 = jnp.asarray(rnd(8, 6, seed=0)) + 5 * jax.nn.one_hot(
        jnp.asarray(np.arange(8) % 6), 6)
    l2 = jnp.asarray(rnd(8, 6, seed=1))
    label = jnp.asarray(np.arange(8) % 6)
    out = ogm_lib.modulate_gradients(grads, l1, l2, label,
                                     jax.random.PRNGKey(0), alpha=0.5,
                                     modulation="OGM")
    # dominant modality (x1) conv grads scaled by coeff < 1
    assert float(out["x1_model"]["conv"]["kernel"][0, 0, 0, 0]) < 1.0
    # BN (1-D) and classifier untouched; non-dominant untouched (coeff 1)
    np.testing.assert_array_equal(np.asarray(out["x1_model"]["bn"]["scale"]),
                                  np.ones(8))
    np.testing.assert_array_equal(np.asarray(out["x1_classifier"]["kernel"]),
                                  np.ones((8, 6)))
    np.testing.assert_allclose(np.asarray(out["x2_model"]["conv"]["kernel"]),
                               np.ones((3, 3, 4, 8)), rtol=1e-6)


def test_ogm_ge_noise_mode_preserves_mean_scale():
    g = jnp.asarray(rnd(3, 3, 4, 8, seed=3))
    grads = {"x1_model": {"k": g}, "x2_model": {"k": g}}
    l1 = jnp.asarray(rnd(8, 6, seed=0))
    l2 = jnp.asarray(rnd(8, 6, seed=1))
    label = jnp.asarray(np.arange(8) % 6)
    out = ogm_lib.modulate_gradients(grads, l1, l2, label,
                                     jax.random.PRNGKey(1), modulation="noise")
    diff = np.asarray(out["x1_model"]["k"]) - np.asarray(g)
    # noise std should be ~ std(g)
    assert 0.3 * float(np.std(np.asarray(g))) < diff.std() < 3.0 * float(
        np.std(np.asarray(g)))


# ---------------------------------------------------------------- QMF
def test_qmf_df_matches_reference():
    stack = rnd(2, 10, 6, seed=11)
    t = torch.tensor(stack)
    energy = torch.log(torch.sum(torch.exp(t), dim=-1))
    conf = energy / 10
    want_fused = torch.sum(t * conf.unsqueeze(-1), dim=0).numpy()
    fused, got_conf = qmf_lib.df(jnp.asarray(stack))
    np.testing.assert_allclose(np.asarray(fused), want_fused, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_conf), conf.numpy(), rtol=1e-5)


def test_qmf_history_update_ema_and_scatter():
    corr = jnp.zeros(20)
    conf_tab = jnp.zeros(20)
    idx = jnp.asarray([3, 7, 7])  # duplicate index: last write wins
    new_corr, new_conf = qmf_lib.history_update(
        corr, conf_tab, idx, jnp.asarray(2.0),
        jnp.asarray([0.5, 0.6, 0.7]))
    assert abs(float(new_corr[3]) - 0.2) < 1e-6   # (1-0.1)*0 + 0.1*2.0
    assert abs(float(new_corr[7]) - 0.2) < 1e-6
    assert abs(float(new_conf[7]) - 0.7) < 1e-6
    # untouched rows stay zero
    assert float(jnp.sum(new_corr)) == pytest.approx(0.4, abs=1e-6)


def test_qmf_history_update_respects_valid_mask():
    corr = jnp.ones(10) * 5.0
    conf_tab = jnp.zeros(10)
    idx = jnp.asarray([1, 2])
    valid = jnp.asarray([1.0, 0.0])
    new_corr, new_conf = qmf_lib.history_update(
        corr, conf_tab, idx, jnp.asarray(1.0), jnp.asarray([0.9, 0.9]), valid)
    assert abs(float(new_corr[1]) - (0.9 * 5.0 + 0.1 * 1.0)) < 1e-6
    assert float(new_corr[2]) == 5.0  # padding row untouched
    assert float(new_conf[2]) == 0.0


def test_qmf_target_margin_matches_reference_normalization():
    table = np.array([0.0, 1.0, 2.0, 4.0], np.float32)
    idx1 = np.array([0, 1, 3])
    idx2 = np.array([2, 1, 0])
    t1 = (table[idx1] - table.min()) / (table.max() - table.min())
    t2 = (table[idx2] - table.min()) / (table.max() - table.min())
    want_target = np.sign(t1 - t2)
    want_margin = np.abs(t1 - t2)
    tgt, mgn = qmf_lib.target_margin(jnp.asarray(table), jnp.asarray(idx1),
                                     jnp.asarray(idx2))
    np.testing.assert_allclose(np.asarray(tgt), want_target, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mgn), want_margin, atol=1e-6)


def test_qmf_reg_loss_margin_ranking_semantics():
    # single modality, hand-computable
    conf = jnp.asarray([[1.0, 0.5, 0.2, 0.9]])
    idx = jnp.asarray([0, 1, 2, 3])
    table = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    loss = qmf_lib.reg_loss(conf, idx, table)
    # torch MarginRankingLoss(x1, x2, -target) == mean(relu(target*(x1-x2)))
    idx2 = np.roll(np.arange(4), -1)
    t = np.asarray(table[0])
    norm = (t - t.min()) / (t.max() - t.min())
    target = np.sign(norm[idx] - norm[idx2])
    margin = np.abs(norm[idx] - norm[idx2])
    tnz = np.where(target == 0, 1.0, target)
    x1 = np.asarray(conf[0])
    x2 = np.roll(np.asarray(conf[0]), -1) + margin / tnz
    want = np.mean(np.maximum(0.0, target * (x1 - x2)))
    assert abs(float(loss) - want) < 1e-6


# ---------------------------------------------------------------- VICReg
def test_vicreg_matches_reference_torch():
    za, zb = rnd(16, 8, seed=20), rnd(16, 8, seed=21)
    ta, tb = torch.tensor(za), torch.tensor(zb)
    eps = 1e-8
    std_a = torch.sqrt(ta.var(dim=0) + eps)
    std_b = torch.sqrt(tb.var(dim=0) + eps)
    loss_var = torch.mean(F.relu(1 - std_a)) + torch.mean(F.relu(1 - std_b))
    loss_inv = F.mse_loss(ta, tb)
    n, d = ta.shape
    ta_c, tb_c = ta - ta.mean(0), tb - tb.mean(0)
    cov_a = ((ta_c.T @ ta_c) / (n - 1)).square()
    cov_b = ((tb_c.T @ tb_c) / (n - 1)).square()
    loss_cov = (cov_a.sum() - cov_a.diagonal().sum()) / d + \
               (cov_b.sum() - cov_b.diagonal().sum()) / d
    want = (loss_var + loss_inv + loss_cov).item()
    got = float(vicreg_loss(jnp.asarray(za), jnp.asarray(zb)))
    assert abs(got - want) < 1e-4


def test_qmf_reg_loss_padded_tail_matches_smaller_batch():
    """With a valid mask, reg_loss must equal the reference's roll over
    the SMALLER real batch — including the wrap-around pair (last real
    row paired with row 0), which a plain roll over the padded batch
    would lose."""
    conf_small = jnp.asarray([[1.0, 0.5, 0.2]])
    idx_small = jnp.asarray([4, 1, 6])
    table = jnp.asarray([np.linspace(0.0, 2.0, 8)])
    want = float(qmf_lib.reg_loss(conf_small, idx_small, table))

    # same 3 real rows padded to batch 5 (pad repeats the last row, the
    # loader's padding policy)
    conf_pad = jnp.asarray([[1.0, 0.5, 0.2, 0.2, 0.2]])
    idx_pad = jnp.asarray([4, 1, 6, 6, 6])
    valid = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    got = float(qmf_lib.reg_loss(conf_pad, idx_pad, table, valid))
    assert abs(got - want) < 1e-6


def test_qmf_reg_loss_full_batch_valid_mask_is_identity():
    conf = jnp.asarray([[1.0, 0.5, 0.2, 0.9]])
    idx = jnp.asarray([0, 1, 2, 3])
    table = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    base = float(qmf_lib.reg_loss(conf, idx, table))
    masked = float(qmf_lib.reg_loss(conf, idx, table, jnp.ones(4)))
    assert abs(base - masked) < 1e-7


def test_vicreg_padded_tail_matches_smaller_batch():
    """valid-masked VICReg over a padded batch == plain VICReg over the
    real rows (the reference ships the smaller last batch)."""
    za, zb = rnd(11, 8, seed=30), rnd(11, 8, seed=31)
    want = float(vicreg_loss(jnp.asarray(za), jnp.asarray(zb)))

    pad = 5
    za_p = np.concatenate([za, np.repeat(za[-1:], pad, axis=0)])
    zb_p = np.concatenate([zb, np.repeat(zb[-1:], pad, axis=0)])
    valid = np.concatenate([np.ones(11), np.zeros(pad)]).astype(np.float32)
    got = float(vicreg_loss(jnp.asarray(za_p), jnp.asarray(zb_p),
                            jnp.asarray(valid)))
    assert abs(got - want) < 1e-5

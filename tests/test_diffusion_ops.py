"""Unit tests of the hybrid-diffusion math on dense masked tensors, checked
against independent NumPy derivations of the reference formulas
(models/molopt_score_model.py:123-175, :370-483)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from targetdiff_tpu.ops import diffusion as D
from targetdiff_tpu.ops.schedules import make_categorical_schedule, make_gaussian_schedule

K = 13
T = 100


@pytest.fixture(scope="module")
def scheds():
    pos = make_gaussian_schedule(
        beta_schedule="sigmoid", num_diffusion_timesteps=T, beta_start=1e-7, beta_end=2e-3
    )
    v = make_categorical_schedule(v_beta_schedule="cosine", num_diffusion_timesteps=T, v_beta_s=0.01)
    return pos, v


def test_index_to_log_onehot_roundtrip():
    x = jnp.array([[0, 3, 12], [5, 5, 1]])
    log_x = D.index_to_log_onehot(x, K)
    assert log_x.shape == (2, 3, K)
    np.testing.assert_array_equal(D.log_onehot_to_index(log_x), x)
    # one-hot rows: max entry log(1), others log(1e-30)
    assert float(log_x.max()) == 0.0
    assert float(log_x.min()) == pytest.approx(np.log(1e-30))


def test_q_v_pred_is_mixture_with_uniform(scheds):
    _, v_sched = scheds
    B, N = 2, 4
    v0 = jnp.zeros((B, N), jnp.int32)
    log_v0 = D.index_to_log_onehot(v0, K)
    t = jnp.array([5, 60])
    log_probs = D.q_v_pred(v_sched, log_v0, t, K)
    probs = np.exp(np.asarray(log_probs))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # manual: acp * onehot + (1-acp)/K
    acp = np.exp(np.asarray(v_sched.log_alphas_cumprod))[np.asarray(t)]
    expected0 = acp + (1 - acp) / K  # class 0 (the true class)
    expected_other = (1 - acp) / K
    np.testing.assert_allclose(probs[:, 0, 0], expected0, rtol=1e-5)
    np.testing.assert_allclose(probs[:, 0, 1], expected_other, rtol=1e-4)


def test_q_v_posterior_normalized_and_bayes(scheds):
    _, v_sched = scheds
    B, N = 3, 5
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.integers(0, K, (B, N)))
    vt = jnp.asarray(rng.integers(0, K, (B, N)))
    log_v0 = D.index_to_log_onehot(v0, K)
    log_vt = D.index_to_log_onehot(vt, K)
    t = jnp.array([1, 50, 99])
    log_post = D.q_v_posterior(v_sched, log_v0, log_vt, t, K)
    probs = np.exp(np.asarray(log_post))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    # Bayes check against direct enumeration for one atom
    b, n = 1, 2
    tt = int(t[b])
    la = np.asarray(v_sched.log_alphas, np.float64)
    lacp = np.asarray(v_sched.log_alphas_cumprod, np.float64)
    alpha_t = np.exp(la[tt])
    acp_tm1 = np.exp(lacp[tt - 1])
    q_vtm1_given_v0 = acp_tm1 * np.eye(K)[int(v0[b, n])] + (1 - acp_tm1) / K
    # q(vt | v_{t-1}) as a function of v_{t-1}, evaluated at observed vt
    q_vt_given_vtm1 = alpha_t * np.eye(K)[int(vt[b, n])] + (1 - alpha_t) / K
    unnorm = q_vtm1_given_v0 * q_vt_given_vtm1
    expected = unnorm / unnorm.sum()
    np.testing.assert_allclose(probs[b, n], expected, rtol=2e-3, atol=1e-6)


def test_perturb_pos_statistics(scheds):
    pos_sched, _ = scheds
    B, N = 4, 8
    key = jax.random.PRNGKey(0)
    pos0 = jnp.ones((B, N, 3))
    t = jnp.array([0, 10, 50, 99])
    xt, eps = D.perturb_pos(pos_sched, key, pos0, t)
    acp = np.asarray(pos_sched.alphas_cumprod)[np.asarray(t)]
    manual = np.sqrt(acp)[:, None, None] * np.asarray(pos0) + np.sqrt(1 - acp)[
        :, None, None
    ] * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(xt), manual, rtol=1e-5, atol=1e-6)


def test_normal_kl_zero_for_identical():
    m = jnp.ones((2, 3, 3))
    lv = jnp.zeros((2, 3, 3))
    kl = D.normal_kl(m, lv, m, lv)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)


def test_normal_kl_manual():
    kl = D.normal_kl(
        jnp.array([[0.0]]), jnp.array([[0.0]]), jnp.array([[1.0]]), jnp.array([[0.0]])
    )
    assert float(kl[0]) == pytest.approx(0.5)


def test_masked_mean_ignores_padding():
    x = jnp.array([[1.0, 2.0, 100.0], [3.0, 100.0, 100.0]])
    mask = jnp.array([[True, True, False], [True, False, False]])
    out = np.asarray(D.masked_mean(x, mask))
    np.testing.assert_allclose(out, [1.5, 3.0])


def test_center_pos_protein():
    B, NP, NL = 2, 5, 3
    rng = np.random.default_rng(1)
    ppos = jnp.asarray(rng.normal(size=(B, NP, 3)).astype(np.float32))
    lpos = jnp.asarray(rng.normal(size=(B, NL, 3)).astype(np.float32))
    pmask = jnp.asarray([[True] * 3 + [False] * 2, [True] * 5])
    p2, l2, off = D.center_pos_protein(ppos, lpos, pmask)
    # masked COM of recentered protein is ~0
    m = np.asarray(pmask, np.float32)[..., None]
    com = (np.asarray(p2) * m).sum(1) / m.sum(1)
    np.testing.assert_allclose(com, 0.0, atol=1e-6)
    # offset restores original
    np.testing.assert_allclose(np.asarray(l2 + off), np.asarray(lpos), atol=1e-6)


def test_sample_time_symmetric_antithetic():
    key = jax.random.PRNGKey(3)
    t, pt = D.sample_time_symmetric(key, 8, 1000)
    t = np.asarray(t)
    assert t.shape == (8,)
    assert (t >= 0).all() and (t < 1000).all()
    # antithetic pairing: first half and second half sum to T-1
    half = 8 // 2 + 1
    np.testing.assert_array_equal(t[half : 2 * half - (2 * half - 8)], 1000 - t[: 8 - half] - 1)
    np.testing.assert_allclose(np.asarray(pt), 1.0 / 1000)


def test_log_sample_categorical_distribution():
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.array([[[0.8, 0.15, 0.05]]]))
    logits = jnp.broadcast_to(logits, (2000, 1, 3))
    keys = jax.random.split(key, 1)[0]
    samples = np.asarray(D.log_sample_categorical(keys, logits))
    freq = np.bincount(samples.ravel(), minlength=3) / samples.size
    np.testing.assert_allclose(freq, [0.8, 0.15, 0.05], atol=0.05)


def test_kl_priors_near_zero_at_T(scheds):
    """After the full forward process the prior KLs should be tiny."""
    pos_sched, v_sched = scheds
    B, N = 2, 6
    rng = np.random.default_rng(2)
    pos0 = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    klp = np.asarray(D.kl_pos_prior(pos_sched, pos0, mask))
    assert klp.shape == (B,)
    assert (klp >= 0).all()

    v0 = jnp.asarray(rng.integers(0, K, (B, N)))
    log_v0 = D.index_to_log_onehot(v0, K)
    klv = np.asarray(D.kl_v_prior(v_sched, log_v0, mask, K))
    assert (klv >= -1e-6).all()
    assert (klv < 0.1).all()  # nearly uniform at t=T

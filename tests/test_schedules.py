"""Golden-value tests of the diffusion schedules against independently written
NumPy formulas (the reference's math at models/molopt_score_model.py:48-97,
:233-267 is pure NumPy and directly comparable)."""

import numpy as np
import pytest

from targetdiff_tpu.ops.schedules import (
    cosine_alpha_schedule,
    get_beta_schedule,
    make_categorical_schedule,
    make_gaussian_schedule,
)


def test_sigmoid_beta_schedule_endpoints():
    betas = get_beta_schedule(
        "sigmoid", beta_start=1e-7, beta_end=2e-3, num_diffusion_timesteps=1000
    )
    assert betas.shape == (1000,)
    # sigmoid(-6) ~ 0.00247: starts just above beta_start, ends just below beta_end
    assert betas[0] == pytest.approx(1e-7 + (2e-3 - 1e-7) / (1 + np.exp(6)), rel=1e-10)
    assert betas[-1] == pytest.approx(1e-7 + (2e-3 - 1e-7) / (1 + np.exp(-6)), rel=1e-10)
    assert np.all(np.diff(betas) > 0)


@pytest.mark.parametrize("name", ["quad", "linear", "const", "jsd"])
def test_other_beta_schedules(name):
    betas = get_beta_schedule(name, beta_start=1e-5, beta_end=1e-2, num_diffusion_timesteps=100)
    assert betas.shape == (100,)
    assert np.all(betas > 0) and np.all(betas <= 1)
    if name == "jsd":
        assert betas[-1] == pytest.approx(1.0, rel=1e-12) or betas[-1] < 1.0
        assert betas[0] == pytest.approx(1.0 / 100)


def test_cosine_alpha_schedule_matches_manual():
    T, s = 50, 0.01
    alphas = cosine_alpha_schedule(T, s)
    steps = T + 1
    x = np.linspace(0, steps, steps)
    acp = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    acp = acp / acp[0]
    expected = np.sqrt(np.clip(acp[1:] / acp[:-1], 0.001, 1.0))
    np.testing.assert_allclose(alphas, expected, rtol=1e-12)


def test_gaussian_schedule_identities():
    sched = make_gaussian_schedule(
        beta_schedule="sigmoid", num_diffusion_timesteps=1000, beta_start=1e-7, beta_end=2e-3
    )
    # ground truth recomputed fully in float64 (the buffers themselves are
    # built in float64 then cast to f32, so agreement must be ~f32 rounding)
    betas = get_beta_schedule(
        "sigmoid", beta_start=1e-7, beta_end=2e-3, num_diffusion_timesteps=1000
    )
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])

    def close(actual, expected):
        np.testing.assert_allclose(np.asarray(actual, np.float64), expected, rtol=3e-5, atol=1e-9)

    assert np.asarray(sched.alphas_cumprod_prev)[0] == 1.0
    close(sched.alphas_cumprod, acp)
    close(sched.sqrt_alphas_cumprod, np.sqrt(acp))
    close(sched.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - acp))
    close(sched.sqrt_recip_alphas_cumprod, np.sqrt(1 / acp))
    close(sched.sqrt_recipm1_alphas_cumprod, np.sqrt(1 / acp - 1))
    pv = betas * (1 - acp_prev) / (1 - acp)
    close(sched.posterior_var, pv)
    close(sched.posterior_mean_c0_coef, betas * np.sqrt(acp_prev) / (1 - acp))
    close(sched.posterior_mean_ct_coef, (1 - acp_prev) * np.sqrt(alphas) / (1 - acp))
    # logvar is clipped at t=0 with t=1's value
    assert np.asarray(sched.posterior_logvar)[0] == np.asarray(sched.posterior_logvar)[1]
    np.testing.assert_allclose(
        np.asarray(sched.posterior_logvar)[1:], np.log(pv[1:]), rtol=1e-5
    )


def test_categorical_schedule_log_consistency():
    sched = make_categorical_schedule(
        v_beta_schedule="cosine", num_diffusion_timesteps=1000, v_beta_s=0.01
    )
    la = np.asarray(sched.log_alphas, np.float64)
    lacp = np.asarray(sched.log_alphas_cumprod, np.float64)
    np.testing.assert_allclose(np.cumsum(la), lacp, rtol=1e-4, atol=1e-6)
    # exp(log_alpha) + exp(log_one_minus_alpha) == 1
    np.testing.assert_allclose(
        np.exp(la) + np.exp(np.asarray(sched.log_one_minus_alphas, np.float64)),
        1.0,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.exp(lacp) + np.exp(np.asarray(sched.log_one_minus_alphas_cumprod, np.float64)),
        1.0,
        atol=1e-5,
    )

"""Diffusion variance schedules and precomputed coefficient buffers.

All schedule construction happens in float64 NumPy on the host (exactly once,
at model build time) and is frozen to float32 device arrays, mirroring the
precision strategy of the reference (reference:
models/molopt_score_model.py:48-97 for the beta schedules and :221-267 for the
buffer construction). The buffers are plain pytrees (NamedTuples of jnp
arrays) so they flow through jit/scan/pjit without special handling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def get_beta_schedule(
    beta_schedule: str, *, beta_start: float, beta_end: float, num_diffusion_timesteps: int
) -> np.ndarray:
    """Variance (beta) schedules for the coordinate diffusion.

    Supported: quad | linear | const | jsd | sigmoid
    (reference: models/molopt_score_model.py:48-78).
    """
    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif beta_schedule == "jsd":
        # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, T)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


def cosine_alpha_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule of Nichol & Dhariwal; returns per-step sqrt(alpha)
    following the reference's convention (reference:
    models/molopt_score_model.py:81-97): alpha_t = sqrt(clip(acp_t/acp_{t-1})).
    """
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    acp = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    acp = acp / acp[0]
    alphas = np.clip(acp[1:] / acp[:-1], a_min=0.001, a_max=1.0)
    return np.sqrt(alphas)


def _log_1_min_a(a: np.ndarray) -> np.ndarray:
    return np.log(1 - np.exp(a) + 1e-40)


class GaussianSchedule(NamedTuple):
    """Precomputed buffers for the Gaussian (coordinate) diffusion
    (reference: models/molopt_score_model.py:233-254)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_mean_c0_coef: jnp.ndarray
    posterior_mean_ct_coef: jnp.ndarray
    posterior_var: jnp.ndarray
    posterior_logvar: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


class CategoricalSchedule(NamedTuple):
    """Log-space buffers for the categorical (atom type) diffusion
    (reference: models/molopt_score_model.py:256-267)."""

    log_alphas: jnp.ndarray
    log_one_minus_alphas: jnp.ndarray
    log_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.log_alphas.shape[0]


def make_gaussian_schedule(
    *,
    beta_schedule: str,
    num_diffusion_timesteps: int,
    beta_start: float = None,
    beta_end: float = None,
    pos_beta_s: float = None,
    dtype=jnp.float32,
) -> GaussianSchedule:
    if beta_schedule == "cosine":
        alphas = cosine_alpha_schedule(num_diffusion_timesteps, pos_beta_s) ** 2
        betas = 1.0 - alphas
    else:
        betas = get_beta_schedule(
            beta_schedule,
            beta_start=beta_start,
            beta_end=beta_end,
            num_diffusion_timesteps=num_diffusion_timesteps,
        )
        alphas = 1.0 - betas

    acp = np.cumprod(alphas, axis=0)
    acp_prev = np.append(1.0, acp[:-1])
    posterior_var = betas * (1.0 - acp_prev) / (1.0 - acp)

    def j(x):
        return jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dtype)

    return GaussianSchedule(
        betas=j(betas),
        alphas_cumprod=j(acp),
        alphas_cumprod_prev=j(acp_prev),
        sqrt_alphas_cumprod=j(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=j(np.sqrt(1.0 - acp)),
        sqrt_recip_alphas_cumprod=j(np.sqrt(1.0 / acp)),
        sqrt_recipm1_alphas_cumprod=j(np.sqrt(1.0 / acp - 1)),
        posterior_mean_c0_coef=j(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_ct_coef=j((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        posterior_var=j(posterior_var),
        # variance is 0 at t=0; clip the log by reusing t=1's value
        posterior_logvar=j(np.log(np.append(posterior_var[1], posterior_var[1:]))),
    )


def make_categorical_schedule(
    *, v_beta_schedule: str, num_diffusion_timesteps: int, v_beta_s: float = 0.01, dtype=jnp.float32
) -> CategoricalSchedule:
    if v_beta_schedule != "cosine":
        raise NotImplementedError(v_beta_schedule)
    alphas_v = cosine_alpha_schedule(num_diffusion_timesteps, v_beta_s)
    log_alphas = np.log(alphas_v)
    log_acp = np.cumsum(log_alphas)

    def j(x):
        return jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dtype)

    return CategoricalSchedule(
        log_alphas=j(log_alphas),
        log_one_minus_alphas=j(_log_1_min_a(log_alphas)),
        log_alphas_cumprod=j(log_acp),
        log_one_minus_alphas_cumprod=j(_log_1_min_a(log_acp)),
    )

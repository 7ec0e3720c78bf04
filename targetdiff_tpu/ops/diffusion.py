"""Hybrid-diffusion math on dense padded tensors.

Gaussian diffusion on ligand coordinates and log-space categorical diffusion
on ligand atom types, re-derived for dense `[B, N, ...]` layouts with per-atom
validity masks (the reference computes the same quantities on ragged
concatenated node lists with per-node `batch` index vectors; see
reference: models/molopt_score_model.py:123-175 for the categorical helpers,
:370-483 for the q/posterior/KL terms, and :706-708 for `extract`).

Conventions:
  * `t` is an int array of shape [B] (one timestep per complex in the batch).
  * coordinates: [B, N, 3] float; atom-type log-probs: [B, N, K] float.
  * `mask`: [B, N] bool — True for real atoms, False for padding.
  * per-graph reductions are masked means/sums over the N axis.

All functions are pure and jit/vmap/scan-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import CategoricalSchedule, GaussianSchedule

LOG_EPS = 1e-30


def extract(coef: jnp.ndarray, t: jnp.ndarray, ndim: int = 3) -> jnp.ndarray:
    """coef[t] broadcast to `ndim` trailing dims: [B] -> [B, 1, ..., 1].

    Dense counterpart of reference extract() (molopt_score_model.py:706-708),
    which gathers per-node via the batch vector; broadcasting over the padded
    node axis is equivalent.
    """
    out = coef[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


# ---------------------------------------------------------------------------
# Categorical (atom type) diffusion, log space
# ---------------------------------------------------------------------------


def index_to_log_onehot(x: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Class indices -> log one-hot with log(0) clamped to log(1e-30)
    (reference: molopt_score_model.py:124-130)."""
    onehot = jax.nn.one_hot(x, num_classes, dtype=jnp.float32)
    return jnp.log(jnp.clip(onehot, LOG_EPS, None))


def log_onehot_to_index(log_x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(log_x, axis=-1)


def categorical_kl(log_prob1: jnp.ndarray, log_prob2: jnp.ndarray) -> jnp.ndarray:
    """KL(p1 || p2) per atom; sums over the class axis
    (reference: molopt_score_model.py:137-139)."""
    return (jnp.exp(log_prob1) * (log_prob1 - log_prob2)).sum(-1)


def log_categorical(log_x_start: jnp.ndarray, log_prob: jnp.ndarray) -> jnp.ndarray:
    """E_{x0}[log p(x0)] per atom (reference: molopt_score_model.py:142-143)."""
    return (jnp.exp(log_x_start) * log_prob).sum(-1)


def normal_kl(mean1, logvar1, mean2, logvar2) -> jnp.ndarray:
    """KL between diagonal Gaussians, summed over the last axis
    (reference: molopt_score_model.py:146-151)."""
    kl = 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2) + (mean1 - mean2) ** 2 * jnp.exp(-logvar2)
    )
    return kl.sum(-1)


def log_normal(values, means, log_scales) -> jnp.ndarray:
    """Gaussian log-density, summed over the last axis
    (reference: molopt_score_model.py:154-157)."""
    var = jnp.exp(log_scales * 2)
    log_prob = -((values - means) ** 2) / (2 * var) - log_scales - np.log(np.sqrt(2 * np.pi))
    return log_prob.sum(-1)


def log_sample_categorical(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Gumbel-max sample of class indices from (log-)probabilities
    (reference: molopt_score_model.py:160-166)."""
    uniform = jax.random.uniform(key, logits.shape)
    gumbel = -jnp.log(-jnp.log(uniform + LOG_EPS) + LOG_EPS)
    return jnp.argmax(gumbel + logits, axis=-1)


def log_add_exp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    maximum = jnp.maximum(a, b)
    return maximum + jnp.log(jnp.exp(a - maximum) + jnp.exp(b - maximum))


def q_v_pred_one_timestep(
    sched: CategoricalSchedule, log_vt_1: jnp.ndarray, t: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """log q(v_t | v_{t-1}) = log[alpha_t v_{t-1} + (1-alpha_t)/K]
    (reference: molopt_score_model.py:371-381)."""
    log_alpha_t = extract(sched.log_alphas, t, log_vt_1.ndim)
    log_1_min_alpha_t = extract(sched.log_one_minus_alphas, t, log_vt_1.ndim)
    return log_add_exp(log_vt_1 + log_alpha_t, log_1_min_alpha_t - np.log(num_classes))


def q_v_pred(
    sched: CategoricalSchedule, log_v0: jnp.ndarray, t: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """log q(v_t | v_0) (reference: molopt_score_model.py:383-392)."""
    log_cum = extract(sched.log_alphas_cumprod, t, log_v0.ndim)
    log_1_min_cum = extract(sched.log_one_minus_alphas_cumprod, t, log_v0.ndim)
    return log_add_exp(log_v0 + log_cum, log_1_min_cum - np.log(num_classes))


def q_v_sample(
    sched: CategoricalSchedule, key: jax.Array, log_v0: jnp.ndarray, t: jnp.ndarray, num_classes: int
):
    """Sample v_t ~ q(v_t|v_0); returns (indices, log-onehot)
    (reference: molopt_score_model.py:394-398)."""
    log_qvt_v0 = q_v_pred(sched, log_v0, t, num_classes)
    idx = log_sample_categorical(key, log_qvt_v0)
    return idx, index_to_log_onehot(idx, num_classes)


def q_v_posterior(
    sched: CategoricalSchedule,
    log_v0: jnp.ndarray,
    log_vt: jnp.ndarray,
    t: jnp.ndarray,
    num_classes: int,
) -> jnp.ndarray:
    """log q(v_{t-1} | v_t, v_0), normalized over classes
    (reference: molopt_score_model.py:401-409)."""
    t_minus_1 = jnp.maximum(t - 1, 0)  # t=0 value unused by the decoder term
    log_qvt1_v0 = q_v_pred(sched, log_v0, t_minus_1, num_classes)
    unnormed = log_qvt1_v0 + q_v_pred_one_timestep(sched, log_vt, t, num_classes)
    return unnormed - jax.nn.logsumexp(unnormed, axis=-1, keepdims=True)


def q_v_pred_strided(
    sched: CategoricalSchedule,
    log_vt: jnp.ndarray,
    t: jnp.ndarray,
    s: jnp.ndarray,
    num_classes: int,
) -> jnp.ndarray:
    """log q(v_t | v_s) for an arbitrary jump s < t under the uniform-mixture
    kernel: alpha_{t|s} = bar(alpha)_t / bar(alpha)_s, the multi-step
    generalization of q_v_pred_one_timestep (D3PM, Austin et al. 2021).
    No reference counterpart — the reference only steps t -> t-1."""
    log_a_ts = extract(sched.log_alphas_cumprod, t, log_vt.ndim) - extract(
        sched.log_alphas_cumprod, jnp.maximum(s, 0), log_vt.ndim
    )
    # log(1 - a_ts) via -expm1: stable as log_a_ts -> 0- (log1p(-exp(x))
    # collapses to log(eps) once exp(x) rounds to 1 in f32)
    log_1_min_a_ts = jnp.log(-jnp.expm1(log_a_ts) + LOG_EPS)
    return log_add_exp(log_vt + log_a_ts, log_1_min_a_ts - np.log(num_classes))


def q_v_posterior_strided(
    sched: CategoricalSchedule,
    log_v0: jnp.ndarray,
    log_vt: jnp.ndarray,
    t: jnp.ndarray,
    s: jnp.ndarray,
    num_classes: int,
) -> jnp.ndarray:
    """log q(v_s | v_t, v_0) for an arbitrary jump s < t: proportional to
    q(v_t | v_s) q(v_s | v_0). With s = t-1 this equals q_v_posterior
    exactly (tested). For s < 0 callers should use the recon distribution
    log_v0 directly (the x0-projection convention, as in DDIM's final step)."""
    log_qvs_v0 = q_v_pred(sched, log_v0, jnp.maximum(s, 0), num_classes)
    unnormed = log_qvs_v0 + q_v_pred_strided(sched, log_vt, t, s, num_classes)
    return unnormed - jax.nn.logsumexp(unnormed, axis=-1, keepdims=True)


def ddim_pos_coefficients(
    betas: np.ndarray, time_seq: np.ndarray, s_seq: np.ndarray, eta: float = 0.0
):
    """HOST-side (f64) DDIM coefficient tables for the jump sequence
    t=time_seq[i] -> s=s_seq[i] (Song et al. 2021):

        x_s = sqrt(abar_s) x0 + sqrt(1 - abar_s - sigma^2) eps_hat + sigma xi
        sigma = eta sqrt((1-abar_s)/(1-abar_t)) sqrt(1 - abar_t/abar_s)

    rewritten as x_s = c_x0 * x0 + c_xt * x_t + sigma * xi (eps_hat
    eliminated). Computed in float64 from the beta schedule because
    1 - abar_t/abar_s underflows f32 when beta_t ~ 1e-7 (sigmoid schedule
    start) — on-device f32 recomputation was measurably wrong at early t.
    s < 0 encodes the final jump to the clean sample (c_x0=1, c_xt=sigma=0).
    With s = t-1, eta = 1 this reproduces the DDPM posterior (tested).
    No reference counterpart — the reference samples only full-schedule DDPM
    (molopt_score_model.py:633-703). Returns f32 arrays (c_x0, c_xt, sigma)
    of time_seq's length."""
    betas64 = np.asarray(betas, np.float64)
    acp = np.cumprod(1.0 - betas64)
    t = np.asarray(time_seq, np.int64)
    s = np.asarray(s_seq, np.int64)
    abar_t = acp[t]
    abar_s = np.where(s >= 0, acp[np.maximum(s, 0)], 1.0)
    sigma = eta * np.sqrt(
        np.clip((1.0 - abar_s) / np.clip(1.0 - abar_t, 1e-300, None), 0.0, None)
        * np.clip(1.0 - abar_t / abar_s, 0.0, None)
    )
    dir_coef = np.sqrt(np.clip(1.0 - abar_s - sigma**2, 0.0, None))
    denom = np.sqrt(np.clip(1.0 - abar_t, 1e-300, None))
    c_xt = dir_coef / denom
    c_x0 = np.sqrt(abar_s) - c_xt * np.sqrt(abar_t)
    f = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return f(c_x0), f(c_xt), f(sigma)


def kl_v_prior(
    sched: CategoricalSchedule, log_v0: jnp.ndarray, mask: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Per-graph mean KL(q(v_T|v_0) || uniform) over real atoms
    (reference: molopt_score_model.py:411-417). Returns [B]."""
    B = log_v0.shape[0]
    T = sched.num_timesteps
    t_last = jnp.full((B,), T - 1, dtype=jnp.int32)
    log_qvT = q_v_pred(sched, log_v0, t_last, num_classes)
    log_uniform = jnp.full_like(log_qvT, -np.log(num_classes))
    kl = categorical_kl(log_qvT, log_uniform)  # [B, N]
    return masked_mean(kl, mask)


# ---------------------------------------------------------------------------
# Gaussian (coordinate) diffusion
# ---------------------------------------------------------------------------


def predict_x0_from_eps(
    sched: GaussianSchedule, xt: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """(reference: molopt_score_model.py:419-422)."""
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, xt.ndim) * eps
    )


def q_pos_posterior(
    sched: GaussianSchedule, x0: jnp.ndarray, xt: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Mean of q(x_{t-1} | x_t, x_0) (reference: molopt_score_model.py:424-428)."""
    return (
        extract(sched.posterior_mean_c0_coef, t, x0.ndim) * x0
        + extract(sched.posterior_mean_ct_coef, t, xt.ndim) * xt
    )


def kl_pos_prior(sched: GaussianSchedule, pos0: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-graph mean KL(q(x_T|x_0) || N(0, I)) over real atoms
    (reference: molopt_score_model.py:430-438). Returns [B]."""
    B = pos0.shape[0]
    T = sched.num_timesteps
    t_last = jnp.full((B,), T - 1, dtype=jnp.int32)
    a_pos = extract(sched.alphas_cumprod, t_last, pos0.ndim)
    pos_model_mean = jnp.sqrt(a_pos) * pos0
    pos_log_variance = jnp.log(jnp.sqrt(1.0 - a_pos))
    kl = normal_kl(
        jnp.zeros_like(pos_model_mean),
        jnp.zeros_like(pos_log_variance),
        pos_model_mean,
        jnp.broadcast_to(pos_log_variance, pos_model_mean.shape),
    )  # [B, N]
    return masked_mean(kl, mask)


def perturb_pos(
    sched: GaussianSchedule, key: jax.Array, pos0: jnp.ndarray, t: jnp.ndarray
):
    """x_t = sqrt(a_bar) x_0 + sqrt(1-a_bar) eps; returns (x_t, eps)
    (reference: molopt_score_model.py:497-504)."""
    a = extract(sched.alphas_cumprod, t, pos0.ndim)
    eps = jax.random.normal(key, pos0.shape, dtype=pos0.dtype)
    return jnp.sqrt(a) * pos0 + jnp.sqrt(1.0 - a) * eps, eps


# ---------------------------------------------------------------------------
# Per-timestep variational terms
# ---------------------------------------------------------------------------


def compute_pos_Lt(
    sched: GaussianSchedule,
    pos_model_mean: jnp.ndarray,
    x0: jnp.ndarray,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Per-graph position KL/NLL term in bits
    (reference: molopt_score_model.py:464-475). Returns [B]."""
    pos_log_variance = extract(sched.posterior_logvar, t, x0.ndim)
    pos_true_mean = q_pos_posterior(sched, x0=x0, xt=xt, t=t)
    kl_pos = normal_kl(
        pos_true_mean,
        jnp.broadcast_to(pos_log_variance, pos_true_mean.shape),
        pos_model_mean,
        jnp.broadcast_to(pos_log_variance, pos_model_mean.shape),
    ) / np.log(2.0)
    decoder_nll = -log_normal(x0, means=pos_model_mean, log_scales=0.5 * pos_log_variance)
    t_is_0 = (t == 0).astype(x0.dtype)[:, None]  # [B, 1] broadcast over atoms
    per_atom = t_is_0 * decoder_nll + (1.0 - t_is_0) * kl_pos
    return masked_mean(per_atom, mask)


def compute_v_Lt(
    log_v_model_prob: jnp.ndarray,
    log_v0: jnp.ndarray,
    log_v_true_prob: jnp.ndarray,
    t: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Per-graph atom-type KL/NLL term
    (reference: molopt_score_model.py:477-483). Returns [B]."""
    kl_v = categorical_kl(log_v_true_prob, log_v_model_prob)
    decoder_nll_v = -log_categorical(log_v0, log_v_model_prob)
    t_is_0 = (t == 0).astype(kl_v.dtype)[:, None]
    per_atom = t_is_0 * decoder_nll_v + (1.0 - t_is_0) * kl_v
    return masked_mean(per_atom, mask)


# ---------------------------------------------------------------------------
# Time sampling & masked reductions
# ---------------------------------------------------------------------------


def sample_time_symmetric(key: jax.Array, num_graphs: int, num_timesteps: int):
    """Antithetic timestep sampling (reference: molopt_score_model.py:453-459).
    Returns (t [B], pt [B])."""
    half = num_graphs // 2 + 1
    t_half = jax.random.randint(key, (half,), 0, num_timesteps)
    t = jnp.concatenate([t_half, num_timesteps - t_half - 1])[:num_graphs]
    pt = jnp.full((num_graphs,), 1.0 / num_timesteps, dtype=jnp.float32)
    return t, pt


def sample_time_importance(
    key: jax.Array, num_graphs: int, Lt_history: jnp.ndarray, Lt_count: jnp.ndarray
):
    """Importance sampling over timesteps weighted by sqrt(E[L_t^2]); falls
    back to symmetric until every bucket has >10 samples
    (reference: molopt_score_model.py:440-451). Returns (t, pt)."""
    num_timesteps = Lt_history.shape[0]
    ready = jnp.all(Lt_count > 10)

    Lt_sqrt = jnp.sqrt(Lt_history + 1e-10) + 0.0001
    Lt_sqrt = Lt_sqrt.at[0].set(Lt_sqrt[1])
    pt_all = Lt_sqrt / Lt_sqrt.sum()

    key_imp, key_sym = jax.random.split(key)
    t_imp = jax.random.categorical(key_imp, jnp.log(pt_all), shape=(num_graphs,))
    pt_imp = pt_all[t_imp]
    t_sym, pt_sym = sample_time_symmetric(key_sym, num_graphs, num_timesteps)
    t = jnp.where(ready, t_imp, t_sym)
    pt = jnp.where(ready, pt_imp, pt_sym)
    return t, pt


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Mean of x over `axis` counting only mask==True entries."""
    m = mask.astype(x.dtype)
    return (x * m).sum(axis) / jnp.maximum(m.sum(axis), 1.0)


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return (x * mask.astype(x.dtype)).sum(axis)


def center_pos_protein(
    protein_pos: jnp.ndarray,
    ligand_pos: jnp.ndarray,
    protein_mask: jnp.ndarray,
    mode: str = "protein",
):
    """Shift each complex so the protein's center of mass is at the origin
    (reference: molopt_score_model.py:110-120). Returns
    (protein_pos, ligand_pos, offset [B, 1, 3])."""
    if mode == "none":
        return protein_pos, ligand_pos, jnp.zeros((protein_pos.shape[0], 1, 3), protein_pos.dtype)
    if mode != "protein":
        raise NotImplementedError(mode)
    m = protein_mask.astype(protein_pos.dtype)[..., None]
    offset = (protein_pos * m).sum(1, keepdims=True) / jnp.maximum(m.sum(1, keepdims=True), 1.0)
    return protein_pos - offset, ligand_pos - offset, offset

"""ScorePosNet3D — hybrid diffusion model over ligand coordinates (Gaussian)
and atom types (categorical), conditioned on a rigid protein pocket.

TPU-native re-design of the reference's ScorePosNet3D
(reference: models/molopt_score_model.py:198-703): the denoiser runs on dense
padded complexes, the training loss / likelihood terms use masked per-graph
reductions (ops/diffusion.py), and the full reverse process runs inside one
`jax.lax.scan` on device — the reference's 1000-iteration Python loop with
per-step device->host trajectory offload (molopt_score_model.py:649-693)
becomes a single compiled program.

Structure:
  * `ScorePosNet` (flax module): atom embeddings + node indicator + refine net
    + v_inference head — the neural part (reference :272-368).
  * `DiffusionModel`: owns the schedules + flax module; pure-functional
    methods `get_diffusion_loss`, `sample_diffusion`, `likelihood_estimation`,
    `fetch_embedding` mirroring the reference API (:485, :634, :566, :620).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.batch import ComplexBatch
from ..ops import diffusion as D
from ..ops import graph as G
from ..ops.schedules import (
    CategoricalSchedule,
    GaussianSchedule,
    make_categorical_schedule,
    make_gaussian_schedule,
)
from .common import TorchLinear, shifted_softplus
from .egnn import EGNN
from .uni_transformer import UniTransformerO2TwoUpdateGeneral


class SinusoidalPosEmb(nn.Module):
    """(reference: models/molopt_score_model.py:182-194)."""

    dim: int

    def __call__(self, x):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim) * -emb)
        emb = x[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def build_refine_net(config: Config, max_ligand: int, dtype=None):
    """(reference: models/molopt_score_model.py:13-45)."""
    if config.model_type == "uni_o2":
        return UniTransformerO2TwoUpdateGeneral(
            num_blocks=config.num_blocks,
            num_layers=config.num_layers,
            hidden_dim=config.hidden_dim,
            n_heads=config.n_heads,
            k=config.knn,
            edge_feat_dim=config.edge_feat_dim,
            num_r_gaussian=config.num_r_gaussian,
            num_node_types=config.num_node_types,
            act_fn=config.act_fn,
            norm=config.norm,
            cutoff_mode=config.cutoff_mode,
            ew_net_type=config.ew_net_type,
            num_x2h=config.num_x2h,
            num_h2x=config.num_h2x,
            r_max=config.r_max,
            x2h_out_fc=config.x2h_out_fc,
            sync_twoup=config.sync_twoup,
            max_ligand=max_ligand,
            remat=config.get("remat", False),
            dtype=dtype,
            name="refine_net",
        )
    elif config.model_type == "egnn":
        return EGNN(
            num_layers=config.num_layers,
            hidden_dim=config.hidden_dim,
            edge_feat_dim=config.edge_feat_dim,
            num_r_gaussian=1,
            k=config.knn,
            cutoff_mode=config.cutoff_mode,
            max_ligand=max_ligand,
            remat=config.get("remat", False),
            dtype=dtype,
            name="refine_net",
        )
    raise ValueError(config.model_type)


class ScorePosNet(nn.Module):
    """The neural denoiser (reference: models/molopt_score_model.py:272-368)."""

    config: Config
    protein_atom_feature_dim: int
    ligand_atom_feature_dim: int
    max_ligand: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        protein_pos,  # [B, NP, 3]
        protein_v,  # [B, NP, FP]
        protein_mask,  # [B, NP]
        init_ligand_pos,  # [B, NL, 3]
        init_ligand_v,  # [B, NL] int
        ligand_mask,  # [B, NL]
        time_step=None,  # [B] int
        return_all=False,
        fix_x=False,
    ) -> Dict[str, Any]:
        cfg = Config(self.config)  # flax freezes dict attrs into FrozenDict
        num_classes = self.ligand_atom_feature_dim
        hidden_dim = cfg.hidden_dim
        emb_dim = hidden_dim - 1 if cfg.node_indicator else hidden_dim
        time_emb_dim = cfg.get("time_emb_dim", 0)
        time_emb_mode = cfg.get("time_emb_mode", "simple")

        init_ligand_v_oh = jax.nn.one_hot(init_ligand_v, num_classes, dtype=jnp.float32)
        if time_emb_dim > 0:
            T = cfg.num_diffusion_timesteps
            if time_emb_mode == "simple":
                tfrac = (time_step.astype(jnp.float32) / T)[:, None, None]
                tfrac = jnp.broadcast_to(tfrac, init_ligand_v_oh.shape[:2] + (1,))
                input_ligand_feat = jnp.concatenate([init_ligand_v_oh, tfrac], axis=-1)
            elif time_emb_mode == "sin":
                t_feat = SinusoidalPosEmb(time_emb_dim, name="time_emb_sin")(
                    time_step.astype(jnp.float32)
                )
                t_feat = TorchLinear(time_emb_dim * 4, name="time_emb_l1")(t_feat)
                t_feat = jax.nn.gelu(t_feat)
                t_feat = TorchLinear(time_emb_dim, name="time_emb_l2")(t_feat)
                t_feat = jnp.broadcast_to(
                    t_feat[:, None, :], init_ligand_v_oh.shape[:2] + (time_emb_dim,)
                )
                input_ligand_feat = jnp.concatenate([init_ligand_v_oh, t_feat], axis=-1)
            else:
                raise NotImplementedError(time_emb_mode)
        else:
            input_ligand_feat = init_ligand_v_oh

        h_protein = TorchLinear(emb_dim, dtype=self.dtype, name="protein_atom_emb")(protein_v)
        init_ligand_h = TorchLinear(emb_dim, dtype=self.dtype, name="ligand_atom_emb")(
            input_ligand_feat
        )

        if cfg.node_indicator:
            zeros = jnp.zeros(h_protein.shape[:2] + (1,), h_protein.dtype)
            ones = jnp.ones(init_ligand_h.shape[:2] + (1,), init_ligand_h.dtype)
            h_protein = jnp.concatenate([h_protein, zeros], axis=-1)
            init_ligand_h = jnp.concatenate([init_ligand_h, ones], axis=-1)

        h_all, pos_all, mask_all, mask_ligand = G.compose_context(
            h_protein, init_ligand_h, protein_pos, init_ligand_pos, protein_mask, ligand_mask
        )

        refine_net = build_refine_net(cfg, self.max_ligand, dtype=self.dtype)
        outputs = refine_net(h_all, pos_all, mask_ligand, mask_all, return_all=return_all, fix_x=fix_x)
        final_pos, final_h = outputs["x"], outputs["h"]

        NP = protein_pos.shape[1]
        final_ligand_pos = final_pos[:, NP:, :]  # ligand occupies the tail slots
        # Export contract (matches fast_apply): padded ligand rows are zero.
        final_ligand_h = final_h[:, NP:, :] * ligand_mask.astype(final_h.dtype)[..., None]

        v_inf_0 = TorchLinear(hidden_dim, dtype=self.dtype, name="v_inference_0")
        v_inf_2 = TorchLinear(num_classes, dtype=self.dtype, name="v_inference_2")

        def v_inference(hh):
            return v_inf_2(shifted_softplus(v_inf_0(hh)))

        final_ligand_v = v_inference(final_ligand_h).astype(jnp.float32)

        preds = {
            "pred_ligand_pos": final_ligand_pos.astype(jnp.float32),
            "pred_ligand_v": final_ligand_v,
            "final_h": final_h,
            "final_ligand_h": final_ligand_h,
        }
        if return_all:
            preds["layer_pred_ligand_pos"] = [p[:, NP:, :] for p in outputs["all_x"]]
            preds["layer_pred_ligand_v"] = [
                v_inference(hh[:, NP:, :]).astype(jnp.float32) for hh in outputs["all_h"]
            ]
        return preds


class SampleResult(NamedTuple):
    pos: jnp.ndarray  # [B, NL, 3] final ligand coordinates (uncentered)
    v: jnp.ndarray  # [B, NL] final atom-type indices
    pos_traj: Optional[jnp.ndarray]  # [S, B, NL, 3]
    v_traj: Optional[jnp.ndarray]  # [S, B, NL]
    v0_traj: Optional[jnp.ndarray]  # [S, B, NL, K] log p(v0) predictions
    vt_traj: Optional[jnp.ndarray]  # [S, B, NL, K] log posterior probs


class DiffusionModel:
    """Owns schedules + flax net; exposes the reference's model API as pure
    functions of (params, rng, batch)."""

    def __init__(
        self,
        config: Config,
        protein_atom_feature_dim: int,
        ligand_atom_feature_dim: int,
        max_protein: int = 384,
        max_ligand: int = 64,
        dtype=None,
    ):
        self.config = config
        self.model_mean_type = config.model_mean_type  # ['noise', 'C0']
        self.loss_v_weight = config.loss_v_weight
        self.sample_time_method = config.get("sample_time_method", "symmetric")
        self.center_pos_mode = config.get("center_pos_mode", "protein")
        self.num_classes = ligand_atom_feature_dim
        self.max_protein = max_protein
        self.max_ligand = max_ligand

        self.pos_sched: GaussianSchedule = make_gaussian_schedule(
            beta_schedule=config.beta_schedule,
            num_diffusion_timesteps=config.num_diffusion_timesteps,
            beta_start=config.get("beta_start"),
            beta_end=config.get("beta_end"),
            pos_beta_s=config.get("pos_beta_s"),
        )
        self.v_sched: CategoricalSchedule = make_categorical_schedule(
            v_beta_schedule=config.v_beta_schedule,
            num_diffusion_timesteps=config.num_diffusion_timesteps,
            v_beta_s=config.get("v_beta_s", 0.01),
        )
        self.num_timesteps = int(self.pos_sched.num_timesteps)
        self._jit_cache: Dict[Any, Any] = {}

        self.net = ScorePosNet(
            config=config,
            protein_atom_feature_dim=protein_atom_feature_dim,
            ligand_atom_feature_dim=ligand_atom_feature_dim,
            max_ligand=max_ligand,
            dtype=dtype,
        )

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array, batch: ComplexBatch):
        t = jnp.zeros((batch.num_graphs,), jnp.int32)
        variables = self.net.init(
            key,
            batch.protein_pos,
            batch.protein_feat,
            batch.protein_mask,
            batch.ligand_pos,
            batch.ligand_v,
            batch.ligand_mask,
            time_step=t,
        )
        # keep the params pytree clean: the 'stats' sow collection (logit
        # envelope telemetry, tools/logit_envelope.py) must not leak into
        # optimizer state / checkpoints
        return {"params": variables["params"]}

    def apply(self, params, batch: ComplexBatch, ligand_pos, ligand_v, time_step, **kw):
        return self.net.apply(
            params,
            batch.protein_pos,
            batch.protein_feat,
            batch.protein_mask,
            ligand_pos,
            ligand_v,
            batch.ligand_mask,
            time_step=time_step,
            **kw,
        )

    def fast_apply(
        self, params, batch: ComplexBatch, ligand_pos, ligand_v, time_step=None,
        dtype=jnp.bfloat16, interpret=None, mode="mega", fix_x=False,
        need_full_h=True,
    ):
        """Fused Pallas-kernel forward (inference path); same params as
        `apply`. Falls back to interpret mode off-TPU. need_full_h=False
        skips last-layer work no ligand output consumes (final_h protein
        rows are then stale — sampling/likelihood only)."""
        from .fast_forward import fast_forward

        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        return fast_forward(
            self.config, params, batch, ligand_pos, ligand_v, self.num_classes,
            time_step=time_step, dtype=dtype, interpret=interpret, mode=mode,
            fix_x=fix_x, need_full_h=need_full_h,
        )

    # -- training loss ------------------------------------------------------

    def get_diffusion_loss(
        self, params, key: jax.Array, batch: ComplexBatch, time_step=None,
        impl: str = "xla",
    ) -> Dict[str, jnp.ndarray]:
        """(reference: models/molopt_score_model.py:485-563).

        impl='fast' runs the denoiser layers as Pallas kernels with
        hand-written Pallas backwards (training fast path, f32 — exact);
        impl='fast_bf16' is the bf16 training variant (heavy dots bf16,
        f32 accumulation/residuals both directions). A '_pl' suffix
        ('fast_pl'/'fast_bf16_pl') selects the round-2/3 PER-LAYER backward
        kernels instead of the round-4 whole-block fused backward
        (duel/debug escape hatch)."""
        B = batch.num_graphs
        lmask = batch.ligand_mask
        protein_pos, ligand_pos, _ = D.center_pos_protein(
            batch.protein_pos, batch.ligand_pos, batch.protein_mask, self.center_pos_mode
        )
        cbatch = batch._replace(protein_pos=protein_pos)

        key_t, key_pos, key_v = jax.random.split(key, 3)
        if time_step is None:
            time_step, _pt = D.sample_time_symmetric(key_t, B, self.num_timesteps)

        # perturb
        ligand_pos_perturbed, pos_noise = D.perturb_pos(
            self.pos_sched, key_pos, ligand_pos, time_step
        )
        log_ligand_v0 = D.index_to_log_onehot(batch.ligand_v, self.num_classes)
        ligand_v_perturbed, log_ligand_vt = D.q_v_sample(
            self.v_sched, key_v, log_ligand_v0, time_step, self.num_classes
        )

        if impl.startswith("fast"):
            from .fast_forward import fast_train_forward

            interpret = jax.default_backend() not in ("tpu", "axon")
            preds = fast_train_forward(
                self.config, params, cbatch, ligand_pos_perturbed,
                ligand_v_perturbed, self.num_classes, interpret=interpret,
                dtype=jnp.bfloat16 if "bf16" in impl else jnp.float32,
                whole_block_bwd=not impl.endswith("_pl"),
            )
        else:
            preds = self.apply(
                params, cbatch, ligand_pos_perturbed, ligand_v_perturbed, time_step
            )
        pred_ligand_pos, pred_ligand_v = preds["pred_ligand_pos"], preds["pred_ligand_v"]
        pred_pos_noise = pred_ligand_pos - ligand_pos_perturbed

        # position loss (reference :536-543)
        if self.model_mean_type == "C0":
            target, pred = ligand_pos, pred_ligand_pos
        elif self.model_mean_type == "noise":
            target, pred = pos_noise, pred_pos_noise
        else:
            raise ValueError(self.model_mean_type)
        sq = ((pred - target) ** 2).sum(-1)  # [B, NL]
        loss_pos_graph = D.masked_mean(sq, lmask)  # [B]
        loss_pos = loss_pos_graph.mean()

        # atom-type loss (reference :546-551)
        log_ligand_v_recon = jax.nn.log_softmax(pred_ligand_v, axis=-1)
        log_v_model_prob = D.q_v_posterior(
            self.v_sched, log_ligand_v_recon, log_ligand_vt, time_step, self.num_classes
        )
        log_v_true_prob = D.q_v_posterior(
            self.v_sched, log_ligand_v0, log_ligand_vt, time_step, self.num_classes
        )
        kl_v = D.compute_v_Lt(log_v_model_prob, log_ligand_v0, log_v_true_prob, time_step, lmask)
        loss_v = kl_v.mean()
        loss = loss_pos + loss_v * self.loss_v_weight

        return {
            "loss_pos": loss_pos,
            "loss_v": loss_v,
            "loss": loss,
            "loss_pos_graph": loss_pos_graph,
            "loss_v_graph": kl_v,
            "x0": ligand_pos,
            "pred_ligand_pos": pred_ligand_pos,
            "pred_ligand_v": pred_ligand_v,
            "pred_pos_noise": pred_pos_noise,
            "ligand_v_recon": jax.nn.softmax(pred_ligand_v, axis=-1),
            "time_step": time_step,
        }

    # -- likelihood (ELBO terms) -------------------------------------------

    def likelihood_estimation(
        self, params, key: jax.Array, batch: ComplexBatch, time_step: jnp.ndarray,
        impl: str = "xla",
    ):
        """Per-timestep KL terms; `time_step == num_timesteps` selects the
        prior terms (reference: models/molopt_score_model.py:566-617).
        Returns (kl_pos [B], kl_v [B]).

        impl='fast' routes the denoiser through the fused megakernel in f32
        (the schedule/KL math is identical; parity tested in
        tests/test_likelihood_fast.py)."""
        lmask = batch.ligand_mask
        protein_pos, ligand_pos, _ = D.center_pos_protein(
            batch.protein_pos, batch.ligand_pos, batch.protein_mask, "protein"
        )
        cbatch = batch._replace(protein_pos=protein_pos)
        log_ligand_v0 = D.index_to_log_onehot(batch.ligand_v, self.num_classes)

        def prior_terms(_):
            kl_pos_prior = D.kl_pos_prior(self.pos_sched, ligand_pos, lmask)
            kl_v_prior = D.kl_v_prior(self.v_sched, log_ligand_v0, lmask, self.num_classes)
            return kl_pos_prior, kl_v_prior

        def step_terms(t):
            key_pos, key_v = jax.random.split(key)
            ligand_pos_perturbed, _ = D.perturb_pos(self.pos_sched, key_pos, ligand_pos, t)
            ligand_v_perturbed, log_ligand_vt = D.q_v_sample(
                self.v_sched, key_v, log_ligand_v0, t, self.num_classes
            )
            if impl == "fast":
                preds = self.fast_apply(
                    params, cbatch, ligand_pos_perturbed, ligand_v_perturbed, t,
                    dtype=jnp.float32, need_full_h=False,
                )
            else:
                preds = self.apply(params, cbatch, ligand_pos_perturbed, ligand_v_perturbed, t)
            if self.model_mean_type != "C0":
                raise ValueError(self.model_mean_type)
            pos_model_mean = D.q_pos_posterior(
                self.pos_sched, preds["pred_ligand_pos"], ligand_pos_perturbed, t
            )
            log_v_recon = jax.nn.log_softmax(preds["pred_ligand_v"], axis=-1)
            log_v_model_prob = D.q_v_posterior(
                self.v_sched, log_v_recon, log_ligand_vt, t, self.num_classes
            )
            log_v_true_prob = D.q_v_posterior(
                self.v_sched, log_ligand_v0, log_ligand_vt, t, self.num_classes
            )
            kl_pos = D.compute_pos_Lt(
                self.pos_sched, pos_model_mean, ligand_pos, ligand_pos_perturbed, t, lmask
            )
            kl_v = D.compute_v_Lt(log_v_model_prob, log_ligand_v0, log_v_true_prob, t, lmask)
            return kl_pos, kl_v

        is_prior = jnp.all(time_step == self.num_timesteps)
        clipped_t = jnp.minimum(time_step, self.num_timesteps - 1)
        kl_pos_s, kl_v_s = step_terms(clipped_t)
        kl_pos_p, kl_v_p = prior_terms(None)
        kl_pos = jnp.where(is_prior, kl_pos_p, kl_pos_s)
        kl_v = jnp.where(is_prior, kl_v_p, kl_v_s)
        return kl_pos, kl_v

    def fetch_embedding(self, params, batch: ComplexBatch, impl: str = "xla"):
        """Hidden states with frozen coordinates
        (reference: models/molopt_score_model.py:619-631). impl='fast' runs
        the fused megakernel with the x-update masked off."""
        if impl == "fast":
            # f32: embedding export must match the XLA path's precision (the
            # bf16 default is for the sampling loop, not feature export)
            return self.fast_apply(
                params, batch, batch.ligand_pos, batch.ligand_v, None,
                dtype=jnp.float32, fix_x=True,
            )
        return self.apply(
            params, batch, batch.ligand_pos, batch.ligand_v, None, fix_x=True
        )

    # -- reverse process ----------------------------------------------------

    def _sample_step(
        self, params, cbatch: ComplexBatch, lmask_f, offset, carry, ts_pair,
        *, impl, dtype, pos_only, return_traj, return_v_probs,
        sampler="ddpm", eta=0.0,
    ):
        """One reverse step (reference: molopt_score_model.py:649-693).

        `ts_pair` is the per-step scan slice: a dict with int scalars "t"
        and "s" (denoise from timestep t to timestep s) plus, for
        sampler='ddim'/'dpm2', the host-precomputed f64->f32 position
        coefficients "cx0"/"cxt"/"sig" (ops/diffusion.py
        ddim_pos_coefficients). sampler='ddpm' has s = t-1 and reproduces
        the reference's ancestral step; 'ddim' takes arbitrary jumps
        (strided D3PM posterior for atom types); 'dpm2' is the Heun /
        DPM-Solver-2 second-order correction of the ddim step (two model
        evaluations per jump) — capabilities the reference lacks. s < 0 is
        the final jump to the clean sample."""
        ligand_pos, ligand_v, k = carry
        k, k_pos, k_v = jax.random.split(k, 3)
        t = jnp.full((cbatch.num_graphs,), ts_pair["t"], jnp.int32)
        s = jnp.full((cbatch.num_graphs,), ts_pair["s"], jnp.int32)

        def apply_model(pos, v, tt):
            if impl == "fast":
                preds_ = self.fast_apply(
                    params, cbatch, pos, v, tt, dtype=dtype, need_full_h=False,
                )
            else:
                preds_ = self.apply(params, cbatch, pos, v, tt)
            if self.model_mean_type == "noise":
                pos0 = D.predict_x0_from_eps(
                    self.pos_sched, pos, preds_["pred_ligand_pos"] - pos, tt
                )
            elif self.model_mean_type == "C0":
                pos0 = preds_["pred_ligand_pos"]
            else:
                raise ValueError(self.model_mean_type)
            return pos0, preds_["pred_ligand_v"]

        pos0_from_e, v0_from_e = apply_model(ligand_pos, ligand_v, t)

        if sampler == "dpm2":
            # Heun / DPM-Solver-2, data-prediction form: take the
            # deterministic first-order DDIM proposal to s, re-evaluate the
            # model there, and redo the jump from the AVERAGE of the two
            # x0 predictions (trapezoidal correction). The standard
            # second-order fix for first-order DDIM's low-NFE stability
            # loss (BASELINE.md ddim table). Two NFE per jump; the final
            # jump (s < 0) stays first-order.
            x_prop = (
                ts_pair["cx0"] * pos0_from_e + ts_pair["cxt"] * ligand_pos
            ) * lmask_f
            # types for the mid evaluation: greedy strided-posterior state
            # at s from the first prediction (what the next step would see)
            log_v_now = D.index_to_log_onehot(ligand_v, self.num_classes)
            s_eval = jnp.maximum(s, 0)
            log_post_mid = D.q_v_posterior_strided(
                self.v_sched, jax.nn.log_softmax(v0_from_e, axis=-1),
                log_v_now, t, s_eval, self.num_classes,
            )
            v_prop = jnp.argmax(log_post_mid, axis=-1)
            pos0_2, v0_2 = apply_model(x_prop, v_prop, s_eval)
            do_corr = (ts_pair["s"] >= 0).astype(ligand_pos.dtype)
            pos0_from_e = pos0_from_e + 0.5 * do_corr * (pos0_2 - pos0_from_e)
            # average the two type predictions in probability space
            p_avg = 0.5 * (
                jax.nn.softmax(v0_from_e, axis=-1) + jax.nn.softmax(v0_2, axis=-1)
            )
            log_avg = jnp.log(jnp.clip(p_avg, 1e-30, None))
            v0_from_e = v0_from_e + do_corr * (log_avg - v0_from_e)

        noise = jax.random.normal(k_pos, ligand_pos.shape, ligand_pos.dtype)
        if sampler in ("ddim", "dpm2"):
            ligand_pos_next = (
                ts_pair["cx0"] * pos0_from_e
                + ts_pair["cxt"] * ligand_pos
                + ts_pair["sig"] * noise
            )
        else:
            pos_model_mean = D.q_pos_posterior(self.pos_sched, pos0_from_e, ligand_pos, t)
            pos_log_variance = D.extract(self.pos_sched.posterior_logvar, t, 3)
            nonzero = (1.0 - (t == 0).astype(jnp.float32))[:, None, None]
            ligand_pos_next = pos_model_mean + nonzero * jnp.exp(0.5 * pos_log_variance) * noise
        ligand_pos = ligand_pos_next * lmask_f

        log_ligand_v_recon = jax.nn.log_softmax(v0_from_e, axis=-1)
        if pos_only:
            log_model_prob = log_ligand_v_recon  # unused
            ligand_v_next = ligand_v
        else:
            log_ligand_v = D.index_to_log_onehot(ligand_v, self.num_classes)
            if sampler in ("ddim", "dpm2"):
                log_post = D.q_v_posterior_strided(
                    self.v_sched, log_ligand_v_recon, log_ligand_v, t, s,
                    self.num_classes,
                )
                # final jump (s < 0): sample straight from the recon dist
                s_neg = (s < 0).astype(log_post.dtype)[:, None, None]
                log_model_prob = (1.0 - s_neg) * log_post + s_neg * log_ligand_v_recon
            else:
                log_model_prob = D.q_v_posterior(
                    self.v_sched, log_ligand_v_recon, log_ligand_v, t, self.num_classes
                )
            ligand_v_next = D.log_sample_categorical(k_v, log_model_prob)
        ligand_v = ligand_v_next

        ys = {}
        if return_traj:
            ys["pos"] = ligand_pos + offset
            ys["v"] = ligand_v
        if return_v_probs:
            ys["v0"] = log_ligand_v_recon
            ys["vt"] = log_model_prob
        return (ligand_pos, ligand_v, k), ys

    def sample_diffusion(
        self,
        params,
        key: jax.Array,
        batch: ComplexBatch,
        init_ligand_pos: jnp.ndarray,
        init_ligand_v: jnp.ndarray,
        num_steps: Optional[int] = None,
        center_pos_mode: Optional[str] = None,
        pos_only: bool = False,
        return_traj: bool = False,
        return_v_probs: bool = False,
        impl: str = "xla",  # 'xla' | 'fast' (fused Pallas kernels)
        dtype=jnp.bfloat16,
        scan_chunk: Optional[int] = 100,
        sampler: str = "ddpm",  # 'ddpm' | 'ddim' (strided, arbitrary jumps)
        eta: float = 0.0,  # ddim stochasticity (0 = deterministic positions)
        ddim_spacing: str = "uniform",  # 'uniform' | 'quadratic' (denser at low t)
    ) -> SampleResult:
        """Full reverse DDPM as on-device `lax.scan`
        (reference: models/molopt_score_model.py:633-703, which loops in
        Python and offloads the trajectory every step).

        `scan_chunk`: split the scan into chunks of this many steps with a
        host dispatch between chunks (one compile, reused). Long single
        device executions (>~2 min) can trip RPC watchdogs on remote-attached
        TPUs; chunking costs ~1 dispatch per chunk. None = single scan.

        `sampler='ddpm'` (default) matches the reference exactly: with
        num_steps < T it runs the LAST num_steps of the schedule
        (truncation, molopt_score_model.py:649). `sampler='ddim'` instead
        STRIDES the full schedule over num_steps evenly-spaced timesteps
        (DDIM positions with stochasticity `eta`; strided D3PM posterior
        for atom types) — ~T/num_steps x faster at comparable quality; the
        reference has no counterpart.
        """
        if num_steps is None:
            num_steps = self.num_timesteps
        center_pos_mode = center_pos_mode or self.center_pos_mode
        lmask = batch.ligand_mask
        lmask_f = lmask.astype(jnp.float32)[..., None]

        protein_pos, init_ligand_pos, offset = D.center_pos_protein(
            batch.protein_pos, init_ligand_pos, batch.protein_mask, center_pos_mode
        )
        cbatch = batch._replace(protein_pos=protein_pos)

        if sampler in ("ddim", "dpm2"):
            # subsequence of the full schedule, descending; each step jumps
            # t -> s (the next entry; final jump s = -1). 'quadratic'
            # spacing spends more of the NFE budget at low t, where the
            # fine geometry (bond lengths -> stability) is decided.
            # 'dpm2' takes the same jump grid but spends TWO model
            # evaluations per jump (Heun correction) — NFE ~ 2*num_steps.
            if ddim_spacing == "quadratic":
                frac = np.linspace(0.0, 1.0, num_steps) ** 2
                grid = frac * (self.num_timesteps - 1)
            elif ddim_spacing == "uniform":
                grid = np.linspace(0, self.num_timesteps - 1, num_steps)
            else:
                raise ValueError(f"unknown ddim_spacing {ddim_spacing!r}")
            time_seq = np.unique(grid.round().astype(np.int64))[::-1].copy()
            s_seq = np.append(time_seq[1:], -1)
        elif sampler == "ddpm":
            time_seq = np.arange(self.num_timesteps - num_steps, self.num_timesteps)[::-1].copy()
            s_seq = time_seq - 1
        else:
            raise ValueError(
                f"unknown sampler {sampler!r} (want 'ddpm', 'ddim' or 'dpm2')"
            )

        def step(carry, ts_pair):
            return self._sample_step(
                params, cbatch, lmask_f, offset, carry, ts_pair,
                impl=impl, dtype=dtype, pos_only=pos_only,
                return_traj=return_traj, return_v_probs=return_v_probs,
                sampler=sampler, eta=eta,
            )

        ts_all = {
            "t": jnp.asarray(time_seq, jnp.int32),
            "s": jnp.asarray(s_seq, jnp.int32),
        }
        if sampler in ("ddim", "dpm2"):
            cx0, cxt, sig = D.ddim_pos_coefficients(
                np.asarray(jax.device_get(self.pos_sched.betas)), time_seq, s_seq, eta
            )
            ts_all.update(cx0=cx0, cxt=cxt, sig=sig)
        # chunking only works from op-by-op (eager) context; under an outer
        # jit trace everything inlines into one program anyway
        tracing = isinstance(init_ligand_pos, jax.core.Tracer)
        if scan_chunk is None or len(time_seq) <= scan_chunk or tracing:
            (ligand_pos, ligand_v, _), ys = jax.lax.scan(
                step, (init_ligand_pos, init_ligand_v, key), ts_all
            )
        else:
            # chunked: one jitted scan program per config, cached on the
            # model and reused across calls/batches
            chunk = scan_chunk
            cache_key = ("chunk_runner", impl, str(dtype), pos_only,
                         return_traj, return_v_probs, center_pos_mode,
                         sampler, eta)
            run_chunk = self._jit_cache.get(cache_key)
            if run_chunk is None:

                def runner(params_, cbatch_, lmask_f_, offset_, carry, ts):
                    def step_a(carry, ts_pair):
                        return self._sample_step(
                            params_, cbatch_, lmask_f_, offset_, carry, ts_pair,
                            impl=impl, dtype=dtype, pos_only=pos_only,
                            return_traj=return_traj, return_v_probs=return_v_probs,
                            sampler=sampler, eta=eta,
                        )

                    return jax.lax.scan(step_a, carry, ts)

                run_chunk = jax.jit(runner)
                self._jit_cache[cache_key] = run_chunk

            def ts_slice(lo, hi):
                return jax.tree_util.tree_map(lambda a: a[lo:hi], ts_all)

            carry = (init_ligand_pos, init_ligand_v, key)
            ys_parts = []
            n_full = len(time_seq) // chunk
            for ci in range(n_full):
                carry, ys_c = run_chunk(
                    params, cbatch, lmask_f, offset, carry,
                    ts_slice(ci * chunk, (ci + 1) * chunk),
                )
                ys_parts.append(ys_c)
            rem = len(time_seq) - n_full * chunk
            if rem:
                carry, ys_c = jax.lax.scan(
                    step, carry, ts_slice(n_full * chunk, len(time_seq))
                )
                ys_parts.append(ys_c)
            ligand_pos, ligand_v, _ = carry
            if ys_parts and ys_parts[0]:
                ys = {
                    k: jnp.concatenate([p[k] for p in ys_parts], axis=0)
                    for k in ys_parts[0]
                }
            else:
                ys = {}

        return SampleResult(
            pos=ligand_pos + offset,
            v=ligand_v,
            pos_traj=ys.get("pos"),
            v_traj=ys.get("v"),
            v0_traj=ys.get("v0"),
            vt_traj=ys.get("vt"),
        )

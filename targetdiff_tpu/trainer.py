"""Training loop machinery: functional train/eval steps, jitted with mesh
shardings, plus the TrainState pytree.

Mirrors the reference's train loop semantics (reference:
scripts/train_diffusion.py:116-208): protein-coordinate noise augmentation
(:122-123, std `train.pos_noise_std`), Adam + global-norm clip 8.0 (:135-137),
and validation over evenly-spaced fixed timesteps with atom-type AUROC
(:153-208) — but with gradient data-parallelism over the mesh's "dp" axis
(the reference is strictly single-GPU; see SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data.batch import ComplexBatch
from .models.score_model import DiffusionModel


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # per-timestep VLB statistics for importance time-sampling. The reference
    # allocates these buffers but never updates them, so its 'importance' mode
    # silently degrades to symmetric (molopt_score_model.py:269-270, :440-451);
    # here they are maintained as an EMA so the mode is actually usable.
    Lt_history: Any = None  # [T] float32
    Lt_count: Any = None  # [T] float32


def create_train_state(model: DiffusionModel, optimizer, key, example_batch) -> TrainState:
    params = model.init(key, example_batch)
    opt_state = optimizer.init(params)
    T = model.num_timesteps
    return TrainState(
        params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32),
        Lt_history=jnp.zeros((T,), jnp.float32), Lt_count=jnp.zeros((T,), jnp.float32),
    )


def _remat_variant(model: DiffusionModel) -> DiffusionModel:
    """Shallow model copy whose refine_net rematerializes each layer's
    [B,N,K,*] edge intermediates in the backward pass (flax nn.remat).
    Parameter structure is unchanged — the same params/checkpoints apply."""
    import copy as _copy

    m2 = _copy.copy(model)
    cfg2 = model.config.merged({"remat": True})
    m2.config = cfg2
    m2.net = model.net.clone(config=cfg2)
    return m2


def _xla_residual_bytes(model: DiffusionModel, batch: ComplexBatch) -> int:
    """Rough HBM estimate of the XLA backward's saved edge intermediates:
    per layer/pass ~8 [B,N,K,H]-sized f32 tensors. Used to auto-enable
    remat before the compiler OOMs (f32 XLA at batch>=32 on the flagship
    shape crashes this image's remote TPU compiler — PARITY.md)."""
    B = batch.num_graphs
    N = batch.protein_pos.shape[1] + batch.ligand_pos.shape[1]
    K = int(model.config.get("knn", 32))
    H = int(model.config.hidden_dim)
    L = int(model.config.num_layers) * int(model.config.get("num_blocks", 1))
    return B * N * K * H * L * 4 * 8


# auto-remat threshold: ~half of a v5e chip's 16 GB HBM left for params,
# activations of the forward, and compiler temporaries
_REMAT_BYTES = 6 * 1024**3


def make_train_step(
    model: DiffusionModel, optimizer, pos_noise_std: float = 0.0, mesh=None,
    time_sampling: str = "symmetric",  # 'symmetric' | 'importance'
    impl: str = "xla",  # 'xla' | 'fast' (Pallas layers with Pallas backwards)
    remat="auto",  # True | False | 'auto' (XLA impl only; fast recomputes in VMEM)
):
    """Returns train_step(state, batch, key) -> (state, metrics), jitted.

    With a mesh, params/opt_state are replicated (or mp-sharded) and the batch
    is sharded over dp; XLA inserts the gradient psum over ICI.

    remat: for impl='xla', 'auto' switches to a per-layer-rematerialized
    backward when the saved edge intermediates would exceed ~6 GB (the
    configs that can ONLY run XLA — EGNN, time_emb — would otherwise crash
    the compiler at TPU-appropriate batch sizes). The Pallas fast path
    recomputes in VMEM by construction and ignores this flag.
    """
    from .ops import diffusion as D

    model_remat = _remat_variant(model) if impl == "xla" and remat else None

    def train_step(state: TrainState, batch: ComplexBatch, key):
        # trace-time (static-shape) decision: re-jitted per batch shape anyway
        m = model
        if model_remat is not None and (
            remat is True or _xla_residual_bytes(model, batch) > _REMAT_BYTES
        ):
            m = model_remat
        key_noise, key_t, key_loss = jax.random.split(key, 3)
        if pos_noise_std > 0:
            noise = (
                jax.random.normal(key_noise, batch.protein_pos.shape, batch.protein_pos.dtype)
                * pos_noise_std
            )
            noise = noise * batch.protein_mask[..., None].astype(noise.dtype)
            batch = batch._replace(protein_pos=batch.protein_pos + noise)

        if time_sampling == "importance":
            t, _pt = D.sample_time_importance(
                key_t, batch.num_graphs, state.Lt_history, state.Lt_count
            )
        else:
            t = None

        def loss_fn(params):
            out = m.get_diffusion_loss(
                params, key_loss, batch, time_step=t, impl=impl
            )
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA update of per-timestep VLB stats. Duplicate timesteps within a
        # batch (common with symmetric/antithetic sampling at small T) are
        # reduced to a per-timestep mean BEFORE the EMA update, so the result
        # is deterministic and every duplicate contributes — a bare
        # .at[t].set() would keep one arbitrary graph's value.
        t_used = out["time_step"]
        vlb_graph = out["loss_pos_graph"] + model.loss_v_weight * out["loss_v_graph"]
        T = state.Lt_history.shape[0]
        sums = jnp.zeros((T,), vlb_graph.dtype).at[t_used].add(vlb_graph)
        counts = jnp.zeros((T,), vlb_graph.dtype).at[t_used].add(1.0)
        mean_vlb = sums / jnp.maximum(counts, 1.0)
        ema = jnp.where(
            state.Lt_count > 0, 0.9 * state.Lt_history + 0.1 * mean_vlb, mean_vlb
        )
        Lt_history = jnp.where(counts > 0, ema, state.Lt_history)
        Lt_count = state.Lt_count + counts

        metrics = {
            "loss": loss,
            "loss_pos": out["loss_pos"],
            "loss_v": out["loss_v"],
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1, Lt_history, Lt_count), metrics

    # Sharding strategy: the caller places state (replicated / mp-sharded via
    # parallel.mesh.param_shardings) and batch (dp-sharded via shard_batch)
    # onto the mesh; jit infers in_shardings from the placed arguments and
    # GSPMD propagates + inserts the gradient psum.
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model: DiffusionModel):
    """Validation loss at a fixed timestep per call
    (reference: scripts/train_diffusion.py:160-189 loops t over
    linspace(0, T-1, 10) and averages batch sums)."""

    @jax.jit
    def eval_step(params, batch: ComplexBatch, t_scalar, key):
        B = batch.num_graphs
        t = jnp.full((B,), t_scalar, jnp.int32)
        out = model.get_diffusion_loss(params, key, batch, time_step=t)
        return {
            "loss": out["loss"],
            "loss_pos": out["loss_pos"],
            "loss_v": out["loss_v"],
            "pred_v": out["pred_ligand_v"],
        }

    return eval_step


def atom_auroc(y_true: np.ndarray, y_prob: np.ndarray, mask: np.ndarray) -> float:
    """Mean per-class one-vs-rest AUROC weighted by class frequency
    (reference: scripts/train_diffusion.py:22-36)."""
    from sklearn.metrics import roc_auc_score

    y_true = y_true[mask]
    y_prob = y_prob[mask]
    scores = []
    weights = []
    for c in range(y_prob.shape[-1]):
        y_c = (y_true == c).astype(np.int32)
        if y_c.sum() == 0 or y_c.sum() == len(y_c):
            continue
        scores.append(roc_auc_score(y_c, y_prob[:, c]))
        weights.append(y_c.sum())
    if not scores:
        return float("nan")
    return float(np.average(scores, weights=weights))

"""Auto-remat for the XLA train fallback (VERDICT r3 #5).

f32 XLA training at batch >= 32 on the flagship shape crashes the remote TPU
compiler without rematerialization (PARITY.md known gap); the configs that
can ONLY run XLA (EGNN, time_emb>0) would land exactly there. These tests
pin: (a) the auto threshold fires at the crashing shape and not at the
reference batch 4, (b) the rematted B=32 flagship train step COMPILES on the
virtual backend, (c) EGNN accepts remat, (d) remat changes no numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _flagship
from targetdiff_tpu.config import Config
from targetdiff_tpu.trainer import (
    _REMAT_BYTES,
    _remat_variant,
    _xla_residual_bytes,
    create_train_state,
    make_train_step,
)
from targetdiff_tpu.utils.train import get_optimizer


def _opt():
    return get_optimizer(
        Config(dict(type="adam", lr=5e-4, weight_decay=0, beta1=0.95,
                    beta2=0.999, max_grad_norm=8.0))
    )


def _grow(batch, B):
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:1], (B,) + x.shape[1:]), batch
    )


def test_auto_threshold():
    model, b = _flagship(num_timesteps=100, max_protein=384, max_ligand=32, batch=4)
    assert _xla_residual_bytes(model, b) < _REMAT_BYTES  # reference batch 4: off
    assert _xla_residual_bytes(model, _grow(b, 32)) > _REMAT_BYTES  # crash shape: on


def test_remat_variant_same_params_different_net():
    model, b = _flagship(num_timesteps=100, max_protein=64, max_ligand=16, batch=2)
    m2 = _remat_variant(model)
    assert m2.net.config.get("remat") is True
    assert model.net.config.get("remat", False) is False
    p1 = model.init(jax.random.PRNGKey(0), b)
    p2 = m2.init(jax.random.PRNGKey(0), b)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)


def test_b32_flagship_xla_step_compiles():
    """The exact shape that crashed: flagship N=416, f32 XLA, batch 32.
    Compile-level check on the virtual CPU backend (no execution — the
    compiled step would take minutes on CPU)."""
    model, b = _flagship(num_timesteps=1000, max_protein=384, max_ligand=32, batch=2)
    b32 = _grow(b, 32)
    state = create_train_state(model, _opt(), jax.random.PRNGKey(0), b)
    step = make_train_step(model, _opt(), pos_noise_std=0.1, impl="xla", remat="auto")
    lowered = jax.jit(step._fun if hasattr(step, "_fun") else step).lower(
        state, b32, jax.random.PRNGKey(1)
    )
    compiled = lowered.compile()
    # remat shows up as Optimization-barrier/custom checkpoint regions; the
    # load-bearing assertion is that compilation succeeds at this shape
    assert compiled is not None


def test_remat_numerics_identical():
    model, b = _flagship(num_timesteps=100, max_protein=48, max_ligand=16, batch=2)
    key = jax.random.PRNGKey(3)
    # the train step donates its state argument — build one per call
    state = create_train_state(model, _opt(), jax.random.PRNGKey(0), b)
    s_off = make_train_step(model, _opt(), impl="xla", remat=False)(state, b, key)
    state = create_train_state(model, _opt(), jax.random.PRNGKey(0), b)
    s_on = make_train_step(model, _opt(), impl="xla", remat=True)(state, b, key)
    np.testing.assert_allclose(
        float(s_off[1]["loss"]), float(s_on[1]["loss"]), rtol=1e-5
    )
    g1 = jax.tree_util.tree_leaves(s_off[0].params)
    g2 = jax.tree_util.tree_leaves(s_on[0].params)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=5e-4, atol=1e-6)


def test_egnn_remat_runs():
    from targetdiff_tpu.data.batch import ComplexBatch
    from targetdiff_tpu.models.score_model import DiffusionModel

    cfg = Config(
        dict(
            model_mean_type="C0", beta_schedule="sigmoid", beta_start=1e-7,
            beta_end=2e-3, v_beta_schedule="cosine", v_beta_s=0.01,
            num_diffusion_timesteps=100, loss_v_weight=100.0,
            sample_time_method="symmetric", time_emb_dim=0,
            time_emb_mode="simple", center_pos_mode="protein",
            node_indicator=True, model_type="egnn", num_blocks=1, num_layers=2,
            hidden_dim=32, n_heads=4, edge_feat_dim=4, num_r_gaussian=1,
            knn=8, num_node_types=8, act_fn="silu", norm=False,
            cutoff_mode="knn", ew_net_type="global", num_x2h=1, num_h2x=1,
            r_max=10.0, x2h_out_fc=False, sync_twoup=False, remat=True,
        )
    )
    model = DiffusionModel(cfg, 27, 13, max_protein=32, max_ligand=8)
    rng = np.random.default_rng(0)
    b = ComplexBatch(
        protein_pos=jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32) * 4),
        protein_feat=jnp.asarray((rng.random((2, 32, 27)) > 0.8).astype(np.float32)),
        protein_mask=jnp.ones((2, 32), bool),
        ligand_pos=jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32)),
        ligand_v=jnp.asarray(rng.integers(0, 13, (2, 8)).astype(np.int32)),
        ligand_mask=jnp.ones((2, 8), bool),
    )
    state = create_train_state(model, _opt(), jax.random.PRNGKey(0), b)
    step = make_train_step(model, _opt(), impl="xla", remat=True)
    state, metrics = step(state, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

"""Coverage of the less-traveled model configurations: 'noise' mean type,
sin/simple time embeddings, hybrid cutoff, pos_only sampling, return_all,
importance time sampling, likelihood prior term."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from targetdiff_tpu.models.score_model import DiffusionModel
from targetdiff_tpu.ops import diffusion as D
from tests.test_model import NUM_CLASSES, PROTEIN_DIM, model_config, random_batch


def test_noise_mean_type_loss_and_sample():
    cfg = model_config(model_mean_type="noise")
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    batch = random_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.get_diffusion_loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(out["loss"]))
    res = model.sample_diffusion(
        params, jax.random.PRNGKey(2), batch,
        jax.random.normal(jax.random.PRNGKey(3), batch.ligand_pos.shape),
        jnp.zeros(batch.ligand_v.shape, jnp.int32), num_steps=4,
    )
    assert np.isfinite(np.asarray(res.pos)).all()


@pytest.mark.parametrize("mode,dim", [("simple", 1), ("sin", 8)])
def test_time_embeddings(mode, dim):
    cfg = model_config(time_emb_dim=dim if mode == "sin" else 1, time_emb_mode=mode)
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    batch = random_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    t = jnp.array([3, 9])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, t)
    assert np.isfinite(np.asarray(preds["pred_ligand_pos"])).all()
    # outputs must actually depend on t
    preds2 = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, t * 0)
    assert not np.allclose(
        np.asarray(preds["pred_ligand_v"]), np.asarray(preds2["pred_ligand_v"])
    )


def test_hybrid_cutoff_forward():
    cfg = model_config(cutoff_mode="hybrid", knn=4)
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    batch = random_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, jnp.array([1, 2]))
    assert np.isfinite(np.asarray(preds["pred_ligand_pos"])).all()


def test_pos_only_sampling():
    cfg = model_config()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    batch = random_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    res = model.sample_diffusion(
        params, jax.random.PRNGKey(1), batch, batch.ligand_pos, batch.ligand_v,
        num_steps=4, pos_only=True,
    )
    np.testing.assert_array_equal(np.asarray(res.v), np.asarray(batch.ligand_v))


def test_return_all_layers():
    cfg = model_config()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    batch = random_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    preds = model.apply(
        params, batch, batch.ligand_pos, batch.ligand_v, jnp.array([0, 1]), return_all=True
    )
    assert len(preds["layer_pred_ligand_pos"]) == 2  # input + 1 block
    assert len(preds["layer_pred_ligand_v"]) == 2


def test_importance_time_sampling():
    key = jax.random.PRNGKey(0)
    hist = jnp.linspace(1.0, 2.0, 100)
    # not ready -> symmetric fallback
    t, pt = D.sample_time_importance(key, 6, hist, jnp.zeros(100))
    np.testing.assert_allclose(np.asarray(pt), 1 / 100, rtol=1e-6)
    # ready -> importance weighted
    t, pt = D.sample_time_importance(key, 600, hist, jnp.full(100, 11.0))
    t = np.asarray(t)
    assert (t >= 0).all() and (t < 100).all()
    assert np.asarray(pt).std() > 0  # non-uniform proposal


def test_likelihood_prior_vs_step_terms():
    cfg = model_config()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    batch = random_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    T = model.num_timesteps
    # prior (t == T)
    kp, kv = model.likelihood_estimation(
        params, jax.random.PRNGKey(1), batch, jnp.full((2,), T, jnp.int32)
    )
    assert kp.shape == (2,) and np.isfinite(np.asarray(kp)).all()
    assert (np.asarray(kv) >= -1e-5).all()
    # mid-chain
    kp2, kv2 = model.likelihood_estimation(
        params, jax.random.PRNGKey(1), batch, jnp.array([5, 12], jnp.int32)
    )
    assert np.isfinite(np.asarray(kp2)).all() and np.isfinite(np.asarray(kv2)).all()


def test_scan_chunking_matches_single_scan():
    cfg = model_config()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    batch = random_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    init_pos = jax.random.normal(jax.random.PRNGKey(3), batch.ligand_pos.shape)
    init_v = jnp.zeros(batch.ligand_v.shape, jnp.int32)
    a = model.sample_diffusion(params, jax.random.PRNGKey(4), batch, init_pos, init_v,
                               num_steps=12, scan_chunk=None)
    b = model.sample_diffusion(params, jax.random.PRNGKey(4), batch, init_pos, init_v,
                               num_steps=12, scan_chunk=5)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))


def test_remat_matches_no_remat():
    """jax.checkpoint'd layers must give identical loss and gradients."""
    batch = random_batch()
    grads = {}
    for remat in (False, True):
        cfg = model_config(remat=remat)
        model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
        params = model.init(jax.random.PRNGKey(0), batch)
        loss_fn = lambda p: model.get_diffusion_loss(p, jax.random.PRNGKey(1), batch)["loss"]
        l, g = jax.value_and_grad(loss_fn)(params)
        grads[remat] = (float(l), g)
    assert grads[False][0] == pytest.approx(grads[True][0], rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads[False][1]), jax.tree_util.tree_leaves(grads[True][1])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

"""Denoiser + diffusion model tests: shapes, SE(3) equivariance, padding
invariance, loss finiteness, tiny end-to-end sampling.

Equivariance strategy follows the reference's RandomRotation construction
(QR-orthogonalized random matrix, utils/transforms.py:172-183): rotating and
translating inputs must rotate predicted coordinates and leave type logits
unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from targetdiff_tpu.config import Config
from targetdiff_tpu.data.batch import ComplexBatch
from targetdiff_tpu.models.score_model import DiffusionModel

PROTEIN_DIM = 27
NUM_CLASSES = 13


def model_config(**over):
    cfg = dict(
        model_mean_type="C0",
        beta_schedule="sigmoid",
        beta_start=1e-7,
        beta_end=2e-3,
        v_beta_schedule="cosine",
        v_beta_s=0.01,
        num_diffusion_timesteps=20,
        loss_v_weight=100.0,
        sample_time_method="symmetric",
        time_emb_dim=0,
        time_emb_mode="simple",
        center_pos_mode="protein",
        node_indicator=True,
        model_type="uni_o2",
        num_blocks=1,
        num_layers=2,
        hidden_dim=32,
        n_heads=4,
        edge_feat_dim=4,
        num_r_gaussian=20,
        knn=8,
        num_node_types=8,
        act_fn="relu",
        norm=True,
        cutoff_mode="knn",
        ew_net_type="global",
        num_x2h=1,
        num_h2x=1,
        r_max=10.0,
        x2h_out_fc=False,
        sync_twoup=False,
    )
    cfg.update(over)
    return Config(cfg)


def random_batch(key=0, B=2, NP_=16, NL=6, np_valid=(14, 16), nl_valid=(5, 6)):
    rng = np.random.default_rng(key)
    ppos = rng.normal(size=(B, NP_, 3)).astype(np.float32) * 3
    pfeat = (rng.random((B, NP_, PROTEIN_DIM)) > 0.7).astype(np.float32)
    lpos = rng.normal(size=(B, NL, 3)).astype(np.float32)
    lv = rng.integers(0, NUM_CLASSES, (B, NL)).astype(np.int32)
    pmask = np.zeros((B, NP_), bool)
    lmask = np.zeros((B, NL), bool)
    for b in range(B):
        pmask[b, : np_valid[b]] = True
        lmask[b, : nl_valid[b]] = True
    return ComplexBatch(
        jnp.asarray(ppos), jnp.asarray(pfeat), jnp.asarray(pmask),
        jnp.asarray(lpos), jnp.asarray(lv), jnp.asarray(lmask),
    )


@pytest.fixture(scope="module", params=["uni_o2", "egnn"])
def model_and_params(request):
    cfg = model_config(model_type=request.param)
    batch = random_batch()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=6)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    batch = random_batch()
    t = jnp.array([3, 7])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, t)
    assert preds["pred_ligand_pos"].shape == (2, 6, 3)
    assert preds["pred_ligand_v"].shape == (2, 6, NUM_CLASSES)
    assert np.isfinite(np.asarray(preds["pred_ligand_pos"])).all()
    assert np.isfinite(np.asarray(preds["pred_ligand_v"])).all()


def random_rotation(seed):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    return Q.astype(np.float32)


def test_equivariance(model_and_params):
    """Rotate+translate the whole complex: predicted positions co-transform,
    type logits are invariant."""
    model, params = model_and_params
    batch = random_batch()
    t = jnp.array([3, 7])
    Q = random_rotation(5)
    shift = np.array([1.5, -2.0, 0.5], np.float32)

    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, t)

    rot = lambda x: jnp.asarray((np.asarray(x) + shift) @ Q)
    batch_r = batch._replace(protein_pos=rot(batch.protein_pos))
    preds_r = model.apply(params, batch_r, rot(batch.ligand_pos), batch.ligand_v, t)

    lmask = np.asarray(batch.ligand_mask)[..., None]
    # positions: global translation is removed by protein-COM centering inside
    # forward? No — forward does not center; the caller does. So compare with
    # the transform applied to raw outputs.
    expected = (np.asarray(preds["pred_ligand_pos"]) + shift) @ Q
    got = np.asarray(preds_r["pred_ligand_pos"])
    np.testing.assert_allclose(got * lmask, expected * lmask, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(preds_r["pred_ligand_v"]) * lmask,
        np.asarray(preds["pred_ligand_v"]) * lmask,
        atol=2e-3,
    )


def test_padding_invariance(model_and_params):
    """Extra padded slots must not change predictions for real atoms."""
    model, params = model_and_params
    batch = random_batch()
    t = jnp.array([3, 7])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, t)

    # widen padding: append 4 protein slots and 2 ligand slots of garbage
    def pad(x, n, fill=0.0):
        pad_shape = (x.shape[0], n) + x.shape[2:]
        return jnp.concatenate([x, jnp.full(pad_shape, fill, x.dtype)], axis=1)

    wide = ComplexBatch(
        protein_pos=pad(batch.protein_pos, 4, 37.0),
        protein_feat=pad(batch.protein_feat, 4, 1.0),
        protein_mask=pad(batch.protein_mask, 4, False),
        ligand_pos=pad(batch.ligand_pos, 2, -11.0),
        ligand_v=pad(batch.ligand_v, 2, 0),
        ligand_mask=pad(batch.ligand_mask, 2, False),
    )
    preds_w = model.apply(params, wide, wide.ligand_pos, wide.ligand_v, t)
    lmask = np.asarray(batch.ligand_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(preds_w["pred_ligand_pos"])[:, :6] * lmask,
        np.asarray(preds["pred_ligand_pos"]) * lmask,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(preds_w["pred_ligand_v"])[:, :6] * lmask,
        np.asarray(preds["pred_ligand_v"]) * lmask,
        atol=1e-4,
    )


def test_diffusion_loss(model_and_params):
    model, params = model_and_params
    batch = random_batch()
    out = model.get_diffusion_loss(params, jax.random.PRNGKey(1), batch)
    for k in ("loss", "loss_pos", "loss_v"):
        val = float(out[k])
        assert np.isfinite(val) and val >= 0
    assert float(out["loss"]) == pytest.approx(
        float(out["loss_pos"]) + 100.0 * float(out["loss_v"]), rel=1e-5
    )


def test_loss_grad_finite(model_and_params):
    model, params = model_and_params
    batch = random_batch()

    def loss_fn(p):
        return model.get_diffusion_loss(p, jax.random.PRNGKey(2), batch)["loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient is nonzero
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_sample_diffusion_runs(model_and_params):
    model, params = model_and_params
    batch = random_batch()
    key = jax.random.PRNGKey(3)
    init_pos = jax.random.normal(key, batch.ligand_pos.shape)
    init_v = jnp.zeros(batch.ligand_v.shape, jnp.int32)
    res = model.sample_diffusion(
        params, key, batch, init_pos, init_v, num_steps=5, return_traj=True
    )
    assert res.pos.shape == batch.ligand_pos.shape
    assert res.v.shape == batch.ligand_v.shape
    assert res.pos_traj.shape == (5,) + batch.ligand_pos.shape
    assert np.isfinite(np.asarray(res.pos)).all()
    v = np.asarray(res.v)
    assert (v >= 0).all() and (v < NUM_CLASSES).all()

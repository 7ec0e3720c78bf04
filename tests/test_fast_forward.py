"""Parity of the fused Pallas forward (interpret mode on CPU) against the XLA
flax forward, on the flagship architecture at small width."""

import jax
import jax.numpy as jnp
import numpy as np

from targetdiff_tpu.config import Config
from targetdiff_tpu.data.batch import ComplexBatch
from targetdiff_tpu.models.score_model import DiffusionModel

PROTEIN_DIM = 27
NUM_CLASSES = 13


def small_flagship():
    return Config(
        dict(
            model_mean_type="C0", beta_schedule="sigmoid", beta_start=1e-7, beta_end=2e-3,
            v_beta_schedule="cosine", v_beta_s=0.01, num_diffusion_timesteps=10,
            loss_v_weight=100.0, sample_time_method="symmetric", time_emb_dim=0,
            time_emb_mode="simple", center_pos_mode="protein", node_indicator=True,
            model_type="uni_o2", num_blocks=1, num_layers=2, hidden_dim=32, n_heads=4,
            edge_feat_dim=4, num_r_gaussian=20, knn=8, num_node_types=8, act_fn="relu",
            norm=True, cutoff_mode="knn", ew_net_type="global", num_x2h=1, num_h2x=1,
            r_max=10.0, x2h_out_fc=False, sync_twoup=False,
        )
    )


def batch_mult8(B=2, NP_=16, NL=8):
    rng = np.random.default_rng(0)
    pmask = np.ones((B, NP_), bool)
    pmask[0, 14:] = False
    lmask = np.ones((B, NL), bool)
    lmask[1, 6:] = False
    return ComplexBatch(
        jnp.asarray(rng.normal(size=(B, NP_, 3)).astype(np.float32) * 3),
        jnp.asarray((rng.random((B, NP_, PROTEIN_DIM)) > 0.7).astype(np.float32)),
        jnp.asarray(pmask),
        jnp.asarray(rng.normal(size=(B, NL, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, NUM_CLASSES, (B, NL)).astype(np.int32)),
        jnp.asarray(lmask),
    )


import pytest


@pytest.mark.parametrize("mode", ["layers", "mega"])
def test_fast_forward_matches_xla(mode):
    cfg = small_flagship()
    batch = batch_mult8()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=8)
    params = model.init(jax.random.PRNGKey(0), batch)
    t = jnp.array([3, 7])

    ref = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, t)
    fast = model.fast_apply(
        params, batch, batch.ligand_pos, batch.ligand_v, t,
        dtype=jnp.float32, interpret=True, mode=mode,
    )

    lmask = np.asarray(batch.ligand_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(fast["pred_ligand_pos"]) * lmask,
        np.asarray(ref["pred_ligand_pos"]) * lmask,
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(fast["pred_ligand_v"]) * lmask,
        np.asarray(ref["pred_ligand_v"]) * lmask,
        atol=2e-3, rtol=1e-2,
    )


def test_fast_forward_equivariance():
    """The fused path must keep SE(3) equivariance (rotation+translation)."""
    cfg = small_flagship()
    batch = batch_mult8()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=8)
    params = model.init(jax.random.PRNGKey(0), batch)
    t = jnp.array([3, 7])

    Q, _ = np.linalg.qr(np.random.default_rng(7).normal(size=(3, 3)))
    Q = Q.astype(np.float32)
    shift = np.array([2.0, -1.0, 0.5], np.float32)
    rot = lambda x: jnp.asarray((np.asarray(x) + shift) @ Q)

    out = model.fast_apply(params, batch, batch.ligand_pos, batch.ligand_v, t,
                           dtype=jnp.float32, interpret=True)
    out_r = model.fast_apply(
        params, batch._replace(protein_pos=rot(batch.protein_pos)),
        rot(batch.ligand_pos), batch.ligand_v, t, dtype=jnp.float32, interpret=True,
    )
    lmask = np.asarray(batch.ligand_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(out_r["pred_ligand_pos"]) * lmask,
        ((np.asarray(out["pred_ligand_pos"]) + shift) @ Q) * lmask,
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_r["pred_ligand_v"]) * lmask,
        np.asarray(out["pred_ligand_v"]) * lmask, atol=2e-3,
    )


def test_mega_olcache_free_regeo_matches_xla():
    """ADVICE r3: the olcache-FREE regeo branch (ligand tail 128-aligned,
    N - n_ligand == 128, i.e. the flagship N=416/NLIG=32 alignment class
    where regeo reuses ocache[:, NPAD:N] as the ligand one-hot) had no
    interpret-mode coverage — every other parity test uses N=24 where
    _needs_olcache is true. Multi-layer forward so regeo actually runs."""
    from targetdiff_tpu.ops.pallas.block_denoiser import _needs_olcache

    NP_, NL = 128, 32
    assert not _needs_olcache(NP_ + NL, NL)
    cfg = small_flagship()
    rng = np.random.default_rng(1)
    pmask = np.ones((2, NP_), bool)
    pmask[0, 120:] = False
    lmask = np.ones((2, NL), bool)
    lmask[1, 28:] = False
    batch = ComplexBatch(
        jnp.asarray(rng.normal(size=(2, NP_, 3)).astype(np.float32) * 4),
        jnp.asarray((rng.random((2, NP_, PROTEIN_DIM)) > 0.7).astype(np.float32)),
        jnp.asarray(pmask),
        jnp.asarray(rng.normal(size=(2, NL, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, NUM_CLASSES, (2, NL)).astype(np.int32)),
        jnp.asarray(lmask),
    )
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=NP_, max_ligand=NL)
    params = model.init(jax.random.PRNGKey(0), batch)
    t = jnp.array([3, 7])

    ref = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, t)
    fast = model.fast_apply(
        params, batch, batch.ligand_pos, batch.ligand_v, t,
        dtype=jnp.float32, interpret=True, mode="mega",
    )
    lm = np.asarray(batch.ligand_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(fast["pred_ligand_pos"]) * lm,
        np.asarray(ref["pred_ligand_pos"]) * lm, atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(fast["pred_ligand_v"]) * lm,
        np.asarray(ref["pred_ligand_v"]) * lm, atol=2e-3, rtol=1e-2,
    )


def test_knn_pallas_matches_xla():
    from targetdiff_tpu.ops import graph as G
    from targetdiff_tpu.ops.pallas.knn import knn_graph_pallas

    rng = np.random.default_rng(0)
    B, N, K = 3, 24, 5
    pos = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 3)
    mask = jnp.asarray(rng.random((B, N)) > 0.2)
    ref = G.knn_graph(pos, mask, K)
    idx, nm = knn_graph_pallas(pos, mask, k=K, interpret=True)
    ref_idx, ref_m = np.asarray(ref.idx), np.asarray(ref.mask)
    got_idx, got_m = np.asarray(idx), np.asarray(nm)
    for b in range(B):
        for i in range(N):
            assert set(got_idx[b, i][got_m[b, i]]) == set(ref_idx[b, i][ref_m[b, i]]), (b, i)


@pytest.mark.parametrize("mode", ["layers", "mega"])
def test_fetch_embedding_fast_matches_xla(mode):
    """fix_x fast path: frozen-coordinate embedding export on the fused
    kernels (VERDICT round-1 item 7; reference molopt_score_model.py:619-631)."""
    cfg = small_flagship()
    batch = batch_mult8()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=8)
    params = model.init(jax.random.PRNGKey(0), batch)

    ref = model.fetch_embedding(params, batch)
    fast = model.fast_apply(
        params, batch, batch.ligand_pos, batch.ligand_v, None,
        dtype=jnp.float32, interpret=True, mode=mode, fix_x=True,
    )
    lm = np.asarray(batch.ligand_mask)[..., None]
    # coordinates must be exactly frozen on the fast path
    np.testing.assert_allclose(
        np.asarray(fast["pred_ligand_pos"]) * lm,
        np.asarray(batch.ligand_pos) * lm, atol=1e-6,
    )
    for key in ("final_ligand_h", "pred_ligand_v"):
        a = np.asarray(ref[key]) * lm
        b = np.asarray(fast[key]) * lm
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-2)


@pytest.mark.parametrize("mode", ["layers", "mega"])
def test_fast_forward_hybrid_cutoff_matches_xla(mode):
    """Hybrid connectivity on the fused kernels: same dense neighborhood
    format, K' = max_ligand - 1 + knn (reference models/common.py:165-212)."""
    cfg = small_flagship()
    cfg.cutoff_mode = "hybrid"
    batch = batch_mult8()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=16, max_ligand=8)
    params = model.init(jax.random.PRNGKey(0), batch)
    t = jnp.array([3, 7])

    ref = model.apply(params, batch, batch.ligand_pos, batch.ligand_v, t)
    fast = model.fast_apply(
        params, batch, batch.ligand_pos, batch.ligand_v, t,
        dtype=jnp.float32, interpret=True, mode=mode,
    )
    lm = np.asarray(batch.ligand_mask)[..., None]
    for key in ("pred_ligand_pos", "pred_ligand_v", "final_ligand_h"):
        a = np.asarray(ref[key]) * lm
        b = np.asarray(fast[key]) * lm
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-2)

"""Round-5 train-path work flags (block_vjp._block_fwd_rule): the
dependency-cone tile skipping must be EXACT for the training loss and every
parameter gradient.

The training loss consumes only ligand rows (score_model loss /
v_inference read h[:, NP:]), so a protein h row whose value never reaches a
ligand output has identically-zero cotangent — the skip changes no consumed
forward value and contributes exact zeros through the fused backward's
checkpoint recompute. Verified on a two-cluster geometry (far cluster 100 A
away: never a neighbor of the ligand side, so its tiles are regeo-clean and
cone-dead at every layer):

1. cone-flagged grads are BITWISE identical to the same run with all-ones
   (compute-everything) flags — same tiling, only the pl.when predicates
   differ, isolating the skipping itself;
2. the full production mode (cone + protein sort) matches the round-4
   all-dirty baseline within f32 reorder tolerance (sort + tile-size changes
   alter accumulation order only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import targetdiff_tpu.models.fast_forward as FF
import targetdiff_tpu.ops.pallas.block_vjp as BV
from targetdiff_tpu.data.batch import ComplexBatch
from targetdiff_tpu.models.score_model import DiffusionModel
from tests.test_fast_forward import NUM_CLASSES, PROTEIN_DIM, small_flagship

NP_, NL = 40, 8  # N=48: cone tile 24 -> 2 x2h tiles, far tile fully dead


def _two_cluster_batch(B=2):
    rng = np.random.default_rng(0)
    ppos = np.zeros((B, NP_, 3), np.float32)
    ppos[:, :32] = rng.normal(size=(B, 32, 3)).astype(np.float32) * 2 + np.array(
        [100.0, 0, 0], np.float32
    )
    ppos[:, 32:] = rng.normal(size=(B, NP_ - 32, 3)).astype(np.float32) * 2
    pmask = np.ones((B, NP_), bool)
    pmask[0, 38:] = False
    lmask = np.ones((B, NL), bool)
    lmask[1, 6:] = False
    return ComplexBatch(
        jnp.asarray(ppos),
        jnp.asarray((rng.random((B, NP_, PROTEIN_DIM)) > 0.7).astype(np.float32)),
        jnp.asarray(pmask),
        jnp.asarray(rng.normal(size=(B, NL, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, NUM_CLASSES, (B, NL)).astype(np.int32)),
        jnp.asarray(lmask),
    )


@pytest.fixture
def _restore_toggles():
    saved = (FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS)
    yield
    FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS = saved


def _loss_and_grads(model, params, batch):
    key = jax.random.PRNGKey(5)
    t = jnp.array([2, 7])

    def loss(p):
        return model.get_diffusion_loss(p, key, batch, time_step=t, impl="fast")["loss"]

    return jax.value_and_grad(loss)(params)


def _setup():
    cfg = small_flagship()
    batch = _two_cluster_batch()
    model = DiffusionModel(cfg, PROTEIN_DIM, NUM_CLASSES, max_protein=NP_, max_ligand=NL)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_cone_flags_bitwise_exact(_restore_toggles, monkeypatch):
    """Computed cone flags vs all-ones flags, same tiling/sort: the skipped
    tiles must contribute NOTHING to loss or any parameter gradient."""
    model, params, batch = _setup()
    FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS = True, True, True
    la, ga = _loss_and_grads(model, params, batch)

    from targetdiff_tpu.ops.pallas import block_denoiser as BD

    real = BD.compute_tile_flags
    monkeypatch.setattr(
        BD, "compute_tile_flags", lambda *a, **k: jnp.ones_like(real(*a, **k))
    )
    lb, gb = _loss_and_grads(model, params, batch)

    assert float(la) == float(lb)
    fa = jax.tree_util.tree_leaves(ga)
    fb = jax.tree_util.tree_leaves(gb)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flags_skip_real_work(_restore_toggles):
    """Sanity: the two-cluster geometry genuinely produces dead/clean tiles
    (otherwise the bitwise test proves nothing)."""
    from targetdiff_tpu.ops import graph as G
    from targetdiff_tpu.ops.pallas.block_denoiser import (
        choose_rtile,
        choose_x2h_tile,
        compute_tile_flags,
    )

    batch = _two_cluster_batch()
    N = NP_ + NL
    x = jnp.concatenate([batch.protein_pos, batch.ligand_pos], axis=1)
    mask = jnp.concatenate([batch.protein_mask, batch.ligand_mask], axis=1)
    # production sort: far cluster lands in the leading rows
    h = jnp.zeros(x.shape[:2] + (8,), jnp.float32)
    _, xs, ms, _ = FF._sort_protein_rows(h, x, mask, NP_)
    nbh = G.knn_graph(xs, ms, 8)
    L = small_flagship().num_layers
    tile = choose_x2h_tile(N, True)
    rtile = choose_rtile(N, True)
    TR = N // rtile
    T = N // tile
    flags = np.asarray(
        compute_tile_flags(nbh.idx, nbh.mask, NL, tile=tile, rtile=rtile, num_layers=L)
    )
    x2h = flags[:, L * TR :].reshape(-1, L, T)
    assert (x2h == 0).any(), "expected at least one dead x2h tile"


def test_production_mode_matches_all_dirty_baseline(_restore_toggles):
    """cone+sort (production) vs round-4 all-dirty no-sort baseline: loss
    and every parameter gradient agree to f32 reorder tolerance."""
    model, params, batch = _setup()
    FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS = True, True, True
    la, ga = _loss_and_grads(model, params, batch)
    FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS = False, False, False
    lb, gb = _loss_and_grads(model, params, batch)

    assert abs(float(la) - float(lb)) / max(abs(float(lb)), 1.0) < 1e-4
    fa, tree_a = jax.tree_util.tree_flatten_with_path(ga)
    fb = jax.tree_util.tree_leaves(gb)
    for (path, a), b in zip(fa, fb):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )

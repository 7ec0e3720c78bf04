"""Sampling pipeline tests including the mesh-sharded multi-pocket path on
8 virtual CPU devices (replacement for batch_sample_diffusion.sh)."""

import jax
import numpy as np

from targetdiff_tpu.models.score_model import DiffusionModel
from targetdiff_tpu.parallel.mesh import make_mesh
from targetdiff_tpu.sampling import sample_testset_sharded
from tests.test_model import model_config


def make_pocket(seed, n=24):
    rng = np.random.default_rng(seed)
    return {
        "protein_pos": rng.normal(size=(n, 3)).astype(np.float32) * 5,
        "protein_feat": (rng.random((n, 27)) > 0.7).astype(np.float32),
    }


def test_sharded_testset_sampling():
    assert len(jax.devices()) == 8
    cfg = model_config(num_diffusion_timesteps=8)
    model = DiffusionModel(cfg, 27, 13, max_protein=32, max_ligand=8)

    from targetdiff_tpu.data.batch import pad_complex

    dummy = pad_complex(
        np.zeros((8, 3), np.float32), np.zeros((8, 27), np.float32),
        np.zeros((2, 3), np.float32), np.zeros((2,), np.int32), 8, 8,
    )
    params = model.init(jax.random.PRNGKey(0), dummy)

    pockets = [make_pocket(i) for i in range(3)]
    mesh = make_mesh(n_dp=8, n_mp=1)
    results = sample_testset_sharded(
        model, params, pockets, num_samples_per_pocket=4,
        key=jax.random.PRNGKey(1), mesh=mesh, num_steps=8,
        max_protein=32, max_ligand=8,
    )
    assert len(results) == 3
    for pi, r in enumerate(results):
        assert len(r["pos"]) == 4
        for pos, v in zip(r["pos"], r["v"]):
            assert len(pos) == len(v) >= 1
            assert np.isfinite(pos).all()
            com = pockets[pi]["protein_pos"].mean(0)
            assert np.linalg.norm(np.asarray(pos).mean(0) - com) < 100


def test_sharded_testset_chunked_full_scale():
    """Driver-scale workload shape (100 pockets x 100 samples) through the
    HBM-bounded chunked path: peak in-flight rows = chunk_rows, pockets
    uploaded once to the device bank (VERDICT round-1 item 4)."""
    assert len(jax.devices()) == 8
    cfg = model_config(num_diffusion_timesteps=2)
    model = DiffusionModel(cfg, 27, 13, max_protein=32, max_ligand=8)

    from targetdiff_tpu.data.batch import pad_complex

    dummy = pad_complex(
        np.zeros((8, 3), np.float32), np.zeros((8, 27), np.float32),
        np.zeros((2, 3), np.float32), np.zeros((2,), np.int32), 8, 8,
    )
    params = model.init(jax.random.PRNGKey(0), dummy)

    pockets = [make_pocket(i, n=16 + (i % 3) * 4) for i in range(100)]
    mesh = make_mesh(n_dp=8, n_mp=1)
    results = sample_testset_sharded(
        model, params, pockets, num_samples_per_pocket=100,
        key=jax.random.PRNGKey(1), mesh=mesh, num_steps=2,
        max_protein=32, max_ligand=8, chunk_rows=512,
    )
    assert len(results) == 100
    total = 0
    for pi, r in enumerate(results):
        assert len(r["pos"]) == 100 and len(r["v"]) == 100
        for pos, v in zip(r["pos"], r["v"]):
            assert pos is not None and len(pos) == len(v) >= 1
            assert np.isfinite(np.asarray(pos)).all()
            total += 1
    assert total == 10000


def test_choose_protein_padding_natural():
    """Padding is the next multiple of 64, capped at max_protein. The
    tile-widening bump (e.g. 512 -> 544 rows for N=576/TI=96) was duel-
    REJECTED on hardware: finer tiles skip more v9 work than wide tiles
    save (tools/pocketbench.py 512,512@544, BASELINE.md round-4 notes)."""
    from targetdiff_tpu.sampling import choose_protein_padding

    assert choose_protein_padding(330, 1024, 32) == 384
    assert choose_protein_padding(500, 1024, 32) == 512  # NOT 544
    assert choose_protein_padding(600, 1024, 32) == 640
    assert choose_protein_padding(500, 500, 32) == 500  # cap
    import pytest

    with pytest.raises(ValueError):
        choose_protein_padding(600, 512, 32)

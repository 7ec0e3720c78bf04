"""Synthetic chemically-sane corpus (data/synth.py): the quality gate's
training data must itself score near-perfect on the gate's metrics, or the
trained-vs-untrained comparison is meaningless."""

import numpy as np

from targetdiff_tpu.data.synth import synth_batch, synth_ligand, synth_pocket
from targetdiff_tpu.chem.reconstruct import MolReconsError, reconstruct_from_generated
from targetdiff_tpu.evaluation import analyze


def test_ligands_are_stable_and_reconstructible():
    rng = np.random.default_rng(0)
    n_stable = n_recon = 0
    N = 30
    for _ in range(N):
        pos, z, v = synth_ligand(rng)
        assert 14 <= len(pos) <= 28
        stable, _, _ = analyze.check_stability(pos, z)
        n_stable += int(stable)
        try:
            reconstruct_from_generated(pos, list(z), [False] * len(z))
            n_recon += 1
        except MolReconsError:
            pass
    assert n_stable >= 0.9 * N, n_stable
    assert n_recon >= 0.95 * N, n_recon


def test_pocket_is_a_2_to_10A_shell():
    rng = np.random.default_rng(1)
    lp, _, _ = synth_ligand(rng)
    pp, feat = synth_pocket(rng, lp, 96)
    d = np.sqrt(((pp[:, None] - lp[None]) ** 2).sum(-1)).min(1)
    assert (d > 2.0).all() and (d < 10.0).all()
    assert feat.shape == (96, 27)
    # element block is one-hot
    assert (feat[:, :6].sum(-1) == 1).all()


def test_batch_shapes_and_masks():
    rng = np.random.default_rng(2)
    b = synth_batch(rng, 3, max_protein=128, max_ligand=32)
    assert b.protein_pos.shape == (3, 128, 3)
    assert b.ligand_v.shape == (3, 32)
    assert bool(b.protein_mask.any(-1).all()) and bool(b.ligand_mask.any(-1).all())
    # ligand atoms sit inside the pocket shell (no clash, within 10A)
    for i in range(3):
        pp = np.asarray(b.protein_pos[i])[np.asarray(b.protein_mask[i])]
        lp = np.asarray(b.ligand_pos[i])[np.asarray(b.ligand_mask[i])]
        d = np.sqrt(((pp[:, None] - lp[None]) ** 2).sum(-1)).min()
        assert d > 1.9, d

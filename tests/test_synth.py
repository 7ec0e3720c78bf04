"""Synthetic chemically-sane corpus (data/synth.py): the quality gate's
training data must itself score well on the gate's metrics, or the
trained-vs-untrained comparison is meaningless.

Round 5 widens the corpus to the reference's chemistry regime (aromatic
5/6-rings, double bonds, S/P/Cl — reference: utils/transforms.py:11-62).
NOTE the molecule-stability metric is imperfect ON REAL AROMATIC CHEMISTRY
by construction: ring bonds straddle the order-2 distance threshold
(reference: utils/evaluation/analyze.py:91-103 margins), so substituted
aromatic carbons read valence 5 about half the time — real CrossDocked
ligands score similarly. The corpus asserts a measured band, not 1.0."""

import numpy as np

from targetdiff_tpu.data.synth import synth_batch, synth_ligand, synth_pocket
from targetdiff_tpu.chem.reconstruct import MolReconsError, reconstruct_from_generated
from targetdiff_tpu.evaluation import analyze


def test_acyclic_ligands_are_stable_and_reconstructible():
    rng = np.random.default_rng(0)
    n_stable = n_recon = 0
    N = 30
    for _ in range(N):
        pos, z, v, arom = synth_ligand(rng, ring_prob=0.0)
        assert 14 <= len(pos) <= 28
        assert not arom.any()
        stable, _, _ = analyze.check_stability(pos, z)
        n_stable += int(stable)
        try:
            reconstruct_from_generated(pos, list(z), None)
            n_recon += 1
        except MolReconsError:
            pass
    assert n_stable >= 0.9 * N, n_stable
    assert n_recon >= 0.95 * N, n_recon


def test_aromatic_corpus_coverage_and_ring_recovery():
    """The widened corpus must exercise >= 10 of the 13 add_aromatic
    classes, reconstruct nearly always, and its aromatic rings must come
    back AROMATIC through the production reconstruction pipeline."""
    from collections import Counter

    rng = np.random.default_rng(0)
    N = 60
    classes = Counter()
    n_recon = 0
    atom_stable = atoms = 0
    ring_den = ring_num = 0
    for _ in range(N):
        pos, z, v, arom = synth_ligand(rng)
        classes.update(int(x) for x in v)
        _, ns, na = analyze.check_stability(pos, z)
        atom_stable += ns
        atoms += na
        has_ar = arom.sum() >= 5
        ring_den += int(has_ar)
        try:
            mol = reconstruct_from_generated(pos, list(z), None)
            n_recon += 1
            if has_ar and any(b.aromatic for b in mol.bonds):
                ring_num += 1
        except MolReconsError:
            pass
    assert len(classes) >= 10, sorted(classes)
    assert n_recon >= 0.95 * N, n_recon
    assert atom_stable >= 0.93 * atoms, atom_stable / atoms
    assert ring_den >= 0.4 * N  # ring_prob=0.65 default
    assert ring_num >= 0.9 * ring_den, (ring_num, ring_den)


def test_double_bonds_present_and_orders_recovered():
    """Sp2 chemistry: the corpus plants C=C / C=O / C=N double bonds and the
    reconstruction's distance-based order assignment must recover order-2
    bonds (the bond-JSD gate's order-2 rows depend on this)."""
    from collections import Counter

    rng = np.random.default_rng(3)
    orders = Counter()
    for _ in range(40):
        pos, z, v, arom = synth_ligand(rng)
        try:
            mol = reconstruct_from_generated(pos, list(z), None)
        except MolReconsError:
            continue
        for b in mol.bonds:
            orders[4 if b.aromatic else b.order] += 1
    assert orders[2] >= 20, orders
    assert orders[4] >= 50, orders


def test_pocket_is_a_2_to_10A_shell():
    rng = np.random.default_rng(1)
    lp, _, _, _ = synth_ligand(rng)
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

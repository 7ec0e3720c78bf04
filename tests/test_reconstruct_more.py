"""Additional reconstruction and chem tests on synthetic geometries with
known answers (bond orders, aromaticity, fragmentation handling)."""

import numpy as np
import pytest

from targetdiff_tpu.chem.mol import Molecule
from targetdiff_tpu.chem.reconstruct import MolReconsError, reconstruct_from_generated


def test_reconstruct_ethane():
    # C-C at 1.54 A
    pos = np.array([[0, 0, 0], [1.54, 0, 0]])
    mol = reconstruct_from_generated(pos, [6, 6])
    assert len(mol.bonds) == 1 and mol.bonds[0].order == 1
    assert mol.to_smiles() == "CC"


def test_reconstruct_ethene_double_bond():
    # C=C at 1.33 A => double bond from the empirical tables
    pos = np.array([[0, 0, 0], [1.33, 0, 0]])
    mol = reconstruct_from_generated(pos, [6, 6])
    assert mol.bonds[0].order == 2
    assert mol.to_smiles() == "C=C"


def test_reconstruct_acetylene_triple_bond():
    pos = np.array([[0, 0, 0], [1.20, 0, 0]])
    mol = reconstruct_from_generated(pos, [6, 6])
    assert mol.bonds[0].order == 3
    assert mol.to_smiles() == "C#C"


def test_reconstruct_carbonyl():
    # formaldehyde heavy atoms: C=O at 1.21 A
    pos = np.array([[0, 0, 0], [1.21, 0, 0]])
    mol = reconstruct_from_generated(pos, [6, 8])
    assert mol.bonds[0].order == 2
    assert mol.to_smiles() == "C=O"


def test_reconstruct_benzene_aromatic_flags():
    t = np.linspace(0, 2 * np.pi, 7)[:-1]
    pos = np.stack([1.39 * np.cos(t), 1.39 * np.sin(t), np.zeros(6)], axis=1)
    mol = reconstruct_from_generated(pos, [6] * 6, aromatic=[True] * 6, basic_mode=False)
    assert len(mol.bonds) == 6
    assert all(b.aromatic for b in mol.bonds)
    # kekulized orders alternate so every carbon has exactly one double bond
    for i in range(6):
        orders = sorted(b.order for b in mol.bonds_of(i))
        assert orders == [1, 2]
    assert mol.to_smiles() == "c1ccccc1"


def test_reconstruct_hypervalent_pruning():
    """6 carbons jammed around one center: the center must not exceed 4 bonds."""
    rng = np.random.default_rng(0)
    center = np.zeros((1, 3))
    shell = rng.normal(size=(6, 3))
    shell = 1.5 * shell / np.linalg.norm(shell, axis=1, keepdims=True)
    pos = np.concatenate([center, shell])
    mol = reconstruct_from_generated(pos, [6] * 7)
    assert mol.degree(0) <= 4


def test_reconstruct_far_apart_fragments():
    """Two distant atoms beyond any linking tolerance stay fragmented and the
    SMILES reflects it with '.'"""
    pos = np.array([[0, 0, 0], [50.0, 0, 0]])
    mol = reconstruct_from_generated(pos, [6, 6])
    assert len(mol.fragments()) == 2
    assert "." in mol.to_smiles()


def test_pyridine_perception():
    """Pyridine built with kekulized bonds: N perceived aromatic, non-donor."""
    t = np.linspace(0, 2 * np.pi, 7)[:-1]
    pos = np.stack([1.39 * np.cos(t), 1.39 * np.sin(t), np.zeros(6)], axis=1)
    mol = Molecule()
    zs = [7, 6, 6, 6, 6, 6]
    for z, p in zip(zs, pos):
        mol.add_atom(z, pos=p)
    for i in range(6):
        mol.add_bond(i, (i + 1) % 6, order=2 if i % 2 == 0 else 1)
    mol.perceive_aromaticity()
    assert all(a.aromatic for a in mol.atoms)
    assert mol.implicit_h(0) == 0  # aromatic N, no H
    from targetdiff_tpu.chem.perception import is_acceptor

    assert is_acceptor(mol, 0)  # pyridine N accepts
    s = mol.to_smiles()
    assert s.count("n") == 1 and s.count("c") == 5


# ---- geometric aromaticity perception (round 5) ---------------------------
# The reference pipeline inherits OpenBabel's geometry-based aromatization
# (reference: utils/reconstruct.py:474-509); without flags, planar rings at
# delocalized bond lengths must come back aromatic.


def _hexagon(r):
    t = np.linspace(0, 2 * np.pi, 7)[:-1]
    return np.stack([r * np.cos(t), r * np.sin(t), np.zeros(6)], axis=1)


def test_geometric_benzene_no_flags():
    """Benzene at the delocalized 1.39 A geometry, NO aromatic flags:
    perceived aromatic from planarity + bond-length windows."""
    mol = reconstruct_from_generated(_hexagon(1.39), [6] * 6)
    assert all(b.aromatic for b in mol.bonds)
    for i in range(6):
        assert sorted(b.order for b in mol.bonds_of(i)) == [1, 2]
    assert mol.to_smiles() == "c1ccccc1"


def test_geometric_pyridine_no_flags():
    """Pyridine from raw geometry: the 6-ring N participates in the kekulized
    alternation (N=C), unlike a 5-ring donor N."""
    mol = reconstruct_from_generated(_hexagon(1.37), [7, 6, 6, 6, 6, 6])
    assert all(a.aromatic for a in mol.atoms)
    n_orders = sorted(b.order for b in mol.bonds_of(0))
    assert n_orders == [1, 2], n_orders
    s = mol.to_smiles()
    assert s.count("n") == 1 and s.count("c") == 5


def test_geometric_thiophene_no_flags():
    """Thiophene: unequal C-S (1.71) / C-C (1.39) ring sides, perceived
    aromatic; the S stays a 2-valent donor (no S=C kekulized)."""
    from targetdiff_tpu.data.synth import _ring_coords

    lens = np.array([1.71, 1.39, 1.42, 1.39, 1.71])
    pos = _ring_coords(lens)
    mol = reconstruct_from_generated(pos, [16, 6, 6, 6, 6])
    assert all(a.aromatic for a in mol.atoms)
    assert all(b.order == 1 for b in mol.bonds_of(0))  # S keeps singles


def test_geometric_furan_and_pyrrole_no_flags():
    from targetdiff_tpu.data.synth import _ring_coords

    for z0, l_het in ((8, 1.36), (7, 1.37)):
        lens = np.array([l_het, 1.38, 1.42, 1.38, l_het])
        mol = reconstruct_from_generated(_ring_coords(lens), [z0, 6, 6, 6, 6])
        assert all(a.aromatic for a in mol.atoms), z0
        assert all(b.order == 1 for b in mol.bonds_of(0)), z0  # donor heteroatom


def test_geometric_negative_cyclohexane():
    """Planar-projected cyclohexane at single-bond 1.54 A: NOT aromatic
    (lengths outside every window)."""
    mol = reconstruct_from_generated(_hexagon(1.54), [6] * 6)
    assert not any(b.aromatic for b in mol.bonds)


def test_geometric_negative_puckered_ring():
    """A ring at aromatic-ish lengths but strongly puckered: planarity
    rejection."""
    pos = _hexagon(1.39)
    pos[:, 2] = np.array([0.35, -0.35, 0.35, -0.35, 0.35, -0.35])
    # re-scale so bond lengths land back in the aromatic window
    d = np.linalg.norm(pos[0] - pos[1])
    pos *= 1.39 / d
    mol = reconstruct_from_generated(pos, [6] * 6)
    assert not any(b.aromatic for b in mol.bonds)

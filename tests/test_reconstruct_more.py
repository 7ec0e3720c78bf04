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

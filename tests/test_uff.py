"""Native UFF-style relaxation for docking prep.

Reference: utils/evaluation/docking_qvina.py:117-119 (UFFOptimizeMolecule
before PDBQT conversion)."""

import os

import numpy as np
import pytest

from targetdiff_tpu.chem.mol import Molecule
from targetdiff_tpu.chem.sdf import read_sdf, remove_hydrogens
from targetdiff_tpu.chem.uff import (
    natural_bond_length,
    relax_for_docking,
    uff_optimize,
)

EXAMPLE_LIGAND = os.path.join(
    os.path.dirname(__file__), "..", "examples", "3ug2_ligand.sdf"
)


def _ethane_stretched():
    m = Molecule()
    m.add_atom(6, pos=np.array([0.0, 0.0, 0.0]))
    m.add_atom(6, pos=np.array([2.6, 0.0, 0.0]))  # C-C natural ~1.51 A
    m.add_bond(0, 1, 1)
    return m


def test_natural_lengths_sane():
    m = _ethane_stretched()
    r0 = natural_bond_length(m, 0, 1, 1.0)
    assert 1.4 < r0 < 1.6
    # double bond shorter than single
    assert natural_bond_length(m, 0, 1, 2.0) < r0


def test_stretched_bond_contracts():
    m = _ethane_stretched()
    uff_optimize(m, max_iters=500)
    r = np.linalg.norm(m.atoms[0].pos - m.atoms[1].pos)
    assert abs(r - natural_bond_length(m, 0, 1, 1.0)) < 0.05


def test_clash_resolves():
    # bent propane with a 1-3 clash: angle term + vdW must open it up
    m = Molecule()
    m.add_atom(6, pos=np.array([0.0, 0.0, 0.0]))
    m.add_atom(6, pos=np.array([1.5, 0.0, 0.0]))
    m.add_atom(6, pos=np.array([0.1, 0.3, 0.0]))  # nearly on top of atom 0
    m.add_bond(0, 1, 1)
    m.add_bond(1, 2, 1)
    uff_optimize(m, max_iters=500)
    d02 = np.linalg.norm(m.atoms[0].pos - m.atoms[2].pos)
    assert d02 > 2.0  # opened toward the ~2.5 A sp3 1-3 distance


def test_real_ligand_improves_and_converges():
    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    before = mol.positions().copy()
    # perturb the crystal geometry
    rng = np.random.default_rng(0)
    for a in mol.atoms:
        a.pos = a.pos + rng.normal(0, 0.15, 3)
    relaxed = relax_for_docking(mol, use_uff=True)
    after = relaxed.positions()
    assert after.shape == before.shape
    assert np.isfinite(after).all()
    # geometry changed (relaxation happened) but stayed near the pocket pose
    assert np.linalg.norm(after - before) > 1e-3
    assert np.abs(after - before).max() < 2.0
    # bond lengths near natural values
    errs = []
    for b in mol.bonds:
        order = 1.5 if b.aromatic else float(b.order)
        r = np.linalg.norm(after[b.a1] - after[b.a2])
        errs.append(abs(r - natural_bond_length(mol, b.a1, b.a2, order)))
    assert np.mean(errs) < 0.12


def test_use_uff_false_is_noop():
    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    before = mol.positions().copy()
    out = relax_for_docking(mol, use_uff=False)
    assert np.array_equal(out.positions(), before)


def test_qvina_task_gates_uff():
    from targetdiff_tpu.evaluation.docking_qvina import QVinaDockingTask

    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    before = mol.positions().copy()
    task = QVinaDockingTask(mol, protein_path="/nonexistent.pdb", use_uff=False)
    assert np.array_equal(task.mol.positions(), before)
    task2 = QVinaDockingTask(mol, protein_path="/nonexistent.pdb", use_uff=True)
    assert not np.array_equal(task2.mol.positions(), before)
    # the relaxation must not mutate the caller's generated pose (ADVICE r2)
    assert np.array_equal(mol.positions(), before)

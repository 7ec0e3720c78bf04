"""Full Wildman-Crippen logP: exact parity with RDKit MolLogP on molecules
with hand-checkable typings.

Reference: utils/evaluation/scoring_func.py (logp via Descriptors.MolLogP)."""

import os

import numpy as np
import pytest

from targetdiff_tpu.chem.crippen import atom_types, crippen_logp
from targetdiff_tpu.chem.mol import Molecule
from targetdiff_tpu.chem.sdf import read_sdf, remove_hydrogens

EXAMPLE_LIGAND = os.path.join(
    os.path.dirname(__file__), "..", "examples", "3ug2_ligand.sdf"
)


def ring6(zs, aromatic=True):
    m = Molecule()
    for z in zs:
        m.add_atom(z)
    for i in range(6):
        m.add_bond(i, (i + 1) % 6, 1, aromatic=aromatic)
    for a in m.atoms:
        a.aromatic = aromatic
    return m


def test_benzene_exact():
    m = ring6([6] * 6)
    assert atom_types(m) == ["C18"] * 6
    # RDKit MolLogP("c1ccccc1") == 1.6866
    assert crippen_logp(m) == pytest.approx(1.6866, abs=1e-4)


def test_pyridine_exact():
    m = ring6([7, 6, 6, 6, 6, 6])
    t = atom_types(m)
    assert t[0] == "N11" and t[1:] == ["C18"] * 5
    # RDKit MolLogP("c1ccncc1") == 1.0816
    assert crippen_logp(m) == pytest.approx(1.0816, abs=1e-4)


def test_ethanol_exact():
    m = Molecule()
    m.add_atom(6)
    m.add_atom(6)
    m.add_atom(8)
    m.add_bond(0, 1, 1)
    m.add_bond(1, 2, 1)
    assert atom_types(m) == ["C1", "C3", "O2"]
    # RDKit MolLogP("CCO") == -0.0014
    assert crippen_logp(m) == pytest.approx(-0.0014, abs=1e-4)


def test_acetic_acid_exact():
    m = Molecule()
    m.add_atom(6)  # CH3
    m.add_atom(6)  # C
    m.add_atom(8)  # =O
    m.add_atom(8)  # OH
    m.add_bond(0, 1, 1)
    m.add_bond(1, 2, 2)
    m.add_bond(1, 3, 1)
    assert atom_types(m) == ["C1", "C5", "O9", "O2"]
    # RDKit MolLogP("CC(=O)O") == 0.0909
    assert crippen_logp(m) == pytest.approx(0.0909, abs=1e-4)


def test_toluene_exact():
    m = ring6([6] * 6)
    c = m.add_atom(6)
    m.add_bond(0, c, 1)
    t = atom_types(m)
    assert t[0] == "C21" and t[6] == "C8"
    # 5*C18 + C21 + C8 + 8*H1 = 0.7905 + 0.1360 + 0.08452 + 0.984
    assert crippen_logp(m) == pytest.approx(1.99502, abs=1e-4)


def test_aniline_phenol_exact():
    m = ring6([6] * 6)
    n = m.add_atom(7)
    m.add_bond(0, n, 1)
    t = atom_types(m)
    assert t[0] == "C22" and t[6] == "N3"
    # RDKit MolLogP("Nc1ccccc1") == 1.2688
    assert crippen_logp(m) == pytest.approx(1.2688, abs=1e-4)

    p = ring6([6] * 6)
    o = p.add_atom(8)
    p.add_bond(0, o, 1)
    t = atom_types(p)
    assert t[0] == "C23" and t[6] == "O2"
    # RDKit MolLogP("Oc1ccccc1") == 1.3922
    assert crippen_logp(p) == pytest.approx(1.3922, abs=1e-4)


def test_naphthalene_bridgeheads():
    m = Molecule()
    for _ in range(10):
        m.add_atom(6)
    ring_a = [0, 1, 2, 3, 4, 5]
    for i in range(6):
        m.add_bond(ring_a[i], ring_a[(i + 1) % 6], 1, aromatic=True)
    # fused ring via atoms 4,5
    extra = [6, 7, 8, 9]
    chain = [5] + extra + [4]
    for i in range(len(chain) - 1):
        m.add_bond(chain[i], chain[i + 1], 1, aromatic=True)
    for a in m.atoms:
        a.aromatic = True
    t = atom_types(m)
    assert t[4] == "C19" and t[5] == "C19"
    assert sum(1 for x in t if x == "C18") == 8
    # 2*C19 + 8*C18 + 8*H1 = 0.591 + 1.2648 + 0.984
    assert crippen_logp(m) == pytest.approx(2.8398, abs=1e-4)


def test_charged_and_halogens():
    # acetate anion: CC(=O)[O-]
    m = Molecule()
    m.add_atom(6)
    m.add_atom(6)
    m.add_atom(8)
    m.add_atom(8, formal_charge=-1)
    m.add_bond(0, 1, 1)
    m.add_bond(1, 2, 2)
    m.add_bond(1, 3, 1)
    assert atom_types(m)[3] == "O12"
    # chlorobenzene: C15 typing
    b = ring6([6] * 6)
    cl = b.add_atom(17)
    b.add_bond(0, cl, 1)
    t = atom_types(b)
    assert t[0] == "C15" and t[6] == "Cl"
    # RDKit MolLogP("Clc1ccccc1") == 2.3400
    assert crippen_logp(b) == pytest.approx(2.3400, abs=1e-4)


def test_example_ligand_band():
    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    lp = crippen_logp(mol)
    # full typed decomposition (7*C3 + 6*C18 + 2*O4 + 2*C23 + 2*C19 + 2*N11
    # + 2*C22 + O3 + N7 + C1 + N4 + C15 + Cl + C14 + F + 21*H1 + H3);
    # Crippen systematically overestimates vs XLogP3 (~4.2) — band checks
    # the typing, the exact-parity check is test_exact_with_rdkit
    assert 4.5 <= lp <= 6.5
    assert np.isfinite(lp)


def test_exact_with_rdkit():
    from targetdiff_tpu.chem.backend import HAVE_RDKIT, to_rdkit

    if not HAVE_RDKIT:
        pytest.skip("RDKit not installed")
    from rdkit.Chem import Descriptors

    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    rd = to_rdkit(mol)
    assert crippen_logp(mol) == pytest.approx(Descriptors.MolLogP(rd), abs=0.2)


def test_descriptors_logp_uses_full_crippen():
    from targetdiff_tpu.chem import descriptors as D

    m = ring6([6] * 6)
    assert D.logp(m) == pytest.approx(1.6866, abs=1e-4)

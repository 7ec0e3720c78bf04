"""Chem layer tests: parsing, SMILES, perception, reconstruction, descriptors,
and the evaluation metrics that build on them. Uses the reference repo's
example files as fixtures (reference: examples/)."""

import numpy as np
import pytest

from targetdiff_tpu.chem import Molecule
from targetdiff_tpu.chem.descriptors import (
    logp,
    mol_weight,
    num_aromatic_rings,
    num_hba,
    num_hbd,
    num_rotatable_bonds,
    obey_lipinski,
    qed,
    sa_score,
    tanimoto_sim,
    tpsa,
)
from targetdiff_tpu.chem.pdb import PDBProtein
from targetdiff_tpu.chem.reconstruct import MolReconsError, reconstruct_from_generated
from targetdiff_tpu.chem.sdf import parse_molfile_text, parse_sdf_file, read_sdf, write_sdf

EXAMPLE_POCKET = "examples/1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb"
EXAMPLE_LIGAND = "examples/3ug2_ligand.sdf"


def make_benzene():
    mol = Molecule()
    pos = [(np.cos(t), np.sin(t), 0.0) for t in np.linspace(0, 2 * np.pi, 7)[:-1]]
    for p in pos:
        mol.add_atom(6, pos=np.array(p) * 1.39)
    for i in range(6):
        mol.add_bond(i, (i + 1) % 6, order=2 if i % 2 == 0 else 1)
    return mol


def test_benzene_aromatic_and_smiles():
    mol = make_benzene()
    mol.perceive_aromaticity()
    assert all(a.aromatic for a in mol.atoms)
    s = mol.to_smiles()
    assert s == "c1ccccc1"


def test_implicit_h():
    mol = Molecule()
    c = mol.add_atom(6)
    o = mol.add_atom(8)
    mol.add_bond(c, o, order=2)
    assert mol.implicit_h(c) == 2  # formaldehyde
    assert mol.implicit_h(o) == 0


def test_smiles_canonical_invariance():
    """Same molecule built in different atom orders -> same SMILES."""

    def build(order):
        # ethanol: C-C-O
        mol = Molecule()
        idx = {}
        for name in order:
            z = {"C1": 6, "C2": 6, "O": 8}[name]
            idx[name] = mol.add_atom(z)
        pairs = [("C1", "C2"), ("C2", "O")]
        for a, b in pairs:
            mol.add_bond(idx[a], idx[b])
        return mol.to_smiles()

    assert build(["C1", "C2", "O"]) == build(["O", "C2", "C1"]) == "CCO"


def test_pdb_parse_pocket():
    p = PDBProtein(EXAMPLE_POCKET)
    d = p.to_dict_atom()
    r = p.to_dict_residue()
    assert len(d["element"]) > 300
    assert d["pos"].shape == (len(d["element"]), 3)
    assert 0 < d["is_backbone"].mean() < 1
    assert (d["atom_to_aa_type"] < 20).all()
    assert len(r["amino_acid"]) == len(p.residues)
    # pocket block round-trip
    block = p.residues_to_pdb_block(p.residues[:3])
    p2 = PDBProtein(block, mode="block")
    assert len(p2.residues) == 3


def test_sdf_parse_gefitinib():
    lig = parse_sdf_file(EXAMPLE_LIGAND)
    assert len(lig["element"]) == 31
    assert lig["bond_index"].shape[1] == 68  # 34 bonds, both directions
    assert lig["atom_feature"].shape == (31, 8)
    # aromatic: quinazoline (10) + phenyl (6)
    assert lig["atom_feature"][:, 2].sum() == 16
    assert lig["pos"].dtype == np.float32
    # bond_index sorted by (src, dst)
    flat = lig["bond_index"][0] * 31 + lig["bond_index"][1]
    assert (np.diff(flat) >= 0).all()


def test_sdf_roundtrip():
    mol = read_sdf(EXAMPLE_LIGAND)
    block = write_sdf(mol)
    mol2 = parse_molfile_text(block)
    assert mol2.num_atoms == mol.num_atoms
    assert len(mol2.bonds) == len(mol.bonds)
    assert mol2.to_smiles() == mol.to_smiles()


def test_reconstruct_ligand_from_coords():
    """Reconstruct gefitinib from its coordinates + elements + aromatic flags;
    connectivity should match the real molecule."""
    from targetdiff_tpu.chem.sdf import remove_hydrogens

    ref = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    pos = ref.positions()
    z = [a.z for a in ref.atoms]
    arom = [a.aromatic for a in ref.atoms]
    mol = reconstruct_from_generated(pos, z, arom, basic_mode=False)
    assert mol.num_atoms == ref.num_atoms
    assert len(mol.bonds) == len(ref.bonds)
    ref_edges = {(min(b.a1, b.a2), max(b.a1, b.a2)) for b in ref.bonds}
    got_edges = {(min(b.a1, b.a2), max(b.a1, b.a2)) for b in mol.bonds}
    assert got_edges == ref_edges
    assert len(mol.fragments()) == 1


def test_reconstruct_failure():
    with pytest.raises(MolReconsError):
        reconstruct_from_generated(np.zeros((0, 3)), [])


def test_descriptors_gefitinib():
    from targetdiff_tpu.chem.sdf import remove_hydrogens

    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    # known values for gefitinib: MW 446.9, HBD 1, logP ~4.1, TPSA ~68.7
    assert mol_weight(mol) == pytest.approx(446.9, abs=2.0)
    assert num_hbd(mol) == 1
    assert num_hba(mol) == 7  # all N+O
    assert num_aromatic_rings(mol) == 3
    assert 1.5 < logp(mol) < 6.5  # RDKit: 4.1; condensed Crippen is approximate
    assert 45 < tpsa(mol) < 90
    assert 3 <= num_rotatable_bonds(mol) <= 10
    q = qed(mol)
    assert 0.3 < q < 0.9  # RDKit gives ~0.55 for gefitinib
    sa = sa_score(mol)
    assert 1.0 <= sa <= 4.5  # easy-ish synthesis
    assert obey_lipinski(mol) >= 4


def test_tanimoto():
    from targetdiff_tpu.chem.sdf import remove_hydrogens

    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    assert tanimoto_sim(mol, mol) == 1.0
    benz = make_benzene()
    benz.perceive_aromaticity()
    assert tanimoto_sim(mol, benz) < 0.5


def test_stability_metric():
    from targetdiff_tpu.chem.sdf import remove_hydrogens
    from targetdiff_tpu.evaluation.analyze import check_stability

    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    stable, n_stable, n = check_stability(mol.positions(), [a.z for a in mol.atoms])
    assert n == 31
    assert n_stable >= 25  # real molecule should be mostly stable


def test_bond_length_metrics():
    from targetdiff_tpu.chem.sdf import remove_hydrogens
    from targetdiff_tpu.evaluation import eval_bond_length as ebl

    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    bl = ebl.bond_distance_from_mol(mol)
    profile = ebl.get_bond_length_profile(bl)
    metrics = ebl.eval_bond_length_profile(profile)
    present = {k: v for k, v in metrics.items() if v is not None}
    assert len(present) >= 3
    assert all(0 <= v <= 1 for v in present.values())
    # a real drug's aromatic CC lengths should be close-ish to empirical
    assert metrics["JSD_6-6|4"] is not None and metrics["JSD_6-6|4"] < 0.8

    pd = ebl.pair_distance_from_pos_v(mol.positions(), [a.z for a in mol.atoms])
    pp = ebl.get_pair_length_profile(pd)
    pm = ebl.eval_pair_length_profile(pp)
    assert pm["JSD_All_12A"] is not None and 0 <= pm["JSD_All_12A"] <= 1


def test_atom_type_metric():
    from collections import Counter

    from targetdiff_tpu.evaluation.eval_atom_type import eval_atom_type_distribution

    # perfect match distribution -> JSD ~ 0
    from targetdiff_tpu.evaluation.eval_atom_type import atom_type_distribution

    ref = atom_type_distribution()
    counter = Counter({k: int(v * 1e6) for k, v in ref.items()})
    assert eval_atom_type_distribution(counter) < 1e-3


def test_atom_num_prior():
    from targetdiff_tpu.utils.atom_num import get_space_size, sample_atom_num

    rng = np.random.default_rng(0)
    pocket = rng.normal(size=(100, 3)) * 8
    size = get_space_size(pocket)
    assert size > 0
    ns = [sample_atom_num(size, rng) for _ in range(50)]
    assert all(1 <= n < 70 for n in ns)

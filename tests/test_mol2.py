"""MOL2 parsing + the reference's sdf->mol2 ligand-parse fallback
(reference: datasets/protein_ligand.py:114-147 read_mol)."""

import os
import pickle

import numpy as np
import pytest

from targetdiff_tpu.chem.mol2 import (
    parse_ligand_file,
    parse_mol2_file,
    parse_mol2_text,
)

BENZENE_MOL2 = """\
@<TRIPOS>MOLECULE
benzene
 12 12 1
SMALL
NO_CHARGES

@<TRIPOS>ATOM
  1 C1  0.0000  1.3960  0.0000 C.ar 1 BNZ 0.0000
  2 C2  1.2090  0.6980  0.0000 C.ar 1 BNZ 0.0000
  3 C3  1.2090 -0.6980  0.0000 C.ar 1 BNZ 0.0000
  4 C4  0.0000 -1.3960  0.0000 C.ar 1 BNZ 0.0000
  5 C5 -1.2090 -0.6980  0.0000 C.ar 1 BNZ 0.0000
  6 C6 -1.2090  0.6980  0.0000 C.ar 1 BNZ 0.0000
  7 H1  0.0000  2.4800  0.0000 H    1 BNZ 0.0000
  8 H2  2.1480  1.2400  0.0000 H    1 BNZ 0.0000
  9 H3  2.1480 -1.2400  0.0000 H    1 BNZ 0.0000
 10 H4  0.0000 -2.4800  0.0000 H    1 BNZ 0.0000
 11 H5 -2.1480 -1.2400  0.0000 H    1 BNZ 0.0000
 12 H6 -2.1480  1.2400  0.0000 H    1 BNZ 0.0000
@<TRIPOS>BOND
  1  1  2 ar
  2  2  3 ar
  3  3  4 ar
  4  4  5 ar
  5  5  6 ar
  6  6  1 ar
  7  1  7 1
  8  2  8 1
  9  3  9 1
 10  4 10 1
 11  5 11 1
 12  6 12 1
"""

ACETAMIDE_MOL2 = """\
@<TRIPOS>MOLECULE
acetamide
 4 3 1
SMALL
USER_CHARGES

@<TRIPOS>ATOM
  1 C1   0.000  0.000  0.000 C.3   1 ACM  0.00
  2 C2   1.520  0.000  0.000 C.2   1 ACM  0.00
  3 O1   2.130  1.060  0.000 O.2   1 ACM -0.40
  4 N1   2.130 -1.190  0.000 N.am  1 ACM -0.30
@<TRIPOS>BOND
  1 1 2 1
  2 2 3 2
  3 2 4 am
"""


def test_parse_mol2_benzene():
    mol = parse_mol2_text(BENZENE_MOL2)
    assert mol.num_atoms == 12
    zs = sorted(a.z for a in mol.atoms)
    assert zs == [1] * 6 + [6] * 6
    ring_bonds = [b for b in mol.bonds if b.aromatic]
    assert len(ring_bonds) == 6
    assert all(mol.atoms[i].aromatic for i in range(6))


def test_parse_mol2_acetamide_types():
    mol = parse_mol2_text(ACETAMIDE_MOL2)
    assert [a.z for a in mol.atoms] == [6, 6, 8, 7]
    co = mol.get_bond(1, 2)
    assert co.order == 2 and not co.aromatic
    cn = mol.get_bond(1, 3)  # amide bond degrades to single
    assert cn.order == 1 and not cn.aromatic


def test_mol2_ligand_dict_contract(tmp_path):
    p = tmp_path / "benzene.mol2"
    p.write_text(BENZENE_MOL2)
    d = parse_mol2_file(str(p))
    # hydrogens removed, same key contract as parse_sdf_file
    assert d["element"].tolist() == [6] * 6
    assert d["pos"].shape == (6, 3)
    assert d["bond_type"].tolist().count(4) == 12  # aromatic, both directions
    for k in ("smiles", "center_of_mass", "atom_feature", "hybridization"):
        assert k in d


def test_sdf_mol2_fallback(tmp_path):
    bad_sdf = tmp_path / "lig.sdf"
    bad_sdf.write_text("garbage\n")
    (tmp_path / "lig.mol2").write_text(BENZENE_MOL2)
    d = parse_ligand_file(str(bad_sdf))
    assert d.get("parsed_from_mol2_fallback")
    assert d["element"].tolist() == [6] * 6
    # without the sibling mol2, the sdf failure must propagate
    bad2 = tmp_path / "other.sdf"
    bad2.write_text("garbage\n")
    with pytest.raises(Exception):
        parse_ligand_file(str(bad2))


def test_pdbbind_process_recovers_via_mol2(tmp_path):
    """PDBBind _process recovers complexes the SDF-only path skips
    (VERDICT r2 next #5)."""
    import shutil

    from targetdiff_tpu.data.datasets import PDBBindDataset

    raw = tmp_path / "raw"
    raw.mkdir()
    shutil.copyfile(
        "examples/1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb",
        raw / "pocket.pdb",
    )
    # a broken sdf with a parsable sibling mol2
    (raw / "lig.sdf").write_text("NOT AN SDF\n")
    (raw / "lig.mol2").write_text(BENZENE_MOL2)
    index = [
        {"pocket": "pocket.pdb", "ligand": "lig.sdf", "pk": 5.0, "kind": 1},
    ]
    with open(raw / "index.pkl", "wb") as f:
        pickle.dump(index, f)

    ds = PDBBindDataset(str(raw / "index.pkl"))
    assert len(ds) == 1
    d = ds[0]
    assert d["ligand_element"].tolist() == [6] * 6
    assert float(d["y"]) == 5.0


def test_pdbbind_process_fails_loudly_on_mass_skips(tmp_path):
    import shutil

    from targetdiff_tpu.data.datasets import PDBBindDataset

    raw = tmp_path / "raw"
    raw.mkdir()
    shutil.copyfile(
        "examples/1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb",
        raw / "pocket.pdb",
    )
    (raw / "lig.sdf").write_text("NOT AN SDF\n")  # no mol2 sibling
    index = [
        {"pocket": "pocket.pdb", "ligand": "lig.sdf", "pk": 5.0, "kind": 1},
    ] * 4
    with open(raw / "index.pkl", "wb") as f:
        pickle.dump(index, f)
    with pytest.raises(RuntimeError, match="silently-shrunken"):
        PDBBindDataset(str(raw / "index.pkl"))
    # the partial store must not persist as a valid dataset
    from targetdiff_tpu.data.store import RecordStore

    assert not RecordStore.exists(str(raw / "pdbbind_processed_final"))

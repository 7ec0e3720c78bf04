"""Optional RDKit backend: transparently upgrades chem operations when RDKit
is importable (it is a C++ library the reference hard-depends on,
reference: utils/data.py:3-6); otherwise the native implementations in this
package are used."""

from __future__ import annotations

from typing import Optional

from .mol import Molecule
from .sdf import write_sdf

try:
    from rdkit import Chem as _Chem

    HAVE_RDKIT = True
except ImportError:
    _Chem = None
    HAVE_RDKIT = False


def to_rdkit(mol: Molecule):
    """chem.Molecule -> rdkit Mol (None when RDKit is unavailable)."""
    if not HAVE_RDKIT:
        return None
    block = write_sdf(mol).replace("$$$$\n", "")
    return _Chem.MolFromMolBlock(block, sanitize=True)


def canonical_smiles(mol: Molecule) -> str:
    """RDKit-canonical SMILES when available, else the native writer."""
    if HAVE_RDKIT:
        rd = to_rdkit(mol)
        if rd is not None:
            return _Chem.MolToSmiles(rd)
    return mol.to_smiles()


def qed(mol: Molecule) -> float:
    if HAVE_RDKIT:
        try:
            from rdkit.Chem import QED

            rd = to_rdkit(mol)
            if rd is not None:
                return float(QED.qed(rd))
        except Exception:
            pass
    from .descriptors import qed as native_qed

    return native_qed(mol)


def sa_score(mol: Molecule) -> Optional[float]:
    """Ertl & Schuffenhauer SA. With RDKit: the exact scorer over the
    VENDORED fragment table (identical to the reference's
    utils/evaluation/sascorer.py + fpscores.pkl.gz); without: the native
    estimate (exact feature/scaling pipeline, surrogate fragment term)."""
    if HAVE_RDKIT:
        try:
            from .sascorer import calculate_sa

            rd = to_rdkit(mol)
            if rd is not None:
                return float(calculate_sa(rd))
        except Exception:
            pass
    from .sascorer import sa_score_native

    return sa_score_native(mol)

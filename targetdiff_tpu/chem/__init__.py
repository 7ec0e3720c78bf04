"""Lightweight self-contained cheminformatics core.

The reference leans on RDKit/OpenBabel (C++ libraries) for parsing,
featurization, reconstruction and scoring (reference: utils/data.py:3-6,
utils/reconstruct.py:10-12, utils/evaluation/scoring_func.py:5-9). This
subpackage provides a dependency-free implementation of the subset the
framework needs — PDB/SDF parsing, a molecule model with valence/ring/
aromaticity perception, SMILES writing, fingerprints and descriptors — and
transparently upgrades to RDKit when it is importable (`chem.backend`).
"""

from .mol import Atom, Bond, Molecule  # noqa: F401

"""QuickVina2 docking wrapper (host-side, external binaries).

Counterpart of reference utils/evaluation/docking_qvina.py:54-212: writes
receptor/ligand files to a tmp dir, prepares PDBQT inputs and runs `qvina2`,
then parses the docked poses. External binaries are probed at run time.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from typing import Dict, List, Optional

import numpy as np

from ..chem.mol import Molecule
from .docking_vina import DockingUnavailable, PrepLig, PrepProt, _which


def get_random_id(length: int = 8) -> str:
    import random
    import string

    return "".join(random.choices(string.ascii_lowercase, k=length))


class BaseDockingTask:
    def __init__(self, pdb_block: Optional[str], mol: Molecule):
        self.pdb_block = pdb_block
        self.mol = mol

    def run(self):
        raise NotImplementedError

    def get_results(self):
        raise NotImplementedError


class QVinaDockingTask(BaseDockingTask):
    """(reference: docking_qvina.py:54-212)."""

    def __init__(
        self,
        mol: Molecule,
        protein_path: str,
        tmp_dir: Optional[str] = None,
        center: Optional[np.ndarray] = None,
        size_factor: float = 1.0,
        use_uff: bool = True,
    ):
        super().__init__(None, mol)
        if use_uff:
            # UFF pre-optimization, matching the reference protocol
            # (docking_qvina.py:117-119): relax generated geometry before
            # PDBQT conversion so scores are comparable. The reference
            # relaxes an AddHs COPY — relax_for_docking mutates positions in
            # place, so deep-copy first to keep the caller's generated pose
            # intact (ADVICE r2).
            import copy

            from ..chem.uff import relax_for_docking

            try:
                mol = relax_for_docking(copy.deepcopy(mol), use_uff=True)
            except Exception:
                mol = self.mol
        self.mol = mol
        self.protein_path = protein_path
        self.tmp_dir = tmp_dir or tempfile.mkdtemp(prefix="qvina_")
        pos = mol.positions()
        self.center = pos.mean(0) if center is None else np.asarray(center)
        extent = pos.max(0) - pos.min(0)
        self.size = (extent + 10.0) * size_factor
        self.results: Optional[List[Dict]] = None

    @classmethod
    def from_generated_mol(cls, mol: Molecule, ligand_filename: str, protein_root: str):
        dirname = os.path.dirname(ligand_filename)
        base = os.path.basename(ligand_filename)[:10]
        protein_fn = os.path.join(dirname, base + ".pdb")
        return cls(mol, os.path.join(protein_root, protein_fn))

    def run_sync(self, exhaustiveness: int = 16) -> List[Dict]:
        qvina = _which("qvina2", "qvina02", "qvina2.1")
        if qvina is None:
            raise DockingUnavailable("qvina2 binary not on PATH")
        lig_pdbqt = os.path.join(self.tmp_dir, "ligand.pdbqt")
        prot_pdbqt = os.path.join(self.tmp_dir, "receptor.pdbqt")
        PrepLig(self.mol).to_pdbqt(lig_pdbqt)
        PrepProt(self.protein_path).to_pdbqt(prot_pdbqt)
        out = os.path.join(self.tmp_dir, "out.pdbqt")
        res = subprocess.run(
            [
                qvina, "--receptor", prot_pdbqt, "--ligand", lig_pdbqt,
                "--center_x", f"{self.center[0]:.4f}",
                "--center_y", f"{self.center[1]:.4f}",
                "--center_z", f"{self.center[2]:.4f}",
                "--size_x", f"{self.size[0]:.4f}",
                "--size_y", f"{self.size[1]:.4f}",
                "--size_z", f"{self.size[2]:.4f}",
                "--exhaustiveness", str(exhaustiveness), "--out", out,
            ],
            capture_output=True, text=True, check=True,
        )
        self.results = self._parse(res.stdout)
        return self.results

    @staticmethod
    def _parse(stdout: str) -> List[Dict]:
        """Parse the qvina result table (reference: docking_qvina.py:198-212)."""
        results = []
        in_table = False
        for line in stdout.splitlines():
            if line.startswith("-----+"):
                in_table = True
                continue
            if in_table:
                fields = line.split()
                if len(fields) >= 4 and fields[0].isdigit():
                    results.append(
                        {"affinity": float(fields[1]), "rmsd_lb": float(fields[2]),
                         "rmsd_ub": float(fields[3])}
                    )
        return results

    def get_results(self):
        return self.results

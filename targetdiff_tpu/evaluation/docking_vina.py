"""AutoDock Vina docking wrapper (host-side, external tools).

Counterpart of reference utils/evaluation/docking_vina.py: ligand/receptor
PDBQT preparation and score_only / minimize / dock runs. External dependencies
(python `vina` package or the `vina` binary, meeko, pdb2pqr, AutoDockTools /
OpenBabel) are probed at call time; a clear DockingUnavailable error is raised
when absent — identical in spirit to the reference, which also shells out to
these tools (docking_vina.py:56-77, :113-144).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Dict, List, Optional

import numpy as np

from ..chem.mol import Molecule
from ..chem.pdb import PDBProtein
from ..chem.sdf import write_sdf


class DockingUnavailable(RuntimeError):
    pass


def _which(*names):
    for n in names:
        p = shutil.which(n)
        if p:
            return p
    return None


class PrepLig:
    """Ligand -> PDBQT via meeko (preferred) or obabel
    (reference: docking_vina.py:25-53)."""

    def __init__(self, mol: Molecule):
        self.mol = mol

    def to_pdbqt(self, out_path: str) -> str:
        sdf_path = out_path + ".sdf"
        write_sdf(self.mol, sdf_path)
        try:
            from meeko import MoleculePreparation  # noqa: F401

            # meeko python API needs an RDKit mol; go through RDKit if present
            from rdkit import Chem

            rdmol = Chem.MolFromMolFile(sdf_path, removeHs=False)
            prep = MoleculePreparation()
            prep.prepare(rdmol)
            prep.write_pdbqt_file(out_path)
            return out_path
        except ImportError:
            pass
        obabel = _which("obabel")
        if obabel is None:
            raise DockingUnavailable("neither meeko+rdkit nor obabel available for ligand prep")
        subprocess.run([obabel, sdf_path, "-O", out_path, "--partialcharge", "gasteiger"],
                       check=True, capture_output=True)
        return out_path


class PrepProt:
    """Receptor PDB -> PDBQT via pdb2pqr + prepare_receptor4 or obabel
    (reference: docking_vina.py:56-77)."""

    def __init__(self, pdb_path: str):
        self.pdb_path = pdb_path

    def to_pdbqt(self, out_path: str) -> str:
        prep4 = _which("prepare_receptor4.py", "prepare_receptor")
        if prep4:
            subprocess.run([prep4, "-r", self.pdb_path, "-o", out_path],
                           check=True, capture_output=True)
            return out_path
        obabel = _which("obabel")
        if obabel is None:
            raise DockingUnavailable("no receptor prep tool (prepare_receptor4/obabel)")
        subprocess.run([obabel, self.pdb_path, "-xr", "-O", out_path],
                       check=True, capture_output=True)
        return out_path


class VinaDock:
    """score_only / minimize / dock via the python vina API or binary
    (reference: docking_vina.py:80-144)."""

    def __init__(self, lig_pdbqt: str, prot_pdbqt: str):
        self.lig = lig_pdbqt
        self.prot = prot_pdbqt
        self.pocket_center: Optional[List[float]] = None
        self.box_size: Optional[List[float]] = None

    def get_box(self, ref_pos: np.ndarray, buffer: float = 9.0):
        """Box from ligand extent + buffer (reference: docking_vina.py:91-112)."""
        lo, hi = ref_pos.min(0), ref_pos.max(0)
        self.pocket_center = ((lo + hi) / 2).tolist()
        self.box_size = (hi - lo + 2 * buffer).tolist()

    def dock(self, score_func="vina", seed=0, mode="dock", exhaustiveness=8, save_pose=False):
        try:
            from vina import Vina
        except ImportError:
            return self._dock_binary(mode, exhaustiveness, seed)
        v = Vina(sf_name=score_func, seed=seed, verbosity=0)
        v.set_receptor(self.prot)
        v.set_ligand_from_file(self.lig)
        v.compute_vina_maps(center=self.pocket_center, box_size=self.box_size)
        if mode == "score_only":
            score = v.score()[0]
            pose = None
        elif mode == "minimize":
            score = v.optimize()[0]
            pose = None
        elif mode == "dock":
            v.dock(exhaustiveness=exhaustiveness, n_poses=1)
            score = v.energies(n_poses=1)[0][0]
            pose = v.poses(n_poses=1) if save_pose else None
        else:
            raise ValueError(mode)
        return float(score), pose

    def _dock_binary(self, mode, exhaustiveness, seed):
        vina_bin = _which("vina", "qvina2", "qvina02")
        if vina_bin is None:
            raise DockingUnavailable("no python-vina API and no vina binary on PATH")
        out = self.lig.replace(".pdbqt", "_out.pdbqt")
        cmd = [
            vina_bin, "--receptor", self.prot, "--ligand", self.lig,
            "--center_x", str(self.pocket_center[0]),
            "--center_y", str(self.pocket_center[1]),
            "--center_z", str(self.pocket_center[2]),
            "--size_x", str(self.box_size[0]),
            "--size_y", str(self.box_size[1]),
            "--size_z", str(self.box_size[2]),
            "--seed", str(seed), "--out", out,
        ]
        if mode == "score_only":
            cmd.append("--score_only")
        else:
            cmd += ["--exhaustiveness", str(exhaustiveness)]
        res = subprocess.run(cmd, capture_output=True, text=True, check=True)
        for line in res.stdout.splitlines():
            if line.strip().startswith("1 ") or "Affinity" in line:
                try:
                    return float(line.split()[1]), None
                except (IndexError, ValueError):
                    continue
        raise RuntimeError(f"could not parse vina output:\n{res.stdout[-2000:]}")


class VinaDockingTask:
    """End-to-end docking of a generated molecule against its source receptor
    (reference: docking_vina.py:147-265)."""

    def __init__(self, mol: Molecule, protein_path: str, tmp_dir: Optional[str] = None):
        self.mol = mol
        self.protein_path = protein_path
        self.tmp_dir = tmp_dir or tempfile.mkdtemp(prefix="vina_")

    @classmethod
    def from_generated_mol(cls, mol: Molecule, ligand_filename: str, protein_root: str):
        """Receptor path derivation from the CrossDocked ligand filename
        (reference: docking_vina.py:183-198)."""
        dirname = os.path.dirname(ligand_filename)
        base = os.path.basename(ligand_filename)[:10]
        protein_fn = os.path.join(dirname, base + ".pdb")
        return cls(mol, os.path.join(protein_root, protein_fn))

    def run(self, mode="dock", exhaustiveness=8) -> List[Dict]:
        lig_pdbqt = os.path.join(self.tmp_dir, "ligand.pdbqt")
        prot_pdbqt = os.path.join(self.tmp_dir, "receptor.pdbqt")
        PrepLig(self.mol).to_pdbqt(lig_pdbqt)
        PrepProt(self.protein_path).to_pdbqt(prot_pdbqt)
        dock = VinaDock(lig_pdbqt, prot_pdbqt)
        dock.get_box(self.mol.positions())
        score, pose = dock.dock(mode=mode, exhaustiveness=exhaustiveness)
        return [{"affinity": score, "pose": pose, "mode": mode}]

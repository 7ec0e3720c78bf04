"""Lightweight UFF-style geometry relaxation (host-side, NumPy).

Counterpart of the reference's ``UFFOptimizeMolecule(ligand_rdmol)`` call in
its QVina docking prep (reference: utils/evaluation/docking_qvina.py:117-119).
When RDKit is installed the exact UFF optimizer is used (chem.backend gating);
this module is the dependency-free fallback: a reduced UFF energy —
harmonic bond stretch (natural lengths from Rappé et al. covalent radii +
bond-order and electronegativity corrections), cosine angle bend with
hybridization-derived natural angles, and 12-6 Lennard-Jones vdW between
atoms separated by >2 bonds — minimized with backtracking steepest descent.

The goal matches the reference protocol's: clean up diffusion-generated
geometry (stretched bonds, clashes) before PDBQT conversion so docking scores
are comparable — not to reproduce RDKit's UFF energies to the kcal.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .mol import Molecule

# UFF atomic parameters (Rappé et al., JACS 1992, Table 1): element Z ->
# (r1 valence-bond radius, theta0 deg, x1 vdW distance, D1 vdW well depth,
# chi GMP electronegativity). sp3 rows; common SBDD elements.
_UFF = {
    1: (0.354, 180.0, 2.886, 0.044, 4.528),
    6: (0.757, 109.47, 3.851, 0.105, 5.343),
    7: (0.700, 106.7, 3.660, 0.069, 6.899),
    8: (0.658, 104.51, 3.500, 0.060, 8.741),
    9: (0.668, 180.0, 3.364, 0.050, 10.874),
    15: (1.101, 93.8, 4.147, 0.274, 5.463),
    16: (1.064, 92.1, 4.035, 0.274, 6.928),
    17: (1.044, 180.0, 3.947, 0.227, 8.564),
    35: (1.192, 180.0, 4.189, 0.251, 7.790),
    53: (1.382, 180.0, 4.50, 0.339, 6.822),
}
_DEFAULT = (1.0, 109.47, 4.0, 0.1, 5.0)

# sp2/sp1 valence radii corrections (UFF "C_2"/"C_R"/"C_1" rows)
_R_SP2 = {6: 0.729, 7: 0.699, 8: 0.680}
_R_AR = {6: 0.729, 7: 0.699, 8: 0.680}
_R_SP1 = {6: 0.706, 7: 0.656, 8: 0.639}


def _params(z: int):
    return _UFF.get(z, _DEFAULT)


def _hybridization(mol: Molecule, i: int) -> int:
    """3 = sp3, 2 = sp2/aromatic, 1 = sp."""
    a = mol.atoms[i]
    if a.aromatic:
        return 2
    orders = [b.order for b in mol.bonds_of(i)]
    if any(o >= 3 for o in orders) or sum(1 for o in orders if o == 2) >= 2:
        return 1
    if any(o == 2 for o in orders):
        return 2
    return 3


def _r_valence(mol: Molecule, i: int) -> float:
    z = mol.atoms[i].z
    hyb = _hybridization(mol, i)
    if hyb == 1 and z in _R_SP1:
        return _R_SP1[z]
    if hyb == 2 and z in _R_SP2:
        return _R_SP2[z]
    return _params(z)[0]


def natural_bond_length(mol: Molecule, i: int, j: int, order: float) -> float:
    """UFF natural bond length r_ij = r_i + r_j + r_BO + r_EN
    (Rappé eq. 2-4)."""
    ri, rj = _r_valence(mol, i), _r_valence(mol, j)
    chi_i, chi_j = _params(mol.atoms[i].z)[4], _params(mol.atoms[j].z)[4]
    r_bo = -0.1332 * (ri + rj) * math.log(max(order, 0.5))
    den = chi_i * ri + chi_j * rj
    r_en = 0.0
    if den > 0:
        r_en = (
            ri * rj * (math.sqrt(chi_i) - math.sqrt(chi_j)) ** 2 / den
        )
    return ri + rj + r_bo - r_en


def _natural_angle(mol: Molecule, j: int) -> float:
    """Natural angle at center j in radians."""
    hyb = _hybridization(mol, j)
    if hyb == 1:
        return math.pi
    if hyb == 2:
        return math.radians(120.0)
    return math.radians(_params(mol.atoms[j].z)[1])


class _Terms:
    def __init__(self, mol: Molecule):
        n = mol.num_atoms
        self.n = n
        bonds: List[Tuple[int, int, float, float]] = []
        for b in mol.bonds:
            order = 1.5 if b.aromatic else float(b.order)
            r0 = natural_bond_length(mol, b.a1, b.a2, order)
            # UFF force constant k = 664.12 * Zi*Zj / r^3; use effective
            # charges folded to a flat 700 kcal/(mol A^2) — adequate for
            # geometry cleanup and keeps the line search well-conditioned.
            bonds.append((b.a1, b.a2, r0, 700.0))
        self.bonds = bonds

        angles: List[Tuple[int, int, int, float, float]] = []
        for j in range(n):
            nbrs = mol.neighbors(j)
            t0 = _natural_angle(mol, j)
            for a in range(len(nbrs)):
                for c in range(a + 1, len(nbrs)):
                    angles.append((nbrs[a], j, nbrs[c], t0, 100.0))
        self.angles = angles

        # nonbonded: all pairs minus 1-2 and 1-3
        excl = set()
        for i, j, *_ in bonds:
            excl.add((min(i, j), max(i, j)))
        for i, j, k, *_ in angles:
            excl.add((min(i, k), max(i, k)))
        pairs = []
        for i in range(n):
            for j in range(i + 1, n):
                if (i, j) in excl:
                    continue
                xi, di = _params(mol.atoms[i].z)[2], _params(mol.atoms[i].z)[3]
                xj, dj = _params(mol.atoms[j].z)[2], _params(mol.atoms[j].z)[3]
                pairs.append((i, j, math.sqrt(xi * xj), math.sqrt(di * dj)))
        self.pairs = pairs

        self.bond_idx = np.array([(b[0], b[1]) for b in bonds], np.int64).reshape(-1, 2)
        self.bond_r0 = np.array([b[2] for b in bonds])
        self.bond_k = np.array([b[3] for b in bonds])
        self.ang_idx = np.array([(a[0], a[1], a[2]) for a in angles], np.int64).reshape(-1, 3)
        self.ang_t0 = np.array([a[3] for a in angles])
        self.ang_k = np.array([a[4] for a in angles])
        self.nb_idx = np.array([(p[0], p[1]) for p in pairs], np.int64).reshape(-1, 2)
        self.nb_x = np.array([p[2] for p in pairs])
        self.nb_d = np.array([p[3] for p in pairs])


def _energy_grad(t: _Terms, pos: np.ndarray) -> Tuple[float, np.ndarray]:
    e = 0.0
    g = np.zeros_like(pos)
    if len(t.bond_r0):
        vi = pos[t.bond_idx[:, 0]] - pos[t.bond_idx[:, 1]]
        r = np.linalg.norm(vi, axis=1)
        dr = r - t.bond_r0
        e += float((0.5 * t.bond_k * dr**2).sum())
        f = (t.bond_k * dr / np.maximum(r, 1e-8))[:, None] * vi
        np.add.at(g, t.bond_idx[:, 0], f)
        np.add.at(g, t.bond_idx[:, 1], -f)
    if len(t.ang_t0):
        a = pos[t.ang_idx[:, 0]]
        b = pos[t.ang_idx[:, 1]]
        c = pos[t.ang_idx[:, 2]]
        u, v = a - b, c - b
        nu = np.linalg.norm(u, axis=1)
        nv = np.linalg.norm(v, axis=1)
        cosq = (u * v).sum(1) / np.maximum(nu * nv, 1e-8)
        cosq = np.clip(cosq, -1.0, 1.0)
        # harmonic in cos(theta): E = k (cos t - cos t0)^2 — smooth at 180
        dc = cosq - np.cos(t.ang_t0)
        e += float((t.ang_k * dc**2).sum())
        pref = (2.0 * t.ang_k * dc)[:, None]
        uhat = u / np.maximum(nu, 1e-8)[:, None]
        vhat = v / np.maximum(nv, 1e-8)[:, None]
        # d cos/d a = (v_hat - u_hat cos)/|u|;  d cos/d c = (u_hat - v_hat cos)/|v|
        du = (vhat - uhat * cosq[:, None]) / np.maximum(nu, 1e-8)[:, None]
        dv = (uhat - vhat * cosq[:, None]) / np.maximum(nv, 1e-8)[:, None]
        np.add.at(g, t.ang_idx[:, 0], pref * du)
        np.add.at(g, t.ang_idx[:, 2], pref * dv)
        np.add.at(g, t.ang_idx[:, 1], -pref * (du + dv))
    if len(t.nb_x):
        vi = pos[t.nb_idx[:, 0]] - pos[t.nb_idx[:, 1]]
        r = np.linalg.norm(vi, axis=1)
        r = np.maximum(r, 0.3)
        s = t.nb_x / r
        s6 = s**6
        e += float((t.nb_d * (s6 * s6 - 2.0 * s6)).sum())
        dEdr = t.nb_d * 12.0 * (s6 - s6 * s6) / r
        f = (dEdr / r)[:, None] * vi
        np.add.at(g, t.nb_idx[:, 0], f)
        np.add.at(g, t.nb_idx[:, 1], -f)
    return e, g


def uff_optimize(
    mol: Molecule,
    max_iters: int = 300,
    tol: float = 1e-4,
    step0: float = 1e-3,
) -> Molecule:
    """Relax ``mol`` geometry in place and return it.

    Backtracking steepest descent on the reduced UFF energy. Mirrors the
    role of the reference's ``UFFOptimizeMolecule`` before docking prep
    (reference docking_qvina.py:117-119): fix distorted bond lengths/clashes
    from generated coordinates without changing connectivity.
    """
    if mol.num_atoms < 2 or not mol.bonds:
        return mol
    t = _Terms(mol)
    pos = mol.positions().astype(np.float64)
    e, g = _energy_grad(t, pos)
    step = step0
    for _ in range(max_iters):
        gn = float(np.linalg.norm(g))
        if gn < tol * mol.num_atoms:
            break
        d = -g / max(gn, 1e-12)
        # backtracking line search
        ok = False
        for _ls in range(20):
            trial = pos + step * gn * d
            e2, g2 = _energy_grad(t, trial)
            if e2 < e:
                pos, e, g = trial, e2, g2
                step *= 1.3
                ok = True
                break
            step *= 0.5
        if not ok:
            break
    for i, a in enumerate(mol.atoms):
        a.pos = pos[i].copy()
    return mol


def relax_for_docking(mol: Molecule, use_uff: bool = True) -> Molecule:
    """Docking prep relaxation with the reference's gate semantics
    (use_uff flag, reference docking_qvina.py:116-119). Exact RDKit UFF
    when available; reduced native UFF otherwise."""
    if not use_uff:
        return mol
    from . import backend

    if backend.HAVE_RDKIT:
        try:
            from rdkit import Chem
            from rdkit.Chem.AllChem import UFFOptimizeMolecule

            rd = backend.to_rdkit(mol)
            if rd is not None:
                rdh = Chem.AddHs(rd, addCoords=True)
                UFFOptimizeMolecule(rdh)
                rdh = Chem.RemoveHs(rdh)
                conf = rdh.GetConformer(0)
                for i in range(min(mol.num_atoms, rdh.GetNumAtoms())):
                    p = conf.GetAtomPosition(i)
                    mol.atoms[i].pos = np.array([p.x, p.y, p.z])
                return mol
        except Exception:
            pass
    return uff_optimize(mol)

"""Point cloud -> molecule reconstruction.

Counterpart of the reference's liGAN-derived OpenBabel/RDKit pipeline
(reference: utils/reconstruct.py:56-518 — `make_obmol`, `connect_the_dots`,
`convert_ob_mol_to_rd_mol`, `postprocess_rd_mol_1/2`,
`reconstruct_from_generated`), implemented natively:

  1. candidate bonds from covalent radii (d < r_i + r_j + tolerance);
  2. hypervalency repair — drop the longest/most-stretched bonds first while
     an atom exceeds its allowed neighbor count (the reference sorts by a
     "bond stretch" criterion, reconstruct.py:143-183);
  3. aromatic-ring handling from the generated aromaticity channel;
  4. bond-order assignment: distance-based order hints (the same empirical
     tables as the stability metric) reconciled against free valences, plus
     ring kekulization by perfect matching.

Raises MolReconsError on failure, mirroring the reference's contract
(reconstruct.py:17).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from . import periodic as PT
from .mol import Molecule

# maximum plausible neighbor count per element (OpenBabel-style)
MAX_NEIGHBORS = {1: 1, 5: 4, 6: 4, 7: 4, 8: 2, 9: 1, 15: 5, 16: 6, 17: 1, 35: 1, 53: 1,
                 14: 4, 34: 6}


class MolReconsError(Exception):
    pass


def _candidate_bonds(pos: np.ndarray, z: Sequence[int], tol: float = 0.45):
    """All pairs within covalent-radius sum + tol (and > 0.4 A apart)."""
    from ..utils.native import get_native

    nat = get_native()
    if nat is not None:
        return nat.candidate_bonds(
            [float(v) for v in np.asarray(pos, np.float64).ravel()],
            [int(e) for e in z], float(tol),
        )
    n = len(pos)
    radii = np.array([PT.covalent_radius(int(e)) for e in z])
    diff = pos[:, None, :] - pos[None, :, :]
    d = np.sqrt((diff**2).sum(-1))
    thresh = radii[:, None] + radii[None, :] + tol
    cands = []
    for i in range(n):
        for j in range(i + 1, n):
            if 0.4 < d[i, j] < thresh[i, j]:
                # stretch = actual / ideal; lower is more credible
                stretch = d[i, j] / (radii[i] + radii[j])
                cands.append((i, j, d[i, j], stretch))
    return cands


def _reachable(adj: dict, a: int, b: int) -> bool:
    """Is b reachable from a WITHOUT using the direct a-b edge?"""
    seen = {a}
    stack = [a]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if u == a and v == b:
                continue
            if v == b:
                return True
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return False


def _prune_bonds(n: int, z: Sequence[int], bonds: List[tuple]) -> List[tuple]:
    """Connectivity-aware pruning mirroring the reference's connect-the-dots
    (reconstruct.py:104-185):
      1. drop halogen-halogen bonds (both max-valence-1 atoms);
      2. remove excessively stretched bonds (stretch > 1.2), most-stretched
         first, unless removal would disconnect the molecule;
      3. hypervalency repair: while an atom exceeds its max neighbor count,
         remove its most-stretched bond with stretch >= 0.9 unless that
         disconnects; as a last resort remove regardless of stretch.
    """
    maxb = {i: MAX_NEIGHBORS.get(int(z[i]), 4) for i in range(n)}
    edges = {(i, j): (d, s) for (i, j, d, s) in bonds}
    # 1. halogen-halogen
    edges = {e: v for e, v in edges.items() if not (maxb[e[0]] == 1 and maxb[e[1]] == 1)}

    def build_adj():
        adj = {i: set() for i in range(n)}
        for (i, j) in edges:
            adj[i].add(j)
            adj[j].add(i)
        return adj

    # 2. stretched bonds, worst first
    adj = build_adj()
    for (i, j), (d, s) in sorted(edges.items(), key=lambda kv: -kv[1][1]):
        if s <= 1.2:
            break
        if _reachable(adj, i, j):
            del edges[(i, j)]
            adj[i].discard(j)
            adj[j].discard(i)

    # 3. hypervalency repair, most-constrained atoms first
    adj = build_adj()
    order = sorted(range(n), key=lambda i: (maxb[i], -(len(adj[i]) - maxb[i])))
    for a in order:
        for relax in (False, True):
            if len(adj[a]) <= maxb[a]:
                break
            abonds = sorted(
                ((i, j) for (i, j) in edges if a in (i, j)),
                key=lambda e: -edges[e][1],
            )
            for (i, j) in abonds:
                if len(adj[a]) <= maxb[a]:
                    break
                if not relax and edges[(i, j)][1] < 0.9:
                    continue  # too compressed to be a bogus bond
                other = j if a == i else i
                if len(adj[other]) > maxb[other] or len(adj[a]) > maxb[a]:
                    if not _reachable(adj, i, j) and len(adj[a]) - 1 >= 1:
                        # removal would fragment; only allow when hopeless
                        if not relax:
                            continue
                    del edges[(i, j)]
                    adj[i].discard(j)
                    adj[j].discard(i)

    return [(i, j, d, s) for (i, j), (d, s) in edges.items()]


def _free_valence(mol: Molecule, i: int) -> int:
    z = mol.atoms[i].z
    states = PT.VALENCE_STATES.get(z, (PT.DEFAULT_VALENCES.get(z, 4),))
    ev = mol.explicit_valence(i)
    for t in states:
        if ev <= t - 1e-6:
            return int(round(t - ev))
    return 0


def _assign_bond_orders(mol: Molecule) -> None:
    """Upgrade single bonds to double/triple where distances indicate and
    both ends have free valence; shortest (most compressed) bonds first."""
    from ..evaluation.analyze import get_bond_order

    scored = []
    for bidx, b in enumerate(mol.bonds):
        if b.aromatic:
            continue
        d = float(np.linalg.norm(mol.atoms[b.a1].pos - mol.atoms[b.a2].pos))
        hint = get_bond_order(mol.atoms[b.a1].symbol, mol.atoms[b.a2].symbol, d)
        if hint >= 2:
            scored.append((d, bidx, hint))
    scored.sort()
    for d, bidx, hint in scored:
        b = mol.bonds[bidx]
        want = hint - b.order
        while want > 0 and _free_valence(mol, b.a1) > 0 and _free_valence(mol, b.a2) > 0:
            b.order += 1
            want -= 1


def _kekulize_aromatic(mol: Molecule, aromatic_atoms: Sequence[int]) -> None:
    """Mark ring bonds among flagged atoms aromatic and kekulize by greedy
    matching: each aromatic C (and flagged N without H) gets one in-ring
    double bond."""
    arom = set(aromatic_atoms)
    ring_bonds = []
    in_6ring = set()
    for ring in mol.rings():
        if all(i in arom for i in ring):
            rs = set(ring)
            if len(ring) == 6:
                in_6ring |= rs
            for b in mol.bonds:
                if b.a1 in rs and b.a2 in rs:
                    b.aromatic = True
                    ring_bonds.append(b)
    # kekulized orders via maximum matching (greedy fails on unlucky bond
    # orderings, e.g. benzene picking two non-adjacent doubles and stranding
    # two atoms); augmenting-path search covers paths and even cycles, which
    # is what aromatic systems reduce to once lone-pair donors are excluded.
    # Carbons always participate; ring N participates in 6-rings only
    # (pyridine-type N=C) — in 5-rings the N is the lone-pair donor
    # (pyrrole) and keeps its single bonds.
    needs = {
        i
        for b in ring_bonds
        for i in (b.a1, b.a2)
        if (mol.atoms[i].z == 6 or (mol.atoms[i].z == 7 and i in in_6ring))
        and _free_valence_kekule(mol, i)
    }
    adj = {i: [] for i in needs}
    for b in ring_bonds:
        if b.a1 in needs and b.a2 in needs:
            adj[b.a1].append(b.a2)
            adj[b.a2].append(b.a1)
    match: dict = {}

    def augment(u, visited):
        for v in adj[u]:
            if v in visited:
                continue
            visited.add(v)
            if v not in match or augment(match[v], visited):
                match[v] = u
                match[u] = v
                return True
        return False

    for u in sorted(needs):
        if u not in match:
            augment(u, {u})
    for b in ring_bonds:
        if match.get(b.a1) == b.a2:
            b.order = 2


def _free_valence_kekule(mol: Molecule, i: int) -> bool:
    v = sum(b.order for b in mol.bonds_of(i))
    return v < PT.DEFAULT_VALENCES.get(mol.atoms[i].z, 4)


# aromatic (delocalized) bond-length windows per element pair, Angstrom:
# between the double-bond and single-bond regimes, generously widened for
# generated-geometry noise. Crystallographic aromatic means: CC 1.39,
# CN 1.34, CO 1.36, CS 1.71, NN 1.35.
_AROMATIC_WINDOWS = {
    (6, 6): (1.30, 1.46),
    (6, 7): (1.27, 1.42),
    (6, 8): (1.29, 1.42),
    (6, 16): (1.62, 1.79),
    (7, 7): (1.27, 1.42),
}
_AROMATIC_PLANARITY_RMS = 0.12  # A, rms out-of-plane deviation


def _geometric_aromatic_rings(mol: Molecule) -> List[List[int]]:
    """Aromatic 5/6-rings detected from GEOMETRY: every ring bond length in
    the delocalized window for its element pair, and the ring near-planar.

    This is the behavior the reference inherits from OpenBabel, whose
    PerceiveBondOrders aromatizes planar rings at intermediate bond lengths
    (reference: utils/reconstruct.py:474-509 perceives + majority-vote
    aromatizes rings from raw coordinates) — a benzene generated at the
    delocalized 1.39 A geometry must come back aromatic, not as a
    cyclohexane whose distances match no bond-order table row."""
    out = []
    for ring in mol.rings():
        m = len(ring)
        if m not in (5, 6):
            continue
        zs = [mol.atoms[i].z for i in ring]
        if any(z not in (6, 7, 8, 16) for z in zs):
            continue
        pos = np.asarray([mol.atoms[i].pos for i in ring], np.float64)
        adj = {i: mol.neighbors(i) for i in ring}
        ok = True
        for k, i in enumerate(ring):
            # ring order as returned is path order; verify consecutive
            # vertices really are bonded before measuring their length
            j = ring[(k + 1) % m]
            if j not in adj[i]:
                ok = False
                break
            w = _AROMATIC_WINDOWS.get(
                (min(mol.atoms[i].z, mol.atoms[j].z), max(mol.atoms[i].z, mol.atoms[j].z))
            )
            if w is None:
                ok = False
                break
            d = float(np.linalg.norm(np.asarray(mol.atoms[i].pos) - np.asarray(mol.atoms[j].pos)))
            if not (w[0] <= d <= w[1]):
                ok = False
                break
        if not ok:
            continue
        centered = pos - pos.mean(0)
        # smallest singular value = rms mass out of the best-fit plane
        sv = np.linalg.svd(centered, compute_uv=False)
        if sv[-1] / np.sqrt(m) > _AROMATIC_PLANARITY_RMS:
            continue
        out.append(ring)
    return out


def reconstruct_from_generated(
    xyz: np.ndarray,
    atomic_nums: Sequence[int],
    aromatic: Optional[Sequence[bool]] = None,
    basic_mode: bool = True,
) -> Molecule:
    """(reference: utils/reconstruct.py:455-518). Returns a chem.Molecule with
    3D coordinates, perceived bonds and orders; raises MolReconsError if no
    chemically sensible molecule can be built."""
    try:
        pos = np.asarray(xyz, np.float64).reshape(-1, 3)
        z = [int(a) for a in atomic_nums]
        n = len(z)
        if n == 0:
            raise MolReconsError("empty molecule")

        cands = _candidate_bonds(pos, z)
        bonds = _prune_bonds(n, z, cands)

        mol = Molecule()
        for i in range(n):
            mol.add_atom(z[i], pos=pos[i])
        for (i, j, d, s) in bonds:
            mol.add_bond(i, j, order=1)

        if aromatic is not None and not basic_mode:
            flagged = [i for i, a in enumerate(aromatic) if a]
            for i in flagged:
                mol.atoms[i].aromatic = True
            _kekulize_aromatic(mol, flagged)
        else:
            # geometry-perceived aromaticity (the OpenBabel-equivalent leg
            # of the reference pipeline): planar rings at delocalized bond
            # lengths become aromatic and are kekulized BEFORE the
            # distance-table order assignment, so in-ring near-double
            # distances don't consume valence the kekulization needs
            geo = _geometric_aromatic_rings(mol)
            if geo:
                flat = sorted({i for r in geo for i in r})
                for i in flat:
                    mol.atoms[i].aromatic = True
                _kekulize_aromatic(mol, flat)
        _assign_bond_orders(mol)
        if aromatic is None or basic_mode:
            mol.perceive_aromaticity()

        _sanity_check(mol)
        return mol
    except MolReconsError:
        raise
    except Exception as e:
        raise MolReconsError(f"reconstruction failed: {type(e).__name__}: {e}") from e


def _sanity_check(mol: Molecule) -> None:
    for i, a in enumerate(mol.atoms):
        ev = mol.explicit_valence(i)
        states = PT.VALENCE_STATES.get(a.z, (PT.DEFAULT_VALENCES.get(a.z, 4),))
        if ev > max(states) + 1.0:
            raise MolReconsError(
                f"atom {i} ({a.symbol}) hypervalent: valence {ev} > {max(states)}"
            )
    # fragmented outputs are allowed (the downstream completeness check
    # rejects '.'-containing SMILES, reference evaluate_diffusion.py:100) —
    # only a fully bond-less multi-atom cloud is hopeless
    if mol.num_atoms > 2 and len(mol.bonds) == 0:
        raise MolReconsError("no bonds perceived")

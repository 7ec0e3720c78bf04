"""Molecular stability metric via empirical bond-order lookup tables.

Counterpart of the reference's analyze module
(reference: utils/evaluation/analyze.py): pairwise distances are compared to
empirical single/double/triple bond-length tables (with margins 10/5/3 pm) to
infer bond orders; an atom is stable when its inferred total valence equals
the allowed valence for its element. The tables (reference:
utils/evaluation/analyze.py:10-57 — published bond-length data) are stored as
a JSON resource.
"""

from __future__ import annotations

import gzip
import json
from importlib import resources as importlib_resources
from typing import Sequence

import numpy as np

from ..chem import periodic as PT

_TABLES = None


def _tables():
    global _TABLES
    if _TABLES is None:
        pkg = importlib_resources.files("targetdiff_tpu") / "resources" / "bond_order_tables.json.gz"
        with pkg.open("rb") as f:
            _TABLES = json.loads(gzip.decompress(f.read()))
    return _TABLES


def get_bond_order(atom1: str, atom2: str, distance: float) -> int:
    """Bond order (0-3) from distance in Angstrom
    (reference: utils/evaluation/analyze.py:91-103). Margins in pm:
    single +10, double +5, triple +3."""
    t = _tables()
    d = 100 * distance  # pm
    b1, b2, b3 = t["bonds1"], t["bonds2"], t["bonds3"]
    m1, m2, m3 = t["margins"]
    if atom1 in b1 and atom2 in b1[atom1]:
        thr1 = b1[atom1][atom2] + m1
        if d < thr1:
            order = 1
            if atom1 in b2 and atom2 in b2.get(atom1, {}):
                thr2 = b2[atom1][atom2] + m2
                if d < thr2:
                    order = 2
                    if atom1 in b3 and atom2 in b3.get(atom1, {}):
                        thr3 = b3[atom1][atom2] + m3
                        if d < thr3:
                            order = 3
            return order
    return 0


def check_stability(
    positions: np.ndarray,
    atom_types: Sequence[int],
    debug: bool = False,
    hs: bool = False,
    return_nr_bonds: bool = False,
):
    """(molecule_stable, n_stable_atoms, n_atoms)
    (reference: utils/evaluation/analyze.py:106-143). `atom_types` are atomic
    numbers. Without explicit hydrogens (hs=False) an atom is stable when
    0 < inferred valence <= allowed valence; with hs it must match exactly."""
    t = _tables()
    allowed = t["allowed_bonds"]
    pos = np.asarray(positions, np.float64)
    n = len(pos)
    assert len(atom_types) == n

    sym = [PT.symbol(int(z)) for z in atom_types]
    valences = _count_valences(pos, atom_types, sym, n)

    n_stable = 0
    for i in range(n):
        a = allowed.get(sym[i])
        if a is None:
            continue
        if hs:
            ok = valences[i] == a
        else:
            ok = 0 < valences[i] <= a
        if debug and not ok:
            print(f"unstable {sym[i]}: valence {valences[i]} allowed {a}")
        n_stable += int(ok)
    if return_nr_bonds:
        return n_stable == n, int(n_stable), n, valences
    return n_stable == n, int(n_stable), n


_NATIVE_TABLE = None


def _native_table():
    """Flatten the bond tables into the 'Z1_Z2' -> (b1,b2,b3) form the C++
    kernel consumes (symmetric pairs included once per direction)."""
    global _NATIVE_TABLE
    if _NATIVE_TABLE is None:
        t = _tables()
        sym2z = {"H": 1, "C": 6, "N": 7, "O": 8, "F": 9, "P": 15, "S": 16, "Cl": 17}
        out = {}
        for s1, inner in t["bonds1"].items():
            for s2, v1 in inner.items():
                z1, z2 = sym2z.get(s1), sym2z.get(s2)
                if z1 is None or z2 is None:
                    continue
                v2 = t["bonds2"].get(s1, {}).get(s2, -1)
                v3 = t["bonds3"].get(s1, {}).get(s2, -1)
                out[f"{z1}_{z2}"] = (float(v1), float(v2), float(v3))
        _NATIVE_TABLE = out
    return _NATIVE_TABLE


def _count_valences(pos, atom_types, sym, n):
    from ..utils.native import get_native

    nat = get_native()
    if nat is not None:
        vals = nat.bond_order_valences(
            [float(v) for v in np.asarray(pos, np.float64).ravel()],
            [int(z) for z in atom_types],
            _native_table(),
        )
        return np.asarray(vals, np.int64)
    valences = np.zeros(n, np.int64)
    for i in range(n):
        for j in range(i + 1, n):
            dist = float(np.linalg.norm(pos[i] - pos[j]))
            order = get_bond_order(sym[i], sym[j], dist)
            valences[i] += order
            valences[j] += order
    return valences


# -- distribution distances (reference: utils/evaluation/analyze.py:60-88) --


def kl_divergence(p_hist, q_hist, eps: float = 1e-10) -> float:
    p = np.asarray(p_hist, np.float64) + eps
    q = np.asarray(q_hist, np.float64) + eps
    p, q = p / p.sum(), q / q.sum()
    return float(np.sum(p * np.log(p / q)))


def js_divergence(p_hist, q_hist, eps: float = 1e-10) -> float:
    p = np.asarray(p_hist, np.float64) + eps
    q = np.asarray(q_hist, np.float64) + eps
    p, q = p / p.sum(), q / q.sum()
    m = 0.5 * (p + q)
    return float(0.5 * np.sum(p * np.log(p / m)) + 0.5 * np.sum(q * np.log(q / m)))


def emd(p_hist, q_hist) -> float:
    p = np.asarray(p_hist, np.float64)
    q = np.asarray(q_hist, np.float64)
    p, q = p / max(p.sum(), 1e-10), q / max(q.sum(), 1e-10)
    return float(np.abs(np.cumsum(p) - np.cumsum(q)).sum())

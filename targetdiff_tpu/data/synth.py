"""Synthetic-but-chemically-sane pocket/ligand complexes.

Serves two in-image needs the (absent) CrossDocked data would otherwise
fill (VERDICT r3 #2):

  * a multi-complex TRAINING corpus whose ligands have real covalent
    geometry — ideal bond lengths per element pair, tetrahedral-ish
    angles, valence caps, no non-bonded clashes — so the frozen empirical
    metrics (bond-length JSD, atom stability) are meaningful targets for
    the trained-vs-untrained quality gate (tools/quality_gate.py);
  * realistic pocket GEOMETRY for benchmarks: protein atoms fill a
    2-10 A shell around the ligand at ~protein density, matching the
    reference's pocket10 extraction rule
    (reference: scripts/data_preparation/extract_pockets.py:30-46).

Ligand atom types use the 'add_aromatic' 13-class vocabulary
(data/transforms.py) with aromatic=False classes only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .batch import ComplexBatch
from .transforms import MAP_ATOM_TYPE_AROMATIC_TO_INDEX

# ideal single-bond lengths (Angstrom) between heavy atoms
_BOND = {
    (6, 6): 1.54, (6, 7): 1.47, (6, 8): 1.43, (6, 9): 1.35,
    (7, 7): 1.45, (7, 8): 1.40, (8, 8): 1.48, (7, 9): 1.40, (8, 9): 1.42,
}
# max heavy-atom degree (implicit hydrogens absorb the rest)
_MAXDEG = {6: 4, 7: 3, 8: 2, 9: 1}
_ELEMS = np.array([6, 7, 8, 9])
_ELEM_P = np.array([0.72, 0.12, 0.13, 0.03])


def _bond_len(z1: int, z2: int) -> float:
    return _BOND.get((min(z1, z2), max(z1, z2)), 1.5)


# realistic bond-length variance: crystallographic/thermal spread of
# heavy-atom single bonds is ~0.01-0.03 A. Ideal (zero-variance) bonds
# make any histogram JSD vs the corpus degenerate at the reference's
# 5 mA DISTANCE_BINS (a delta profile overlaps nothing), so sampled
# geometry could never score well no matter how good the model is.
BOND_SIGMA = 0.02


def synth_ligand(rng: np.random.Generator, n_min: int = 14, n_max: int = 28):
    """One tree-shaped molecule with near-ideal covalent geometry (bond
    lengths ~ N(ideal, BOND_SIGMA)).

    Returns (pos [n,3] f32, atomic_numbers [n] int, v [n] int vocab indices).
    Growth: attach each new atom to a random open site, direction chosen
    among random candidates to maximize clearance from non-bonded atoms
    (keeps inferred bond orders = the intended tree)."""
    n = int(rng.integers(n_min, n_max + 1))
    z = rng.choice(_ELEMS, size=n, p=_ELEM_P)
    # F is terminal-only; make atom 0 a carbon so growth can start anywhere
    z[0] = 6
    pos = np.zeros((n, 3), np.float64)
    deg = np.zeros(n, np.int64)
    for i in range(1, n):
        # open attachment sites: degree below cap, F never branches
        open_sites = [
            j for j in range(i)
            if deg[j] < _MAXDEG[int(z[j])] - (0 if i == n - 1 else 0) and z[j] != 9
        ]
        if not open_sites:
            open_sites = [int(np.argmin(deg[:i]))]
        j = int(open_sites[rng.integers(len(open_sites))])
        blen = _bond_len(int(z[i]), int(z[j])) + float(
            rng.normal(0.0, BOND_SIGMA)
        )
        best, best_clear = None, -1.0
        for _ in range(24):
            d = rng.normal(size=3)
            d /= np.linalg.norm(d) + 1e-12
            cand = pos[j] + d * blen
            others = np.delete(pos[:i], j, axis=0)
            clear = np.linalg.norm(others - cand, axis=1).min() if len(others) else 10.0
            if clear > best_clear:
                best, best_clear = cand, clear
        pos[i] = best
        deg[i] += 1
        deg[j] += 1
    pos -= pos.mean(0)
    v = np.array(
        [MAP_ATOM_TYPE_AROMATIC_TO_INDEX[(int(zz), False)] for zz in z], np.int64
    )
    return pos.astype(np.float32), z.astype(np.int64), v


def synth_pocket(rng: np.random.Generator, lig_pos: np.ndarray, n_protein: int,
                 feat_dim: int = 27):
    """Protein shell 2-10 A around the ligand at uniform density (pocket10
    rule); features are a plausible random one-hot-ish 27-dim vector (the
    protein featurizer's element/amino-acid/backbone blocks)."""
    keep = np.zeros((0, 3), np.float32)
    while len(keep) < n_protein:
        cand = rng.uniform(-14, 14, size=(n_protein * 40, 3)).astype(np.float32)
        cand += lig_pos.mean(0)
        d = np.sqrt(((cand[:, None] - lig_pos[None]) ** 2).sum(-1)).min(1)
        keep = np.concatenate([keep, cand[(d > 2.0) & (d < 10.0)]])
    ppos = keep[:n_protein]
    feat = np.zeros((n_protein, feat_dim), np.float32)
    elem = rng.choice([0, 1, 2, 3], size=n_protein, p=[0.62, 0.17, 0.16, 0.05])
    feat[np.arange(n_protein), elem] = 1.0  # element block (C/N/O/S-ish)
    aa = rng.integers(0, min(20, feat_dim - 7), size=n_protein)
    feat[np.arange(n_protein), 6 + aa] = 1.0
    feat[:, -1] = (rng.random(n_protein) < 0.4).astype(np.float32)  # backbone
    return ppos, feat


def synth_batch(
    rng: np.random.Generator,
    batch: int,
    max_protein: int = 128,
    max_ligand: int = 32,
    n_protein_range=(96, 128),
    n_ligand_range=(14, 28),
    feat_dim: int = 27,
) -> ComplexBatch:
    """A padded ComplexBatch of `batch` independent synthetic complexes."""
    import jax.numpy as jnp

    ppos = np.zeros((batch, max_protein, 3), np.float32)
    pfeat = np.zeros((batch, max_protein, feat_dim), np.float32)
    pmask = np.zeros((batch, max_protein), bool)
    lpos = np.zeros((batch, max_ligand, 3), np.float32)
    lv = np.zeros((batch, max_ligand), np.int64)
    lmask = np.zeros((batch, max_ligand), bool)
    for b in range(batch):
        nl_hi = min(n_ligand_range[1], max_ligand)
        lp, _z, v = synth_ligand(rng, n_ligand_range[0], nl_hi)
        npr = int(rng.integers(*n_protein_range)) if n_protein_range[0] < n_protein_range[1] else n_protein_range[0]
        npr = min(npr, max_protein)
        pp, pf = synth_pocket(rng, lp, npr, feat_dim)
        nl = len(lp)
        lpos[b, :nl] = lp
        lv[b, :nl] = v
        lmask[b, :nl] = True
        ppos[b, :npr] = pp
        pfeat[b, :npr] = pf
        pmask[b, :npr] = True
    return ComplexBatch(
        protein_pos=jnp.asarray(ppos),
        protein_feat=jnp.asarray(pfeat),
        protein_mask=jnp.asarray(pmask),
        ligand_pos=jnp.asarray(lpos),
        ligand_v=jnp.asarray(lv),
        ligand_mask=jnp.asarray(lmask),
    )

"""Host-side kNN-structure analysis for megakernel encoding decisions.

Measures, per destination tile of the composed [protein... | ligand-tail]
layout, (a) the number of DISTINCT kNN sources (per-tile compacted operand
capacity — VERDICT r3 #1) and (b) the number of DIRTY rows (rows with >= 1
ligand source, whose edges change between layers as the ligand moves — the
regeo skip candidate), under different protein orderings:

  pdb     original file order
  morton  3D Morton (z-curve) spatial sort
  ligdist distance-to-ligand-centroid sort

on both the REAL example pocket (examples/*pocket10.pdb) and the synthetic
Gaussian-blob geometry bench.py uses.

Usage: python tools/nbr_stats.py [K]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def knn(pos, k):
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.argsort(d2, axis=1)[:, :k]


def morton_order(pos):
    q = ((pos - pos.min(0)) / (np.ptp(pos, 0).max() + 1e-9) * 1023).astype(np.int64)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code)


def analyze(ppos, lpos, K, label):
    NL = len(lpos)
    lig_c = lpos.mean(0)
    orders = {
        "pdb": np.arange(len(ppos)),
        "morton": morton_order(ppos),
        "ligdist": np.argsort(((ppos - lig_c) ** 2).sum(-1)),
    }
    print(f"\n== {label}: NP={len(ppos)} NL={NL} K={K}")
    for name, order in orders.items():
        pos = np.concatenate([ppos[order], lpos], 0)
        N = len(pos)
        idx = knn(pos, K)
        NPAD = N - NL
        dirty_row = (idx >= NPAD).any(1)  # row has >=1 ligand source
        n_dirty = int(dirty_row[:NPAD].sum())
        out = [f"{name:8s} dirty-protein-rows={n_dirty:4d}/{NPAD}"]
        for TI in (104, 52, 26):
            T = N // TI if N % TI == 0 else None
            if T is None:
                # pad tiles from the top for analysis purposes
                T = -(-N // TI)
            distinct = []
            dirty_tiles = 0
            for t in range(T):
                rows = slice(t * TI, min((t + 1) * TI, N))
                src = idx[rows].ravel()
                distinct.append(len(np.unique(src)))
                if dirty_row[rows].any() or rows.stop > NPAD:
                    dirty_tiles += 1
            out.append(
                f"TI={TI}: distinct p50/p95/max={int(np.median(distinct))}/"
                f"{int(np.percentile(distinct, 95))}/{max(distinct)} "
                f"dirty-tiles={dirty_tiles}/{T}"
            )
        print("  " + "  |  ".join(out))


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # real example pocket
    from targetdiff_tpu.chem.pdb import PDBProtein
    from targetdiff_tpu.chem.sdf import parse_sdf_file

    pdb_path = os.path.join(root, "examples", "1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb")
    sdf_path = os.path.join(root, "examples", "1h36_A_rec_1h36_r88_lig_tt_docked_0.sdf")
    prot = PDBProtein(open(pdb_path).read())
    lig = parse_sdf_file(sdf_path)
    ppos = np.asarray(prot.to_dict_atom()["pos"], np.float32)
    lpos = np.asarray(lig["pos"], np.float32)
    analyze(ppos, lpos, K, "real pocket 1h36 (pocket10)")

    # bench.py synthetic geometry: protein N(0,4^2), ligand N(0,1)
    rng = np.random.default_rng(0)
    analyze(
        rng.normal(size=(330, 3)).astype(np.float32) * 4,
        rng.normal(size=(26, 3)).astype(np.float32),
        K,
        "bench synthetic blob (330p/26l)",
    )

    # realistic synthetic: ligand ~25 atoms, 1.5A steps; protein = uniform
    # 0.1 atoms/A^3 shell within 10A of the ligand (crossdocked pocket10 rule)
    lsteps = rng.normal(size=(25, 3))
    lsteps /= np.linalg.norm(lsteps, axis=1, keepdims=True)
    lpos2 = np.cumsum(lsteps * 1.5, 0).astype(np.float32)
    lpos2 -= lpos2.mean(0)
    cand = rng.uniform(-14, 14, size=(12000, 3)).astype(np.float32)
    d = np.sqrt(((cand[:, None] - lpos2[None]) ** 2).sum(-1)).min(1)
    keep = cand[(d > 2.0) & (d < 10.0)]
    analyze(keep[:330], lpos2, K, "realistic synthetic pocket (330p/25l)")


if __name__ == "__main__":
    main()

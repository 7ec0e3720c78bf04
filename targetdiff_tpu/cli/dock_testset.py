"""Dock the reference test-set ligands (ground-truth Vina baseline).

Usage: python -m targetdiff_tpu.cli.dock_testset --dataset_path ./data/... \
       --out baseline_vina.pkl

Counterpart of reference scripts/dock_testset.py:1-76 (QVina docking of the
100 reference ligands) and scripts/dock_baseline.py:1-59 (multiprocess
docking of baseline sample files).
"""

from __future__ import annotations

import argparse
import os
import pickle
from functools import partial
from multiprocessing import Pool

from ..chem.sdf import read_sdf, remove_hydrogens
from ..config import Config
from ..data.datasets import get_dataset
from ..utils.misc import get_logger


def _dock_one(entry, protein_root, mode):
    ligand_fn, protein_fn = entry
    try:
        from ..evaluation.docking_qvina import QVinaDockingTask
        from ..evaluation.docking_vina import VinaDockingTask

        mol = remove_hydrogens(read_sdf(os.path.join(protein_root, ligand_fn)))
        if mode == "qvina":
            task = QVinaDockingTask(mol, os.path.join(protein_root, protein_fn))
            results = task.run_sync()
        else:
            task = VinaDockingTask(mol, os.path.join(protein_root, protein_fn))
            results = task.run(mode="score_only" if mode == "vina_score" else "dock")
        return {"ligand_filename": ligand_fn, "vina": results}
    except Exception as e:
        return {"ligand_filename": ligand_fn, "vina": None,
                "error": f"{type(e).__name__}: {e}"}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--split", default=None)
    ap.add_argument("--protein_root", required=True)
    ap.add_argument("--mode", default="qvina", choices=["qvina", "vina_score", "vina_dock"])
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--out", default="testset_docking.pkl")
    args = ap.parse_args(argv)

    logger = get_logger("dock_testset")
    cfg = Config({"name": "pl", "path": args.dataset_path, "split": args.split})
    _, subsets = get_dataset(dict(cfg))
    test = subsets["test"] if subsets else None
    entries = []
    n = len(test)
    for i in range(n):
        d = test[i]
        entries.append((d["ligand_filename"], d["protein_filename"]))

    fn = partial(_dock_one, protein_root=args.protein_root, mode=args.mode)
    with Pool(args.num_workers) as pool:
        results = pool.map(fn, entries)
    ok = [r for r in results if r["vina"]]
    logger.info(f"docked {len(ok)}/{len(results)}")
    with open(args.out, "wb") as f:
        pickle.dump(results, f)


if __name__ == "__main__":
    main()

"""Evaluate sampling results: stability, reconstruction, chemistry, JSD
metrics, optional docking.

Usage: python -m targetdiff_tpu.cli.evaluate_diffusion OUTPUT_DIR
       [--docking_mode none|qvina|vina_score|vina_dock] [--protein_root ...]

Counterpart of reference scripts/evaluate_diffusion.py:35-208. Per sample:
stability (analyze.check_stability), pair distances, reconstruction,
completeness, QED/SA/Lipinski, optional docking; aggregates validity dict,
bond-length/atom-type JSD, and summary stats into metrics.pkl.
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
from collections import Counter

import numpy as np

from ..chem.reconstruct import MolReconsError, reconstruct_from_generated
from ..data.transforms import get_atomic_number_from_index, is_aromatic_from_index
from ..evaluation import analyze, eval_atom_type, eval_bond_length
from ..evaluation.scoring import get_chem
from ..utils.misc import get_logger


def evaluate_results(result_files, atom_mode, docking_mode="none",
                     protein_root=None, exhaustiveness=16, logger=None,
                     eval_step=-1):
    """`eval_step` indexes the saved trajectory (reference:
    evaluate_diffusion.py:76); -1 (final step) also works on results saved
    without --save_traj. Any other value requires trajectories."""
    log = logger or get_logger("eval")
    n_samples = 0
    n_stable = 0
    n_atom_stable, n_atom_total = 0, 0
    n_recon, n_complete = 0, 0
    n_arom_pred, n_arom_recovered = 0, 0
    all_pair_dist, all_bond_dist = [], []
    all_atom_types = Counter()
    results = []

    for fpath in result_files:
        with open(fpath, "rb") as f:
            res = pickle.load(f)
        if eval_step == -1 or "pred_ligand_pos_traj" not in res:
            if eval_step != -1:
                raise SystemExit(
                    f"--eval_step {eval_step} needs trajectories; {fpath} was "
                    "sampled without --save_traj"
                )
            pos_list, v_list = res["pred_ligand_pos"], res["pred_ligand_v"]
        else:
            pos_list = [t[eval_step] for t in res["pred_ligand_pos_traj"]]
            v_list = [t[eval_step] for t in res["pred_ligand_v_traj"]]
        for pos, v in zip(pos_list, v_list):
            n_samples += 1
            atom_nums = get_atomic_number_from_index(v, atom_mode)
            aromatic = is_aromatic_from_index(v, atom_mode)

            stable, ns, na = analyze.check_stability(pos, atom_nums)
            n_stable += int(stable)
            n_atom_stable += ns
            n_atom_total += na
            all_atom_types += Counter(atom_nums)
            all_pair_dist += eval_bond_length.pair_distance_from_pos_v(pos, atom_nums)

            # aromatic-ring recovery: of the samples whose TYPE channel
            # predicts an aromatic system (>= 5 aromatic-class atoms), how
            # many reconstruct to a molecule with an aromatic ring — ties
            # the type and geometry channels together (round 5)
            arom_predicted = aromatic is not None and sum(aromatic) >= 5

            try:
                mol = reconstruct_from_generated(
                    pos, atom_nums, aromatic, basic_mode=(atom_mode == "basic")
                )
                smiles = mol.to_smiles()
            except MolReconsError:
                if arom_predicted:
                    n_arom_pred += 1
                continue
            n_recon += 1
            if arom_predicted:
                n_arom_pred += 1
                n_arom_recovered += int(any(b.aromatic for b in mol.bonds))
            if "." in smiles:
                continue
            n_complete += 1
            all_bond_dist += eval_bond_length.bond_distance_from_mol(mol)
            try:
                chem = get_chem(mol)
            except Exception as e:
                log.info(f"chem scoring failed: {e}")
                continue
            entry = {"smiles": smiles, "chem_results": chem, "mol": mol,
                     "pos": pos, "v": v}
            if docking_mode != "none":
                entry["vina"] = _dock(mol, res, docking_mode, protein_root,
                                      exhaustiveness, log)
            results.append(entry)

    validity = {
        "mol_stable": n_stable / max(n_samples, 1),
        "atm_stable": n_atom_stable / max(n_atom_total, 1),
        "recon_success": n_recon / max(n_samples, 1),
        "completeness": n_complete / max(n_samples, 1),
    }
    bond_profile = eval_bond_length.get_bond_length_profile(all_bond_dist)
    bond_metrics = eval_bond_length.eval_bond_length_profile(bond_profile)
    pair_profile = eval_bond_length.get_pair_length_profile(all_pair_dist)
    pair_metrics = eval_bond_length.eval_pair_length_profile(pair_profile)
    atom_jsd = eval_atom_type.eval_atom_type_distribution(all_atom_types)

    qed = [r["chem_results"]["qed"] for r in results]
    sa = [r["chem_results"]["sa"] for r in results]
    summary = {
        "validity": validity,
        "bond_length_jsd": bond_metrics,
        "pair_length_jsd": pair_metrics,
        "atom_type_jsd": atom_jsd,
        # raw profiles so callers (e.g. tools/quality_gate.py) can compare
        # against a distribution other than the frozen CrossDocked tables
        "pair_length_profile": pair_profile,
        "bond_length_profile": bond_profile,
        "bond_type_counts": Counter(
            eval_bond_length._format_bond_type(bt) for bt, _ in all_bond_dist
        ),
        "atom_type_counts": all_atom_types,
        "aromatic_ring_recovery": (
            n_arom_recovered / n_arom_pred if n_arom_pred else None
        ),
        "n_aromatic_predicted": n_arom_pred,
        "qed_mean": float(np.mean(qed)) if qed else None,
        "qed_median": float(np.median(qed)) if qed else None,
        "sa_mean": float(np.mean(sa)) if sa else None,
        "sa_median": float(np.median(sa)) if sa else None,
        "num_results": len(results),
    }
    ring_sizes = Counter()
    for r in results:
        ring_sizes += Counter(r["chem_results"]["ring_size"])
    total_rings = sum(ring_sizes.values())
    summary["ring_size_ratio"] = {
        k: v / max(total_rings, 1) for k, v in sorted(ring_sizes.items())
    }
    if docking_mode != "none":
        vina = [r["vina"] for r in results if r.get("vina") is not None]
        if vina and isinstance(vina[0], dict):
            for key in vina[0]:
                vals = [v[key] for v in vina if v.get(key) is not None]
                if vals:
                    summary[f"vina_{key}_mean"] = float(np.mean(vals))
                    summary[f"vina_{key}_median"] = float(np.median(vals))
    return summary, results


def _dock(mol, res, mode, protein_root, exhaustiveness, log):
    try:
        from ..evaluation.docking_vina import VinaDockingTask

        task = VinaDockingTask.from_generated_mol(
            mol, res["data"]["ligand_filename"], protein_root=protein_root
        )
        if mode == "vina_score":
            score = task.run(mode="score_only", exhaustiveness=exhaustiveness)
            return {"score": score[0]["affinity"] if score else None}
        if mode == "vina_dock":
            out = task.run(mode="dock", exhaustiveness=exhaustiveness)
            return {"dock": out[0]["affinity"] if out else None}
        if mode == "qvina":
            from ..evaluation.docking_qvina import QVinaDockingTask

            qt = QVinaDockingTask.from_generated_mol(
                mol, res["data"]["ligand_filename"], protein_root=protein_root
            )
            out = qt.run_sync()
            return {"qvina": out[0]["affinity"] if out else None}
    except Exception as e:
        log.info(f"docking failed: {type(e).__name__}: {e}")
        return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("sample_path")
    ap.add_argument("--docking_mode", default="none",
                    choices=["none", "qvina", "vina_score", "vina_dock"])
    ap.add_argument("--protein_root", default="./data/test_set")
    ap.add_argument("--atom_mode", default=None,
                    help="override ligand atom mode (else read from results)")
    ap.add_argument("--eval_num_examples", type=int, default=None,
                    help="evaluate only the first N result files "
                    "(reference: evaluate_diffusion.py:40)")
    ap.add_argument("--eval_step", type=int, default=-1,
                    help="trajectory step to evaluate (needs --save_traj "
                    "results unless -1; reference: evaluate_diffusion.py:39)")
    ap.add_argument("--exhaustiveness", type=int, default=16,
                    help="vina search exhaustiveness "
                    "(reference: evaluate_diffusion.py:45)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    logger = get_logger("evaluate")
    files = sorted(glob.glob(os.path.join(args.sample_path, "result_*.pkl")))
    if not files:
        raise SystemExit(f"no result_*.pkl under {args.sample_path}")
    if args.eval_num_examples is not None:
        files = files[: args.eval_num_examples]
    with open(files[0], "rb") as f:
        first = pickle.load(f)
    atom_mode = args.atom_mode or first.get("ligand_atom_mode", "add_aromatic")

    summary, results = evaluate_results(
        files, atom_mode, args.docking_mode, args.protein_root,
        exhaustiveness=args.exhaustiveness, logger=logger,
        eval_step=args.eval_step,
    )
    for k, v in summary.items():
        if k.endswith("_profile"):
            continue  # raw histograms, too noisy for the log
        logger.info(f"{k}: {v}")
    out_path = args.out or os.path.join(args.sample_path, "metrics.pkl")
    with open(out_path, "wb") as f:
        pickle.dump({"summary": summary, "results": [
            {k: v for k, v in r.items() if k != "mol"} for r in results
        ]}, f)
    logger.info(f"saved {out_path}")


if __name__ == "__main__":
    main()

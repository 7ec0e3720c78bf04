"""Exercise the evaluation CLI path end-to-end on synthetic results built from
the real example ligand (so reconstruction/chem succeed)."""

import os
import pickle

import numpy as np

from targetdiff_tpu.chem.sdf import read_sdf, remove_hydrogens
from targetdiff_tpu.cli.evaluate_diffusion import evaluate_results
from targetdiff_tpu.data.transforms import MAP_ATOM_TYPE_AROMATIC_TO_INDEX

LIGAND = "examples/3ug2_ligand.sdf"


def test_evaluate_results_on_real_ligand(tmp_path):
    mol = remove_hydrogens(read_sdf(LIGAND))
    pos = mol.positions()
    v = np.array(
        [MAP_ATOM_TYPE_AROMATIC_TO_INDEX[(a.z, a.aromatic)] for a in mol.atoms],
        np.int64,
    )
    res = {
        "pred_ligand_pos": [pos, pos + 0.01],
        "pred_ligand_v": [v, v],
        "data": {"ligand_filename": "x/y.sdf"},
        "ligand_atom_mode": "add_aromatic",
    }
    fp = str(tmp_path / "result_0.pkl")
    with open(fp, "wb") as f:
        pickle.dump(res, f)

    summary, results = evaluate_results([fp], "add_aromatic")
    assert summary["validity"]["recon_success"] == 1.0
    assert summary["validity"]["completeness"] == 1.0
    assert summary["validity"]["atm_stable"] > 0.7
    assert summary["num_results"] == 2
    assert 0.2 < summary["qed_mean"] < 0.9
    assert summary["atom_type_jsd"] < 1.0
    jsds = {k: val for k, val in summary["bond_length_jsd"].items() if val is not None}
    assert len(jsds) >= 3
    # a real drug's geometry should sit close to the empirical distributions
    assert all(v < 0.9 for v in jsds.values())
    assert 5 in summary["ring_size_ratio"] or 6 in summary["ring_size_ratio"]


def test_evaluate_results_eval_step_on_traj(tmp_path):
    """--eval_step reads from saved trajectories (reference
    evaluate_diffusion.py:76); a non-final step on garbage early geometry
    scores worse than the final one, and eval_step without traj fails."""
    import pytest

    mol = remove_hydrogens(read_sdf(LIGAND))
    pos = mol.positions()
    v = np.array(
        [MAP_ATOM_TYPE_AROMATIC_TO_INDEX[(a.z, a.aromatic)] for a in mol.atoms],
        np.int64,
    )
    rng = np.random.default_rng(0)
    noisy = pos + rng.normal(size=pos.shape) * 3.0  # "early-step" geometry
    res = {
        "pred_ligand_pos": [pos],
        "pred_ligand_v": [v],
        "pred_ligand_pos_traj": [np.stack([noisy, pos])],
        "pred_ligand_v_traj": [np.stack([v, v])],
        "data": {"ligand_filename": "x/y.sdf"},
        "ligand_atom_mode": "add_aromatic",
    }
    fp = str(tmp_path / "result_0.pkl")
    with open(fp, "wb") as f:
        pickle.dump(res, f)

    s_final, _ = evaluate_results([fp], "add_aromatic", eval_step=-1)
    s_early, _ = evaluate_results([fp], "add_aromatic", eval_step=0)
    assert s_final["validity"]["atm_stable"] > s_early["validity"]["atm_stable"]

    res2 = {k: val for k, val in res.items() if "traj" not in k}
    fp2 = str(tmp_path / "result_1.pkl")
    with open(fp2, "wb") as f:
        pickle.dump(res2, f)
    with pytest.raises(SystemExit):
        evaluate_results([fp2], "add_aromatic", eval_step=0)

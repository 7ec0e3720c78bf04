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

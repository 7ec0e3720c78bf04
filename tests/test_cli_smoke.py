"""Smoke tests: every CLI module imports and its --help parses (catches
import-time breakage across the whole surface)."""

import importlib

import pytest

CLIS = [
    "train_diffusion",
    "sample_diffusion",
    "sample_for_pocket",
    "evaluate_diffusion",
    "evaluate_from_meta",
    "likelihood_est_diffusion",
    "dock_testset",
    "data_preparation",
    "pdbbind_preparation",
    "train_prop",
    "eval_prop",
    "inference_prop",
    "summarize_results",
    "analyze_affinity",
]


@pytest.mark.parametrize("name", CLIS)
def test_cli_help(name, capsys):
    mod = importlib.import_module(f"targetdiff_tpu.cli.{name}")
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()


def test_chem_backend():
    from targetdiff_tpu.chem.backend import canonical_smiles, qed
    from targetdiff_tpu.chem.sdf import read_sdf, remove_hydrogens

    mol = remove_hydrogens(read_sdf("examples/3ug2_ligand.sdf"))
    s = canonical_smiles(mol)
    assert isinstance(s, str) and len(s) > 10
    assert 0 < qed(mol) < 1


def test_load_model_from_checkpoint_flagship_knn(tmp_path):
    """Regression: the params-template dummy must have >= knn atoms — an
    8-atom dummy crashed every sampling CLI at startup for the released
    knn=32 config (top_k k > axis size)."""
    import jax
    import numpy as np

    from targetdiff_tpu.cli.sample_diffusion import load_model_from_checkpoint
    from targetdiff_tpu.config import load_config
    from targetdiff_tpu.data.batch import pad_complex
    from targetdiff_tpu.data.transforms import (
        FeaturizeLigandAtom,
        FeaturizeProteinAtom,
    )
    from targetdiff_tpu.models.score_model import DiffusionModel
    from targetdiff_tpu.utils.checkpoint import save_checkpoint

    cfg = load_config("configs/training.yml")
    pf = FeaturizeProteinAtom()
    lf = FeaturizeLigandAtom(cfg.data.transform.ligand_atom_mode)
    model = DiffusionModel(cfg.model, pf.feature_dim, lf.feature_dim,
                           max_protein=40, max_ligand=8)
    dummy = pad_complex(
        np.zeros((40, 3), np.float32), np.zeros((40, pf.feature_dim), np.float32),
        np.zeros((2, 3), np.float32), np.zeros((2,), np.int32), 40, max_ligand=8,
    )
    params = model.init(jax.random.PRNGKey(0), dummy)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, cfg, params)

    m2, p2, tc, _pf, _lf = load_model_from_checkpoint(path, max_protein=64,
                                                      max_ligand=16)
    assert int(tc.model.knn) == 32
    n_leaves = len(jax.tree_util.tree_leaves(p2))
    assert n_leaves == len(jax.tree_util.tree_leaves(params))

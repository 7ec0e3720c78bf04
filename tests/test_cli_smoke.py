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

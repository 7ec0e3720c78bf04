"""Predict binding affinity (Kd/Ki/IC50) for a single protein-ligand complex.

Usage: python -m targetdiff_tpu.cli.inference_prop CKPT --protein x.pdb
       --ligand y.sdf [--kind Kd]

Counterpart of reference scripts/property_prediction/inference.py:31-51,
:116-119: extracts the 10A pocket around the ligand on the fly, featurizes,
predicts pK and converts to molar concentration (affinity = 10^-pK).
"""

from __future__ import annotations

import argparse

import jax

from ..chem.pdb import PDBProtein
from ..chem.sdf import parse_sdf_file, read_sdf, remove_hydrogens
from ..data.transforms_prop import (
    FeaturizeLigandAtomProp,
    FeaturizeProteinAtom,
    ligand_atom_feature_matrix,
)
from ..models.prop.prop_model import PropPredNet
from ..utils.checkpoint import load_checkpoint
from ..utils.misc import get_logger
from ..utils.misc_prop import collate_prop

KMAP = {"Ki": 1, "Kd": 2, "IC50": 3}


def build_complex(protein_path: str, ligand_path: str, pocket_radius: float = 10.0):
    protein = PDBProtein(protein_path)
    ligand = parse_sdf_file(ligand_path)
    selected = protein.query_residues_ligand({"pos": ligand["pos"]}, pocket_radius)
    pocket = PDBProtein(protein.residues_to_pdb_block(selected), mode="block")
    pdict = pocket.to_dict_atom()
    mol = remove_hydrogens(read_sdf(ligand_path))
    data = {
        "protein_element": pdict["element"],
        "protein_pos": pdict["pos"],
        "protein_is_backbone": pdict["is_backbone"],
        "protein_atom_to_aa_type": pdict["atom_to_aa_type"],
        "ligand_element": ligand["element"],
        "ligand_pos": ligand["pos"],
        "ligand_atom_feature": ligand_atom_feature_matrix(mol),
    }
    return data


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--protein", required=True)
    ap.add_argument("--ligand", required=True)
    ap.add_argument("--kind", default="Kd", choices=list(KMAP))
    ap.add_argument("--max_protein", type=int, default=768)
    ap.add_argument("--max_ligand", type=int, default=128)
    args = ap.parse_args(argv)

    logger = get_logger("inference_prop")
    raw = load_checkpoint(args.ckpt)
    config = raw["config"]
    model = PropPredNet(config=dict(config.model), output_dim=3)

    data = build_complex(args.protein, args.ligand)
    data = FeaturizeProteinAtom()(data)
    data = FeaturizeLigandAtomProp()(data)
    data["kind"] = KMAP[args.kind]
    batch = collate_prop([data], args.max_protein, args.max_ligand)

    template = model.init(jax.random.PRNGKey(0), batch)
    params = load_checkpoint(args.ckpt, params_template=template)["params"]
    pk = float(model.apply(params, batch)[0])
    molar = 10 ** (-pk)
    if molar < 1e-9:
        conc = f"{molar * 1e12:.2f} pM"
    elif molar < 1e-6:
        conc = f"{molar * 1e9:.2f} nM"
    else:
        conc = f"{molar * 1e6:.2f} uM"
    logger.info(f"predicted pK = {pk:.3f}  ({args.kind} = {conc})")


if __name__ == "__main__":
    main()

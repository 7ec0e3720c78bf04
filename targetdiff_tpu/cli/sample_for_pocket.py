"""Generate molecules for a raw pocket PDB file and write SDF outputs.

Usage: python -m targetdiff_tpu.cli.sample_for_pocket configs/sampling.yml
       --pdb_path examples/XXXX_pocket10.pdb [--num_samples 10]

Counterpart of reference scripts/sample_for_pocket.py:18-129: builds an
empty-ligand complex from the PDB, samples, reconstructs molecules and dumps
SDF + SMILES.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..chem.pdb import PDBProtein
from ..chem.reconstruct import MolReconsError, reconstruct_from_generated
from ..chem.sdf import write_sdf
from ..config import load_config
from ..data.transforms import get_atomic_number_from_index, is_aromatic_from_index
from ..sampling import sample_diffusion_ligand
from ..utils.misc import get_logger, seed_all
from .sample_diffusion import load_model_from_checkpoint


def pdb_to_pocket_data(pdb_path: str, protein_featurizer):
    """PDB -> featurized empty-ligand pocket dict
    (reference: scripts/sample_for_pocket.py:18-31)."""
    pocket_dict = PDBProtein(pdb_path).to_dict_atom()
    data = {
        "protein_element": pocket_dict["element"],
        "protein_pos": pocket_dict["pos"],
        "protein_is_backbone": pocket_dict["is_backbone"],
        "protein_atom_to_aa_type": pocket_dict["atom_to_aa_type"],
    }
    return protein_featurizer(data)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--pdb_path", required=True)
    ap.add_argument("--num_samples", type=int, default=10)
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument(
        "--sampler", default=None, choices=["ddpm", "ddim"],
        help="ddim strides the full schedule over --num_steps jumps "
        "(faster; no reference counterpart)",
    )
    ap.add_argument("--ddim_spacing", default=None, choices=["uniform", "quadratic"],
                    help="ddim timestep spacing (quadratic = denser at low t)")
    ap.add_argument("--eta", type=float, default=None,
                    help="ddim stochasticity (default 0)")
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--result_path", default="./outputs_pdb")
    ap.add_argument("--max_protein", type=int, default=640)
    ap.add_argument("--max_ligand", type=int, default=64)
    ap.add_argument(
        "--impl", default="auto", choices=["auto", "xla", "fast"],
        help="auto: fused Pallas kernels on TPU when supported, else XLA",
    )
    args = ap.parse_args(argv)

    config = load_config(args.config)
    seed_all(config.sample.seed)
    logger = get_logger("sample_pocket")
    os.makedirs(args.result_path, exist_ok=True)

    model, params, train_config, protein_feat, _lig = load_model_from_checkpoint(
        config.model.checkpoint, args.max_protein, args.max_ligand
    )
    mode = train_config.data.transform.ligand_atom_mode

    data = pdb_to_pocket_data(args.pdb_path, protein_feat)
    pocket = {"protein_pos": data["protein_pos"], "protein_feat": data["protein_atom_feature"]}

    result = sample_diffusion_ligand(
        model, params, pocket,
        num_samples=args.num_samples,
        key=jax.random.PRNGKey(config.sample.seed),
        batch_size=args.batch_size,
        num_steps=args.num_steps or config.sample.num_steps,
        sample_num_atoms=config.sample.get("sample_num_atoms", "prior"),
        max_protein=args.max_protein,
        max_ligand=args.max_ligand,
        impl=args.impl,
        rng=np.random.default_rng(config.sample.seed),
        sampler=args.sampler or config.sample.get("sampler", "ddpm"),
        eta=args.eta if args.eta is not None else config.sample.get("eta", 0.0),
        ddim_spacing=args.ddim_spacing or config.sample.get("ddim_spacing", "uniform"),
    )

    sdf_path = os.path.join(args.result_path, "samples.sdf")
    if os.path.exists(sdf_path):
        os.remove(sdf_path)
    n_ok = 0
    smiles_list = []
    for i, (pos, v) in enumerate(zip(result["pos"], result["v"])):
        try:
            atomic_nums = get_atomic_number_from_index(v, mode)
            aromatic = is_aromatic_from_index(v, mode)
            mol = reconstruct_from_generated(
                pos, atomic_nums, aromatic, basic_mode=(mode == "basic")
            )
            smiles = mol.to_smiles()
            if "." in smiles:
                logger.info(f"sample {i}: fragmented ({smiles})")
                continue
            write_sdf(mol, sdf_path, name=f"sample_{i}", append=True)
            smiles_list.append(smiles)
            n_ok += 1
            logger.info(f"sample {i}: {smiles}")
        except MolReconsError as e:
            logger.info(f"sample {i}: reconstruction failed ({e})")
    with open(os.path.join(args.result_path, "samples.smi"), "w") as f:
        f.write("\n".join(smiles_list) + "\n")
    logger.info(f"{n_ok}/{len(result['pos'])} molecules -> {sdf_path}")


if __name__ == "__main__":
    main()

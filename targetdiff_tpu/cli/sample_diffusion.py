"""Sample molecules for pockets of the test split.

Usage: python -m targetdiff_tpu.cli.sample_diffusion configs/sampling.yml
       -i DATA_ID [--result_path ./outputs]

Counterpart of reference scripts/sample_diffusion.py: loads the checkpoint,
rebuilds model + transforms from the config embedded in it (:136-147),
samples num_samples molecules with the atom-count prior, and dumps a result
file per pocket. The whole reverse process runs on device (lax.scan); with
--all, pockets shard across devices via the mesh instead of the reference's
batch_sample_diffusion.sh process sharding.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import jax
import numpy as np

from ..config import load_config
from ..data.datasets import get_dataset
from ..data.transforms import Compose, FeaturizeLigandAtom, FeaturizeProteinAtom
from ..models.score_model import DiffusionModel
from ..sampling import sample_diffusion_ligand
from ..utils.checkpoint import load_checkpoint
from ..utils.misc import get_logger, seed_all


def load_model_from_checkpoint(ckpt_path, max_protein=384, max_ligand=64):
    protein_feat = FeaturizeProteinAtom()
    raw = load_checkpoint(ckpt_path)
    train_config = raw["config"]
    ligand_feat = FeaturizeLigandAtom(train_config.data.transform.ligand_atom_mode)
    model = DiffusionModel(
        train_config.model, protein_feat.feature_dim, ligand_feat.feature_dim,
        max_protein=max_protein, max_ligand=max_ligand,
    )
    # unflatten params against a freshly-initialized template. The dummy
    # complex must have >= knn atoms or the kNN top_k fails at init
    # (regression: an 8-atom dummy crashed every sampling CLI at startup
    # for the flagship knn=32 config)
    from ..data.batch import pad_complex

    np_dummy = max(int(train_config.model.get("knn", 32)) + 8, 40)
    dummy = pad_complex(
        np.zeros((np_dummy, 3), np.float32),
        np.zeros((np_dummy, protein_feat.feature_dim), np.float32),
        np.zeros((2, 3), np.float32), np.zeros((2,), np.int32), np_dummy,
        max_ligand=8,
    )
    template = model.init(jax.random.PRNGKey(0), dummy)
    params = load_checkpoint(ckpt_path, params_template=template)["params"]
    return model, params, train_config, protein_feat, ligand_feat


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-i", "--data_id", type=int, default=0)
    ap.add_argument("--all", action="store_true", help="sample every test pocket")
    ap.add_argument("--result_path", default="./outputs")
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--max_protein", type=int, default=640)
    ap.add_argument("--max_ligand", type=int, default=64)
    ap.add_argument(
        "--impl", default="auto", choices=["auto", "xla", "fast"],
        help="auto: fused Pallas kernels on TPU when the config supports "
        "them, XLA otherwise; fast: fused kernels (falls back to xla with a "
        "warning on unsupported configs)",
    )
    ap.add_argument(
        "--sharded", action="store_true",
        help="with --all: sample every pocket through the mesh-dp sharded, "
        "HBM-chunked path (replaces scripts/batch_sample_diffusion.sh)",
    )
    ap.add_argument("--chunk_rows", type=int, default=100,
                    help="max pocket x sample rows in flight (HBM bound)")
    ap.add_argument(
        "--sampler", default=None, choices=["ddpm", "ddim", "dpm2"],
        help="override config.sample.sampler: ddpm = reference-exact "
        "ancestral sampling; ddim = stride the full schedule over "
        "config.sample.num_steps jumps (faster; no reference counterpart); "
        "dpm2 = Heun/DPM-Solver-2 second-order correction of the ddim jump "
        "(2 model evals per step, better quality at low NFE)",
    )
    ap.add_argument("--ddim_spacing", default=None, choices=["uniform", "quadratic"],
                    help="ddim timestep spacing (quadratic = denser at low t)")
    ap.add_argument("--save_traj", type=int, default=0, metavar="STRIDE",
                    help="save pred_ligand_{pos,v}_traj at this step stride "
                    "(reference saves the full trajectory unconditionally, "
                    "sample_diffusion.py:179; opt-in here for disk reasons). "
                    "Not supported with --sharded.")
    ap.add_argument("--eta", type=float, default=None,
                    help="ddim stochasticity (default 0 = deterministic positions)")
    args = ap.parse_args(argv)

    config = load_config(args.config)
    seed_all(config.sample.seed)
    logger = get_logger("sample")
    os.makedirs(args.result_path, exist_ok=True)

    model, params, train_config, protein_feat, ligand_feat = load_model_from_checkpoint(
        config.model.checkpoint, args.max_protein, args.max_ligand
    )

    transform = Compose([protein_feat, ligand_feat])
    _, subsets = get_dataset(train_config.data, transform=transform)
    test_set = subsets["test"]
    ids = range(len(test_set)) if args.all else [args.data_id]

    if args.sharded and args.save_traj:
        raise SystemExit("--save_traj is not supported with --sharded "
                         "(trajectories for 10k rows exceed HBM); drop one")
    if args.sharded:
        from ..sampling import sample_testset_sharded

        datas = [test_set[i] for i in ids]
        pockets = [
            {"protein_pos": d["protein_pos"], "protein_feat": d["protein_atom_feature"]}
            for d in datas
        ]
        ref_sizes = [len(d["ligand_pos"]) for d in datas]
        t0 = time.time()
        results = sample_testset_sharded(
            model, params, pockets,
            num_samples_per_pocket=config.sample.num_samples,
            key=jax.random.PRNGKey(config.sample.seed),
            num_steps=config.sample.num_steps,
            sample_num_atoms=config.sample.get("sample_num_atoms", "prior"),
            max_protein=args.max_protein,
            max_ligand=args.max_ligand,
            chunk_rows=args.chunk_rows,
            impl=args.impl,
            ref_sizes=ref_sizes,
            rng=np.random.default_rng(config.sample.seed),
            sampler=args.sampler or config.sample.get("sampler", "ddpm"),
            eta=args.eta if args.eta is not None else config.sample.get("eta", 0.0),
            ddim_spacing=args.ddim_spacing or config.sample.get("ddim_spacing", "uniform"),
        )
        elapsed = time.time() - t0
        for data_id, data, pocket, result in zip(ids, datas, pockets, results):
            out = {
                "data": {k: np.asarray(v) for k, v in pocket.items()}
                | {
                    "protein_filename": data.get("protein_filename"),
                    "ligand_filename": data.get("ligand_filename"),
                },
                "pred_ligand_pos": result["pos"],
                "pred_ligand_v": result["v"],
                # measured device time attributed to this pocket's rows
                # (was: wall-clock divided evenly across pockets)
                "time": [result["time"]],
                "ligand_atom_mode": train_config.data.transform.ligand_atom_mode,
            }
            out_path = os.path.join(args.result_path, f"result_{data_id}.pkl")
            with open(out_path, "wb") as f:
                pickle.dump(out, f)
        logger.info(
            f"sharded: {len(ids)} pockets x {config.sample.num_samples} samples "
            f"in {elapsed:.1f}s (chunk_rows={args.chunk_rows})"
        )
        return

    for data_id in ids:
        data = test_set[data_id]
        pocket = {
            "protein_pos": data["protein_pos"],
            "protein_feat": data["protein_atom_feature"],
        }
        ref_ligand = {
            "ligand_pos": data["ligand_pos"],
            "ligand_v": data["ligand_atom_feature_full"],
        }
        key = jax.random.PRNGKey(config.sample.seed + data_id)
        result = sample_diffusion_ligand(
            model, params, pocket,
            num_samples=config.sample.num_samples,
            key=key,
            batch_size=args.batch_size,
            num_steps=config.sample.num_steps,
            pos_only=config.sample.get("pos_only", False),
            center_pos_mode=config.sample.get("center_pos_mode", "protein"),
            sample_num_atoms=config.sample.get("sample_num_atoms", "prior"),
            ref_ligand=ref_ligand,
            max_protein=args.max_protein,
            max_ligand=args.max_ligand,
            return_traj=bool(args.save_traj),
            traj_stride=max(args.save_traj, 1),
            impl=args.impl,
            rng=np.random.default_rng(config.sample.seed + data_id),
            sampler=args.sampler or config.sample.get("sampler", "ddpm"),
            eta=args.eta if args.eta is not None else config.sample.get("eta", 0.0),
            ddim_spacing=args.ddim_spacing or config.sample.get("ddim_spacing", "uniform"),
        )
        out = {
            "data": {k: np.asarray(v) for k, v in pocket.items()}
            | {
                "protein_filename": data.get("protein_filename"),
                "ligand_filename": data.get("ligand_filename"),
            },
            "pred_ligand_pos": result["pos"],
            "pred_ligand_v": result["v"],
            "time": result["time"],
            "ligand_atom_mode": train_config.data.transform.ligand_atom_mode,
        }
        if args.save_traj:
            out["pred_ligand_pos_traj"] = result["pos_traj"]
            out["pred_ligand_v_traj"] = result["v_traj"]
            out["traj_stride"] = args.save_traj
        out_path = os.path.join(args.result_path, f"result_{data_id}.pkl")
        with open(out_path, "wb") as f:
            pickle.dump(out, f)
        logger.info(
            f"pocket {data_id}: {len(result['pos'])} molecules in "
            f"{sum(result['time']):.1f}s -> {out_path}"
        )


if __name__ == "__main__":
    main()

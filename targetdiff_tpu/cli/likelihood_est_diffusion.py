"""Likelihood (ELBO) estimation + embedding export for affinity prediction.

Usage: python -m targetdiff_tpu.cli.likelihood_est_diffusion configs/sampling.yml
       [--split train|test] [--result_path ./likelihood]

Counterpart of reference scripts/likelihood_est_diffusion.py: for each
complex, sums T * mean(KL_t) over a strided timestep set plus the t=T prior
term (:18-64), and exports `fetch_embedding` hidden states (:86-109). The
per-timestep Python loop of the reference becomes one vmapped/jitted batch of
timesteps per complex on device.
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..data.batch import ComplexBatch
from ..data.datasets import get_dataset
from ..data.transforms import Compose
from ..utils.misc import get_logger, seed_all
from .sample_diffusion import load_model_from_checkpoint


def data_likelihood_estimation(model, params, batch_one: ComplexBatch, key, time_steps):
    """nll estimate for one complex: replicate it across the timestep batch
    (reference: likelihood_est_diffusion.py:18-64). Returns (nll, kl_pos, kl_v)."""
    n_t = len(time_steps)
    rep = ComplexBatch(*[jnp.repeat(getattr(batch_one, f), n_t, axis=0)
                         for f in ComplexBatch._fields])
    t = jnp.asarray(time_steps, jnp.int32)
    kl_pos, kl_v = model.likelihood_estimation(params, key, rep, t)

    T = model.num_timesteps
    t_prior = jnp.full((1,), T, jnp.int32)
    kl_pos_prior, kl_v_prior = model.likelihood_estimation(params, key, batch_one, t_prior)

    nll = (
        T * (kl_pos.mean() + kl_v.mean())
        + kl_pos_prior.sum()
        + kl_v_prior.sum()
    )
    return float(nll), np.asarray(kl_pos), np.asarray(kl_v)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--split", default="test", choices=["train", "test"])
    ap.add_argument("--result_path", default="./likelihood")
    ap.add_argument("--t_stride", type=int, default=100)
    ap.add_argument("--max_protein", type=int, default=640)
    ap.add_argument("--max_ligand", type=int, default=64)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--impl", default="xla", choices=["xla", "fast"],
                    help="fast: fused megakernel with frozen coordinates")
    args = ap.parse_args(argv)

    config = load_config(args.config)
    seed_all(config.sample.seed)
    logger = get_logger("likelihood")
    os.makedirs(args.result_path, exist_ok=True)

    model, params, train_config, protein_feat, ligand_feat = load_model_from_checkpoint(
        config.model.checkpoint, args.max_protein, args.max_ligand
    )
    transform = Compose([protein_feat, ligand_feat])
    _, subsets = get_dataset(train_config.data, transform=transform)
    dset = subsets[args.split]

    time_steps = list(range(0, model.num_timesteps, args.t_stride))
    like_fn = jax.jit(
        lambda p, b, k: model.likelihood_estimation(
            p, k, b, jnp.asarray(time_steps, jnp.int32)
        )
    )
    del like_fn  # jit happens inside data_likelihood_estimation calls

    from ..data.datasets import collate_padded

    out = []
    n = len(dset) if not args.limit else min(args.limit, len(dset))
    for i in range(n):
        try:
            d = dset[i]
            one = collate_padded([d], args.max_protein, args.max_ligand)
        except Exception as e:
            logger.info(f"skip {i}: {e}")
            continue
        key = jax.random.PRNGKey(config.sample.seed + i)
        nll, kl_pos, kl_v = data_likelihood_estimation(model, params, one, key, time_steps)
        emb = model.fetch_embedding(params, one, impl=args.impl)
        nl = int(np.asarray(one.ligand_mask).sum())
        out.append({
            "ligand_filename": d.get("ligand_filename"),
            "protein_filename": d.get("protein_filename"),
            "nll": nll,
            "kl_pos": kl_pos,
            "kl_v": kl_v,
            "final_ligand_h": np.asarray(emb["final_ligand_h"])[0, :nl],
            "pred_ligand_v": jax.nn.softmax(
                np.asarray(emb["pred_ligand_v"])[0, :nl], axis=-1
            ),
        })
        if (i + 1) % 25 == 0:
            logger.info(f"{i + 1}/{n} complexes, last nll {nll:.1f}")

    path = os.path.join(args.result_path, f"crossdocked_{args.split}.pkl")
    with open(path, "wb") as f:
        pickle.dump(out, f)
    logger.info(f"saved {len(out)} entries -> {path}")


if __name__ == "__main__":
    main()

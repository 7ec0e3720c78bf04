"""Likelihood (ELBO) estimation + embedding export for affinity prediction.

Usage: python -m targetdiff_tpu.cli.likelihood_est_diffusion configs/sampling.yml
       [--split train|test] [--result_path ./likelihood]

Counterpart of reference scripts/likelihood_est_diffusion.py: for each
complex, sums T * mean(KL_t) over a strided timestep set plus the t=T prior
term (:18-64), and exports `fetch_embedding` hidden states (:86-109). The
reference's per-timestep Python loop becomes one jitted batch of
(complexes x timesteps) rows on device; --impl auto/fast runs the denoiser
through the fused megakernel (f32) for both the KL terms and the embedding
export.
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


def data_likelihood_estimation(model, params, batch_one: ComplexBatch, key, time_steps,
                               impl: str = "xla"):
    """nll estimate for one complex: replicate it across the timestep batch
    (reference: likelihood_est_diffusion.py:18-64). Returns (nll, kl_pos, kl_v)."""
    nll, kl_pos, kl_v = batch_likelihood_estimation(
        model, params, batch_one, key, time_steps, impl=impl
    )
    return float(nll[0]), kl_pos[0], kl_v[0]


def batch_likelihood_estimation(model, params, batch_c: ComplexBatch, key, time_steps,
                                impl: str = "xla"):
    """nll estimates for a batch of C complexes in two device dispatches:
    one [C * n_t]-row call for the strided step terms and one [C]-row call
    for the t=T prior (the reference loops complexes one at a time,
    reference: likelihood_est_diffusion.py:67-83).

    Returns (nll [C], kl_pos [C, n_t], kl_v [C, n_t]) as numpy."""
    C = batch_c.num_graphs
    n_t = len(time_steps)
    rep = ComplexBatch(*[jnp.repeat(getattr(batch_c, f), n_t, axis=0)
                         for f in ComplexBatch._fields])
    t = jnp.tile(jnp.asarray(time_steps, jnp.int32), C)

    cache_key = ("likelihood_jit", impl)
    like_fn = model._jit_cache.get(cache_key)
    if like_fn is None:
        like_fn = jax.jit(
            lambda p, k, b, tt: model.likelihood_estimation(p, k, b, tt, impl=impl)
        )
        model._jit_cache[cache_key] = like_fn
    kl_pos, kl_v = like_fn(params, key, rep, t)
    kl_pos = np.asarray(kl_pos).reshape(C, n_t)
    kl_v = np.asarray(kl_v).reshape(C, n_t)

    T = model.num_timesteps
    t_prior = jnp.full((C,), T, jnp.int32)
    kl_pos_prior, kl_v_prior = like_fn(params, key, batch_c, t_prior)
    nll = (
        T * (kl_pos.mean(axis=1) + kl_v.mean(axis=1))
        + np.asarray(kl_pos_prior)
        + np.asarray(kl_v_prior)
    )
    return nll, kl_pos, kl_v


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--split", default="test", choices=["train", "test"])
    ap.add_argument("--result_path", default="./likelihood")
    ap.add_argument("--t_stride", type=int, default=100)
    ap.add_argument("--max_protein", type=int, default=640)
    ap.add_argument("--max_ligand", type=int, default=64)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--batch_complexes", type=int, default=8,
                    help="complexes per device dispatch")
    ap.add_argument("--impl", default="auto", choices=["auto", "xla", "fast"],
                    help="fast/auto: fused megakernel (f32) for the KL terms "
                    "and the frozen-coordinate embedding export")
    args = ap.parse_args(argv)

    config = load_config(args.config)
    seed_all(config.sample.seed)
    logger = get_logger("likelihood")
    os.makedirs(args.result_path, exist_ok=True)

    model, params, train_config, protein_feat, ligand_feat = load_model_from_checkpoint(
        config.model.checkpoint, args.max_protein, args.max_ligand
    )
    from ..models.fast_forward import resolve_impl

    impl = resolve_impl(model.config, args.impl, logger=logger)
    transform = Compose([protein_feat, ligand_feat])
    _, subsets = get_dataset(train_config.data, transform=transform)
    dset = subsets[args.split]

    time_steps = list(range(0, model.num_timesteps, args.t_stride))

    from ..data.datasets import collate_padded

    # featurize + collate on host, batch C complexes per device dispatch
    n = len(dset) if not args.limit else min(args.limit, len(dset))
    C = max(1, args.batch_complexes)
    out = []
    batch_items = []  # (index, data dict)
    for i in range(n):
        try:
            d = dset[i]
            batch_items.append((i, d))
        except Exception as e:
            logger.info(f"skip {i}: {e}")
        flush = len(batch_items) == C or (i == n - 1 and batch_items)
        if not flush:
            continue
        ds = [bd for _, bd in batch_items]
        # pad the complex batch to C rows (repeat the last) so one compiled
        # program covers every dispatch; extras are dropped on host
        n_real = len(ds)
        ds_padded = ds + [ds[-1]] * (C - n_real)
        batch_c = collate_padded(ds_padded, args.max_protein, args.max_ligand)
        key = jax.random.PRNGKey(config.sample.seed + batch_items[0][0])
        nll, kl_pos, kl_v = batch_likelihood_estimation(
            model, params, batch_c, key, time_steps, impl=impl
        )
        emb = model.fetch_embedding(params, batch_c, impl=impl)
        emb_h = np.asarray(emb["final_ligand_h"])
        emb_full = np.asarray(emb["final_h"])  # [C, NP+NL, H] composed order
        emb_v = np.asarray(emb["pred_ligand_v"])
        lmask = np.asarray(batch_c.ligand_mask)
        pmask = np.asarray(batch_c.protein_mask)
        NPpad = pmask.shape[1]
        for bi, (di, d) in enumerate(batch_items):
            nl = int(lmask[bi].sum())
            npr = int(pmask[bi].sum())
            # un-pad the composed node features: real protein rows, then the
            # ligand rows at the padded-protein tail (reference exports
            # final_h over the full protein+ligand node set,
            # likelihood_est_diffusion.py:102-108)
            final_h = np.concatenate(
                [emb_full[bi, :npr], emb_full[bi, NPpad : NPpad + nl]], axis=0
            )
            out.append({
                "ligand_filename": d.get("ligand_filename"),
                "protein_filename": d.get("protein_filename"),
                "nll": float(nll[bi]),
                "kl_pos": kl_pos[bi],
                "kl_v": kl_v[bi],
                "final_h": final_h,
                "final_ligand_h": emb_h[bi, :nl],
                "pred_ligand_v": np.asarray(
                    jax.nn.softmax(emb_v[bi, :nl], axis=-1)
                ),
            })
        logger.info(f"{len(out)} complexes done, last nll {float(nll[n_real - 1]):.1f}")
        batch_items = []

    path = os.path.join(args.result_path, f"crossdocked_{args.split}.pkl")
    with open(path, "wb") as f:
        pickle.dump(out, f)
    logger.info(f"saved {len(out)} entries -> {path}")


if __name__ == "__main__":
    main()

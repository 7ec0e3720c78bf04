"""Train the pocket-conditioned diffusion model.

Usage: python -m targetdiff_tpu.cli.train_diffusion configs/training.yml
       [--device auto] [--logdir ./logs] [--resume ckpt.npz]

Counterpart of reference scripts/train_diffusion.py with the same loop
semantics — protein-pos noise augmentation, Adam + grad-clip, best-val
checkpointing, validation over 10 fixed timesteps with atom-type AUROC — plus
what the reference lacks: data-parallel training over a device mesh and true
resume from checkpoint.
"""

from __future__ import annotations

import argparse
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..data.datasets import PaddedLoader, get_dataset, inf_iterator
from ..data.transforms import (
    Compose,
    FeaturizeLigandAtom,
    FeaturizeLigandBond,
    FeaturizeProteinAtom,
    RandomRotation,
)
from ..models.score_model import DiffusionModel
from ..parallel.mesh import make_mesh, shard_batch
from ..trainer import TrainState, atom_auroc, create_train_state, make_eval_step, make_train_step
from ..utils import train as train_utils
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.misc import BlackHole, count_parameters, get_logger, get_new_log_dir, seed_all


def build_transform(cfg_data):
    protein_featurizer = FeaturizeProteinAtom()
    ligand_featurizer = FeaturizeLigandAtom(cfg_data.transform.ligand_atom_mode)
    tfs = [protein_featurizer, ligand_featurizer, FeaturizeLigandBond()]
    if cfg_data.transform.get("random_rot", False):
        tfs.append(RandomRotation())
    return Compose(tfs), protein_featurizer, ligand_featurizer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--logdir", default="./logs_diffusion")
    ap.add_argument("--tag", default="")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--max_protein", type=int, default=640)
    ap.add_argument("--max_ligand", type=int, default=64)
    ap.add_argument("--n_mp", type=int, default=1, help="tensor-parallel axis size")
    ap.add_argument("--train_report_iter", type=int, default=200)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="denoiser compute dtype (params stay f32)")
    ap.add_argument("--impl", default="xla", choices=["xla", "fast"],
                    help="fast: attention layers as Pallas kernels with "
                    "hand-written Pallas backwards")
    ap.add_argument("--dist_coordinator", default=None,
                    help="multi-host: coordinator address host:port")
    ap.add_argument("--dist_num_processes", type=int, default=None)
    ap.add_argument("--dist_process_id", type=int, default=None)
    args = ap.parse_args(argv)

    # multi-host runtime init MUST precede the first backend touch
    # (parallel/mesh.py init_distributed; SURVEY §5 distributed-backend row)
    from ..parallel.mesh import init_distributed

    multiproc = init_distributed(
        args.dist_coordinator, args.dist_num_processes, args.dist_process_id
    )
    is_main = jax.process_index() == 0

    config = load_config(args.config)
    seed_all(config.train.seed)
    log_dir = get_new_log_dir(
        args.logdir,
        prefix="training",
        tag=(args.tag + (f"p{jax.process_index()}" if multiproc else "")),
    )
    logger = get_logger("train", log_dir)
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(log_dir)
    except ImportError:
        writer = BlackHole()
    shutil.copyfile(args.config, os.path.join(log_dir, os.path.basename(args.config)))
    logger.info(f"log dir: {log_dir}; devices: {jax.devices()}")

    transform, protein_feat, ligand_feat = build_transform(config.data)
    dataset, subsets = get_dataset(config.data, transform=transform)
    train_set, val_set = subsets["train"], subsets["test"]
    logger.info(f"train {len(train_set)} / val {len(val_set)}")

    loader = PaddedLoader(
        train_set, config.train.batch_size, max_protein=args.max_protein,
        max_ligand=args.max_ligand, shuffle=True, seed=config.train.seed,
    )
    val_loader = PaddedLoader(
        val_set, config.train.batch_size, max_protein=args.max_protein,
        max_ligand=args.max_ligand, shuffle=False, drop_last=False,
    )
    train_iter = inf_iterator(loader)

    import jax.numpy as jnp

    model = DiffusionModel(
        config.model, protein_feat.feature_dim, ligand_feat.feature_dim,
        max_protein=args.max_protein, max_ligand=args.max_ligand,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
    )
    opt_cfg = config.train.optimizer.merged({"max_grad_norm": config.train.max_grad_norm})
    optimizer = train_utils.get_optimizer(opt_cfg)
    scheduler = train_utils.get_scheduler(config.train.scheduler, config.train.optimizer)

    example = next(train_iter)
    key = jax.random.PRNGKey(config.train.seed)
    key, init_key = jax.random.split(key)
    state = create_train_state(model, optimizer, init_key, example)
    logger.info(f"parameters: {count_parameters(state.params):,}")

    start_iter = 1
    if args.resume:
        ck = load_checkpoint(args.resume, state.params, state.opt_state)
        state = TrainState(ck["params"], ck["opt_state"] or state.opt_state,
                           jnp.asarray(ck["iteration"], jnp.int32))
        scheduler.load_state_dict(ck["scheduler"]) if ck["scheduler"] else None
        start_iter = ck["iteration"] + 1
        logger.info(f"resumed from {args.resume} at iter {start_iter}")

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        import math

        n_dp = math.gcd(config.train.batch_size, n_dev // args.n_mp)
        if n_dp > 1:
            mesh = make_mesh(n_dp=n_dp, n_mp=args.n_mp,
                             devices=jax.devices()[: n_dp * args.n_mp])
            logger.info(f"mesh: {mesh}")
        else:
            logger.info(f"batch {config.train.batch_size} not divisible across "
                        f"{n_dev} devices; single-device training")
    if multiproc:
        assert mesh is not None, (
            "multi-process training needs batch_size divisible over the "
            "global device count"
        )
        from ..parallel.mesh import replicate_state

        # identical seeds -> identical init on every process; placing onto the
        # process-spanning mesh makes the state a true global array
        state = TrainState(
            replicate_state(state.params, mesh),
            replicate_state(state.opt_state, mesh),
            state.step, state.Lt_history, state.Lt_count,
        )

    train_step = make_train_step(
        model, optimizer, config.train.pos_noise_std, mesh=mesh, impl=args.impl
    )
    eval_step = make_eval_step(model)

    best_val = float("inf")
    it = start_iter
    try:
        while it <= config.train.max_iters:
            batch = next(train_iter)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            key, sk = jax.random.split(key)
            state, metrics = train_step(state, batch, sk)
            if it % args.train_report_iter == 0 or it == start_iter:
                m = {k: float(v) for k, v in metrics.items()}
                lr = train_utils.get_learning_rate(state.opt_state)
                logger.info(
                    f"[train] iter {it} loss {m['loss']:.4f} pos {m['loss_pos']:.4f} "
                    f"v {m['loss_v']:.4f} grad {m['grad_norm']:.2f} lr {lr:.2e}"
                )
                for k, v in m.items():
                    writer.add_scalar(f"train/{k}", v, it)
                writer.add_scalar("train/lr", lr, it)

            if it % config.train.val_freq == 0:
                val_loss = validate(
                    model, eval_step, state.params, val_loader, key, logger,
                    writer, it, mesh=mesh,
                )
                new_lr = scheduler.step(val_loss, train_utils.get_learning_rate(state.opt_state))
                train_utils.set_learning_rate(state.opt_state, new_lr)
                if val_loss < best_val:
                    best_val = val_loss
                    if is_main:  # rank 0 owns checkpoints in multi-host runs
                        ckpt = os.path.join(log_dir, f"ckpt_{it}.npz")
                        save_checkpoint(
                            ckpt, config, state.params, state.opt_state,
                            scheduler.state_dict(), it,
                        )
                        logger.info(f"[val] new best {val_loss:.4f} -> {ckpt}")
            it += 1
    except KeyboardInterrupt:
        logger.info("interrupted; saving last checkpoint")
        if not is_main:
            return
        save_checkpoint(
            os.path.join(log_dir, f"ckpt_last_{it}.npz"), config, state.params,
            state.opt_state, scheduler.state_dict(), it,
        )


def _gather_to_host(arr) -> np.ndarray:
    """Full global value of a (possibly process-spanning) array on every host."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)


def validate(model, eval_step, params, val_loader, key, logger, writer, it,
             num_t=10, mesh=None):
    """Fixed-timestep validation + atom-type AUROC
    (reference: scripts/train_diffusion.py:153-208).

    With a mesh, val batches are sharded over dp exactly like training
    batches, so the loss is computed with global semantics and every
    process sees the identical val_loss — keeping multi-host LR-scheduler
    and best-val decisions in sync (ADVICE r2)."""
    T = model.num_timesteps
    ts = np.linspace(0, T - 1, num_t).astype(np.int32)
    tot, tot_pos, tot_v, n = 0.0, 0.0, 0.0, 0
    ys, ps, ms = [], [], []
    for batch in val_loader:
        host_batch = batch
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(batch, mesh)
        for t_scalar in ts:
            out = eval_step(params, batch, int(t_scalar), key)
            B = batch.num_graphs
            tot += float(out["loss"]) * B
            tot_pos += float(out["loss_pos"]) * B
            tot_v += float(out["loss_v"]) * B
            n += B
        ys.append(np.asarray(host_batch.ligand_v))
        ps.append(jax.nn.softmax(_gather_to_host(out["pred_v"]), axis=-1))
        ms.append(np.asarray(host_batch.ligand_mask))
    val_loss = tot / max(n, 1)
    auroc = atom_auroc(
        np.concatenate([y.ravel() for y in ys]),
        np.concatenate([p.reshape(-1, p.shape[-1]) for p in ps]),
        np.concatenate([m.ravel() for m in ms]),
    )
    logger.info(
        f"[val] iter {it} loss {val_loss:.4f} pos {tot_pos/max(n,1):.4f} "
        f"v {tot_v/max(n,1):.4f} auroc {auroc:.4f}"
    )
    writer.add_scalar("val/loss", val_loss, it)
    writer.add_scalar("val/auroc", auroc, it)
    return val_loss


if __name__ == "__main__":
    main()

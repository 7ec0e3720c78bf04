"""Train the supervised binding-affinity regressor on PDBBind.

Usage: python -m targetdiff_tpu.cli.train_prop configs/prop/pdbbind_general_egnn.yml

Counterpart of reference scripts/property_prediction/train_prop.py: MSE
training with coordinate-noise augmentation, per-kind (Ki/Kd/IC50) validation
metrics, best-val checkpointing.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np
import optax

from ..config import load_config
from ..data.datasets import get_dataset
from ..data.transforms import Compose
from ..data.transforms_prop import FeaturizeLigandAtomProp, FeaturizeProteinAtom
from ..models.prop.prop_model import prop_loss_fn
from ..utils import train as train_utils
from ..utils.checkpoint import save_checkpoint
from ..utils.misc import count_parameters, get_logger, get_new_log_dir, seed_all
from ..utils.misc_prop import collate_prop, get_eval_scores, get_prop_model


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--logdir", default="./logs_prop")
    ap.add_argument("--max_protein", type=int, default=512)
    ap.add_argument("--max_ligand", type=int, default=96)
    args = ap.parse_args(argv)

    config = load_config(args.config)
    seed_all(config.train.seed)
    log_dir = get_new_log_dir(args.logdir, prefix="prop")
    logger = get_logger("train_prop", log_dir)

    protein_feat = FeaturizeProteinAtom()
    ligand_feat = FeaturizeLigandAtomProp()
    transform = Compose([protein_feat, ligand_feat])
    _, subsets = get_dataset(config.data, transform=transform)
    train_set, val_set = subsets["train"], subsets["test"]
    logger.info(f"train {len(train_set)} val {len(val_set)}")

    # 'egnn_enc' encoder selects the diffusion-feature-augmented variant
    # (reference: configs/prop/pdbbind_general_egnn_enc_final_h.yml)
    model = get_prop_model(config.model)
    enc_ft = (
        config.model.get("enc_feature_type")
        if config.model.encoder.name == "egnn_enc"
        else None
    )
    n_missing_emb = 0

    def batches(dataset, bs, shuffle, seed=0):
        nonlocal n_missing_emb
        order = np.arange(len(dataset))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        buf = []
        for i in order:
            try:
                s = dataset[int(i)]
            except Exception:
                continue
            if (len(s["protein_pos"]) > args.max_protein
                    or len(s["ligand_pos"]) > args.max_ligand):
                continue
            if enc_ft is not None and "final_h" not in s:
                n_missing_emb += 1  # complex absent from the emb export
                continue
            buf.append(s)
            if len(buf) == bs:
                yield collate_prop(buf, args.max_protein, args.max_ligand,
                                   enc_feature_type=enc_ft)
                buf = []

    example = next(batches(train_set, config.train.batch_size, False))
    key = jax.random.PRNGKey(config.train.seed)
    params = model.init(key, example)
    logger.info(f"parameters: {count_parameters(params):,}")

    opt_cfg = config.train.optimizer.merged(
        {"max_grad_norm": config.train.get("max_grad_norm", 0)}
    )
    optimizer = train_utils.get_optimizer(opt_cfg)
    opt_state = optimizer.init(params)
    scheduler = train_utils.get_scheduler(config.train.scheduler, config.train.optimizer)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        (loss, pred), grads = jax.value_and_grad(
            lambda p: prop_loss_fn(model, p, key, batch, config.train.pos_noise_std),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, batch):
        return model.apply(params, batch)

    best_val = float("inf")
    it = 0
    for epoch in range(config.train.get("max_epochs", 100)):
        for batch in batches(train_set, config.train.batch_size, True, seed=epoch):
            key, sk = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state, batch, sk)
            it += 1
            if it % 100 == 0:
                logger.info(f"iter {it} loss {float(loss):.4f}")

        ys, ps, kinds = [], [], []
        for batch in batches(val_set, config.train.batch_size, False):
            pred = predict(params, batch)
            ys.append(np.asarray(batch.y))
            ps.append(np.asarray(pred))
            kinds.append(np.asarray(batch.kind))
        y, p, kk = map(np.concatenate, (ys, ps, kinds))
        scores = get_eval_scores(p, y)
        for kind_id, kind_name in ((1, "Ki"), (2, "Kd"), (3, "IC50")):
            m = kk == kind_id
            if m.sum() > 2:
                s = get_eval_scores(p[m], y[m])
                logger.info(f"[val {kind_name}] " + " ".join(f"{a} {b:.3f}" for a, b in s.items()))
        val_loss = scores["rmse"]
        logger.info(f"[val] epoch {epoch} " + " ".join(f"{a} {b:.4f}" for a, b in scores.items()))
        if enc_ft is not None and n_missing_emb and epoch == 0:
            logger.info(f"skipped {n_missing_emb} complexes without emb features")
        new_lr = scheduler.step(val_loss, train_utils.get_learning_rate(opt_state))
        train_utils.set_learning_rate(opt_state, new_lr)
        if val_loss < best_val:
            best_val = val_loss
            save_checkpoint(os.path.join(log_dir, f"prop_ckpt_{epoch}.npz"),
                            config, params, opt_state, scheduler.state_dict(), it)
            logger.info(f"new best rmse {val_loss:.4f}")


if __name__ == "__main__":
    main()

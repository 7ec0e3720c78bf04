"""Evaluate a trained affinity regressor on the PDBBind test split
(reference: scripts/property_prediction/eval_prop.py:29-89)."""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..data.datasets import get_dataset
from ..data.transforms import Compose
from ..data.transforms_prop import FeaturizeLigandAtomProp, FeaturizeProteinAtom
from ..utils.checkpoint import load_checkpoint
from ..utils.misc import get_logger
from ..utils.misc_prop import collate_prop, get_eval_scores, get_prop_model


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_protein", type=int, default=512)
    ap.add_argument("--max_ligand", type=int, default=96)
    args = ap.parse_args(argv)

    logger = get_logger("eval_prop")
    raw = load_checkpoint(args.ckpt)
    config = raw["config"]

    protein_feat = FeaturizeProteinAtom()
    ligand_feat = FeaturizeLigandAtomProp()
    transform = Compose([protein_feat, ligand_feat])
    _, subsets = get_dataset(config.data, transform=transform)
    test_set = subsets["test"]

    model = get_prop_model(config.model)
    enc_ft = (
        config.model.get("enc_feature_type")
        if config.model.encoder.name == "egnn_enc"
        else None
    )
    samples = []
    for i in range(len(test_set)):
        try:
            s = test_set[i]
        except Exception:
            continue
        if enc_ft is not None and "final_h" not in s:
            continue
        if len(s["protein_pos"]) <= args.max_protein and len(s["ligand_pos"]) <= args.max_ligand:
            samples.append(s)
    example = collate_prop(samples[: args.batch_size], args.max_protein,
                           args.max_ligand, enc_feature_type=enc_ft)
    template = model.init(jax.random.PRNGKey(0), example)
    params = load_checkpoint(args.ckpt, params_template=template)["params"]

    predict = jax.jit(lambda p, b: model.apply(p, b))
    ys, ps, kinds = [], [], []
    for i in range(0, len(samples), args.batch_size):
        chunk = samples[i : i + args.batch_size]
        batch = collate_prop(chunk, args.max_protein, args.max_ligand,
                             enc_feature_type=enc_ft)
        pred = predict(params, batch)
        ys.append(np.asarray(batch.y))
        ps.append(np.asarray(pred))
        kinds.append(np.asarray(batch.kind))
    y, p, kk = map(np.concatenate, (ys, ps, kinds))
    scores = get_eval_scores(p, y)
    logger.info("overall: " + " ".join(f"{a} {b:.4f}" for a, b in scores.items()))
    for kind_id, kind_name in ((1, "Ki"), (2, "Kd"), (3, "IC50")):
        m = kk == kind_id
        if m.sum() > 2:
            s = get_eval_scores(p[m], y[m])
            logger.info(f"{kind_name}: " + " ".join(f"{a} {b:.4f}" for a, b in s.items()))


if __name__ == "__main__":
    main()

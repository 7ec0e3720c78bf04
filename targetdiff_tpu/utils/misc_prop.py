"""Prop-prediction infra: regression metrics and batch assembly
(reference: utils/misc_prop.py:9-64)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def get_eval_scores(ypred: np.ndarray, ytrue: np.ndarray, verbose: bool = False) -> Dict:
    """RMSE / MAE / R^2 / Pearson / Spearman
    (reference: utils/misc_prop.py:9-24)."""
    from scipy import stats
    from sklearn.metrics import mean_absolute_error, mean_squared_error, r2_score

    ypred = np.asarray(ypred).ravel()
    ytrue = np.asarray(ytrue).ravel()
    rmse = float(np.sqrt(mean_squared_error(ytrue, ypred)))
    mae = float(mean_absolute_error(ytrue, ypred))
    r2 = float(r2_score(ytrue, ypred))
    pearson = float(stats.pearsonr(ytrue, ypred)[0])
    spearman = float(stats.spearmanr(ytrue, ypred)[0])
    out = {"rmse": rmse, "mae": mae, "r2": r2, "pearson": pearson, "spearman": spearman}
    if verbose:
        print(" | ".join(f"{k} {v:.4f}" for k, v in out.items()))
    return out


def collate_prop(samples: List[Dict], max_protein: int, max_ligand: int):
    """Pad prop samples into a PropBatch."""
    import jax.numpy as jnp

    from ..models.prop.prop_model import PropBatch

    B = len(samples)
    fp = samples[0]["protein_atom_feature"].shape[-1]
    fl = samples[0]["ligand_atom_feature_full"].shape[-1]
    ppos = np.zeros((B, max_protein, 3), np.float32)
    pfeat = np.zeros((B, max_protein, fp), np.float32)
    pmask = np.zeros((B, max_protein), bool)
    lpos = np.zeros((B, max_ligand, 3), np.float32)
    lfeat = np.zeros((B, max_ligand, fl), np.float32)
    lmask = np.zeros((B, max_ligand), bool)
    y = np.zeros((B,), np.float32)
    kind = np.ones((B,), np.int32)
    for i, s in enumerate(samples):
        np_, nl = len(s["protein_pos"]), len(s["ligand_pos"])
        if np_ > max_protein or nl > max_ligand:
            raise ValueError("sample exceeds padding")
        ppos[i, :np_] = s["protein_pos"]
        pfeat[i, :np_] = s["protein_atom_feature"]
        pmask[i, :np_] = True
        lpos[i, :nl] = s["ligand_pos"]
        lfeat[i, :nl] = s["ligand_atom_feature_full"]
        lmask[i, :nl] = True
        y[i] = float(s.get("y", 0.0))
        kind[i] = int(s.get("kind", 1))
    return PropBatch(
        jnp.asarray(ppos), jnp.asarray(pfeat), jnp.asarray(pmask),
        jnp.asarray(lpos), jnp.asarray(lfeat), jnp.asarray(lmask),
        jnp.asarray(y), jnp.asarray(kind),
    )


def get_prop_model(config, protein_dim: int, ligand_dim: int, output_dim: int = 3):
    """Model factory (reference: utils/misc_prop.py:45-64)."""
    from ..models.prop.prop_model import PropPredNet

    return PropPredNet(config=dict(config), output_dim=output_dim)

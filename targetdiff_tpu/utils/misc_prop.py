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


def build_enc_features(sample: Dict, feature_type: str):
    """Per-sample diffusion-derived enc features from the merged emb fields
    (reference: models/property_pred/prop_model.py:167-205 get_loss).
    Returns (enc_ligand [NL, Dl] | None, enc_node [np+nl, Dn] | None,
    enc_graph [Dg] | None)."""
    lig, node, graph = None, None, None
    if feature_type == "nll":
        graph = sample["nll"]
    elif feature_type == "nll_all":
        graph = sample["nll_all"]
    elif feature_type == "final_h":
        node = sample["final_h"]
    elif feature_type == "pred_ligand_v":
        lig = sample["pred_ligand_v"]
    elif feature_type == "pred_v_entropy_pre":
        lig = sample["pred_v_entropy"]
    elif feature_type == "pred_v_entropy_post":
        graph = sample["pred_v_entropy"].sum(0)
    elif feature_type == "full":
        graph = np.concatenate(
            [sample["nll_all"], sample["pred_v_entropy"].sum(0)]
        )
        node = sample["final_h"]
        lig = np.concatenate(
            [sample["pred_ligand_v"], sample["pred_v_entropy"]], axis=-1
        )
    else:
        raise NotImplementedError(feature_type)
    return lig, node, graph


def collate_prop(samples: List[Dict], max_protein: int, max_ligand: int,
                 enc_feature_type: str = None):
    """Pad prop samples into a PropBatch. With enc_feature_type, the
    diffusion-derived features are padded alongside: node features follow the
    composed protein|ligand layout (real protein rows at [0, np), ligand rows
    at [max_protein, max_protein + nl)) so they align with compose_context."""
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
    enc_l = enc_n = enc_g = None
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
        if enc_feature_type is not None:
            el, en, eg = build_enc_features(s, enc_feature_type)
            if el is not None:
                if enc_l is None:
                    enc_l = np.zeros((B, max_ligand, el.shape[-1]), np.float32)
                enc_l[i, :nl] = el
            if en is not None:
                if enc_n is None:
                    enc_n = np.zeros(
                        (B, max_protein + max_ligand, en.shape[-1]), np.float32
                    )
                enc_n[i, :np_] = en[:np_]
                enc_n[i, max_protein : max_protein + nl] = en[np_ : np_ + nl]
            if eg is not None:
                eg = np.asarray(eg, np.float32).ravel()
                if enc_g is None:
                    enc_g = np.zeros((B, eg.shape[-1]), np.float32)
                enc_g[i] = eg
    return PropBatch(
        jnp.asarray(ppos), jnp.asarray(pfeat), jnp.asarray(pmask),
        jnp.asarray(lpos), jnp.asarray(lfeat), jnp.asarray(lmask),
        jnp.asarray(y), jnp.asarray(kind),
        enc_ligand_feat=None if enc_l is None else jnp.asarray(enc_l),
        enc_node_feat=None if enc_n is None else jnp.asarray(enc_n),
        enc_graph_feat=None if enc_g is None else jnp.asarray(enc_g),
    )


def get_prop_model(config_model, output_dim: int = 3):
    """Model factory (reference: utils/misc_prop.py:45-64): encoder name
    'egnn_enc' selects the diffusion-feature-augmented PropPredNetEnc with a
    single regression head."""
    from ..models.prop.prop_model import PropPredNet, PropPredNetEnc

    if config_model.encoder.name == "egnn_enc":
        return PropPredNetEnc(
            config=dict(config_model),
            enc_ligand_dim=int(config_model.get("enc_ligand_dim", 0)),
            enc_node_dim=int(config_model.get("enc_node_dim", 0)),
            enc_graph_dim=int(config_model.get("enc_graph_dim", 0)),
            output_dim=1,
        )
    return PropPredNet(config=dict(config_model), output_dim=output_dim)

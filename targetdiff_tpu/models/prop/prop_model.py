"""Binding-affinity prediction models (supervised EGNN regressor on PDBBind).

Dense-padded flax counterparts of the reference's property-prediction family
(reference: models/property_pred/prop_egnn.py:48-83 `EnEquiEncoder` — residual
E(n)-GNN encoder without coordinate updates, kNN graph, linspace distance-RBF
edge features; models/property_pred/prop_model.py:28-95 `PropPredNet` — 3-way
Ki/Kd/IC50 output head masked by affinity kind; :98-215 `PropPredNetEnc` —
variant injecting diffusion-derived features at ligand/node/graph level).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import Config
from ...ops import graph as G
from ...ops.rbf import gaussian_smearing
from ..common import MLP, TorchLinear, shifted_softplus


class PropBatch(NamedTuple):
    """Dense prop-prediction batch; `kind` in {1: Ki, 2: Kd, 3: IC50}
    (reference: datasets/protein_ligand.py KMAP)."""

    protein_pos: jnp.ndarray  # [B, NP, 3]
    protein_feat: jnp.ndarray  # [B, NP, FP]
    protein_mask: jnp.ndarray  # [B, NP]
    ligand_pos: jnp.ndarray  # [B, NL, 3]
    ligand_feat: jnp.ndarray  # [B, NL, FL]
    ligand_mask: jnp.ndarray  # [B, NL]
    y: jnp.ndarray  # [B]
    kind: jnp.ndarray  # [B] int (1..3)
    enc_ligand_feat: Optional[jnp.ndarray] = None  # [B, NL, D1]
    enc_node_feat: Optional[jnp.ndarray] = None  # [B, N, D2]
    enc_graph_feat: Optional[jnp.ndarray] = None  # [B, D3]

    @property
    def num_graphs(self):
        return self.protein_pos.shape[0]


class EnBaseLayerProp(nn.Module):
    """(reference: models/property_pred/prop_egnn.py:8-46) — message MLP with
    sigmoid gate, summed, then node MLP; output is the residual branch."""

    hidden_dim: int
    act_fn: str = "relu"
    norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h, nbh: G.Neighborhood, edge_attr):
        B, N, H = h.shape
        hi = jnp.broadcast_to(h[:, :, None, :], (B, N, nbh.idx.shape[-1], H))
        hj = G.gather_nodes(h, nbh.idx)
        mij = MLP(self.hidden_dim, self.hidden_dim, num_layer=2, norm=self.norm,
                  act_fn=self.act_fn, act_last=True, dtype=self.dtype, name="edge_mlp")(
            jnp.concatenate([edge_attr, hi, hj], axis=-1)
        )
        eij = jax.nn.sigmoid(TorchLinear(1, dtype=self.dtype, name="edge_inf")(mij))
        m = jnp.where(nbh.mask[..., None], mij * eij, 0.0)
        mi = m.sum(axis=2)
        return MLP(self.hidden_dim, self.hidden_dim, num_layer=2, norm=self.norm,
                   act_fn=self.act_fn, dtype=self.dtype, name="node_mlp")(
            jnp.concatenate([mi, h], axis=-1)
        )


class EnEquiEncoder(nn.Module):
    """(reference: models/property_pred/prop_egnn.py:48-83)."""

    num_layers: int
    hidden_dim: int
    num_r_gaussian: int
    k: int = 32
    cutoff: float = 10.0
    act_fn: str = "relu"
    norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_attr, pos, node_mask):
        import numpy as np

        nbh = G.knn_graph(pos, node_mask, self.k)
        _, dist = G.rel_geometry(pos, nbh)
        knots = np.linspace(0.0, self.cutoff, self.num_r_gaussian)
        offsets = jnp.asarray(knots, jnp.float32)
        coeff = -0.5 / float(knots[1] - knots[0]) ** 2
        edge_attr = gaussian_smearing(dist, offsets, coeff).astype(node_attr.dtype)

        h = node_attr
        for l in range(self.num_layers):
            h = h + EnBaseLayerProp(
                self.hidden_dim, act_fn=self.act_fn, norm=self.norm,
                dtype=self.dtype, name=f"layer_{l}",
            )(h, nbh, edge_attr)
        return h


def _encoder_from_config(cfg, dtype=None):
    if cfg.name not in ("egnn", "egnn_enc"):
        raise ValueError(cfg.name)
    return EnEquiEncoder(
        num_layers=cfg.num_layers, hidden_dim=cfg.hidden_dim,
        num_r_gaussian=cfg.num_r_gaussian, k=cfg.knn, cutoff=cfg.cutoff,
        act_fn=cfg.act_fn, norm=cfg.norm, dtype=dtype, name="encoder",
    )


class PropPredNet(nn.Module):
    """(reference: models/property_pred/prop_model.py:28-95)."""

    config: Any
    output_dim: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: PropBatch):
        cfg = Config(self.config)
        hidden = cfg.hidden_channels
        h_protein = TorchLinear(hidden, dtype=self.dtype, name="protein_atom_emb")(
            batch.protein_feat
        )
        h_ligand = TorchLinear(hidden, dtype=self.dtype, name="ligand_atom_emb")(
            batch.ligand_feat
        )
        h, pos, mask_all, _ = G.compose_context(
            h_protein, h_ligand, batch.protein_pos, batch.ligand_pos,
            batch.protein_mask, batch.ligand_mask,
        )
        h = _encoder_from_config(cfg.encoder, self.dtype)(h, pos, mask_all)
        pre_out = (h * mask_all[..., None].astype(h.dtype)).sum(axis=1)  # sum-pool
        y = TorchLinear(hidden, dtype=self.dtype, name="out_0")(pre_out)
        y = shifted_softplus(y)
        out = TorchLinear(self.output_dim, dtype=self.dtype, name="out_2")(y)  # [B, 3]
        kind_mask = jax.nn.one_hot(batch.kind - 1, self.output_dim, dtype=out.dtype)
        return (out * kind_mask).sum(-1)  # [B]


class PropPredNetEnc(nn.Module):
    """Encoder variant with injected diffusion features
    (reference: models/property_pred/prop_model.py:98-215).
    enc_feature_type in {nll, final_h, pred_ligand_v, pred_v_entropy_pre,
    pred_v_entropy_post, full}; the corresponding enc_* fields of PropBatch
    must be populated."""

    config: Any
    enc_ligand_dim: int = 0
    enc_node_dim: int = 0
    enc_graph_dim: int = 0
    output_dim: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: PropBatch):
        cfg = Config(self.config)
        hidden = cfg.hidden_channels
        lig_feat = batch.ligand_feat
        if self.enc_ligand_dim > 0:
            lig_feat = jnp.concatenate([lig_feat, batch.enc_ligand_feat], axis=-1)
        h_protein = TorchLinear(hidden, dtype=self.dtype, name="protein_atom_emb")(
            batch.protein_feat
        )
        h_ligand = TorchLinear(hidden, dtype=self.dtype, name="ligand_atom_emb")(lig_feat)
        h, pos, mask_all, _ = G.compose_context(
            h_protein, h_ligand, batch.protein_pos, batch.ligand_pos,
            batch.protein_mask, batch.ligand_mask,
        )
        h = _encoder_from_config(cfg.encoder, self.dtype)(h, pos, mask_all)
        if self.enc_node_dim > 0:
            h = jnp.concatenate([h, batch.enc_node_feat], axis=-1)
            z = TorchLinear(hidden, dtype=self.dtype, name="enc_node_0")(h)
            z = jax.nn.relu(z)
            h = TorchLinear(hidden, dtype=self.dtype, name="enc_node_2")(z)
        pre_out = (h * mask_all[..., None].astype(h.dtype)).sum(axis=1)
        if self.enc_graph_dim > 0:
            pre_out = jnp.concatenate([pre_out, batch.enc_graph_feat], axis=-1)
        y = TorchLinear(hidden, dtype=self.dtype, name="out_0")(pre_out)
        y = shifted_softplus(y)
        out = TorchLinear(self.output_dim, dtype=self.dtype, name="out_2")(y)
        if self.output_dim > 1:
            kind_mask = jax.nn.one_hot(batch.kind - 1, self.output_dim, dtype=out.dtype)
            return (out * kind_mask).sum(-1)
        return out[..., 0]


def prop_loss_fn(model, params, key, batch: PropBatch, pos_noise_std: float):
    """MSE loss with coordinate-noise augmentation
    (reference: models/property_pred/prop_model.py:76-95)."""
    kp, kl = jax.random.split(key)
    pnoise = jax.random.normal(kp, batch.protein_pos.shape) * pos_noise_std
    lnoise = jax.random.normal(kl, batch.ligand_pos.shape) * pos_noise_std
    noisy = batch._replace(
        protein_pos=batch.protein_pos + pnoise, ligand_pos=batch.ligand_pos + lnoise
    )
    pred = model.apply(params, noisy)
    loss = ((pred - batch.y) ** 2).mean()
    return loss, pred

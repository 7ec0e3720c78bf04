"""E(n)-equivariant GNN denoiser (alternative backbone), dense-padded for TPU.

Counterpart of the reference's EGNN (reference: models/egnn.py:9-133), selected
via `model_type: egnn` (reference: models/molopt_score_model.py:34-42). Message
passing over [B, N, K] neighborhoods with masked sums replacing torch_scatter
`scatter_sum`.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import graph as G
from ..ops.rbf import gaussian_smearing, gaussian_smearing_offsets
from .common import MLP, TorchLinear, get_activation


def _xavier_uniform_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class EnBaseLayer(nn.Module):
    """Classic E(n)-GNN layer (reference: models/egnn.py:9-64): edge MLP m_ij,
    sigmoid gate e_ij, gated sum aggregation, residual node MLP, and a
    tanh-bounded coordinate update applied to ligand atoms only."""

    hidden_dim: int
    edge_feat_dim: int
    num_r_gaussian: int
    update_x: bool = True
    act_fn: str = "silu"
    norm: bool = False
    r_min: float = 0.0
    r_max: float = 10.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h, x, nbh: G.Neighborhood, mask_ligand, edge_attr=None, fix_x=False):
        B, N, H = h.shape
        hi = jnp.broadcast_to(h[:, :, None, :], (B, N, nbh.idx.shape[-1], H))
        hj = G.gather_nodes(h, nbh.idx)
        rel_x, dist = G.rel_geometry(x, nbh)  # [B,3,N,K], [B,N,K]
        d_sq = (dist * dist)[..., None]  # [B,N,K,1]

        if self.num_r_gaussian > 1:
            offsets, coeff = gaussian_smearing_offsets(self.r_min, self.r_max, self.num_r_gaussian)
            d_feat = gaussian_smearing(dist, offsets, coeff).astype(h.dtype)
        else:
            d_feat = d_sq.astype(h.dtype)
        if edge_attr is not None:
            edge_feat = jnp.concatenate([d_feat, edge_attr], axis=-1)
        else:
            edge_feat = d_sq.astype(h.dtype)

        mij = MLP(self.hidden_dim, self.hidden_dim, num_layer=2, norm=self.norm,
                  act_fn=self.act_fn, act_last=True, dtype=self.dtype, name="edge_mlp")(
            jnp.concatenate([hi, hj, edge_feat], axis=-1)
        )
        eij = jax.nn.sigmoid(TorchLinear(1, dtype=self.dtype, name="edge_inf")(mij))
        m = jnp.where(nbh.mask[..., None], mij * eij, 0.0)
        mi = m.sum(axis=2)  # masked scatter_sum over incoming edges

        h = h + MLP(self.hidden_dim, self.hidden_dim, num_layer=2, norm=self.norm,
                    act_fn=self.act_fn, dtype=self.dtype, name="node_mlp")(
            jnp.concatenate([mi, h], axis=-1)
        )

        if self.update_x:
            # x_mlp: Linear -> act -> Linear(no bias, xavier gain 1e-3) -> tanh
            # (reference: models/egnn.py:26-32)
            g = TorchLinear(self.hidden_dim, dtype=self.dtype, name="x_mlp_0")(mij)
            g = get_activation(self.act_fn)(g)
            g = TorchLinear(1, use_bias=False, kernel_init=_xavier_uniform_gain(0.001),
                            dtype=self.dtype, name="x_mlp_2")(g)
            g = jnp.tanh(g)
            # per-edge scalar gate on rel vectors
            s = jnp.where(nbh.mask, g[..., 0].astype(jnp.float32) / (dist + 1.0), 0.0)
            delta = jnp.einsum("bnk,bnkd->bnd", s, rel_x.astype(jnp.float32))
            if not fix_x:
                x = x + delta * mask_ligand[..., None].astype(x.dtype)

        return h, x


class EGNN(nn.Module):
    """Full EGNN denoiser: per layer rebuild the kNN graph on current
    coordinates (reference: models/egnn.py:67-133)."""

    num_layers: int
    hidden_dim: int
    edge_feat_dim: int
    num_r_gaussian: int
    k: int = 32
    cutoff: float = 10.0
    cutoff_mode: str = "knn"
    update_x: bool = True
    act_fn: str = "silu"
    norm: bool = False
    max_ligand: int = 0
    remat: bool = False  # rematerialize each layer in the backward pass
    dtype: Optional[jnp.dtype] = None

    def _connect(self, x, node_mask, mask_ligand) -> G.Neighborhood:
        if self.cutoff_mode == "knn":
            return G.knn_graph(x, node_mask, self.k)
        if self.cutoff_mode == "hybrid":
            assert self.max_ligand > 0
            return G.hybrid_graph(x, node_mask, mask_ligand, self.k, self.max_ligand)
        raise ValueError(f"Not supported cutoff mode: {self.cutoff_mode}")

    @nn.compact
    def __call__(self, h, x, mask_ligand, node_mask, return_all=False, fix_x=False):
        all_x, all_h = [x], [h]
        layer_cls = EnBaseLayer
        if self.remat:
            # EGNN can ONLY run the XLA path (no fused kernels), so large
            # batches depend on rematerializing the [B,N,K,*] edge tensors
            layer_cls = nn.remat(layer_cls, static_argnums=(6,))
        for l_idx in range(self.num_layers):
            nbh = self._connect(x, node_mask, mask_ligand)
            edge_type = G.edge_types(nbh, mask_ligand).astype(h.dtype)
            h, x = layer_cls(
                self.hidden_dim, self.edge_feat_dim, self.num_r_gaussian,
                update_x=self.update_x, act_fn=self.act_fn, norm=self.norm,
                dtype=self.dtype, name=f"layer_{l_idx}",
            )(h, x, nbh, mask_ligand, edge_type, fix_x)
            all_x.append(x)
            all_h.append(h)
        outputs = {"x": x, "h": h}
        if return_all:
            outputs.update({"all_x": all_x, "all_h": all_h})
        return outputs

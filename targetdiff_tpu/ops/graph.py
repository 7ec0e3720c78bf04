"""Dense padded graph construction — the TPU-native replacement for
torch_cluster's `knn_graph` and PyG ragged batching.

Layout: each complex in a batch is a fixed-size padded node set
`[B, N, ...]` with a validity mask `[B, N]`. Neighborhoods are `[B, N, K]`
index tensors (for center/dst node i, its K nearest source/src nodes j), with
a neighbor validity mask. This reproduces the semantics of
`knn_graph(x, k, batch, flow='source_to_target')` (reference:
models/uni_transformer.py:276-286) with static shapes so the whole denoiser
runs under jit/scan and the FLOPs land on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 1e20


class Neighborhood(NamedTuple):
    idx: jnp.ndarray  # [B, N, K] int32 — source-node indices per center node
    mask: jnp.ndarray  # [B, N, K] bool — neighbor validity


def pairwise_sq_dists(pos: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] -> [B, N, N] squared distances via the matmul identity
    (keeps memory at O(N^2) and runs on the MXU). Only used for neighbor
    *selection*; per-edge distances are recomputed exactly after gathering."""
    sq = jnp.sum(pos * pos, axis=-1)
    cross = jnp.einsum("bid,bjd->bij", pos, pos)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def knn_graph(pos: jnp.ndarray, mask: jnp.ndarray, k: int) -> Neighborhood:
    """k-nearest-neighbor graph over valid nodes, excluding self-loops.

    Equivalent to torch_cluster `knn_graph(..., flow='source_to_target')`:
    edges point j (source) -> i (target); row i of the result lists i's k
    nearest valid j != i. Padded rows get fully-masked neighborhoods.
    """
    B, N, _ = pos.shape
    d2 = pairwise_sq_dists(pos)
    valid = mask[:, None, :] & mask[:, :, None]  # both endpoints real
    eye = jnp.eye(N, dtype=bool)[None]
    d2 = jnp.where(valid & ~eye, d2, BIG)
    neg_top, idx = jax.lax.top_k(-d2, k)  # [B, N, K]
    nbr_mask = neg_top > -BIG / 2
    return Neighborhood(idx=idx.astype(jnp.int32), mask=nbr_mask)


def hybrid_graph(
    pos: jnp.ndarray,
    node_mask: jnp.ndarray,
    mask_ligand: jnp.ndarray,
    k: int,
    max_ligand: int,
) -> Neighborhood:
    """Hybrid connectivity (reference: models/common.py:165-212): ligand atoms
    fully connected among themselves plus k nearest protein atoms; protein
    atoms get k nearest among all atoms. Dense form: per-center neighbor list
    of width K = max_ligand - 1 + k, padded with masked slots.

    `mask_ligand` is [B, N] (True on ligand rows of the composed context).
    """
    B, N, _ = pos.shape
    K = max_ligand - 1 + k
    d2 = pairwise_sq_dists(pos)
    valid = node_mask[:, None, :] & node_mask[:, :, None]
    eye = jnp.eye(N, dtype=bool)[None]
    base_invalid = ~(valid & ~eye)

    lig_src = mask_ligand[:, None, :]
    lig_dst = mask_ligand[:, :, None]

    # ligand centers: rank all ligand sources ahead of protein sources (the
    # +1e6 offset exceeds any real squared distance), keep every ligand source
    # plus the k nearest protein sources
    d2_lig_center = jnp.where(lig_src, d2, d2 + 1e6)
    d2_lig_center = jnp.where(base_invalid, BIG, d2_lig_center)
    neg_l, idx_l = jax.lax.top_k(-d2_lig_center, K)
    src_is_lig_l = jnp.take_along_axis(jnp.broadcast_to(lig_src, (B, N, N)), idx_l, axis=2)
    protein_rank = jnp.cumsum((~src_is_lig_l).astype(jnp.int32), axis=-1)
    keep_l = (neg_l > -BIG / 2) & (src_is_lig_l | (protein_rank <= k))

    # protein centers: plain knn over all atoms, first k valid entries
    d2_prot_center = jnp.where(base_invalid, BIG, d2)
    neg_p, idx_p = jax.lax.top_k(-d2_prot_center, K)
    keep_p = neg_p > -BIG / 2
    keep_p = keep_p & (jnp.cumsum(keep_p.astype(jnp.int32), axis=-1) <= k)

    idx = jnp.where(lig_dst, idx_l, idx_p).astype(jnp.int32)
    nbr_mask = jnp.where(mask_ligand[:, :, None], keep_l, keep_p)
    return Neighborhood(idx=idx, mask=nbr_mask)


def edge_types(nbh: Neighborhood, mask_ligand: jnp.ndarray) -> jnp.ndarray:
    """4-way one-hot edge type by (src is ligand, dst is ligand)
    (reference: models/uni_transformer.py:288-299):
      0: l->l   1: l->p   2: p->l   3: p->p
    Returns [B, N, K, 4] float32."""
    src_lig = jnp.take_along_axis(
        jnp.broadcast_to(mask_ligand[:, None, :], nbh.idx.shape[:2] + (mask_ligand.shape[1],)),
        nbh.idx,
        axis=2,
    )
    dst_lig = mask_ligand[:, :, None]
    etype = jnp.where(
        src_lig & dst_lig, 0, jnp.where(src_lig & ~dst_lig, 1, jnp.where(~src_lig & dst_lig, 2, 3))
    )
    return jax.nn.one_hot(etype, 4, dtype=jnp.float32)


def gather_nodes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-node features at neighbor indices:
    x [B, N, D], idx [B, N, K] -> [B, N, K, D].

    Lowered as one flat row-gather from [B*N, D] (measured ~2x faster on TPU
    than the equivalent take_along_axis on [B, 1, N, D])."""
    B, N, K = idx.shape
    D = x.shape[-1]
    off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    flat = jnp.take(x.reshape(B * N, D), (idx + off).reshape(-1), axis=0)
    return flat.reshape(B, N, K, D)


def rel_geometry(x: jnp.ndarray, nbh: Neighborhood):
    """Edge geometry: rel [B, N, K, 3] (= x_dst - x_src) and dist [B, N, K],
    computed in f32 (coordinate precision matters for the RBF features)."""
    xj = gather_nodes(x, nbh.idx)
    rel = x[:, :, None, :] - xj
    dist = jnp.sqrt((rel * rel).sum(-1) + 1e-16)
    return rel, dist


def compose_context(
    h_protein: jnp.ndarray,
    h_ligand: jnp.ndarray,
    pos_protein: jnp.ndarray,
    pos_ligand: jnp.ndarray,
    protein_mask: jnp.ndarray,
    ligand_mask: jnp.ndarray,
):
    """Concatenate protein then ligand nodes into one padded context.

    The reference stable-sorts the concatenated ragged batch so each graph's
    protein atoms precede its ligand atoms (reference: models/common.py:120-137);
    with one graph per batch row, plain concatenation reproduces that order.
    Returns (h_all [B, N, H], pos_all [B, N, 3], mask_all [B, N],
    mask_ligand [B, N])."""
    h_all = jnp.concatenate([h_protein, h_ligand], axis=1)
    pos_all = jnp.concatenate([pos_protein, pos_ligand], axis=1)
    mask_all = jnp.concatenate([protein_mask, ligand_mask], axis=1)
    B, NP = protein_mask.shape
    NL = ligand_mask.shape[1]
    mask_ligand = jnp.concatenate(
        [jnp.zeros((B, NP), bool), jnp.ones((B, NL), bool)], axis=1
    )
    # padded ligand slots must not count as ligand
    mask_ligand = mask_ligand & mask_all
    return h_all, pos_all, mask_all, mask_ligand

"""Fused kNN graph kernel: pairwise distances + top-k entirely in VMEM.

The XLA path materializes the [B, N, N] squared-distance matrix in HBM and
runs a sort-based `lax.top_k` (profiled at ~15-20 ms/step at B=100, N=416 —
the largest non-denoiser cost of a sampling step). Here each complex's d2
matrix lives only in VMEM (416 x 416 f32 ~ 692 KB) and the k nearest
neighbors are extracted with K rounds of row-max + first-match-argmin +
masking, all on the VPU.

Semantics match ops/graph.knn_graph (torch_cluster knn_graph with
flow='source_to_target': no self loops, only valid->valid edges, up to k
neighbors with a validity mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e20


def _knn_kernel(pos_ref, mask_ref, idx_ref, nmask_ref, d2buf, *, N, K):
    pos = pos_ref[0]  # [N, 3] f32
    m = mask_ref[0]  # [N, 1] f32
    sq = (pos * pos).sum(-1, keepdims=True)  # [N, 1]
    cross = jnp.dot(pos, pos.T, preferred_element_type=jnp.float32)  # [N, N]
    d2 = jnp.maximum(sq + sq.T - 2.0 * cross, 0.0)

    valid = m * m.T  # [N, N] 1/0
    row_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    d2 = jnp.where((valid > 0) & (row_i != col_j), d2, BIG)
    d2buf[...] = d2

    col_f = col_j.astype(jnp.float32)
    for k in range(K):  # static unroll: K small
        cur = d2buf[...]
        mn = cur.min(axis=1, keepdims=True)  # [N, 1]
        # first column index achieving the min
        hit = cur <= mn
        jk = jnp.where(hit, col_f, float(N)).min(axis=1, keepdims=True)  # [N,1] f32
        jki = jk.astype(jnp.int32)
        idx_ref[0, :, k : k + 1] = jnp.where(jki >= N, 0, jki)
        nmask_ref[0, :, k : k + 1] = jnp.where(mn < BIG / 2, 1.0, 0.0)
        # knock out the selected column per row
        d2buf[...] = jnp.where(col_j == jki, BIG, cur)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_graph_pallas(pos, mask, k: int = 32, interpret: bool = False):
    """pos [B, N, 3] f32, mask [B, N] bool -> (idx [B,N,K] i32, nmask [B,N,K] bool)."""
    B, N, _ = pos.shape
    kern = functools.partial(_knn_kernel, N=N, K=k)
    idx, nmask = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, N, k), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, k), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
            jax.ShapeDtypeStruct((B, N, k), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
        interpret=interpret,
    )(pos.astype(jnp.float32), mask.astype(jnp.float32)[..., None])
    return idx, nmask > 0.5

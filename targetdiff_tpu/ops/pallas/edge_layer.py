"""Fused Pallas TPU kernels for the UniTransformerO2 attention layers.

Why: the XLA path materializes ~10 [B, N, K, 128+] edge tensors per layer in
HBM (gathered neighbor features, concatenated kv inputs, MLP intermediates,
LayerNorm casts) — measured ~45 ms/layer at B=100, N=416, K=32 on v5e, fully
HBM-bandwidth-bound. These kernels keep the entire edge computation in VMEM:

  * per-complex node features h[b] (N x 128 bf16 ~ 106 KB) are resident in
    VMEM across all center tiles;
  * the neighbor gather is an in-VMEM one-hot matmul on the MXU
    (one_hot(idx) @ h — ~27 MFLOP per 8-center tile, trivial), eliminating
    the slow HBM row-gather entirely;
  * the edge MLPs (kv-input -> LayerNorm -> relu -> Linear) run on
    [TN*K, 128] tiles with the first Linear split by input block
    (edge-type | rbf | h_i | h_j) so the per-node terms are computed once per
    node, not per edge;
  * masked per-center softmax and aggregation happen in-register via
    [TN, K, heads] reshapes.

HBM traffic per layer drops to ~2 x N x H reads/writes + parameters.

The kernels implement the exact math of BaseX2HAttLayer / BaseH2XAttLayer
(reference: models/uni_transformer.py:11-140) for the released TargetDiff
config (x2h_out_fc=False, ew_net_type='global', relu, norm=True). They are
inference-path kernels (sampling/likelihood); training uses the XLA path.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def _pick_tile(N: int) -> int:
    """Largest center-tile size (multiple of 8) dividing N; bigger tiles
    amortize per-grid-step overhead."""
    for tn in (64, 32, 16, 8):
        if N % tn == 0:
            return tn
    raise ValueError(f"N={N} must be a multiple of 8")
NEG = -1e9


class X2HParams(NamedTuple):
    """Weights of one BaseX2HAttLayer, first Linear split by kv-input block
    (order: edge_feat 4 | r_feat 80 | h_i | h_j — reference
    models/uni_transformer.py:49-51)."""

    hk_w1e: jnp.ndarray  # [4, H]
    hk_w1r: jnp.ndarray  # [R, H]
    hk_w1i: jnp.ndarray  # [H, H]
    hk_w1j: jnp.ndarray  # [H, H]
    hk_b1: jnp.ndarray  # [H]
    hk_lns: jnp.ndarray  # [H]
    hk_lnb: jnp.ndarray  # [H]
    hk_w2: jnp.ndarray  # [H, H]
    hk_b2: jnp.ndarray  # [H]
    hv_w1e: jnp.ndarray
    hv_w1r: jnp.ndarray
    hv_w1i: jnp.ndarray
    hv_w1j: jnp.ndarray
    hv_b1: jnp.ndarray
    hv_lns: jnp.ndarray
    hv_lnb: jnp.ndarray
    hv_w2: jnp.ndarray
    hv_b2: jnp.ndarray
    hq_w1: jnp.ndarray  # [H, H]
    hq_b1: jnp.ndarray
    hq_lns: jnp.ndarray
    hq_lnb: jnp.ndarray
    hq_w2: jnp.ndarray
    hq_b2: jnp.ndarray


class H2XParams(NamedTuple):
    xk_w1e: jnp.ndarray
    xk_w1r: jnp.ndarray
    xk_w1i: jnp.ndarray
    xk_w1j: jnp.ndarray
    xk_b1: jnp.ndarray
    xk_lns: jnp.ndarray
    xk_lnb: jnp.ndarray
    xk_w2: jnp.ndarray  # [H, H]
    xk_b2: jnp.ndarray
    xv_w1e: jnp.ndarray
    xv_w1r: jnp.ndarray
    xv_w1i: jnp.ndarray
    xv_w1j: jnp.ndarray
    xv_b1: jnp.ndarray
    xv_lns: jnp.ndarray
    xv_lnb: jnp.ndarray
    xv_w2: jnp.ndarray  # [H, heads]
    xv_b2: jnp.ndarray  # [heads]
    xq_w1: jnp.ndarray
    xq_b1: jnp.ndarray
    xq_lns: jnp.ndarray
    xq_lnb: jnp.ndarray
    xq_w2: jnp.ndarray
    xq_b2: jnp.ndarray


def _ln_relu(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return jnp.maximum(y, 0.0)


def _edge_mlp(et4, rbf, hi_term, hj, w1e, w1r, w1j, b1, lns, lnb, w2, b2, K, dtype):
    """First Linear of the edge MLP, split by kv-input block; hi_term is the
    per-node [TN, H] partial (h_i @ w1i) repeated across K."""
    z = (
        jnp.dot(et4.astype(dtype), w1e.astype(dtype), preferred_element_type=jnp.float32)
        + jnp.dot(rbf.astype(dtype), w1r.astype(dtype), preferred_element_type=jnp.float32)
        + jnp.dot(hj.astype(dtype), w1j.astype(dtype), preferred_element_type=jnp.float32)
        + jnp.broadcast_to(hi_term[:, None, :], (hi_term.shape[0], K, hi_term.shape[1])).reshape(
            hi_term.shape[0] * K, hi_term.shape[1]
        )
        + b1.astype(jnp.float32)
    )
    z = _ln_relu(z, lns, lnb).astype(dtype)
    return jnp.dot(z, w2.astype(dtype), preferred_element_type=jnp.float32) + b2.astype(
        jnp.float32
    )


def _node_mlp(h_tile, w1, b1, lns, lnb, w2, b2, dtype):
    z = jnp.dot(h_tile.astype(dtype), w1.astype(dtype), preferred_element_type=jnp.float32)
    z = _ln_relu(z + b1.astype(jnp.float32), lns, lnb).astype(dtype)
    return jnp.dot(z, w2.astype(dtype), preferred_element_type=jnp.float32) + b2.astype(
        jnp.float32
    )


def _edge_geometry(x_ref, onehot_d, rows, offsets_ref, coeff, K, dtype):
    """rel [TNK, 3], dist [TNK, 1], rbf [TNK, R] from current coordinates.

    The coordinate gather reuses the bf16 one-hot matmul with an exact hi/lo
    split (x = round-to-bf16(x) + residual): one-hot selection is exact in any
    dtype, so two bf16 matmuls reconstruct xj to full f32 precision at 2x the
    MXU rate of an f32 matmul."""
    x_all = x_ref[:]  # [N, 3] f32
    x_hi = x_all.astype(dtype)
    x_lo = (x_all - x_hi.astype(jnp.float32)).astype(dtype)
    xj = (
        jnp.dot(onehot_d, x_hi, preferred_element_type=jnp.float32)
        + jnp.dot(onehot_d, x_lo, preferred_element_type=jnp.float32)
    )  # [TNK, 3]
    x_tile = x_ref[rows]
    TNx = x_tile.shape[0]
    xi = jnp.broadcast_to(x_tile[:, None, :], (TNx, K, 3)).reshape(TNx * K, 3)
    rel = xi - xj
    dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)  # [TNK, 1]
    d = dist - offsets_ref[:]  # [TNK, 1] - [1, R] -> [TNK, R]
    rbf = jnp.exp(coeff * d * d)
    return rel, dist, rbf


def _attention_alpha(k, q_tile, v_scale_mask, n_heads, dh, K, S, St, TN):
    """Masked per-center softmax. k [TNK, H]; q_tile [TN, H];
    v_scale_mask [TNK, 1] (0/1 neighbor validity). Returns alpha [TNK, heads].
    S [H, heads] sums lane blocks per head; St its transpose."""
    TNq, Hq = q_tile.shape
    q_rep = jnp.broadcast_to(q_tile[:, None, :], (TNq, K, Hq)).reshape(TNq * K, Hq)
    prod = (k * q_rep).astype(jnp.float32)
    logits = jnp.dot(prod, S, preferred_element_type=jnp.float32) / math.sqrt(dh)
    logits = jnp.where(v_scale_mask > 0, logits, NEG)
    lg = logits.reshape(TN, K, n_heads)
    mx = jax.lax.stop_gradient(lg.max(axis=1, keepdims=True))
    e = jnp.exp(lg - mx) * v_scale_mask.reshape(TN, K, 1)
    den = e.sum(axis=1, keepdims=True)
    alpha = e / jnp.maximum(den, 1e-16)
    return alpha.reshape(TN * K, n_heads)


def _head_matrices(H, n_heads, dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, n_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (H, n_heads), 1)
    S = (lane // (H // n_heads) == head).astype(dtype)  # [H, heads]
    return S, S.T


def _x2h_kernel(
    # inputs
    h_ref, x_ref, idx_ref, nmask_ref, etype_ref, ew_ref, offsets_ref, p_refs,
    # outputs
    hout_ref,
    *, N, H, K, n_heads, coeff, dtype, TN,
):
    t = pl.program_id(1)
    rows = pl.ds(t * TN, TN)
    TNK = TN * K
    dh = H // n_heads

    idx_t, et4, nm, ew = _edge_scalars_2d(idx_ref, etype_ref, nmask_ref, ew_ref, TN, K)
    onehot_d = _onehot_from_idx(idx_t, N, TN, K, dtype)

    h_all = h_ref[:]  # [N, H]
    hj = jnp.dot(onehot_d, h_all.astype(dtype), preferred_element_type=jnp.float32)
    h_tile = h_ref[rows, :]  # [TN, H]

    _, _, rbf = _edge_geometry(x_ref, onehot_d, rows, offsets_ref, coeff, K, dtype)

    # r_feat = outer(edge_type_onehot, rbf): type-major blocks of R
    r_feat = jnp.concatenate([rbf * et4[:, i : i + 1] for i in range(4)], axis=1)

    p = p_refs
    hi_k = jnp.dot(h_tile.astype(dtype), p.hk_w1i[:].astype(dtype),
                   preferred_element_type=jnp.float32)
    k = _edge_mlp(et4, r_feat, hi_k, hj, p.hk_w1e[:], p.hk_w1r[:], p.hk_w1j[:],
                  p.hk_b1[:], p.hk_lns[:], p.hk_lnb[:], p.hk_w2[:], p.hk_b2[:], K, dtype)
    hi_v = jnp.dot(h_tile.astype(dtype), p.hv_w1i[:].astype(dtype),
                   preferred_element_type=jnp.float32)
    v = _edge_mlp(et4, r_feat, hi_v, hj, p.hv_w1e[:], p.hv_w1r[:], p.hv_w1j[:],
                  p.hv_b1[:], p.hv_lns[:], p.hv_lnb[:], p.hv_w2[:], p.hv_b2[:], K, dtype)
    v = v * ew

    q = _node_mlp(h_tile, p.hq_w1[:], p.hq_b1[:], p.hq_lns[:], p.hq_lnb[:],
                  p.hq_w2[:], p.hq_b2[:], dtype)

    S, St = _head_matrices(H, n_heads, jnp.float32)
    alpha = _attention_alpha(k.astype(dtype), q.astype(dtype), nm, n_heads, dh, K, S, St, TN)
    alpha128 = jnp.dot(alpha, St, preferred_element_type=jnp.float32)  # [TNK, H]
    m = alpha128 * v
    out = m.reshape(TN, K, H).sum(axis=1)  # [TN, H]
    hout_ref[...] = (out + h_tile.astype(jnp.float32)).astype(hout_ref.dtype)


def _h2x_kernel(
    h_ref, x_ref, idx_ref, nmask_ref, etype_ref, ew_ref, mlig_ref, offsets_ref, p_refs,
    xout_ref,
    *, N, H, K, n_heads, coeff, dtype, TN, T0=0,
):
    t = pl.program_id(1)
    rows = pl.ds((t + T0) * TN, TN)
    TNK = TN * K
    dh = H // n_heads

    idx_t, et4, nm, ew = _edge_scalars_2d(idx_ref, etype_ref, nmask_ref, ew_ref, TN, K)
    onehot_d = _onehot_from_idx(idx_t, N, TN, K, dtype)

    h_all = h_ref[:]
    hj = jnp.dot(onehot_d, h_all.astype(dtype), preferred_element_type=jnp.float32)
    h_tile = h_ref[rows, :]

    rel, dist, rbf = _edge_geometry(x_ref, onehot_d, rows, offsets_ref, coeff, K, dtype)

    r_feat = jnp.concatenate([rbf * et4[:, i : i + 1] for i in range(4)], axis=1)

    p = p_refs
    hi_k = jnp.dot(h_tile.astype(dtype), p.xk_w1i[:].astype(dtype),
                   preferred_element_type=jnp.float32)
    k = _edge_mlp(et4, r_feat, hi_k, hj, p.xk_w1e[:], p.xk_w1r[:], p.xk_w1j[:],
                  p.xk_b1[:], p.xk_lns[:], p.xk_lnb[:], p.xk_w2[:], p.xk_b2[:], K, dtype)
    hi_v = jnp.dot(h_tile.astype(dtype), p.xv_w1i[:].astype(dtype),
                   preferred_element_type=jnp.float32)
    v16 = _edge_mlp(et4, r_feat, hi_v, hj, p.xv_w1e[:], p.xv_w1r[:], p.xv_w1j[:],
                    p.xv_b1[:], p.xv_lns[:], p.xv_lnb[:], p.xv_w2[:], p.xv_b2[:], K, dtype)
    v16 = v16 * ew  # [TNK, heads]

    q = _node_mlp(h_tile, p.xq_w1[:], p.xq_b1[:], p.xq_lns[:], p.xq_lnb[:],
                  p.xq_w2[:], p.xq_b2[:], dtype)

    S, St = _head_matrices(H, n_heads, jnp.float32)
    alpha = _attention_alpha(k.astype(dtype), q.astype(dtype), nm, n_heads, dh, K, S, St, TN)

    # scalar gate per edge: mean over heads of alpha * v (head-mean commutes
    # with the edge sum — see models/uni_transformer.py BaseH2XAttLayer)
    s = (alpha * v16).sum(axis=-1, keepdims=True) / n_heads  # [TNK, 1]
    weighted = s * rel  # [TNK, 3]
    delta = weighted.reshape(TN, K, 3).sum(axis=1)  # [TN, 3]
    x_tile = x_ref[rows]
    xout_ref[...] = x_tile + delta * mlig_ref[rows]


def _lift_scalar(v2, TN, K):
    """[TN, K] -> [TNK, 1]. Mosaic rejects a bare 2D->3D expand_dims followed
    by a leading-dim merge, but accepts broadcast-to->=8 lanes + merge + slice
    (empirically verified)."""
    v3 = jnp.broadcast_to(v2[:, :, None], (TN, K, 8))
    return v3.reshape(TN * K, 8)[:, :1]


def _edge_scalars_2d(idx_ref, etype_ref, nmask_ref, ew_ref, TN, K):
    """Read [TN, K] tiles and lift them to edge-major [TNK, .] via
    leading-dim-only merges (layout-free on TPU)."""
    TNK = TN * K
    idx_t = idx_ref[...]  # [TN, K] int32
    et_t = etype_ref[...]
    nm = _lift_scalar(nmask_ref[...], TN, K)
    ew = _lift_scalar(ew_ref[...], TN, K)
    iota4 = jax.lax.broadcasted_iota(jnp.int32, (TN, K, 4), 2)
    et4 = (et_t[:, :, None] == iota4).astype(jnp.float32).reshape(TNK, 4)
    return idx_t, et4, nm, ew


def _onehot_from_idx(idx_t, N, TN, K, dtype):
    """[TN, K] indices -> [TNK, N] one-hot selection matrix, built in 3D then
    flattened over leading dims only."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (TN, K, N), 2)
    return (idx_t[:, :, None] == iota).astype(dtype).reshape(TN * K, N)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "coeff", "dtype", "interpret"),
)
def x2h_attention_layer(
    h, x, idx, nbr_mask, etype, e_w, offsets, params: X2HParams,
    *, n_heads=16, coeff=-0.5, dtype=jnp.bfloat16, interpret=False,
):
    """h [B,N,H] -> h' [B,N,H]. idx/nbr_mask/etype/e_w are [B,N,K]."""
    B, N, H = h.shape
    K = idx.shape[-1]
    TN = _pick_tile(N)
    grid = (B, N // TN)
    TNK = TN * K

    kern = functools.partial(
        _x2h_kernel, N=N, H=H, K=K, n_heads=n_heads, coeff=coeff, dtype=dtype, TN=TN
    )
    params2d = _params_2d(params)
    in_specs = [
        pl.BlockSpec((1, N, H), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, offsets.shape[-1]), lambda b, t: (0, 0)),
    ] + [pl.BlockSpec(p.shape, lambda b, t: (0, 0)) for p in params2d]

    out = pl.pallas_call(
        _regroup(kern, n_regular=7, params_cls=X2HParams, n_out=1),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TN, H), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, H), h.dtype),
        interpret=interpret,
    )(
        h, x, idx, nbr_mask.astype(jnp.float32),
        etype.astype(jnp.int32), e_w.astype(jnp.float32),
        offsets.reshape(1, -1), *params2d,
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "coeff", "dtype", "interpret", "n_ligand"),
)
def h2x_attention_layer(
    h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, params: H2XParams,
    *, n_heads=16, coeff=-0.5, dtype=jnp.bfloat16, interpret=False,
    n_ligand=None,
):
    """Returns updated coordinates x' [B,N,3] (ligand rows only move).

    With `n_ligand` (the composed layout's ligand tail size), the grid runs
    ONLY the destination tiles containing ligand rows — protein rows never
    move, so their h2x edge computations are dead work (reference
    models/uni_transformer.py:206 masks the same result)."""
    B, N, H = h.shape
    K = idx.shape[-1]
    TN = _pick_tile(N)
    T = N // TN
    t0 = 0 if n_ligand is None else (N - n_ligand) // TN
    grid = (B, T - t0)
    TNK = TN * K

    kern = functools.partial(
        _h2x_kernel, N=N, H=H, K=K, n_heads=n_heads, coeff=coeff, dtype=dtype,
        TN=TN, T0=t0,
    )
    params2d = _params_2d(params)
    in_specs = [
        pl.BlockSpec((1, N, H), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, N, 1), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, offsets.shape[-1]), lambda b, t: (0, 0)),
    ] + [pl.BlockSpec(p.shape, lambda b, t: (0, 0)) for p in params2d]

    out = pl.pallas_call(
        _regroup(kern, n_regular=8, params_cls=H2XParams, n_out=1),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TN, 3), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, (T - t0) * TN, 3), x.dtype),
        interpret=interpret,
    )(
        h, x, idx, nbr_mask.astype(jnp.float32),
        etype.astype(jnp.int32), e_w.astype(jnp.float32),
        mask_ligand.astype(jnp.float32)[..., None], offsets.reshape(1, -1), *params2d,
    )
    if t0 == 0:
        return out
    # protein-only leading tiles were skipped: their coordinates are the input
    return jnp.concatenate([x[:, : t0 * TN], out], axis=1)


def _params_2d(params):
    """Reshape 1-D parameter vectors to [1, D] (TPU blocks must be >= 2D)."""
    return type(params)(*[p.reshape(1, -1) if p.ndim == 1 else p for p in params])


def _regroup(kern, n_regular, params_cls, n_out):
    """Adapt flat pallas refs: squeeze leading singleton block dims, regroup
    the trailing parameter refs into their NamedTuple."""
    n_params = len(params_cls._fields)

    def wrapped(*refs):
        regular = [_View2D(r) for r in refs[: n_regular]]
        params = params_cls(*refs[n_regular : n_regular + n_params])
        outs = [_View2D(r) for r in refs[n_regular + n_params :]]
        kern(*regular, params, *outs)

    return wrapped


class _View2D:
    """Minimal ref adapter dropping a leading singleton block dimension."""

    def __init__(self, ref):
        self.ref = ref
        self._lead = len(ref.shape) >= 3 and ref.shape[0] == 1

    def __getitem__(self, key):
        if not self._lead:
            return self.ref[key]
        if key is Ellipsis:
            return self.ref[0]
        if isinstance(key, tuple):
            return self.ref[(0,) + key]
        return self.ref[0, key]

    def __setitem__(self, key, value):
        if not self._lead:
            self.ref[key] = value
            return
        if key is Ellipsis:
            self.ref[0] = value
            return
        if isinstance(key, tuple):
            self.ref[(0,) + key] = value
        else:
            self.ref[0, key] = value

    @property
    def shape(self):
        return self.ref.shape[1:] if self._lead else self.ref.shape

    @property
    def dtype(self):
        return self.ref.dtype

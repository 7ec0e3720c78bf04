"""Hand-written Pallas backward kernels for the fused attention layers.

Makes TRAINING run on the fused kernels (VERDICT round-1 item 3): each
BaseX2HAttLayer / BaseH2XAttLayer forward is the existing Pallas kernel
(ops/pallas/edge_layer.py), and its backward is a single Pallas kernel that
recomputes the edge intermediates in VMEM (cheaper than storing [B, N*K, H]
residuals to HBM) and emits

  * data gradients d_h [B,N,H], d_x [B,N,3], d_ew [B,N,K] — the neighbor
    scatters (the transpose of the one-hot gather) run as sublane-contracting
    MXU matmuls accumulated across center tiles;
  * parameter gradients, accumulated IN-KERNEL across the whole (B, tiles)
    grid into revisited output blocks (TPU grids are sequential, so
    init-on-first-visit + "+=" is exact).

The math is the exact VJP of the layer forward (reference layer semantics:
models/uni_transformer.py:11-140): residual add, masked per-head softmax,
edge-MLP with split first Linear, LayerNorm (eps 1e-5), relu, the
e_w gating, and the rbf/distance geometry chain (gradients DO flow into
coordinates through the Gaussian smearing).

Gradient parity vs `jax.grad` of the XLA path is tested in
tests/test_edge_layer_vjp.py (f32, interpret mode -> tight tolerances).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .edge_layer import (
    H2XParams,
    X2HParams,
    _edge_scalars_2d,
    _head_matrices,
    _onehot_from_idx,
    _params_2d,
    _pick_tile,
    h2x_attention_layer,
    x2h_attention_layer,
)

NEG = -1e9
EPS = 1e-5


def _cdot(a, b, cd):
    """a @ b with operands cast to the compute dtype `cd`, f32 accumulation.
    cd=float32 reproduces the exact round-2 f32 kernels; cd=bfloat16 is the
    bf16 training variant (VERDICT r2 #3): every heavy dot runs bf16 on the
    MXU while LN statistics, softmax, residuals and ALL gradient
    accumulation stay f32."""
    return jnp.dot(a.astype(cd), b.astype(cd),
                   preferred_element_type=jnp.float32)


def _cdotg(a, b, cd):
    """dot_general contracting dim 0 of both (param grads / scatters),
    operands cast to `cd`, f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(cd), b.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# shared forward-recompute + backward pieces (per tile)
# ---------------------------------------------------------------------------


def _ln_fwd(z, lns, lnb):
    """Returns (n, invs, u) with n=(z-mean)/std, u = lns*n + lnb."""
    mean = z.mean(-1, keepdims=True)
    var = ((z - mean) ** 2).mean(-1, keepdims=True)
    invs = jax.lax.rsqrt(var + EPS)
    n = (z - mean) * invs
    return n, invs, lns * n + lnb


def _colsum(x):
    """Column sums as an MXU matmul -> [1, C]. A plain .sum(0) produces a
    sublane-replicated vector layout that Mosaic cannot relayout into the
    accumulation outputs (observed compile failure); the matmul result has a
    standard layout."""
    rows = x.shape[0]
    ones = jnp.ones((rows, 8), jnp.float32)
    return jax.lax.dot_general(
        ones, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[0:1, :]


def _ln_bwd(du, n, invs, lns):
    """d z given d u for u = lns*n + lnb; also returns (d lns, d lnb)."""
    dn = du * lns
    dlns = _colsum(du * n)
    dlnb = _colsum(du)
    m1 = dn.mean(-1, keepdims=True)
    m2 = (dn * n).mean(-1, keepdims=True)
    dz = invs * (dn - m1 - n * m2)
    return dz, dlns, dlnb


def _edge_mlp_fwd(et4, r_feat, hi_term_rep, hj, w1e, w1r, w1j, b1, lns, lnb, w2, b2,
                  cd=jnp.float32):
    """Recompute of the split-input edge MLP (dots in `cd`, f32 residuals).
    Returns output plus the residues needed for its backward."""
    z = (
        _cdot(et4, w1e, cd)
        + _cdot(r_feat, w1r, cd)
        + _cdot(hj, w1j, cd)
        + hi_term_rep
        + b1
    )
    n, invs, u = _ln_fwd(z, lns, lnb)
    a = jnp.maximum(u, 0.0)
    out = _cdot(a, w2, cd) + b2
    return out, (z, n, invs, u, a)


def _edge_mlp_bwd(dout, res, et4, r_feat, hj, w1e, w1r, w1j, lns, w2,
                  cd=jnp.float32):
    """Backward of _edge_mlp_fwd. Returns d(r_feat), d(hj), d(hi_term_rep)
    and the parameter gradients (dots in `cd`, f32 accumulation)."""
    z, n, invs, u, a = res
    da = _cdot(dout, w2.T, cd)
    dw2 = _cdotg(a, dout, cd)
    db2 = _colsum(dout)
    du = jnp.where(u > 0, da, 0.0)
    dz, dlns, dlnb = _ln_bwd(du, n, invs, lns)
    dr_feat = _cdot(dz, w1r.T, cd)
    dhj = _cdot(dz, w1j.T, cd)
    dhi_rep = dz  # (hi_term enters additively; caller reduces over K)
    dw1e = _cdotg(et4, dz, cd)
    dw1r = _cdotg(r_feat, dz, cd)
    dw1j = _cdotg(hj, dz, cd)
    db1 = _colsum(dz)
    return dr_feat, dhj, dhi_rep, (dw1e, dw1r, dw1j, db1, dlns, dlnb, dw2, db2)


def _node_mlp_fwd(h_tile, w1, b1, lns, lnb, w2, b2, cd=jnp.float32):
    z = _cdot(h_tile, w1, cd) + b1
    n, invs, u = _ln_fwd(z, lns, lnb)
    a = jnp.maximum(u, 0.0)
    out = _cdot(a, w2, cd) + b2
    return out, (z, n, invs, u, a)


def _node_mlp_bwd(dout, res, h_tile, w1, lns, w2, cd=jnp.float32):
    z, n, invs, u, a = res
    da = _cdot(dout, w2.T, cd)
    dw2 = _cdotg(a, dout, cd)
    db2 = _colsum(dout)
    du = jnp.where(u > 0, da, 0.0)
    dz, dlns, dlnb = _ln_bwd(du, n, invs, lns)
    dh_tile = _cdot(dz, w1.T, cd)
    dw1 = _cdotg(h_tile, dz, cd)
    db1 = _colsum(dz)
    return dh_tile, (dw1, db1, dlns, dlnb, dw2, db2)


def _geometry_fwd(x_ref, onehot, rows, offsets, coeff, K, cd=jnp.float32):
    x_all = x_ref[:]
    if cd == jnp.float32:
        xj = jnp.dot(onehot, x_all, preferred_element_type=jnp.float32)
    else:
        # positions need more than bf16 mantissa: gather hi|lo split halves
        # through the bf16 one-hot (exact; same trick as the megakernel)
        N = x_all.shape[0]
        x_hi = x_all.astype(cd)
        x_lo = (x_all - x_hi.astype(jnp.float32)).astype(cd)
        zpad = jnp.zeros((N, 5), cd)
        xhl = jnp.concatenate([x_hi, zpad, x_lo, zpad], axis=1)  # [N, 16]
        xj2 = jnp.dot(onehot, xhl, preferred_element_type=jnp.float32)
        xj = xj2[:, 0:3] + xj2[:, 8:11]
    x_tile = x_ref[rows]
    TN = x_tile.shape[0]
    xi = jnp.broadcast_to(x_tile[:, None, :], (TN, K, 3)).reshape(TN * K, 3)
    rel = xi - xj
    dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)
    d = dist - offsets
    rbf = jnp.exp(coeff * d * d)
    return rel, dist, d, rbf


def _softmax_fwd(k, q_rep, nm, n_heads, dh, TN, K, S):
    prod = k * q_rep
    logits = jnp.dot(prod, S, preferred_element_type=jnp.float32) / math.sqrt(dh)
    logits = jnp.where(nm > 0, logits, NEG)
    lg = logits.reshape(TN, K, n_heads)
    mx = lg.max(axis=1, keepdims=True)
    e = jnp.exp(lg - mx) * nm.reshape(TN, K, 1)
    den = e.sum(axis=1, keepdims=True)
    alpha = (e / jnp.maximum(den, 1e-16)).reshape(TN * K, n_heads)
    return alpha


def _softmax_bwd(dalpha, alpha, TN, K, n_heads):
    a3 = alpha.reshape(TN, K, n_heads)
    da3 = dalpha.reshape(TN, K, n_heads)
    inner = (a3 * da3).sum(axis=1, keepdims=True)
    return (a3 * (da3 - inner)).reshape(TN * K, n_heads)


def _rep_rows(v, TN, K):
    """[TN, C] -> [TN*K, C] row repetition."""
    C = v.shape[-1]
    return jnp.broadcast_to(v[:, None, :], (TN, K, C)).reshape(TN * K, C)


def _sum_rows(v, TN, K):
    """[TN*K, C] -> [TN, C] sum over each center's K edges."""
    C = v.shape[-1]
    return v.reshape(TN, K, C).sum(axis=1)


def _scatter_nbr(onehot, contrib, cd=jnp.float32):
    """Transpose of the one-hot gather: [TNK, N]^T @ [TNK, C] -> [N, C]."""
    return _cdotg(onehot, contrib, cd)


# ---------------------------------------------------------------------------
# x2h backward kernel
# ---------------------------------------------------------------------------


def _x2h_bwd_kernel(
    h_ref, x_ref, idx_ref, nmask_ref, etype_ref, ew_ref, offsets_ref, g_ref,
    p: X2HParams,
    dh_ref, dx_ref, dew_ref, *dp_refs,
    N, H, K, n_heads, coeff, TN, cd=jnp.float32,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    dh = H // n_heads
    rows = pl.ds(t * TN, TN)
    TNK = TN * K

    @pl.when(t == 0)
    def _():
        dh_ref[...] = jnp.zeros((N, H), jnp.float32)
        dx_ref[...] = jnp.zeros((N, 3), jnp.float32)

    @pl.when((b == 0) & (t == 0))
    def _():
        for r in dp_refs:
            r[...] = jnp.zeros(r.shape, jnp.float32)

    idx_t, et4, nm, ew = _edge_scalars_2d(idx_ref, etype_ref, nmask_ref, ew_ref, TN, K)
    onehot = _onehot_from_idx(idx_t, N, TN, K, cd)

    h_all = h_ref[:].astype(jnp.float32)
    hj = _cdot(onehot, h_all, cd)
    h_tile = h_ref[rows, :].astype(jnp.float32)
    offsets = offsets_ref[:]

    rel, dist, d_off, rbf = _geometry_fwd(x_ref, onehot, rows, offsets, coeff, K,
                                          cd=cd)
    r_feat = jnp.concatenate([rbf * et4[:, i : i + 1] for i in range(4)], axis=1)

    # ---- forward recompute (dots in cd, residuals f32) ----
    hi_k = _cdot(h_tile, p.hk_w1i[:], cd)
    k, res_k = _edge_mlp_fwd(et4, r_feat, _rep_rows(hi_k, TN, K), hj,
                             p.hk_w1e[:], p.hk_w1r[:], p.hk_w1j[:], p.hk_b1[:],
                             p.hk_lns[:], p.hk_lnb[:], p.hk_w2[:], p.hk_b2[:],
                             cd=cd)
    hi_v = _cdot(h_tile, p.hv_w1i[:], cd)
    v_pre, res_v = _edge_mlp_fwd(et4, r_feat, _rep_rows(hi_v, TN, K), hj,
                                 p.hv_w1e[:], p.hv_w1r[:], p.hv_w1j[:], p.hv_b1[:],
                                 p.hv_lns[:], p.hv_lnb[:], p.hv_w2[:], p.hv_b2[:],
                                 cd=cd)
    v = v_pre * ew
    q, res_q = _node_mlp_fwd(h_tile, p.hq_w1[:], p.hq_b1[:], p.hq_lns[:],
                             p.hq_lnb[:], p.hq_w2[:], p.hq_b2[:], cd=cd)
    S, St = _head_matrices(H, n_heads, jnp.float32)
    q_rep = _rep_rows(q, TN, K)
    alpha = _softmax_fwd(k, q_rep, nm, n_heads, dh, TN, K, S)
    alpha128 = jnp.dot(alpha, St, preferred_element_type=jnp.float32)

    # ---- backward ----
    g = g_ref[...].astype(jnp.float32)  # d h_out [TN, H]
    dm = _rep_rows(g, TN, K)  # [TNK, H]
    dalpha128 = dm * v
    dv = dm * alpha128
    dalpha = jnp.dot(dalpha128, S, preferred_element_type=jnp.float32)
    dlogits = _softmax_bwd(dalpha, alpha, TN, K, n_heads) / math.sqrt(dh)
    dl128 = jnp.dot(dlogits, St, preferred_element_type=jnp.float32)
    dk = dl128 * q_rep
    dq = _sum_rows(dl128 * k, TN, K)

    dv_pre = dv * ew
    dew2d = (dv * v_pre).sum(-1, keepdims=True)  # [TNK, 1]
    dew_ref[...] = dew2d.reshape(TN, K)

    dr_k, dhj_k, dhi_rep_k, pg_k = _edge_mlp_bwd(
        dk, res_k, et4, r_feat, hj, p.hk_w1e[:], p.hk_w1r[:], p.hk_w1j[:],
        p.hk_lns[:], p.hk_w2[:], cd=cd
    )
    dr_v, dhj_v, dhi_rep_v, pg_v = _edge_mlp_bwd(
        dv_pre, res_v, et4, r_feat, hj, p.hv_w1e[:], p.hv_w1r[:], p.hv_w1j[:],
        p.hv_lns[:], p.hv_w2[:], cd=cd
    )
    dh_q, pg_q = _node_mlp_bwd(dq, res_q, h_tile, p.hq_w1[:], p.hq_lns[:],
                               p.hq_w2[:], cd=cd)

    dr_feat = dr_k + dr_v
    dhj = dhj_k + dhj_v
    dhi_k = _sum_rows(dhi_rep_k, TN, K)
    dhi_v = _sum_rows(dhi_rep_v, TN, K)

    # geometry chain: r_feat = rbf * et4 blocks; d rbf = sum_t et4_t * block_t
    R = rbf.shape[-1]
    drbf = sum(dr_feat[:, i * R : (i + 1) * R] * et4[:, i : i + 1] for i in range(4))
    ddist = (drbf * (2.0 * coeff) * d_off * rbf).sum(-1, keepdims=True)
    drel = ddist * rel / jnp.maximum(dist, 1e-16)
    dxi = _sum_rows(drel, TN, K)
    dxj = -drel

    # ---- accumulate data grads ----
    dh_tile_total = (
        g  # residual path
        + dh_q
        + _cdot(dhi_k, p.hk_w1i[:].T, cd)
        + _cdot(dhi_v, p.hv_w1i[:].T, cd)
    )
    dh_ref[rows, :] = dh_ref[rows, :] + dh_tile_total
    dh_ref[...] = dh_ref[...] + _scatter_nbr(onehot, dhj, cd)
    dx_ref[rows, :] = dx_ref[rows, :] + dxi
    dx_ref[...] = dx_ref[...] + _scatter_nbr(onehot, dxj, cd)

    # ---- accumulate parameter grads (order must match X2HGrads below) ----
    # NamedTuple field order: w1e, w1r, w1i, w1j, b1, lns, lnb, w2, b2
    hi_grads_k = _cdotg(h_tile, dhi_k, cd)
    pieces = [pg_k[0], pg_k[1], hi_grads_k, pg_k[2]] + list(pg_k[3:])
    hi_grads_v = _cdotg(h_tile, dhi_v, cd)
    pieces += [pg_v[0], pg_v[1], hi_grads_v, pg_v[2]] + list(pg_v[3:])
    pieces += list(pg_q)
    for r, val in zip(dp_refs, pieces):
        r[...] = r[...] + val


# ---------------------------------------------------------------------------
# h2x backward kernel
# ---------------------------------------------------------------------------


def _h2x_bwd_kernel(
    h_ref, x_ref, idx_ref, nmask_ref, etype_ref, ew_ref, mlig_ref, offsets_ref,
    g_ref, p: H2XParams,
    dh_ref, dx_ref, dew_ref, *dp_refs,
    N, H, K, n_heads, coeff, TN, T0=0, cd=jnp.float32,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    dh = H // n_heads
    rows = pl.ds((t + T0) * TN, TN)

    @pl.when(t == 0)
    def _():
        dh_ref[...] = jnp.zeros((N, H), jnp.float32)
        dx_ref[...] = jnp.zeros((N, 3), jnp.float32)

    @pl.when((b == 0) & (t == 0))
    def _():
        for r in dp_refs:
            r[...] = jnp.zeros(r.shape, jnp.float32)

    idx_t, et4, nm, ew = _edge_scalars_2d(idx_ref, etype_ref, nmask_ref, ew_ref, TN, K)
    onehot = _onehot_from_idx(idx_t, N, TN, K, cd)

    h_all = h_ref[:].astype(jnp.float32)
    hj = _cdot(onehot, h_all, cd)
    h_tile = h_ref[rows, :].astype(jnp.float32)
    offsets = offsets_ref[:]

    rel, dist, d_off, rbf = _geometry_fwd(x_ref, onehot, rows, offsets, coeff, K,
                                          cd=cd)
    r_feat = jnp.concatenate([rbf * et4[:, i : i + 1] for i in range(4)], axis=1)

    hi_k = _cdot(h_tile, p.xk_w1i[:], cd)
    k, res_k = _edge_mlp_fwd(et4, r_feat, _rep_rows(hi_k, TN, K), hj,
                             p.xk_w1e[:], p.xk_w1r[:], p.xk_w1j[:], p.xk_b1[:],
                             p.xk_lns[:], p.xk_lnb[:], p.xk_w2[:], p.xk_b2[:],
                             cd=cd)
    hi_v = _cdot(h_tile, p.xv_w1i[:], cd)
    v_pre, res_v = _edge_mlp_fwd(et4, r_feat, _rep_rows(hi_v, TN, K), hj,
                                 p.xv_w1e[:], p.xv_w1r[:], p.xv_w1j[:], p.xv_b1[:],
                                 p.xv_lns[:], p.xv_lnb[:], p.xv_w2[:], p.xv_b2[:],
                                 cd=cd)
    v16 = v_pre * ew  # [TNK, heads]
    q, res_q = _node_mlp_fwd(h_tile, p.xq_w1[:], p.xq_b1[:], p.xq_lns[:],
                             p.xq_lnb[:], p.xq_w2[:], p.xq_b2[:], cd=cd)
    S, St = _head_matrices(H, n_heads, jnp.float32)
    q_rep = _rep_rows(q, TN, K)
    alpha = _softmax_fwd(k, q_rep, nm, n_heads, dh, TN, K, S)
    s = (alpha * v16).sum(-1, keepdims=True) / n_heads  # [TNK, 1]

    # ---- backward: g = d x_out [TN, 3] ----
    g = g_ref[...].astype(jnp.float32)
    mlig = mlig_ref[...]  # [TN, 1] — the block IS the tile (spec (1, TN, 1))
    # x_out = x + mlig * sum_K (s * rel)
    dx_direct = g  # identity path for all rows
    gd = g * mlig  # delta path only where ligand
    dweighted = _rep_rows(gd, TN, K)  # [TNK, 3]
    ds = (dweighted * rel).sum(-1, keepdims=True)
    drel_from_delta = dweighted * s

    dalpha = ds * v16 / n_heads
    dv16 = ds * alpha / n_heads
    dlogits = _softmax_bwd(dalpha, alpha, TN, K, n_heads) / math.sqrt(dh)
    dl128 = jnp.dot(dlogits, St, preferred_element_type=jnp.float32)
    dk = dl128 * q_rep
    dq = _sum_rows(dl128 * k, TN, K)

    dv_pre = dv16 * ew
    dew2d = (dv16 * v_pre).sum(-1, keepdims=True)
    dew_ref[...] = dew2d.reshape(TN, K)

    dr_k, dhj_k, dhi_rep_k, pg_k = _edge_mlp_bwd(
        dk, res_k, et4, r_feat, hj, p.xk_w1e[:], p.xk_w1r[:], p.xk_w1j[:],
        p.xk_lns[:], p.xk_w2[:], cd=cd
    )
    dr_v, dhj_v, dhi_rep_v, pg_v = _edge_mlp_bwd(
        dv_pre, res_v, et4, r_feat, hj, p.xv_w1e[:], p.xv_w1r[:], p.xv_w1j[:],
        p.xv_lns[:], p.xv_w2[:], cd=cd
    )
    dh_q, pg_q = _node_mlp_bwd(dq, res_q, h_tile, p.xq_w1[:], p.xq_lns[:],
                               p.xq_w2[:], cd=cd)

    dr_feat = dr_k + dr_v
    dhj = dhj_k + dhj_v
    dhi_k = _sum_rows(dhi_rep_k, TN, K)
    dhi_v = _sum_rows(dhi_rep_v, TN, K)

    R = rbf.shape[-1]
    drbf = sum(dr_feat[:, i * R : (i + 1) * R] * et4[:, i : i + 1] for i in range(4))
    ddist = (drbf * (2.0 * coeff) * d_off * rbf).sum(-1, keepdims=True)
    drel = ddist * rel / jnp.maximum(dist, 1e-16) + drel_from_delta
    dxi = _sum_rows(drel, TN, K)
    dxj = -drel

    dh_tile_total = (
        dh_q
        + _cdot(dhi_k, p.xk_w1i[:].T, cd)
        + _cdot(dhi_v, p.xv_w1i[:].T, cd)
    )
    dh_ref[rows, :] = dh_ref[rows, :] + dh_tile_total
    dh_ref[...] = dh_ref[...] + _scatter_nbr(onehot, dhj, cd)
    dx_ref[rows, :] = dx_ref[rows, :] + dx_direct + dxi
    dx_ref[...] = dx_ref[...] + _scatter_nbr(onehot, dxj, cd)

    # NamedTuple field order: w1e, w1r, w1i, w1j, b1, lns, lnb, w2, b2
    hi_grads_k = _cdotg(h_tile, dhi_k, cd)
    pieces = [pg_k[0], pg_k[1], hi_grads_k, pg_k[2]] + list(pg_k[3:])
    hi_grads_v = _cdotg(h_tile, dhi_v, cd)
    pieces += [pg_v[0], pg_v[1], hi_grads_v, pg_v[2]] + list(pg_v[3:])
    pieces += list(pg_q)
    for r, val in zip(dp_refs, pieces):
        r[...] = r[...] + val


# ---------------------------------------------------------------------------
# pallas_call wrappers for the backward kernels
# ---------------------------------------------------------------------------


def _param_grad_shapes(params):
    """One f32 output per parameter tensor, 2D-ified like _params_2d."""
    return [jax.ShapeDtypeStruct(
        (1, p.shape[-1]) if p.ndim == 1 else p.shape, jnp.float32
    ) for p in params]


def _x2h_bwd(h, x, idx, nbr_mask, etype, e_w, offsets, params, g,
             *, n_heads, coeff, interpret, cd=jnp.float32):
    B, N, H = h.shape
    K = idx.shape[-1]
    TN = _pick_tile(N)
    grid = (B, N // TN)
    params2d = _params_2d(params)

    kern = functools.partial(
        _x2h_bwd_kernel, N=N, H=H, K=K, n_heads=n_heads, coeff=coeff, TN=TN,
        cd=cd,
    )
    n_regular = 8

    def wrapped(*refs):
        regular = [_Squeeze(r) for r in refs[:n_regular]]
        p = X2HParams(*refs[n_regular : n_regular + len(params2d)])
        outs = refs[n_regular + len(params2d) :]
        d_outs = [_Squeeze(r) for r in outs[:3]]
        kern(*regular, p, *d_outs, *outs[3:])

    in_specs = [
        pl.BlockSpec((1, N, H), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, offsets.shape[-1]), lambda b, t: (0, 0)),
        pl.BlockSpec((1, TN, H), lambda b, t: (b, t, 0)),
    ] + [pl.BlockSpec(p.shape, lambda b, t: (0, 0)) for p in params2d]

    out_specs = [
        pl.BlockSpec((1, N, H), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
    ] + [
        pl.BlockSpec(s.shape, lambda b, t: (0,) * len(s.shape))
        for s in _param_grad_shapes(params)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N, H), jnp.float32),
        jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, N, K), jnp.float32),
    ] + _param_grad_shapes(params)

    outs = pl.pallas_call(
        wrapped, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(
        h, x, idx, nbr_mask.astype(jnp.float32), etype.astype(jnp.int32),
        e_w.astype(jnp.float32), offsets.reshape(1, -1), g, *params2d,
    )
    dh_, dx_, dew_ = outs[0], outs[1], outs[2]
    dparams = X2HParams(*[
        dp.reshape(p.shape) for dp, p in zip(outs[3:], params)
    ])
    return dh_, dx_, dew_, dparams


def _h2x_bwd(h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, params, g,
             *, n_heads, coeff, interpret, n_ligand=None, cd=jnp.float32):
    B, N, H = h.shape
    K = idx.shape[-1]
    TN = _pick_tile(N)
    T = N // TN
    # ligand-tail restriction: only destination tiles containing ligand rows
    # have a delta path; protein rows contribute only the identity d x = g,
    # added outside the kernel
    t0 = 0 if n_ligand is None else (N - n_ligand) // TN
    grid = (B, T - t0)
    params2d = _params_2d(params)

    kern = functools.partial(
        _h2x_bwd_kernel, N=N, H=H, K=K, n_heads=n_heads, coeff=coeff, TN=TN,
        T0=t0, cd=cd,
    )
    n_regular = 9

    def wrapped(*refs):
        regular = [_Squeeze(r) for r in refs[:n_regular]]
        p = H2XParams(*refs[n_regular : n_regular + len(params2d)])
        outs = refs[n_regular + len(params2d) :]
        d_outs = [_Squeeze(r) for r in outs[:3]]
        kern(*regular, p, *d_outs, *outs[3:])

    in_specs = [
        pl.BlockSpec((1, N, H), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, TN, 1), lambda b, t: (b, t + t0, 0)),
        pl.BlockSpec((1, offsets.shape[-1]), lambda b, t: (0, 0)),
        pl.BlockSpec((1, TN, 3), lambda b, t: (b, t + t0, 0)),
    ] + [pl.BlockSpec(p.shape, lambda b, t: (0, 0)) for p in params2d]

    out_specs = [
        pl.BlockSpec((1, N, H), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, TN, K), lambda b, t: (b, t, 0)),
    ] + [
        pl.BlockSpec(s.shape, lambda b, t: (0,) * len(s.shape))
        for s in _param_grad_shapes(params)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N, H), jnp.float32),
        jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, (T - t0) * TN, K), jnp.float32),
    ] + _param_grad_shapes(params)

    outs = pl.pallas_call(
        wrapped, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(
        h, x, idx, nbr_mask.astype(jnp.float32), etype.astype(jnp.int32),
        e_w.astype(jnp.float32), mask_ligand.astype(jnp.float32)[..., None],
        offsets.reshape(1, -1), g, *params2d,
    )
    dh_, dx_, dew_ = outs[0], outs[1], outs[2]
    if t0:
        # skipped protein tiles: identity path d x = g; d e_w = 0 there
        dx_ = dx_.at[:, : t0 * TN, :].add(g[:, : t0 * TN, :])
        dew_ = jnp.concatenate(
            [jnp.zeros((B, t0 * TN, K), dew_.dtype), dew_], axis=1
        )
    dparams = H2XParams(*[
        dp.reshape(p.shape) for dp, p in zip(outs[3:], params)
    ])
    return dh_, dx_, dew_, dparams


class _Squeeze:
    """Leading singleton block-dim adapter (same as edge_layer._View2D)."""

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


# ---------------------------------------------------------------------------
# custom_vjp layer functions (the trainable fast path)
# ---------------------------------------------------------------------------


def _zero_cot(a):
    if jnp.issubdtype(a.dtype, jnp.floating):
        return jnp.zeros_like(a)
    return np.zeros(a.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def x2h_layer_trainable(h, x, idx, nbr_mask, etype, e_w, offsets, params,
                        n_heads, coeff, interpret, dtype=jnp.float32):
    """BaseX2HAttLayer with Pallas forward AND Pallas backward.

    dtype=float32 (default): exact vs the XLA path, tight gradients.
    dtype=bfloat16: the bf16 training variant — heavy dots in bf16 with f32
    accumulation in BOTH forward and backward (LN stats, softmax, residuals
    and gradient accumulation stay f32; position gathers use an exact hi|lo
    split)."""
    return x2h_attention_layer(
        h, x, idx, nbr_mask, etype, e_w, offsets, params,
        n_heads=n_heads, coeff=coeff, dtype=dtype, interpret=interpret,
    )


def _x2h_fwd_rule(h, x, idx, nbr_mask, etype, e_w, offsets, params,
                  n_heads, coeff, interpret, dtype=jnp.float32):
    out = x2h_attention_layer(
        h, x, idx, nbr_mask, etype, e_w, offsets, params,
        n_heads=n_heads, coeff=coeff, dtype=dtype, interpret=interpret,
    )
    return out, (h, x, idx, nbr_mask, etype, e_w, offsets, params)


def _x2h_bwd_rule(n_heads, coeff, interpret, dtype, res, g):
    h, x, idx, nbr_mask, etype, e_w, offsets, params = res
    dh_, dx_, dew_, dparams = _x2h_bwd(
        h, x, idx, nbr_mask, etype, e_w, offsets, params, g,
        n_heads=n_heads, coeff=coeff, interpret=interpret, cd=dtype,
    )
    return (
        dh_.astype(h.dtype), dx_.astype(x.dtype), _zero_cot(idx),
        _zero_cot(nbr_mask), _zero_cot(etype), dew_.astype(e_w.dtype),
        jnp.zeros_like(offsets),
        type(params)(*[dp.astype(p.dtype) for dp, p in zip(dparams, params)]),
    )


x2h_layer_trainable.defvjp(_x2h_fwd_rule, _x2h_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def h2x_layer_trainable(h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets,
                        params, n_heads, coeff, interpret, n_ligand=None,
                        dtype=jnp.float32):
    """BaseH2XAttLayer with Pallas forward AND Pallas backward.

    `n_ligand` restricts both directions to the ligand-destination tail
    tiles (protein coordinates never move). dtype as x2h_layer_trainable."""
    return h2x_attention_layer(
        h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, params,
        n_heads=n_heads, coeff=coeff, dtype=dtype, interpret=interpret,
        n_ligand=n_ligand,
    )


def _h2x_fwd_rule(h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets,
                  params, n_heads, coeff, interpret, n_ligand=None,
                  dtype=jnp.float32):
    out = h2x_attention_layer(
        h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, params,
        n_heads=n_heads, coeff=coeff, dtype=dtype, interpret=interpret,
        n_ligand=n_ligand,
    )
    return out, (h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, params)


def _h2x_bwd_rule(n_heads, coeff, interpret, n_ligand, dtype, res, g):
    h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, params = res
    dh_, dx_, dew_, dparams = _h2x_bwd(
        h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, params, g,
        n_heads=n_heads, coeff=coeff, interpret=interpret, n_ligand=n_ligand,
        cd=dtype,
    )
    return (
        dh_.astype(h.dtype), dx_.astype(x.dtype), _zero_cot(idx),
        _zero_cot(nbr_mask), _zero_cot(etype), dew_.astype(e_w.dtype),
        _zero_cot(mask_ligand), jnp.zeros_like(offsets),
        type(params)(*[dp.astype(p.dtype) for dp, p in zip(dparams, params)]),
    )


h2x_layer_trainable.defvjp(_h2x_fwd_rule, _h2x_bwd_rule)

"""Whole-block fused BACKWARD for the trainable fast path (VERDICT r3 #4).

The round-2/3 training fast path ran one Pallas backward kernel PER
attention layer (2L kernels per step, each rebuilding the [TNK, N] one-hot
and its geometry per tile from scratch — ops/pallas/edge_layer_vjp.py).
This module walks ALL num_layers layers backward in ONE pallas_call per
batch: the one-hot gather/scatter operand is built once per complex and
reused by every layer/pass/direction, all stacked layer parameters stay
VMEM-resident, and the running (dh, dx) cotangents ping-pong between two
VMEM scratches instead of round-tripping HBM between per-layer kernels.

Forward remains the existing per-layer Pallas kernels (their outputs ARE
the per-layer checkpoints the backward needs); `block_layers_trainable`
wraps the L-layer loop in one custom_vjp whose backward is the fused
kernel. Math is the exact VJP of the layer semantics (reference:
models/uni_transformer.py:11-140), reusing the per-tile fwd-recompute /
bwd helpers from edge_layer_vjp.py; parameter gradients accumulate
in-kernel across the (B,) grid into [L, ...]-stacked outputs (TPU grids
are sequential).

cd=float32 (default): f32 one-hot + f32 dots — tight parity with the XLA
path. cd=bfloat16: the bf16 training variant (heavy dots bf16, f32
accumulation, exact hi|lo position gathers).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .edge_layer import (
    H2XParams,
    X2HParams,
    _head_matrices,
    _lift_scalar,
    _pick_tile,
    h2x_attention_layer,
    x2h_attention_layer,
)
from .edge_layer_vjp import (
    _cdot,
    _cdotg,
    _edge_mlp_bwd,
    _edge_mlp_fwd,
    _node_mlp_bwd,
    _node_mlp_fwd,
    _rep_rows,
    _softmax_bwd,
    _softmax_fwd,
    _sum_rows,
    _zero_cot,
)

N_PFIELDS = len(X2HParams._fields)  # == len(H2XParams._fields) == 24

# Trace-time duel toggle (tools/trainbench.py): False restores the round-4
# all-dirty train forward (no tile flags, tile/rtile 104). Production: True.
TRAIN_TILE_FLAGS = True

# Round-5 backward geometry cache (mirrors the forward's ecache/regeo
# pattern): rel|dist|r_feat|et4|nm|ew live in one [N*K, GW] VMEM scratch,
# prefilled once per complex and refreshed per layer ONLY for regeo-dirty
# tiles (the geometry of a tile whose edges touch no ligand atom is
# bit-identical across layers — only ligand rows move). fwdbwd_probe
# measured the per-layer geometry recompute at 11.0 ms of the 67.6 ms
# backward at B=32. False restores the recompute-everywhere backward
# (tools/trainbench.py spec 'fastnogc').
BWD_GEOM_CACHE = True


def stack_params_2d(layer_params):
    """[per-layer NamedTuple] -> one NamedTuple of [L, a, b] arrays (1D
    fields 2D-ified to [L, 1, H]); f32 for in-kernel use."""
    cls = type(layer_params[0])
    outs = []
    for i in range(len(layer_params[0])):
        leaves = [
            (p[i][None] if p[i].ndim == 1 else p[i]).astype(jnp.float32)
            for p in layer_params
        ]
        outs.append(jnp.stack(leaves))
    return cls(*outs)


def _geom_ck(xck_ref, l, onehot, rows, TN, offsets, coeff, K, cd):
    """Geometry recompute for layer l from the x checkpoint stack."""
    x_all = xck_ref[0, l]  # [N, 3] f32
    if cd == jnp.float32:
        xj = jnp.dot(onehot, x_all, preferred_element_type=jnp.float32)
    else:
        N = x_all.shape[0]
        x_hi = x_all.astype(cd)
        x_lo = (x_all - x_hi.astype(jnp.float32)).astype(cd)
        zpad = jnp.zeros((N, 5), cd)
        xhl = jnp.concatenate([x_hi, zpad, x_lo, zpad], axis=1)
        xj2 = jnp.dot(onehot, xhl, preferred_element_type=jnp.float32)
        xj = xj2[:, 0:3] + xj2[:, 8:11]
    x_tile = xck_ref[0, l, rows, :]
    xi = jnp.broadcast_to(x_tile[:, None, :], (TN, K, 3)).reshape(TN * K, 3)
    rel = xi - xj
    dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)
    d = dist - offsets
    rbf = jnp.exp(coeff * d * d)
    return rel, dist, d, rbf


def _block_bwd_kernel(
    # inputs
    flags_ref, hck_ref, xck_ref, idx_ref, nmask_ref, etype_ref, ew_ref,
    mlig_ref, offsets_ref, gh_ref, gx_ref, px: X2HParams, ph: H2XParams,
    # outputs
    dh0_ref, dx0_ref, dew_ref, dpx_refs, dph_refs,
    # scratch
    ocache, dhbuf, dxbuf, *gc_scratch,
    N, H, K, L, n_heads, coeff, TN, NLIG, cd, gc=False, ablate=(),
):
    b = pl.program_id(0)
    dh = H // n_heads
    T = N // TN
    TNK = TN * K
    NPAD = N - NLIG
    T0 = NPAD // TN  # first tile with ligand-destination rows
    S, St = _head_matrices(H, n_heads, jnp.float32)
    offsets = offsets_ref[:]

    @pl.when(b == 0)
    def _zero_pgrads():
        for r in list(dpx_refs) + list(dph_refs):
            r[...] = jnp.zeros(r.shape, jnp.float32)

    dew_ref[0] = jnp.zeros((N, K), jnp.float32)

    # one-hot gather/scatter operand cached ONCE for the whole block
    # (the per-layer kernels rebuilt it 2*L*T times per complex)
    def cache_tile(t, _):
        erows = pl.ds(t * TNK, TNK)
        idx_t = idx_ref[0, pl.ds(t * TN, TN), :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (TN, K, N), 2)
        ocache[erows, :] = (idx_t[:, :, None] == iota).astype(cd).reshape(TNK, N)
        return 0

    jax.lax.fori_loop(0, T, cache_tile, 0, unroll=False)

    dhbuf[0] = gh_ref[0].astype(jnp.float32)
    dhbuf[1] = jnp.zeros((N, H), jnp.float32)
    dxbuf[0, :, 0:3] = gx_ref[0].astype(jnp.float32)
    dxbuf[0, :, 3:8] = jnp.zeros((N, 5), jnp.float32)

    def edge_scalars(t, T0s):
        rows = pl.ds((t + T0s) * TN, TN)
        et_t = etype_ref[0, rows, :]
        nm = _lift_scalar(nmask_ref[0, rows, :], TN, K)
        ew = _lift_scalar(ew_ref[0, rows, :], TN, K)
        iota4 = jax.lax.broadcasted_iota(jnp.int32, (TN, K, 4), 2)
        et4 = (et_t[:, :, None] == iota4).astype(jnp.float32).reshape(TNK, 4)
        return et4, nm, ew

    # ---- geometry cache (BWD_GEOM_CACHE): lane layout in gcache ----
    R = offsets.shape[-1]
    ET0, NM0, EW0 = 4 + 4 * R, 8 + 4 * R, 9 + 4 * R
    gcache = gc_scratch[0] if gc else None

    def _store_geo(erows, rel, dist, rbf, et4):
        gcache[erows, 0:3] = rel
        gcache[erows, 3:4] = dist
        gcache[erows, 4 : 4 + 4 * R] = jnp.concatenate(
            [rbf * et4[:, i : i + 1] for i in range(4)], axis=1
        )

    def _load_geo(erows):
        """(et4, nm, ew, rel, dist, d_off, rbf, r_feat) from gcache.
        rbf = sum of the 4 one-hot-partitioned r_feat blocks (exact:
        et4 rows are one-hot so exactly one block is rbf, the rest 0);
        d_off = dist - offsets, the same expression _geom_ck uses."""
        et4 = gcache[erows, ET0 : ET0 + 4]
        nm = gcache[erows, NM0 : NM0 + 1]
        ew = gcache[erows, EW0 : EW0 + 1]
        rel = gcache[erows, 0:3]
        dist = gcache[erows, 3:4]
        r_feat = gcache[erows, 4 : 4 + 4 * R]
        rbf = (
            r_feat[:, 0:R] + r_feat[:, R : 2 * R]
            + r_feat[:, 2 * R : 3 * R] + r_feat[:, 3 * R : 4 * R]
        )
        d_off = dist - offsets
        return et4, nm, ew, rel, dist, d_off, rbf, r_feat

    if gc:
        # prefill ONCE per complex: per-edge scalars (layer-invariant) and
        # layer-0 geometry (exact for every layer of regeo-CLEAN tiles;
        # dirty tiles are refreshed per layer below before any read)
        def geo_prefill(t, _):
            erows = pl.ds(t * TNK, TNK)
            et4, nm, ew = edge_scalars(t, 0)
            gcache[erows, ET0 : ET0 + 4] = et4
            gcache[erows, NM0 : NM0 + 1] = nm
            gcache[erows, EW0 : EW0 + 1] = ew
            rel, dist, _d, rbf = _geom_ck(
                xck_ref, 0, ocache[erows, :], pl.ds(t * TN, TN), TN,
                offsets, coeff, K, cd,
            )
            _store_geo(erows, rel, dist, rbf, et4)
            return 0

        jax.lax.fori_loop(0, T, geo_prefill, 0, unroll=False)

    def layer_body(l2, _):
        l = L - 1 - l2
        src = jax.lax.rem(l2, 2)
        dst = jax.lax.rem(l2 + 1, 2)
        # d x_in starts as the identity path (x_out = x_in for every row;
        # the ligand delta path adds below); d h_mid accumulates IN PLACE
        # into dhbuf[src] (h2x consumed h_mid too), which x2h then consumes
        dhbuf[dst] = jnp.zeros((N, H), jnp.float32)
        dxbuf[dst] = dxbuf[src]

        if gc and "geom" not in ablate:
            # refresh layer-l geometry for regeo-DIRTY live tiles only; both
            # backward directions below read gcache (the ligand tail was
            # previously recomputed TWICE per layer, once per direction).
            # Liveness is monotone as l decreases, so a tile is fresh at
            # every layer that reads it.
            def refresh_tile(t, _):
                live = flags_ref[0, 0, l * T + t] != 0
                dirty = flags_ref[0, 0, L * T + t] != 0

                def _refresh():
                    erows = pl.ds(t * TNK, TNK)
                    rel, dist, _d, rbf = _geom_ck(
                        xck_ref, l, ocache[erows, :], pl.ds(t * TN, TN),
                        TN, offsets, coeff, K, cd,
                    )
                    _store_geo(erows, rel, dist, rbf,
                               gcache[erows, ET0 : ET0 + 4])

                pl.when(jnp.logical_and(live, dirty))(_refresh)
                return 0

            jax.lax.fori_loop(0, T, refresh_tile, 0, unroll=False)

        # ---- h2x backward: ligand-destination tail tiles only ----
        def h2x_tile(t, _):
            rows = pl.ds((t + T0) * TN, TN)
            erows = pl.ds((t + T0) * TNK, TNK)
            onehot = ocache[erows, :]
            h_all = hck_ref[0, l + 1].astype(jnp.float32)
            hj = _cdot(onehot, h_all, cd)
            h_tile = hck_ref[0, l + 1, rows, :].astype(jnp.float32)
            if gc:
                et4, nm, ew, rel, dist, d_off, rbf, r_feat = _load_geo(erows)
            else:
                et4, nm, ew = edge_scalars(t, T0)
                rel, dist, d_off, rbf = _geom_ck(
                    xck_ref, l, onehot, rows, TN, offsets, coeff, K, cd
                )
                r_feat = jnp.concatenate(
                    [rbf * et4[:, i : i + 1] for i in range(4)], axis=1
                )
            p = ph
            hi_k = _cdot(h_tile, p.xk_w1i[l], cd)
            k, res_k = _edge_mlp_fwd(
                et4, r_feat, _rep_rows(hi_k, TN, K), hj,
                p.xk_w1e[l], p.xk_w1r[l], p.xk_w1j[l], p.xk_b1[l],
                p.xk_lns[l], p.xk_lnb[l], p.xk_w2[l], p.xk_b2[l], cd=cd,
            )
            hi_v = _cdot(h_tile, p.xv_w1i[l], cd)
            v_pre, res_v = _edge_mlp_fwd(
                et4, r_feat, _rep_rows(hi_v, TN, K), hj,
                p.xv_w1e[l], p.xv_w1r[l], p.xv_w1j[l], p.xv_b1[l],
                p.xv_lns[l], p.xv_lnb[l], p.xv_w2[l], p.xv_b2[l], cd=cd,
            )
            v16 = v_pre * ew
            q, res_q = _node_mlp_fwd(
                h_tile, p.xq_w1[l], p.xq_b1[l], p.xq_lns[l], p.xq_lnb[l],
                p.xq_w2[l], p.xq_b2[l], cd=cd,
            )
            q_rep = _rep_rows(q, TN, K)
            alpha = _softmax_fwd(k, q_rep, nm, n_heads, dh, TN, K, S)
            s = (alpha * v16).sum(-1, keepdims=True) / n_heads

            g = dxbuf[src, rows, 0:3]
            mlig = mlig_ref[0, rows, :]
            gd = g * mlig
            dweighted = _rep_rows(gd, TN, K)
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
            dew_ref[0, rows, :] = dew_ref[0, rows, :] + dew2d.reshape(TN, K)

            dr_k, dhj_k, dhi_rep_k, pg_k = _edge_mlp_bwd(
                dk, res_k, et4, r_feat, hj, p.xk_w1e[l], p.xk_w1r[l],
                p.xk_w1j[l], p.xk_lns[l], p.xk_w2[l], cd=cd,
            )
            dr_v, dhj_v, dhi_rep_v, pg_v = _edge_mlp_bwd(
                dv_pre, res_v, et4, r_feat, hj, p.xv_w1e[l], p.xv_w1r[l],
                p.xv_w1j[l], p.xv_lns[l], p.xv_w2[l], cd=cd,
            )
            dh_q, pg_q = _node_mlp_bwd(
                dq, res_q, h_tile, p.xq_w1[l], p.xq_lns[l], p.xq_w2[l], cd=cd,
            )

            dr_feat = dr_k + dr_v
            dhj = dhj_k + dhj_v
            dhi_k = _sum_rows(dhi_rep_k, TN, K)
            dhi_v = _sum_rows(dhi_rep_v, TN, K)
            R = rbf.shape[-1]
            drbf = sum(
                dr_feat[:, i * R : (i + 1) * R] * et4[:, i : i + 1]
                for i in range(4)
            )
            ddist = (drbf * (2.0 * coeff) * d_off * rbf).sum(-1, keepdims=True)
            drel = ddist * rel / jnp.maximum(dist, 1e-16) + drel_from_delta
            dxi = _sum_rows(drel, TN, K)
            dxj = -drel

            # cotangent on h_mid (consumed by this layer's x2h backward)
            dh_tile_total = (
                dh_q + _cdot(dhi_k, p.xk_w1i[l].T, cd)
                + _cdot(dhi_v, p.xv_w1i[l].T, cd)
            )
            dhbuf[src, rows, :] = dhbuf[src, rows, :] + dh_tile_total
            dhbuf[src] = dhbuf[src] + _cdotg(onehot, dhj, cd)
            dxbuf[dst, rows, 0:3] = dxbuf[dst, rows, 0:3] + dxi
            dxbuf[dst, :, 0:3] = dxbuf[dst, :, 0:3] + _cdotg(onehot, dxj, cd)

            hi_grads_k = _cdotg(h_tile, dhi_k, cd)
            pieces = [pg_k[0], pg_k[1], hi_grads_k, pg_k[2]] + list(pg_k[3:])
            hi_grads_v = _cdotg(h_tile, dhi_v, cd)
            pieces += [pg_v[0], pg_v[1], hi_grads_v, pg_v[2]] + list(pg_v[3:])
            pieces += list(pg_q)
            for r, val in zip(dph_refs, pieces):
                r[l] = r[l] + val
            return 0

        jax.lax.fori_loop(0, T - T0, h2x_tile, 0, unroll=False)

        # ---- x2h backward: all tiles (cone-dead tiles skipped: their rows'
        # output cotangents are identically zero — every contribution below
        # is a product with that zero, so the skip is bit-exact; see
        # block_layers_trainable docstring) ----
        def x2h_tile(t, _):
            pl.when(flags_ref[0, 0, l * T + t] != 0)(
                functools.partial(_x2h_tile_body, t)
            )
            return 0

        def _x2h_tile_body(t):
            rows = pl.ds(t * TN, TN)
            erows = pl.ds(t * TNK, TNK)
            onehot = ocache[erows, :]
            h_tile = hck_ref[0, l, rows, :].astype(jnp.float32)
            if "gather" in ablate:  # timing stand-in: dest-row broadcast
                hj = jnp.broadcast_to(
                    h_tile[:, None, :], (TN, K, H)
                ).reshape(TNK, H)
            else:
                h_all = hck_ref[0, l].astype(jnp.float32)
                hj = _cdot(onehot, h_all, cd)
            if gc:
                # 'geom' ablate: the refresh loop above is skipped, so these
                # are stale layer-0 values — same timing stand-in as before
                et4, nm, ew, rel, dist, d_off, rbf, r_feat = _load_geo(erows)
            else:
                et4, nm, ew = edge_scalars(t, 0)
                if "geom" in ablate:  # timing stand-in: constant geometry
                    rel = jnp.ones((TNK, 3), jnp.float32)
                    dist = jnp.ones((TNK, 1), jnp.float32)
                    d_off = jnp.ones((TNK, offsets.shape[-1]), jnp.float32)
                    rbf = jnp.ones((TNK, offsets.shape[-1]), jnp.float32)
                else:
                    rel, dist, d_off, rbf = _geom_ck(
                        xck_ref, l, onehot, rows, TN, offsets, coeff, K, cd
                    )
                r_feat = jnp.concatenate(
                    [rbf * et4[:, i : i + 1] for i in range(4)], axis=1
                )
            p = px
            hi_k = _cdot(h_tile, p.hk_w1i[l], cd)
            k, res_k = _edge_mlp_fwd(
                et4, r_feat, _rep_rows(hi_k, TN, K), hj,
                p.hk_w1e[l], p.hk_w1r[l], p.hk_w1j[l], p.hk_b1[l],
                p.hk_lns[l], p.hk_lnb[l], p.hk_w2[l], p.hk_b2[l], cd=cd,
            )
            if "vbranch" in ablate:  # timing stand-in: reuse the k branch
                v_pre, res_v = k, res_k
            else:
                hi_v = _cdot(h_tile, p.hv_w1i[l], cd)
                v_pre, res_v = _edge_mlp_fwd(
                    et4, r_feat, _rep_rows(hi_v, TN, K), hj,
                    p.hv_w1e[l], p.hv_w1r[l], p.hv_w1j[l], p.hv_b1[l],
                    p.hv_lns[l], p.hv_lnb[l], p.hv_w2[l], p.hv_b2[l], cd=cd,
                )
            v = v_pre * ew
            q, res_q = _node_mlp_fwd(
                h_tile, p.hq_w1[l], p.hq_b1[l], p.hq_lns[l], p.hq_lnb[l],
                p.hq_w2[l], p.hq_b2[l], cd=cd,
            )
            q_rep = _rep_rows(q, TN, K)
            g = dhbuf[src, rows, :]
            dm = _rep_rows(g, TN, K)
            if "softmax" in ablate:  # timing stand-in: skip the whole chain
                alpha128 = jnp.broadcast_to(nm, (TNK, H))
                dalpha128 = dm * v
                dv = dm * alpha128
                dl128 = dalpha128
                dq = _sum_rows(dl128 * k, TN, K)
            else:
                alpha = _softmax_fwd(k, q_rep, nm, n_heads, dh, TN, K, S)
                alpha128 = jnp.dot(alpha, St, preferred_element_type=jnp.float32)
                dalpha128 = dm * v
                dv = dm * alpha128
                dalpha = jnp.dot(dalpha128, S, preferred_element_type=jnp.float32)
                dlogits = _softmax_bwd(dalpha, alpha, TN, K, n_heads) / math.sqrt(dh)
                dl128 = jnp.dot(dlogits, St, preferred_element_type=jnp.float32)
                dq = _sum_rows(dl128 * k, TN, K)
            dk = dl128 * q_rep
            dv_pre = dv * ew
            dew2d = (dv * v_pre).sum(-1, keepdims=True)
            dew_ref[0, rows, :] = dew_ref[0, rows, :] + dew2d.reshape(TN, K)

            dr_k, dhj_k, dhi_rep_k, pg_k = _edge_mlp_bwd(
                dk, res_k, et4, r_feat, hj, p.hk_w1e[l], p.hk_w1r[l],
                p.hk_w1j[l], p.hk_lns[l], p.hk_w2[l], cd=cd,
            )
            if "vbranch" in ablate:  # timing stand-in: reuse the k branch
                dr_v, dhj_v, dhi_rep_v, pg_v = dr_k, dhj_k, dhi_rep_k, pg_k
            else:
                dr_v, dhj_v, dhi_rep_v, pg_v = _edge_mlp_bwd(
                    dv_pre, res_v, et4, r_feat, hj, p.hv_w1e[l], p.hv_w1r[l],
                    p.hv_w1j[l], p.hv_lns[l], p.hv_w2[l], cd=cd,
                )
            dh_q, pg_q = _node_mlp_bwd(
                dq, res_q, h_tile, p.hq_w1[l], p.hq_lns[l], p.hq_w2[l], cd=cd,
            )
            dr_feat = dr_k + dr_v
            dhj = dhj_k + dhj_v
            dhi_k = _sum_rows(dhi_rep_k, TN, K)
            dhi_v = _sum_rows(dhi_rep_v, TN, K)
            R = rbf.shape[-1]
            drbf = sum(
                dr_feat[:, i * R : (i + 1) * R] * et4[:, i : i + 1]
                for i in range(4)
            )
            ddist = (drbf * (2.0 * coeff) * d_off * rbf).sum(-1, keepdims=True)
            drel = ddist * rel / jnp.maximum(dist, 1e-16)
            dxi = _sum_rows(drel, TN, K)
            dxj = -drel

            dh_tile_total = (
                g  # residual path
                + dh_q
                + _cdot(dhi_k, p.hk_w1i[l].T, cd)
                + _cdot(dhi_v, p.hv_w1i[l].T, cd)
            )
            dhbuf[dst, rows, :] = dhbuf[dst, rows, :] + dh_tile_total
            if "scatter" not in ablate:
                dhbuf[dst] = dhbuf[dst] + _cdotg(onehot, dhj, cd)
            dxbuf[dst, rows, 0:3] = dxbuf[dst, rows, 0:3] + dxi
            if "scatter" not in ablate:
                dxbuf[dst, :, 0:3] = dxbuf[dst, :, 0:3] + _cdotg(onehot, dxj, cd)

            if "pgrads" not in ablate:
                hi_grads_k = _cdotg(h_tile, dhi_k, cd)
                pieces = [pg_k[0], pg_k[1], hi_grads_k, pg_k[2]] + list(pg_k[3:])
                hi_grads_v = _cdotg(h_tile, dhi_v, cd)
                pieces += [pg_v[0], pg_v[1], hi_grads_v, pg_v[2]] + list(pg_v[3:])
                pieces += list(pg_q)
                for r, val in zip(dpx_refs, pieces):
                    r[l] = r[l] + val

        jax.lax.fori_loop(0, T, x2h_tile, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, L, layer_body, 0, unroll=False)

    last = L % 2
    dh0_ref[0] = dhbuf[last]
    dx0_ref[0] = dxbuf[last, :, 0:3]


def _stacked_grad_shapes(sp):
    return [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in sp]


def _block_bwd(hs, xs, idx, nbr_mask, etype, e_w, mask_ligand, offsets,
               spx: X2HParams, sph: H2XParams, gh, gx,
               *, n_heads, coeff, interpret, n_ligand, cd, x2h_flags=None):
    """hs [B, L+1, N, H] f32 checkpoints, xs [B, L+1, N, 3] f32.
    x2h_flags [B, L*T] (T = N/_pick_tile(N) backward tiles): per-layer x2h
    backward tile liveness; None = all-live (round-4 behavior)."""
    B, Lp1, N, H = hs.shape
    L = Lp1 - 1
    K = idx.shape[-1]
    TN = _pick_tile(N)
    if x2h_flags is None:
        x2h_flags = jnp.ones((B, L * (N // TN)), jnp.int32)
    assert x2h_flags.shape == (B, L * (N // TN)), x2h_flags.shape
    gc = BWD_GEOM_CACHE
    if gc:
        # plain regeo-dirty bits (layer-independent, NOT cone-intersected:
        # the cache-vs-recompute decision needs "does this tile's geometry
        # ever change", which is the v9 first-TR rule)
        from .block_denoiser import compute_tile_flags as _ctf

        dirty = _ctf(idx, nbr_mask, n_ligand, tile=TN, rtile=TN,
                     num_layers=None)[:, : N // TN]
        x2h_flags = jnp.concatenate([x2h_flags, dirty], axis=-1)

    # trace-time backward phase attribution (tools/fwdbwd_probe.py):
    # BWD_ABLATE=gather|geom|vbranch|softmax|scatter|pgrads (comma-sep)
    # replaces that phase of the x2h backward tiles with a timing stand-in
    # (math WRONG under ablation — measurement only, like kablate.py)
    import os as _os

    ablate = tuple(
        a for a in _os.environ.get("BWD_ABLATE", "").split(",") if a
    )
    kern = functools.partial(
        _block_bwd_kernel, N=N, H=H, K=K, L=L, n_heads=n_heads, coeff=coeff,
        TN=TN, NLIG=n_ligand, cd=cd, gc=gc, ablate=ablate,
    )

    def wrapped(*refs):
        regular = refs[:11]
        px = X2HParams(*refs[11 : 11 + N_PFIELDS])
        ph = H2XParams(*refs[11 + N_PFIELDS : 11 + 2 * N_PFIELDS])
        outs = refs[11 + 2 * N_PFIELDS :]
        dh0, dx0, dew = outs[0], outs[1], outs[2]
        dpx = outs[3 : 3 + N_PFIELDS]
        dph = outs[3 + N_PFIELDS : 3 + 2 * N_PFIELDS]
        scratch = outs[3 + 2 * N_PFIELDS :]
        kern(*regular, px, ph, dh0, dx0, dew, dpx, dph, *scratch)

    R = offsets.shape[-1]
    NF = (L + 1 if gc else L) * (N // TN)
    in_specs = (
        [
            # per-complex flag row in SMEM (same layout trick as the forward
            # megakernel: last two block dims equal the array's)
            pl.BlockSpec((1, 1, NF), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lp1, N, H), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, Lp1, N, 3), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, R), lambda b: (0, 0)),
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0)),
        ]
        + [pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim) for a in spx]
        + [pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim) for a in sph]
    )
    out_specs = [
        pl.BlockSpec((1, N, H), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
    ] + [
        pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim)
        for a in list(spx) + list(sph)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N, H), jnp.float32),
        jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, N, K), jnp.float32),
    ] + _stacked_grad_shapes(spx) + _stacked_grad_shapes(sph)

    outs = pl.pallas_call(
        wrapped,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((N * K, N), cd),  # ocache
            pltpu.VMEM((2, N, H), jnp.float32),  # dh ping-pong
            pltpu.VMEM((2, N, 8), jnp.float32),  # dx ping-pong
        ] + ([
            # rel(3)|dist(1)|r_feat(4R)|et4(4)|nm(1)|ew(1), 128-lane padded
            pltpu.VMEM((N * K, -(-(10 + 4 * R) // 128) * 128), jnp.float32),
        ] if gc else []),
        interpret=interpret,
    )(
        x2h_flags.astype(jnp.int32)[:, None, :],
        hs, xs, idx.astype(jnp.int32), nbr_mask.astype(jnp.float32),
        etype.astype(jnp.int32), e_w.astype(jnp.float32),
        mask_ligand.astype(jnp.float32)[..., None], offsets.reshape(1, -1),
        gh.astype(jnp.float32), gx.astype(jnp.float32), *spx, *sph,
    )
    dh0, dx0, dew = outs[0], outs[1], outs[2]
    dspx = X2HParams(*outs[3 : 3 + N_PFIELDS])
    dsph = H2XParams(*outs[3 + N_PFIELDS : 3 + 2 * N_PFIELDS])
    return dh0, dx0, dew, dspx, dsph


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def block_layers_trainable(h, x, idx, nbr_mask, etype, e_w, mask_ligand,
                           offsets, spx_ph, n_heads, coeff, interpret,
                           n_ligand, dtype=jnp.float32, need_full_h=True):
    """All L (x2h + h2x) layers with per-layer Pallas forwards and ONE fused
    whole-block Pallas backward. spx_ph = (spx, sph): X2HParams / H2XParams
    of [L, ...]-stacked (2D-ified) f32 arrays from stack_params_2d.

    need_full_h=False (round 5): the TRAINING loss reads only ligand rows
    (score_model loss / v_inference consume h[:, NP:]), so the sampling
    megakernel's v10 per-layer dependency-cone tile skipping is EXACT for
    the loss and every parameter gradient too — a protein h row whose value
    never reaches a ligand output has identically-zero cotangent, so the
    fused backward's recompute from its (stale-but-finite) checkpoint rows
    contributes exact zeros. Returned h protein rows are then UNSPECIFIED;
    callers must consume ligand rows only (use True for every block whose
    full h feeds a next block)."""
    spx, sph = spx_ph[0], spx_ph[1]
    L = spx[0].shape[0]
    for l in range(L):
        # 2D-ified bias rows [1, H] flow straight into the per-layer kernels
        pxl = X2HParams(*[a[l] for a in spx])
        h = x2h_attention_layer(
            h, x, idx, nbr_mask, etype, e_w, offsets, pxl,
            n_heads=n_heads, coeff=coeff, dtype=dtype, interpret=interpret,
        )
        phl = H2XParams(*[a[l] for a in sph])
        x = h2x_attention_layer(
            h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, phl,
            n_heads=n_heads, coeff=coeff, dtype=dtype, interpret=interpret,
            n_ligand=n_ligand,
        )
    return h, x


def merge_stacks(spx: X2HParams, sph: H2XParams, dtype):
    """[L, ...]-stacked X2H/H2X params -> the megakernel's merged
    BlockParams layout (k|v merged on the output axis, edge rows reordered
    [Wr|We], h2x value head lane-replicated) + dummy EwParams (the train
    forward feeds e_w as an input). Mirrors
    fast_forward.extract_block_params, but from stacks."""
    from .block_denoiser import BlockParams, EwParams

    f32 = jnp.float32
    H = spx.hk_w1i.shape[-1]
    rep = H // sph.xv_w2.shape[-1] if sph.xv_w2.shape[-1] != H else 1

    def side(p, pre, rep_v=1):
        g = lambda name: getattr(p, f"{pre}{name}")
        w1er = jnp.concatenate(
            [jnp.concatenate([g("k_w1r"), g("v_w1r")], -1),
             jnp.concatenate([g("k_w1e"), g("v_w1e")], -1)], 1)
        w1j = jnp.concatenate([g("k_w1j"), g("v_w1j")], -1)
        w1iq = jnp.concatenate([g("k_w1i"), g("v_w1i"), g("q_w1")], -1)
        b1q = jnp.concatenate([g("k_b1"), g("v_b1"), g("q_b1")], -1)
        lns = jnp.concatenate([g("k_lns"), g("v_lns")], 1)
        lnb = jnp.concatenate([g("k_lnb"), g("v_lnb")], 1)
        w2v, b2v = g("v_w2"), g("v_b2")
        if rep_v > 1:
            w2v = jnp.repeat(w2v, rep_v, axis=2)
            b2v = jnp.repeat(b2v, rep_v, axis=2)
        return (
            w1er.astype(dtype), w1j.astype(dtype), w1iq.astype(dtype),
            b1q.astype(f32), lns.astype(f32), lnb.astype(f32),
            g("k_w2").astype(dtype), g("k_b2").astype(f32),
            w2v.astype(dtype), b2v.astype(f32),
            g("q_lns").astype(f32), g("q_lnb").astype(f32),
            g("q_w2").astype(dtype), g("q_b2").astype(f32),
        )

    bp = BlockParams(*side(spx, "h"), *side(sph, "x", rep_v=rep))
    R = spx.hk_w1r.shape[1]
    ew = EwParams(
        w1=jnp.zeros((R, H), dtype), b1=jnp.zeros((1, H), f32),
        lns=jnp.ones((1, H), f32), lnb=jnp.zeros((1, H), f32),
        w2=jnp.zeros((H, H), dtype), b2=jnp.zeros((1, 1), f32),
    )
    return ew, bp


def _block_fwd_rule(h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets,
                    spx_ph, n_heads, coeff, interpret, n_ligand,
                    dtype=jnp.float32, need_full_h=True):
    spx, sph = spx_ph[0], spx_ph[1]
    L = spx[0].shape[0]
    B, N, H = h.shape
    K = idx.shape[-1]
    from .block_denoiser import (
        block_denoiser, block_denoiser_fits, choose_rtile, choose_x2h_tile,
        compute_tile_flags,
    )

    use_mega = (
        n_ligand is not None and n_ligand <= 128
        and (N - n_ligand) % 8 == 0
        and block_denoiser_fits(N, K, H, n_ligand)
    )
    if use_mega:
        # ONE whole-block forward kernel, emitting the per-layer h/x
        # checkpoint stacks the fused backward consumes (geometry refresh,
        # one-hot and lifts are built once per complex instead of per layer)
        ewp, bp = merge_stacks(spx, sph, dtype)
        # v9/v10 work flags in TRAIN mode (round 5): the regeo-clean skip is
        # bit-exact in every mode (clean tiles' geometry never changes), and
        # with need_full_h=False the per-layer x2h dependency cone is exact
        # for loss AND gradients (see block_layers_trainable docstring).
        # Checkpoints stay exact where it matters: xck is exact everywhere
        # (only always-computed ligand rows move); hck dead rows are
        # stale-but-finite and meet only zero cotangents in the backward.
        per_layer = not need_full_h and TRAIN_TILE_FLAGS
        if TRAIN_TILE_FLAGS:
            tile = choose_x2h_tile(N, per_layer)
            rtile = choose_rtile(N, per_layer)
            flags = compute_tile_flags(
                idx, nbr_mask, n_ligand, tile=tile, rtile=rtile,
                num_layers=L if per_layer else None,
            )
        else:  # duel baseline: round-4 all-dirty behavior
            tile = rtile = 104
            flags = None
        need_full_h = need_full_h or not per_layer
        hout, xout, hck, xck = block_denoiser(
            h.astype(dtype) if dtype != jnp.float32 else h,
            x, idx, nbr_mask, mask_ligand, offsets, ewp, bp,
            num_layers=L, n_heads=n_heads, coeff=coeff,
            dtype=jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32,
            interpret=interpret, n_ligand=n_ligand,
            ew_in=e_w, train_checkpoints=True,
            tile=tile, rtile=rtile, tile_flags=flags,
            need_full_h=need_full_h,
        )
        res = (hck, xck, idx, nbr_mask, etype, e_w, mask_ligand, offsets,
               spx, sph)
        return (hout.astype(h.dtype), xout), res

    hs, xs = [h.astype(jnp.float32)], [x.astype(jnp.float32)]
    for l in range(L):
        pxl = X2HParams(*[a[l] for a in spx])
        h = x2h_attention_layer(
            h, x, idx, nbr_mask, etype, e_w, offsets, pxl,
            n_heads=n_heads, coeff=coeff, dtype=dtype, interpret=interpret,
        )
        hs.append(h.astype(jnp.float32))
        phl = H2XParams(*[a[l] for a in sph])
        x = h2x_attention_layer(
            h, x, idx, nbr_mask, etype, e_w, mask_ligand, offsets, phl,
            n_heads=n_heads, coeff=coeff, dtype=dtype, interpret=interpret,
            n_ligand=n_ligand,
        )
        xs.append(x.astype(jnp.float32))
    res = (
        jnp.stack(hs, axis=1), jnp.stack(xs, axis=1), idx, nbr_mask, etype,
        e_w, mask_ligand, offsets, spx, sph,
    )
    return (h, x), res


def _block_bwd_rule(n_heads, coeff, interpret, n_ligand, dtype, need_full_h,
                    res, g):
    hs, xs, idx, nbr_mask, etype, e_w, mask_ligand, offsets, spx, sph = res
    gh, gx = g
    x2h_flags = None
    if not need_full_h and TRAIN_TILE_FLAGS:
        # cone-dead x2h backward tiles carry identically-zero cotangents
        # (loss reads only ligand rows in this mode) — skip them, at the
        # backward's own tile granularity
        from .block_denoiser import compute_tile_flags

        N = hs.shape[2]
        L = hs.shape[1] - 1
        TN = _pick_tile(N)
        TR = N // TN
        flags = compute_tile_flags(
            idx, nbr_mask, n_ligand, tile=TN, rtile=TN, num_layers=L
        )
        x2h_flags = flags[:, L * TR :]
    dh0, dx0, dew, dspx, dsph = _block_bwd(
        hs, xs, idx, nbr_mask, etype, e_w, mask_ligand, offsets, spx, sph,
        gh, gx, n_heads=n_heads, coeff=coeff, interpret=interpret,
        n_ligand=n_ligand, cd=dtype, x2h_flags=x2h_flags,
    )
    return (
        dh0.astype(hs.dtype), dx0.astype(xs.dtype), _zero_cot(idx),
        _zero_cot(nbr_mask), _zero_cot(etype), dew.astype(e_w.dtype),
        _zero_cot(mask_ligand), jnp.zeros_like(offsets),
        (X2HParams(*[d.astype(p.dtype) for d, p in zip(dspx, spx)]),
         H2XParams(*[d.astype(p.dtype) for d, p in zip(dsph, sph)])),
    )


block_layers_trainable.defvjp(_block_fwd_rule, _block_bwd_rule)

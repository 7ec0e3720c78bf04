"""Whole-block fused denoiser megakernel (v5).

One pallas_call per UniTransformerO2 block runs ALL num_layers attention
layers (x2h + h2x each) for one complex per grid step, entirely in VMEM
(reference: models/uni_transformer.py:11-210; the reference launches ~40
CUDA kernels per layer through PyG scatter/gather ops).

Design — driven by measured VMEM-traffic accounting on v5e (the kernel is
bandwidth-bound on [N*K, N]-sized one-hot reads at ~270 GB/s effective):

  * grid = (B,): h [N,128], x [N,3], kNN edge arrays and ALL stacked layer
    parameters are VMEM-resident; h/x ping-pong between two scratches.
    Requires the raised scoped-VMEM limit (set on import in
    targetdiff_tpu/__init__.py; the chip has >=96 MB usable).
  * ocache [N*K, N] bf16: the gather one-hot is built ONCE per block and
    reused by all L x 2 passes (v1 rebuilt it per tile-pass).
  * gather folded into the edge MLPs: onehot @ [h@w1j_k | h@w1j_v], with
    the node-level h@w1j done once per layer — per-edge h_j is never
    materialized, and ONE one-hot read serves both the k and v MLPs.
  * geometry updates are ligand-only: protein atoms never move during a
    block, so rel' = rel + d_i - onehot_lig @ d_lig gathers just the
    [n_ligand] delta rows through a 128-lane one-hot (50x smaller read
    than a full [N*K, N] gather per layer).
  * rel lives in an aligned [N*K, 8] f32 scratch (no hi/lo bf16 split, no
    sub-vreg lane slicing).
  * the global edge weights e_w (sigmoid MLP of block-start distances,
    reference models/uni_transformer.py:312-318) are computed once into a
    [N, K] scratch and reused by every layer.
  * LayerNorm mean/var as MXU matmuls with a ones vector; K-axis softmax
    aggregation as [TI, TI*K] segment-matrix matmuls.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


class BlockParams(NamedTuple):
    hk_w1er: jnp.ndarray
    hk_w1i: jnp.ndarray
    hk_w1j: jnp.ndarray
    hk_b1: jnp.ndarray
    hk_lns: jnp.ndarray
    hk_lnb: jnp.ndarray
    hk_w2: jnp.ndarray
    hk_b2: jnp.ndarray
    hv_w1er: jnp.ndarray
    hv_w1i: jnp.ndarray
    hv_w1j: jnp.ndarray
    hv_b1: jnp.ndarray
    hv_lns: jnp.ndarray
    hv_lnb: jnp.ndarray
    hv_w2: jnp.ndarray
    hv_b2: jnp.ndarray
    hq_w1: jnp.ndarray
    hq_b1: jnp.ndarray
    hq_lns: jnp.ndarray
    hq_lnb: jnp.ndarray
    hq_w2: jnp.ndarray
    hq_b2: jnp.ndarray
    xk_w1er: jnp.ndarray
    xk_w1i: jnp.ndarray
    xk_w1j: jnp.ndarray
    xk_b1: jnp.ndarray
    xk_lns: jnp.ndarray
    xk_lnb: jnp.ndarray
    xk_w2: jnp.ndarray
    xk_b2: jnp.ndarray
    xv_w1er: jnp.ndarray
    xv_w1i: jnp.ndarray
    xv_w1j: jnp.ndarray
    xv_b1: jnp.ndarray
    xv_lns: jnp.ndarray
    xv_lnb: jnp.ndarray
    xv_w2: jnp.ndarray
    xv_b2: jnp.ndarray
    xq_w1: jnp.ndarray
    xq_b1: jnp.ndarray
    xq_lns: jnp.ndarray
    xq_lnb: jnp.ndarray
    xq_w2: jnp.ndarray
    xq_b2: jnp.ndarray


class EwParams(NamedTuple):
    w1: jnp.ndarray
    b1: jnp.ndarray
    lns: jnp.ndarray
    lnb: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def _ln_relu(x, scale, bias, eps=1e-5, out_dtype=None):
    """LayerNorm + relu; mean/mean-square reductions as MXU matmuls."""
    xf = x.astype(jnp.float32)
    H = xf.shape[-1]
    ones2 = jnp.ones((H, 8), jnp.float32) / H
    x2 = xf * xf
    mean = jnp.dot(xf, ones2, preferred_element_type=jnp.float32)[:, :1]
    m2 = jnp.dot(x2, ones2, preferred_element_type=jnp.float32)[:, :1]
    var = jnp.maximum(m2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = jnp.maximum(y * scale + bias, 0.0)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def _block_kernel(
    h_ref, x_ref, idx_ref, nmask_ref, etype_ref, mlig_ref, offsets_ref,
    ewp: EwParams, bp: BlockParams,
    hout_ref, xout_ref,
    hbuf, xbuf, ewbuf, ecache, relc, ocache, olcache, dlig, nw, ni, nq, wkv,
    *, N, H, K, L, n_heads, coeff, dtype, TI, NLIG,
):
    NK = N * K
    dh = H // n_heads
    T = N // TI
    TNK = TI * K

    lane = jax.lax.broadcasted_iota(jnp.int32, (H, n_heads), 0)
    headi = jax.lax.broadcasted_iota(jnp.int32, (H, n_heads), 1)
    S = (lane // dh == headi).astype(dtype)  # [H, heads]
    St = S.T.astype(jnp.float32)

    hbuf[0] = h_ref[0].astype(dtype)
    xbuf[0] = x_ref[0].astype(jnp.float32)
    # uninitialized lanes/rows of the ligand-delta staging buffer would feed
    # 0 * garbage into the regeo dot — zero it once per complex
    dlig[:, :] = jnp.zeros((128, 16), jnp.float32)

    seg_row = jax.lax.broadcasted_iota(jnp.int32, (TI, TNK), 0)
    seg_col = jax.lax.broadcasted_iota(jnp.int32, (TI, TNK), 1)
    SEG = (seg_col // K == seg_row).astype(dtype)  # [TI, TNK]
    SEGf = SEG.astype(jnp.float32)

    def lift_rows(v2, rows_n, tnk):  # [rows_n, K] -> [tnk, 1]
        return jnp.broadcast_to(v2[:, :, None], (rows_n, K, 8)).reshape(tnk, 8)[:, :1]

    def feat_pack(erows, rel, dist, tnk, et2d):
        """feat = [onehot(et,4) | rbf(20) x onehot(et,4)] into ecache
        (reference models/uni_transformer.py:49-51 kv-input order); rel goes
        to the aligned f32 relc scratch."""
        rbf = jnp.exp(coeff * (dist - offsets_ref[:]) ** 2)  # [tnk, R]
        nrows = et2d.shape[0]
        ets = [
            lift_rows((et2d == t).astype(jnp.float32), nrows, tnk) for t in range(4)
        ]
        et4f = jnp.concatenate(ets, axis=1)
        feat = jnp.concatenate(
            [et4f] + [rbf * et4f[:, i : i + 1] for i in range(4)], axis=1
        )
        zrest = jnp.zeros((tnk, 128 - 84), dtype)
        ecache[erows, :] = jnp.concatenate([feat.astype(dtype), zrest], axis=1)
        relc[erows, 0:3] = rel
        return rbf

    # ---- block-start init: one-hot cache, feat/rel cache, edge weights ----
    def init_tile(ti, _):
        rows = pl.ds(ti * TI, TI)
        erows = pl.ds(ti * TNK, TNK)
        idx_t = idx_ref[0, rows, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (TI, K, N), 2)
        oh = (idx_t[:, :, None] == iota).astype(dtype).reshape(TNK, N)
        ocache[erows, :] = oh
        # ligand-only one-hot (lane = idx - (N - NLIG)); geometry updates
        # later in the block gather ONLY ligand deltas through this
        iotaL = jax.lax.broadcasted_iota(jnp.int32, (TI, K, 128), 2)
        ridx = idx_t - (N - NLIG)
        ohl = ((ridx[:, :, None] == iotaL) & (ridx[:, :, None] >= 0)).astype(
            dtype
        ).reshape(TNK, 128)
        olcache[erows, :] = ohl
        x_cur = xbuf[0]
        x_hi = x_cur.astype(dtype)
        x_lo = (x_cur - x_hi.astype(jnp.float32)).astype(dtype)
        xhl = jnp.concatenate(
            [x_hi, jnp.zeros((N, 5), dtype), x_lo, jnp.zeros((N, 5), dtype)], 1
        )  # [N,16]: one oh read serves both halves
        xj2 = jnp.dot(oh, xhl, preferred_element_type=jnp.float32)
        xj = xj2[:, 0:3] + xj2[:, 8:11]
        xi = jnp.broadcast_to(
            xbuf[0, rows, :][:, None, :], (TI, K, 3)
        ).reshape(TNK, 3)
        rel = xi - xj
        dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)
        rbf = feat_pack(erows, rel, dist, TNK, etype_ref[0, rows, :])
        z = jnp.dot(rbf.astype(dtype), ewp.w1[:], preferred_element_type=jnp.float32) + ewp.b1[:]
        z = _ln_relu(z, ewp.lns[:], ewp.lnb[:], out_dtype=dtype)
        logit = jnp.dot(z, ewp.w2[:], preferred_element_type=jnp.float32) + ewp.b2[:]
        ewbuf[rows, :] = jax.nn.sigmoid(logit).reshape(TI, K)
        return 0

    jax.lax.fori_loop(0, T, init_tile, 0, unroll=False)

    def stage_node(h_all, w1er_k, w1er_v, w1j_k, w1j_v, w1i_k, b1_k, w1i_v, b1_v,
                   qw1, qb1, qlns, qlnb, qw2, qb2):
        """Per-layer node-level precomputes into scratches:
        nw = [h@w1j_k | h@w1j_v] bf16; ni = [h@w1i_k + b1_k | h@w1i_v + b1_v]
        f32; nq = node-MLP output f32 (gather-fold: onehot @ nw replaces the
        per-edge hj materialization)."""
        wkv[0:84, :H] = w1er_k
        wkv[0:84, H:] = w1er_v
        nw[:, :H] = jnp.dot(h_all, w1j_k, preferred_element_type=jnp.float32).astype(dtype)
        nw[:, H:] = jnp.dot(h_all, w1j_v, preferred_element_type=jnp.float32).astype(dtype)
        ni[:, :H] = jnp.dot(h_all, w1i_k, preferred_element_type=jnp.float32) + b1_k
        ni[:, H:] = jnp.dot(h_all, w1i_v, preferred_element_type=jnp.float32) + b1_v
        z = jnp.dot(h_all, qw1, preferred_element_type=jnp.float32) + qb1
        z = _ln_relu(z, qlns, qlnb, out_dtype=dtype)
        nq[:, :] = jnp.dot(z, qw2, preferred_element_type=jnp.float32) + qb2

    def edge_mlp_kv(oh, feat, hi_kv_rep,
                    lns_k, lnb_k, w2_k, b2_k, lns_v, lnb_v, w2_v, b2_v):
        """Fused k+v edge MLPs: ONE gather-shaped dot with the combined
        [N, 2H] node-precompute RHS (nw), so the 11 MB one-hot LHS is read
        once per pass instead of twice; LN/w2 then run per 128-lane half."""
        zg = jnp.dot(oh, nw[:, :], preferred_element_type=jnp.float32)  # [tnk, 2H]
        zf = jnp.dot(feat, wkv[0:84, :], preferred_element_type=jnp.float32)
        z = zg + zf + hi_kv_rep
        z_k = _ln_relu(z[:, :H], lns_k, lnb_k, out_dtype=dtype)
        z_v = _ln_relu(z[:, H:], lns_v, lnb_v, out_dtype=dtype)
        k = (jnp.dot(z_k, w2_k, preferred_element_type=jnp.float32) + b2_k).astype(dtype)
        v = (jnp.dot(z_v, w2_v, preferred_element_type=jnp.float32) + b2_v).astype(dtype)
        return k, v

    def softmax_of(k, q_tile, nm_t):
        q_rep = jnp.broadcast_to(
            q_tile[:, None, :], (TI, K, H)
        ).reshape(TNK, H)
        prod = k * q_rep
        logits = jnp.dot(prod, S, preferred_element_type=jnp.float32) / math.sqrt(dh)
        lg = jnp.where(nm_t > 0, logits.reshape(TI, K, n_heads), NEG)
        mx = lg.max(axis=1, keepdims=True)
        e = jnp.exp(lg - mx) * nm_t
        den = e.sum(axis=1, keepdims=True)
        return (e / jnp.maximum(den, 1e-16)).reshape(TNK, n_heads)

    def layer_body(l, _):
        src = jax.lax.rem(l, 2)
        dst = jax.lax.rem(l + 1, 2)

        # geometry changed in the previous layer's h2x — but ONLY ligand
        # atoms move, so the update gathers just the [NLIG] delta block
        # through the 128-lane ligand one-hot (50x smaller read than a full
        # [NK, N] gather): rel' = rel + d_i - oh_lig @ d_lig
        @pl.when(l > 0)
        def _():
            dl = xbuf[src, N - NLIG : N, :] - xbuf[1 - src, N - NLIG : N, :]
            d_hi = dl.astype(dtype)
            d_lo = (dl - d_hi.astype(jnp.float32)).astype(dtype)
            dlig[0:NLIG, 0:3] = d_hi.astype(jnp.float32)
            dlig[0:NLIG, 8:11] = d_lo.astype(jnp.float32)

            def regeo_tile(ti, _):
                rows = pl.ds(ti * TI, TI)
                erows = pl.ds(ti * TNK, TNK)
                rel_old = relc[erows, 0:3]
                ohl = olcache[erows, :]
                dj2 = jnp.dot(ohl, dlig[:, :].astype(dtype),
                              preferred_element_type=jnp.float32)
                dj = dj2[:, 0:3] + dj2[:, 8:11]
                d_rows = xbuf[src, rows, :] - xbuf[1 - src, rows, :]
                di = jnp.broadcast_to(
                    d_rows[:, None, :], (TI, K, 3)
                ).reshape(TNK, 3)
                rel = rel_old + di - dj
                dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)
                feat_pack(erows, rel, dist, TNK, etype_ref[0, rows, :])
                return 0

            jax.lax.fori_loop(0, T, regeo_tile, 0, unroll=False)

        # ---- pass A: x2h ----
        stage_node(hbuf[src], bp.hk_w1er[l], bp.hv_w1er[l], bp.hk_w1j[l], bp.hv_w1j[l], bp.hk_w1i[l],
                   bp.hk_b1[l], bp.hv_w1i[l], bp.hv_b1[l],
                   bp.hq_w1[l], bp.hq_b1[l], bp.hq_lns[l], bp.hq_lnb[l],
                   bp.hq_w2[l], bp.hq_b2[l])

        def x2h_tile(ti, _):
            rows = pl.ds(ti * TI, TI)
            erows = pl.ds(ti * TNK, TNK)
            oh = ocache[erows, :]
            feat = ecache[erows, 0:84]
            hi_kv_rep = jnp.broadcast_to(
                ni[rows, :][:, None, :], (TI, K, 2 * H)
            ).reshape(TNK, 2 * H)
            k, v = edge_mlp_kv(oh, feat, hi_kv_rep,
                               bp.hk_lns[l], bp.hk_lnb[l], bp.hk_w2[l], bp.hk_b2[l],
                               bp.hv_lns[l], bp.hv_lnb[l], bp.hv_w2[l], bp.hv_b2[l])
            nm_t = nmask_ref[0, rows, :].reshape(TI, K, 1)
            alpha = softmax_of(k, nq[rows, :].astype(dtype), nm_t)
            alpha128 = jnp.dot(alpha, St, preferred_element_type=jnp.float32)
            ew1 = lift_rows(ewbuf[rows, :], TI, TNK)
            av = (alpha128 * ew1 * v.astype(jnp.float32)).astype(dtype)
            out = jnp.dot(SEG, av, preferred_element_type=jnp.float32)
            hbuf[dst, rows, :] = (
                out + hbuf[src, rows, :].astype(jnp.float32)
            ).astype(dtype)
            return 0

        jax.lax.fori_loop(0, T, x2h_tile, 0, unroll=False)

        # ---- pass B: h2x ----
        stage_node(hbuf[dst], bp.xk_w1er[l], bp.xv_w1er[l], bp.xk_w1j[l], bp.xv_w1j[l], bp.xk_w1i[l],
                   bp.xk_b1[l], bp.xv_w1i[l], bp.xv_b1[l],
                   bp.xq_w1[l], bp.xq_b1[l], bp.xq_lns[l], bp.xq_lnb[l],
                   bp.xq_w2[l], bp.xq_b2[l])

        def h2x_tile(ti, _):
            rows = pl.ds(ti * TI, TI)
            erows = pl.ds(ti * TNK, TNK)
            oh = ocache[erows, :]
            feat = ecache[erows, 0:84]
            rel = relc[erows, 0:3]
            hi_kv_rep = jnp.broadcast_to(
                ni[rows, :][:, None, :], (TI, K, 2 * H)
            ).reshape(TNK, 2 * H)
            k, v16 = edge_mlp_kv(oh, feat, hi_kv_rep,
                                 bp.xk_lns[l], bp.xk_lnb[l], bp.xk_w2[l], bp.xk_b2[l],
                                 bp.xv_lns[l], bp.xv_lnb[l], bp.xv_w2[l], bp.xv_b2[l])
            nm_t = nmask_ref[0, rows, :].reshape(TI, K, 1)
            alpha = softmax_of(k, nq[rows, :].astype(dtype), nm_t)
            ew1 = lift_rows(ewbuf[rows, :], TI, TNK)
            s = (alpha * (v16.astype(jnp.float32) * ew1)).sum(
                axis=-1, keepdims=True
            ) / n_heads
            sr = s * rel
            delta = jnp.dot(SEGf, sr, preferred_element_type=jnp.float32)
            xbuf[dst, rows, :] = (
                xbuf[src, rows, :] + delta * mlig_ref[0, rows, :]
            )
            return 0

        jax.lax.fori_loop(0, T, h2x_tile, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, L, layer_body, 0, unroll=False)

    last = L % 2
    hout_ref[0] = hbuf[last].astype(hout_ref.dtype)
    xout_ref[0] = xbuf[last]


def estimate_vmem_bytes(N: int, K: int, H: int = 128) -> int:
    """Scratch VMEM the megakernel needs for one complex (dominated by the
    [N*K, N] one-hot cache). Used to gate the 'mega' path before Mosaic
    fails to allocate (ADVICE r2: hybrid-mode N=704/K=95 wants ~94 MB for
    ocache alone)."""
    NK = N * K
    return (
        2 * N * H * 2  # hbuf bf16
        + 2 * N * 3 * 4  # xbuf f32
        + N * K * 4  # ewbuf
        + NK * 128 * 2  # ecache bf16
        + NK * 8 * 4  # relc f32
        + NK * N * 2  # ocache bf16
        + NK * 128 * 2  # olcache bf16
        + 128 * 16 * 4  # dlig
        + N * 2 * H * 2  # nw bf16
        + N * 2 * H * 4  # ni f32
        + N * H * 4  # nq f32
        + 88 * 2 * H * 2  # wkv
    )


# leave headroom under the 96 MB raised scoped-VMEM limit for inputs
# (h/x/idx/etype blocks + stacked layer params) and compiler temporaries
VMEM_SCRATCH_BUDGET = 72 * 1024 * 1024


def block_denoiser_fits(N: int, K: int, H: int = 128) -> bool:
    return estimate_vmem_bytes(N, K, H) <= VMEM_SCRATCH_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "n_heads", "coeff", "dtype", "interpret",
                     "tile", "n_ligand"),
)
def block_denoiser(
    h, x, idx, nbr_mask, etype, mask_ligand, offsets,
    ew_params: EwParams, block_params: BlockParams,
    *, num_layers, n_heads=16, coeff=-0.5, dtype=jnp.bfloat16, interpret=False,
    tile=104, n_ligand=32,
):
    B, N, H = h.shape
    K = idx.shape[-1]
    if not interpret and not block_denoiser_fits(N, K, H):
        raise ValueError(
            f"block_denoiser scratch VMEM estimate "
            f"{estimate_vmem_bytes(N, K, H) >> 20} MB exceeds the "
            f"{VMEM_SCRATCH_BUDGET >> 20} MB budget at N={N}, K={K} "
            f"(the [N*K, N] one-hot cache dominates); use the per-layer "
            f"'layers' mode for this shape"
        )
    # largest 8-aligned divisor of N at most `tile`; whole-N fallback for
    # small/unaligned N (interpret-mode tests) — the old descending loop
    # never terminated for N % 8 != 0
    TI = min(tile, N)
    while TI > 8 and (N % TI or TI % 8):
        TI -= 8
    if N % TI:
        TI = N
    R = offsets.shape[-1]

    NLIG = n_ligand
    assert NLIG <= 128, "ligand block must fit the 128-lane gather"
    kern = functools.partial(
        _block_kernel, N=N, H=H, K=K, L=num_layers, n_heads=n_heads,
        coeff=coeff, dtype=dtype, TI=TI, NLIG=NLIG,
    )

    n_ew = len(EwParams._fields)
    n_bp = len(BlockParams._fields)

    def wrapped(*refs):
        regular = refs[:7]
        ewp = EwParams(*refs[7 : 7 + n_ew])
        bpp = BlockParams(*refs[7 + n_ew : 7 + n_ew + n_bp])
        outs = refs[7 + n_ew + n_bp : 7 + n_ew + n_bp + 2]
        scratch = refs[7 + n_ew + n_bp + 2 :]
        kern(*regular, ewp, bpp, *outs, *scratch)

    in_specs = (
        [
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, R), lambda b: (0, 0)),
        ]
        + [pl.BlockSpec(p.shape, lambda b: (0,) * p.ndim) for p in ew_params]
        + [pl.BlockSpec(p.shape, lambda b: (0,) * p.ndim) for p in block_params]
    )

    hout, xout = pl.pallas_call(
        wrapped,
        grid=(B,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, H), h.dtype),
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, N, H), dtype),
            pltpu.VMEM((2, N, 3), jnp.float32),
            pltpu.VMEM((N, K), jnp.float32),
            pltpu.VMEM((N * K, 128), dtype),
            pltpu.VMEM((N * K, 8), jnp.float32),
            pltpu.VMEM((N * K, N), dtype),
            pltpu.VMEM((N * K, 128), dtype),
            pltpu.VMEM((128, 16), jnp.float32),
            pltpu.VMEM((N, 2 * H), dtype),
            pltpu.VMEM((N, 2 * H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((88, 2 * H), dtype),
        ],
        interpret=interpret,
    )(
        h, x.astype(jnp.float32), idx.astype(jnp.int32),
        nbr_mask.astype(jnp.float32), etype.astype(jnp.int32),
        mask_ligand.astype(jnp.float32)[..., None], offsets.reshape(1, -1),
        *ew_params, *block_params,
    )
    return hout, xout

"""Whole-block fused denoiser megakernel.

One pallas_call per UniTransformerO2 block runs ALL num_layers attention
layers (x2h + h2x each) for one complex per grid step, entirely in VMEM:

  * grid = (B,): node features h [N,128], coordinates x [N,3], the kNN edge
    arrays and ALL stacked layer parameters are VMEM-resident; h/x ping-pong
    between two scratch buffers across layers;
  * the global edge weights e_w (sigmoid MLP of block-start distances,
    reference models/uni_transformer.py:312-318) are computed once into a
    [N, K] scratch and reused by every layer — the reference's semantics;
  * per (layer, tile): neighbor gather via bf16 one-hot matmul (hi/lo split
    keeps f32-exact coordinates), split-input edge MLPs, masked per-center
    softmax, aggregation, equivariant coordinate update
    (reference: models/uni_transformer.py:11-210).

vs the per-layer kernels (edge_layer.py) this removes 17 of 18 kernel
launches per denoiser call, all intermediate HBM round-trips of h and x, and
the per-grid-step pipeline overhead that dominated the trace profile.
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
    """All layer parameters stacked on a leading layer axis [L, ...].
    Edge-MLP first Linears are merged/split by kv-input block: w1er covers
    [edge_feat(4) | r_feat(4R)] rows, w1i/w1j the h_i/h_j rows (kv-input
    order per reference models/uni_transformer.py:49-51). Vectors are
    stacked as [L, 1, D]. Weights bf16, vectors f32."""

    hk_w1er: jnp.ndarray  # [L, 4+4R, H]
    hk_w1i: jnp.ndarray  # [L, H, H]
    hk_w1j: jnp.ndarray  # [L, H, H]
    hk_b1: jnp.ndarray  # [L, 1, H]
    hk_lns: jnp.ndarray
    hk_lnb: jnp.ndarray
    hk_w2: jnp.ndarray  # [L, H, H]
    hk_b2: jnp.ndarray
    hv_w1er: jnp.ndarray
    hv_w1i: jnp.ndarray
    hv_w1j: jnp.ndarray
    hv_b1: jnp.ndarray
    hv_lns: jnp.ndarray
    hv_lnb: jnp.ndarray
    hv_w2: jnp.ndarray
    hv_b2: jnp.ndarray
    hq_w1: jnp.ndarray  # [L, H, H]
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
    xv_w2: jnp.ndarray  # [L, H, heads]
    xv_b2: jnp.ndarray  # [L, 1, heads]
    xq_w1: jnp.ndarray
    xq_b1: jnp.ndarray
    xq_lns: jnp.ndarray
    xq_lnb: jnp.ndarray
    xq_w2: jnp.ndarray
    xq_b2: jnp.ndarray


class EwParams(NamedTuple):
    """edge_pred_layer MLP (reference models/uni_transformer.py:242-243)."""

    w1: jnp.ndarray  # [R, hid] bf16
    b1: jnp.ndarray  # [1, hid] f32
    lns: jnp.ndarray
    lnb: jnp.ndarray
    w2: jnp.ndarray  # [hid, 1] bf16
    b2: jnp.ndarray  # [1, 1] f32


def _ln_relu(x, scale, bias, eps=1e-5):
    """LayerNorm + relu with the mean/mean-square reductions done as one MXU
    matmul against a ones-matrix (VPU reduction passes over [TNK, H] were a
    measurable share of the kernel's elementwise budget)."""
    xf = x.astype(jnp.float32)
    H = xf.shape[-1]
    ones2 = jnp.ones((H, 8), jnp.float32) / H  # 8 lanes for tile alignment
    x2 = xf * xf
    mean = jnp.dot(xf, ones2, preferred_element_type=jnp.float32)[:, :1]
    m2 = jnp.dot(x2, ones2, preferred_element_type=jnp.float32)[:, :1]
    var = jnp.maximum(m2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return jnp.maximum(y * scale + bias, 0.0)


def _block_kernel(
    h_ref, x_ref, idx_ref, nmask_ref, etype_ref, mlig_ref, offsets_ref,
    ewp: EwParams, bp: BlockParams,
    hout_ref, xout_ref,
    hbuf, xbuf, ewbuf,
    *, N, H, K, L, n_heads, coeff, dtype, TN,
):
    T = N // TN
    TNK = TN * K
    dh = H // n_heads
    UNROLL = 1  # Mosaic fori_loop supports only unroll=1 or full unroll (full crashes the compiler at this size)
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, n_heads), 0)
    headi = jax.lax.broadcasted_iota(jnp.int32, (H, n_heads), 1)
    S = (lane // dh == headi).astype(jnp.float32)  # [H, heads]
    St = S.T

    hbuf[0] = h_ref[0].astype(dtype)
    xbuf[0] = x_ref[0].astype(jnp.float32)

    # center-segment sum as an MXU matmul: seg[n, e] = (e // K == n)
    seg_row = jax.lax.broadcasted_iota(jnp.int32, (TN, TN * K), 0)
    seg_col = jax.lax.broadcasted_iota(jnp.int32, (TN, TN * K), 1)
    SEG = (seg_col // K == seg_row).astype(jnp.float32)  # [TN, TNK]

    def lift(v2):  # [TN, K] -> [TNK, 1]
        return jnp.broadcast_to(v2[:, :, None], (TN, K, 8)).reshape(TNK, 8)[:, :1]

    def onehot_of(rows):
        idx_t = idx_ref[0, rows, :]  # [TN, K]
        iota = jax.lax.broadcasted_iota(jnp.int32, (TN, K, N), 2)
        return (idx_t[:, :, None] == iota).astype(dtype).reshape(TNK, N)

    def geometry(onehot, x_tile, x_hi, x_lo):
        xj = (
            jnp.dot(onehot, x_hi, preferred_element_type=jnp.float32)
            + jnp.dot(onehot, x_lo, preferred_element_type=jnp.float32)
        )  # [TNK, 3]
        xi = jnp.broadcast_to(x_tile[:, None, :], (TN, K, 3)).reshape(TNK, 3)
        rel = xi - xj
        dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)
        return rel, dist

    def feat_of(rows, dist):
        rbf = jnp.exp(coeff * (dist - offsets_ref[:]) ** 2)  # [TNK, R]
        iota4 = jax.lax.broadcasted_iota(jnp.int32, (TN, K, 4), 2)
        et4 = (etype_ref[0, rows, :][:, :, None] == iota4).astype(jnp.float32)
        et4f = et4.reshape(TNK, 4)
        # kv-input prefix: [edge_feat(4) | outer(edge_type, rbf)(4R)]
        return jnp.concatenate(
            [et4f] + [rbf * et4f[:, i : i + 1] for i in range(4)], axis=1
        ), rbf

    # ---- block-start edge weights into ewbuf [N, K] ----
    def init_ew(ti, _):
        rows = pl.ds(ti * TN, TN)
        x_cur = xbuf[0]
        x_hi = x_cur.astype(dtype)
        x_lo = (x_cur - x_hi.astype(jnp.float32)).astype(dtype)
        onehot = onehot_of(rows)
        _, dist = geometry(onehot, xbuf[0, rows, :], x_hi, x_lo)
        rbf = jnp.exp(coeff * (dist - offsets_ref[:]) ** 2)
        z = jnp.dot(rbf.astype(dtype), ewp.w1[:], preferred_element_type=jnp.float32) + ewp.b1[:]
        z = _ln_relu(z, ewp.lns[:], ewp.lnb[:]).astype(dtype)
        logit = jnp.dot(z, ewp.w2[:], preferred_element_type=jnp.float32) + ewp.b2[:]
        ewbuf[rows, :] = jax.nn.sigmoid(logit).reshape(TN, K)
        return 0

    jax.lax.fori_loop(0, T, init_ew, 0, unroll=False)

    def edge_mlp(feat, hi_term, hj, w1er, w1j, b1, lns, lnb, w2, b2):
        z = (
            jnp.dot(feat.astype(dtype), w1er, preferred_element_type=jnp.float32)
            + jnp.dot(hj, w1j, preferred_element_type=jnp.float32)
            + jnp.broadcast_to(hi_term[:, None, :], (TN, K, H)).reshape(TNK, H)
            + b1
        )
        z = _ln_relu(z, lns, lnb).astype(dtype)
        return jnp.dot(z, w2, preferred_element_type=jnp.float32) + b2

    def node_mlp(h_tile, w1, b1, lns, lnb, w2, b2):
        z = jnp.dot(h_tile, w1, preferred_element_type=jnp.float32) + b1
        z = _ln_relu(z, lns, lnb).astype(dtype)
        return jnp.dot(z, w2, preferred_element_type=jnp.float32) + b2

    def attention(k, q_tile, nm1):
        q_rep = jnp.broadcast_to(
            q_tile.astype(dtype)[:, None, :], (TN, K, H)
        ).reshape(TNK, H)
        prod = (k.astype(dtype) * q_rep).astype(jnp.float32)
        logits = jnp.dot(prod, S, preferred_element_type=jnp.float32) / math.sqrt(dh)
        lg = jnp.where(nm1 > 0, logits, NEG).reshape(TN, K, n_heads)
        mx = lg.max(axis=1, keepdims=True)
        e = jnp.exp(lg - mx) * nm1.reshape(TN, K, 1)
        den = e.sum(axis=1, keepdims=True)
        return (e / jnp.maximum(den, 1e-16)).reshape(TNK, n_heads)

    def layer_body(l, _):
        src = jax.lax.rem(l, 2)
        dst = jax.lax.rem(l + 1, 2)
        x_cur = xbuf[src]
        x_hi = x_cur.astype(dtype)
        x_lo = (x_cur - x_hi.astype(jnp.float32)).astype(dtype)

        def x2h_tile(ti, _):
            rows = pl.ds(ti * TN, TN)
            onehot = onehot_of(rows)
            hj = jnp.dot(onehot, hbuf[src], preferred_element_type=jnp.float32)
            h_tile = hbuf[src, rows, :]
            _, dist = geometry(onehot, xbuf[src, rows, :], x_hi, x_lo)
            feat, _ = feat_of(rows, dist)
            nm1 = lift(nmask_ref[0, rows, :])
            ew1 = lift(ewbuf[rows, :])

            hi_k = jnp.dot(h_tile, bp.hk_w1i[l], preferred_element_type=jnp.float32)
            k = edge_mlp(feat, hi_k, hj, bp.hk_w1er[l], bp.hk_w1j[l], bp.hk_b1[l],
                         bp.hk_lns[l], bp.hk_lnb[l], bp.hk_w2[l], bp.hk_b2[l])
            hi_v = jnp.dot(h_tile, bp.hv_w1i[l], preferred_element_type=jnp.float32)
            v = edge_mlp(feat, hi_v, hj, bp.hv_w1er[l], bp.hv_w1j[l], bp.hv_b1[l],
                         bp.hv_lns[l], bp.hv_lnb[l], bp.hv_w2[l], bp.hv_b2[l])
            v = v * ew1
            q = node_mlp(h_tile, bp.hq_w1[l], bp.hq_b1[l], bp.hq_lns[l],
                         bp.hq_lnb[l], bp.hq_w2[l], bp.hq_b2[l])
            alpha = attention(k, q, nm1)
            alpha128 = jnp.dot(alpha, St, preferred_element_type=jnp.float32)
            out = jnp.dot(SEG, alpha128 * v, preferred_element_type=jnp.float32)
            hbuf[dst, rows, :] = (out + h_tile.astype(jnp.float32)).astype(dtype)
            return 0

        jax.lax.fori_loop(0, T, x2h_tile, 0, unroll=UNROLL)

        def h2x_tile(ti, _):
            rows = pl.ds(ti * TN, TN)
            onehot = onehot_of(rows)
            hj = jnp.dot(onehot, hbuf[dst], preferred_element_type=jnp.float32)
            h_tile = hbuf[dst, rows, :]
            rel, dist = geometry(onehot, xbuf[src, rows, :], x_hi, x_lo)
            feat, _ = feat_of(rows, dist)
            nm1 = lift(nmask_ref[0, rows, :])
            ew1 = lift(ewbuf[rows, :])

            hi_k = jnp.dot(h_tile, bp.xk_w1i[l], preferred_element_type=jnp.float32)
            k = edge_mlp(feat, hi_k, hj, bp.xk_w1er[l], bp.xk_w1j[l], bp.xk_b1[l],
                         bp.xk_lns[l], bp.xk_lnb[l], bp.xk_w2[l], bp.xk_b2[l])
            hi_v = jnp.dot(h_tile, bp.xv_w1i[l], preferred_element_type=jnp.float32)
            v16 = edge_mlp(feat, hi_v, hj, bp.xv_w1er[l], bp.xv_w1j[l], bp.xv_b1[l],
                           bp.xv_lns[l], bp.xv_lnb[l], bp.xv_w2[l], bp.xv_b2[l])
            v16 = v16 * ew1
            q = node_mlp(h_tile, bp.xq_w1[l], bp.xq_b1[l], bp.xq_lns[l],
                         bp.xq_lnb[l], bp.xq_w2[l], bp.xq_b2[l])
            alpha = attention(k, q, nm1)
            s = (alpha * v16).sum(axis=-1, keepdims=True) / n_heads
            delta = jnp.dot(SEG, s * rel, preferred_element_type=jnp.float32)
            xbuf[dst, rows, :] = xbuf[src, rows, :] + delta * mlig_ref[0, rows, :]
            return 0

        jax.lax.fori_loop(0, T, h2x_tile, 0, unroll=UNROLL)
        return 0

    jax.lax.fori_loop(0, L, layer_body, 0, unroll=False)

    last = L % 2
    hout_ref[0] = hbuf[last].astype(hout_ref.dtype)
    xout_ref[0] = xbuf[last]


@functools.partial(
    jax.jit, static_argnames=("num_layers", "n_heads", "coeff", "dtype", "interpret", "tile")
)
def block_denoiser(
    h, x, idx, nbr_mask, etype, mask_ligand, offsets,
    ew_params: EwParams, block_params: BlockParams,
    *, num_layers, n_heads=16, coeff=-0.5, dtype=jnp.bfloat16, interpret=False, tile=32,
):
    """Run the full block (num_layers x (x2h, h2x)) on dense padded inputs.

    h [B,N,H]; x [B,N,3] f32; idx/nbr_mask/etype [B,N,K]; mask_ligand [B,N].
    Returns (h_out [B,N,H], x_out [B,N,3])."""
    B, N, H = h.shape
    K = idx.shape[-1]
    TN = min(tile, N)
    while N % TN:
        TN //= 2
    assert TN >= 8, (N, tile)
    R = offsets.shape[-1]

    kern = functools.partial(
        _block_kernel, N=N, H=H, K=K, L=num_layers, n_heads=n_heads,
        coeff=coeff, dtype=dtype, TN=TN,
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
        ],
        interpret=interpret,
    )(
        h, x.astype(jnp.float32), idx.astype(jnp.int32),
        nbr_mask.astype(jnp.float32), etype.astype(jnp.int32),
        mask_ligand.astype(jnp.float32)[..., None], offsets.reshape(1, -1),
        *ew_params, *block_params,
    )
    return hout, xout

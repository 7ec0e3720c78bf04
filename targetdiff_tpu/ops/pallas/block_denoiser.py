"""Whole-block fused denoiser megakernel (v7).

One pallas_call per UniTransformerO2 block runs ALL num_layers attention
layers (x2h + h2x each) for one complex per grid step, entirely in VMEM
(reference: models/uni_transformer.py:11-210; the reference launches ~40
CUDA kernels per layer through PyG scatter/gather ops).

Design — driven by measured phase ablations on v5e (round 3). The earlier
"VMEM-read floor" model was re-measured and overturned: the [N*K, N]
one-hot gather dots run at ~70% MXU efficiency and their cost scales with
output lanes, i.e. the kernel is MXU-FLOP-bound, not read-bound. The
structure that follows:

  * grid = (B,): h [N,128], x, kNN arrays and ALL stacked layer parameters
    are VMEM-resident; h ping-pongs between two scratches, x lives in one
    `xfull` scratch (needs the raised scoped-VMEM limit, set on import in
    targetdiff_tpu/__init__.py).
  * h2x runs on LIGAND-destination rows only: x updates are masked to
    ligand atoms (reference models/uni_transformer.py:206) and ligand rows
    sit at the tail of the composed layout, so the other (N-NLIG)*K h2x
    edge computations are dead work (measured ~45% of v5's edge time).
  * raw-h gather, shared between passes: hjc = onehot @ h gathers the raw
    128-lane h once per layer (after x2h); both h2x(l) and x2h(l+1) consume
    it through per-pass [128, 2H] weight projections. Half the gather
    FLOPs of the folded 2H-lane form, and the per-layer node-fold staging
    disappears.
  * k|v parameter stacks are merged along the output axis OUTSIDE the
    kernel (extract_block_params), so each pass runs one [*, 2H] dot where
    v5 ran two [*, H] dots plus an in-kernel weight-staging copy.
  * edge features live in ecache as [rbf x onehot(et,4) (80) | onehot(et,4)
    (4) | 0...]: the et-dependent 80-lane replication mask is CACHED at
    init (static per block), so the per-layer geometry refresh (regeo) is
    just rbf -> one 4-way lane tile -> one multiply -> one 80-lane store.
  * geometry updates are ligand-only: rel' = rel + d_i - onehot_lig @ d_lig
    gathers just the [NLIG] delta rows through a 128-lane one-hot.
  * edge types are derived IN KERNEL from the composed layout (ligand =
    tail indices), eliminating the per-step XLA take_along_axis glue.
  * the global edge weights e_w (sigmoid MLP of block-start distances,
    reference models/uni_transformer.py:312-318) are computed once into a
    [N, K] scratch and reused by every layer.
  * x2h softmax is SHIFT-FREE and LANE-REPLICATED (round 3): logits come
    out of `prod @ S128` (block-diagonal head-sum) already replicated
    across each head's dh lanes; exp runs on +-60-clipped logits (a
    per-head shift cancels in num/den, and measured exp cost is ~0.2 ms);
    numerator AND denominator aggregate over K through the same full-width
    [TI, TI*K] segment matmul, normalizing once after aggregation. The
    head-compact [*, 16] formulation's narrow dots ran at ~12% MXU
    utilization and cost 2x the rest of the softmax.
  * LayerNorm stats as plain lane reductions — they beat narrow [H, 8]
    ones-matmuls by 2.3 ms/call (lnred duel).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


class BlockParams(NamedTuple):
    """Per-block stacked layer parameters, k|v merged along the output axis.

    Shapes (L = num_layers, H = hidden):
      *_w1er [L, 84, 2H]  edge-feature rows, reordered [Wr(80) | We(4)]
      *_w1j  [L, H, 2H]   neighbor (gathered h_j) projection
      *_w1iq [L, H, 3H]   destination h_i k|v projections + query first layer
      *_b1q  [L, 1, 3H]
      *_lns / *_lnb [L, 2, H]  LayerNorm affine, k|v stacked on sublanes
      *_w2k  [L, H, H], *_b2k [L, 1, H]
      h_w2v  [L, H, H], h_b2v [L, 1, H]     (x2h value head)
      x_w2v  [L, H, H], x_b2v [L, 1, H]     (h2x head-scalar columns
                                             replicated across dh lanes)
      *q_*   query-MLP params (unchanged layout)
    """

    h_w1er: jnp.ndarray
    h_w1j: jnp.ndarray
    h_w1iq: jnp.ndarray
    h_b1q: jnp.ndarray
    h_lns: jnp.ndarray
    h_lnb: jnp.ndarray
    h_w2k: jnp.ndarray
    h_b2k: jnp.ndarray
    h_w2v: jnp.ndarray
    h_b2v: jnp.ndarray
    hq_lns: jnp.ndarray
    hq_lnb: jnp.ndarray
    hq_w2: jnp.ndarray
    hq_b2: jnp.ndarray
    x_w1er: jnp.ndarray
    x_w1j: jnp.ndarray
    x_w1iq: jnp.ndarray
    x_b1q: jnp.ndarray
    x_lns: jnp.ndarray
    x_lnb: jnp.ndarray
    x_w2k: jnp.ndarray
    x_b2k: jnp.ndarray
    x_w2v: jnp.ndarray
    x_b2v: jnp.ndarray
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


def _ln_relu(x, scale, bias, eps=1e-5, out_dtype=None, skip_ln=False,
             mode="dots8"):
    """LayerNorm + relu. mode: 'dots8' narrow [H,8] ones-matmul stats,
    'full' full-width bf16 [H,H] ones-matmul stats (lane-replicated),
    'reduce' plain lane reductions."""
    xf = x.astype(jnp.float32)
    if skip_ln:  # ablation timing stand-in
        out = jnp.maximum(xf * scale + bias, 0.0)
        return out if out_dtype is None else out.astype(out_dtype)
    H = xf.shape[-1]
    if mode == "full":
        x16 = xf.astype(jnp.bfloat16)
        onesH = jnp.full((H, H), 1.0 / H, jnp.bfloat16)
        mean = jnp.dot(x16, onesH, preferred_element_type=jnp.float32)
        m2 = jnp.dot(x16 * x16, onesH, preferred_element_type=jnp.float32)
    elif mode == "reduce":
        mean = xf.mean(-1, keepdims=True)
        m2 = (xf * xf).mean(-1, keepdims=True)
    else:
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
    flags_ref, h_ref, x_ref, idx_ref, nmask_ref, mlig_ref, offsets_ref,
    ewin_ref, s128_ref, seg_ref, segl_ref, seglf_ref,
    ewp: EwParams, bp: BlockParams,
    hout_ref, xout_ref, hck_ref, xck_ref,
    hbuf, xfull, dnode, lcache, ecache, e4rep, relc, ocache,
    dlig, ni, nq, xhl_s, olcache=None,
    *, N, H, K, L, n_heads, coeff, dtype, TI, TIR, NLIG, ablate=(),
    need_full_h=True, train_mode=False, per_layer_flags=False,
):
    NK = N * K
    dh = H // n_heads
    T = N // TI
    TNK = TI * K
    R = offsets_ref.shape[-1]
    ER = 4 * R + 4  # [rbf x onehot(et,4) | onehot(et,4)] feature width
    LK = NLIG * K  # h2x works on ONLY the ligand-destination tail edges
    NPAD = N - NLIG  # ligand rows sit at the tail of the composed layout
    # regeo runs on its own FINER tiling (TIR <= TI): per-tile dirty skipping
    # is the whole point there, and finer tiles skip more cleanly
    TR = N // TIR
    TNKR = TIR * K
    TL0R = NPAD // TIR  # first regeo tile containing ligand rows

    # plain lane-reduction LN stats beat the narrow [H,8] ones-matmuls by
    # 2.3 ms/call (lnred duel); 'lndots' restores the old mode for duels
    ln_mode = ("dots8" if "lndots" in ablate
               else "full" if "lnfull" in ablate else "reduce")
    # block-diagonal head-sum-and-replicate: lg128 = prod @ S128 yields each
    # head's logit replicated across its dh lanes. Narrow [*,16] dots
    # (head-compact logits + the St head->lane lift) ran at ~12% MXU
    # utilization and cost 2x the whole rest of the softmax (measured
    # sa_den/sa_e128 ablations); full-width [H,H] keeps every dot square.
    # S128/SEG/SEGL are complex-independent constants HOISTED to inputs
    # (constant index_map -> DMA'd once, resident across the whole grid)
    S128 = s128_ref[:]

    hbuf[0] = h_ref[0].astype(dtype)
    if per_layer_flags:
        # v10 cone skipping leaves never-live rows of the ping-pong buffer
        # untouched across ALL layers; they still appear as zero-weighted
        # columns of later one-hot gather dots, where an uninitialized
        # NaN/Inf would poison 0*x. Seed both buffers finite once.
        hbuf[1] = h_ref[0].astype(dtype)
    xfull[:, :] = x_ref[0].astype(jnp.float32)
    if train_mode:
        # per-layer checkpoints for the whole-block backward (block_vjp.py)
        hck_ref[0, 0] = hbuf[0].astype(jnp.float32)
        xck_ref[0, 0] = xfull[:, :]
    # uninitialized lanes/rows of the ligand-delta staging buffer would feed
    # 0 * garbage into the regeo dot — zero it once per complex; dnode's
    # protein rows must stay zero (only ligand rows are ever written)
    dlig[:, :] = jnp.zeros((128, 16), jnp.float32)
    dnode[:, :] = jnp.zeros((N, 8), jnp.float32)

    SEG = seg_ref[:]  # [TI, TNK]
    SEGL = segl_ref[:]  # [NLIG, LK]
    SEGLf = seglf_ref[:]

    def lift_rows(v2, rows_n, tnk):  # [rows_n, K] -> [tnk, 1]
        return jnp.broadcast_to(v2[:, :, None], (rows_n, K, 8)).reshape(tnk, 8)[:, :1]

    def etype_of(idx_t, row0):
        """4-way protein/ligand edge type from the composed layout: sources
        and destinations with index >= N - NLIG are ligand (replaces the
        per-step XLA take_along_axis glue; reference
        models/uni_transformer.py:288-299)."""
        rows_n = idx_t.shape[0]
        rowi = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows_n, K), 0)
        src_lig = idx_t >= NPAD
        dst_lig = rowi >= NPAD
        return jnp.where(
            src_lig & dst_lig, 0,
            jnp.where(src_lig & ~dst_lig, 1, jnp.where(~src_lig & dst_lig, 2, 3)),
        ).astype(jnp.int32)

    sC = math.sqrt(-coeff) if coeff < 0 else None
    offs_s = None if sC is None else offsets_ref[:] * sC

    def rbf_of(dist):
        # exp(coeff*(d-o)^2) == exp(-(s*d - s*o)^2) with s = sqrt(-coeff):
        # scaling d once on the [*, 1] lane saves a full [*, R] multiply
        if sC is None:
            return jnp.exp(coeff * (dist - offsets_ref[:]) ** 2)
        u = dist * sC - offs_s
        return jnp.exp(u * (-u))  # [tnk, R=20]

    def feat_store(erows, rel, rbf, tnk):
        """Refresh the rbf-dependent 80 lanes of ecache:
        feat80 = [rbf|rbf|rbf|rbf] * cached-et-replication-mask
        (the outer product rbf x onehot(et,4), reference
        models/uni_transformer.py:194-195). rel goes to the aligned f32
        relc scratch."""
        rbf4 = jnp.concatenate([rbf, rbf, rbf, rbf], axis=1)  # [tnk, 4R]
        feat80 = rbf4 * e4rep[erows, 0 : 4 * R].astype(jnp.float32)
        ecache[erows, 0 : 4 * R] = feat80.astype(dtype)
        relc[erows, 0:3] = rel

    # ---- block-start init: one-hot caches, et masks, feats, edge weights --
    def init_tile(ti, _):
        rows = pl.ds(ti * TI, TI)
        erows = pl.ds(ti * TNK, TNK)
        idx_t = idx_ref[0, rows, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (TI, K, N), 2)
        oh = (idx_t[:, :, None] == iota).astype(dtype).reshape(TNK, N)
        ocache[erows, :] = oh
        if olcache is not None:
            # ligand-only one-hot (lane = idx - NPAD); only needed when the
            # ligand tail is not 128-aligned in ocache (NPAD % 128 != 0)
            iotaL = jax.lax.broadcasted_iota(jnp.int32, (TI, K, 128), 2)
            ridx = idx_t - NPAD
            ohl = ((ridx[:, :, None] == iotaL) & (ridx[:, :, None] >= 0)).astype(
                dtype
            ).reshape(TNK, 128)
            olcache[erows, :] = ohl
        # static per-block et features: the 4-lane one-hot tail of ecache
        # and the 80-lane group-replication mask for the rbf outer product
        et2d = etype_of(idx_t, ti * TI)
        ets = [
            lift_rows((et2d == t).astype(jnp.float32), TI, TNK) for t in range(4)
        ]
        et4f = jnp.concatenate(ets, axis=1)  # [TNK, 4]
        zrest = jnp.zeros((TNK, 128 - ER), dtype)
        e4r = jnp.concatenate(
            [jnp.broadcast_to(et4f[:, g : g + 1], (TNK, R)) for g in range(4)]
            + [jnp.zeros((TNK, 128 - 4 * R), jnp.float32)],
            axis=1,
        )

        # NOTE (round 5, measured and REJECTED): gating this store on the
        # layer-1 regeo-cone flags (e4rep is consumed only by regeo
        # refreshes; ~63% of 512-class tiles never refresh) ran 65.35 vs
        # 60.50 ms/call — the pl.when around a store inside the init tile
        # body costs ~5 ms, far more than the skipped [TNK,128] store
        # saves. Keep it unconditional.
        e4rep[erows, :] = e4r.astype(dtype)
        if "xhlper" in ablate:  # pre-v10.1: rebuild the tile-invariant
            # hi|lo operand in every tile (duel stand-in)
            x_cur = xfull[:, :]
            x_hi = x_cur.astype(dtype)
            x_lo = (x_cur - x_hi.astype(jnp.float32)).astype(dtype)
            xhl = jnp.concatenate(
                [x_hi, jnp.zeros((N, 5), dtype), x_lo, jnp.zeros((N, 5), dtype)]
                * 8, 1
            )
        else:
            xhl = xhl_s[:, :]
        xj2 = jnp.dot(oh, xhl, preferred_element_type=jnp.float32)
        xj = xj2[:, 0:3] + xj2[:, 8:11]
        xi = jnp.broadcast_to(
            xfull[rows, :][:, None, :], (TI, K, 3)
        ).reshape(TNK, 3)
        rel = xi - xj
        dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)
        rbf = rbf_of(dist)
        rbf4 = jnp.concatenate([rbf, rbf, rbf, rbf], axis=1)
        feat80 = rbf4 * e4r[:, 0 : 4 * R]
        ecache[erows, :] = jnp.concatenate(
            [feat80.astype(dtype), et4f.astype(dtype), zrest], axis=1
        )
        relc[erows, 0:3] = rel
        if train_mode:
            # training: e_w comes from the (differentiable) XLA MLP input
            ew1 = lift_rows(ewin_ref[0, rows, :], TI, TNK)
        else:
            z = jnp.dot(rbf.astype(dtype), ewp.w1[:],
                        preferred_element_type=jnp.float32) + ewp.b1[:]
            z = _ln_relu(z, ewp.lns[:], ewp.lnb[:], out_dtype=dtype,
                         mode=ln_mode)
            # ewp.w2 arrives lane-replicated [H, H] (extract_block_params);
            # every output lane holds the same logit — slice lane 0
            logit = jnp.dot(z, ewp.w2[:], preferred_element_type=jnp.float32
                            )[:, 0:1] + ewp.b2[:]
            ew1 = jax.nn.sigmoid(logit)
        # CACHED LIFTS (v9): per-edge [NK, 1] row-form mask BIAS and edge
        # weight, built ONCE here — every layer's softmax previously
        # re-broadcast both from [TI, K] (2 extra full-lane passes per tile
        # per layer). Lane 0 is an ADDITIVE logit bias ((nm-1)*1e9: 0 for
        # valid, -1e9 for masked -> clip -> exp(-60) ~ 9e-27 ~ 0), folding
        # the mask multiply into the already-needed clip+exp chain. Fully
        # masked rows then emit a ~uniform average instead of exact zeros —
        # only ever true for PADDED rows, whose h/x is never consumed.
        nm1 = lift_rows(nmask_ref[0, rows, :], TI, TNK)
        lcache[erows, 0:1] = (nm1 - 1.0) * 1e9
        lcache[erows, 1:2] = ew1
        return 0

    if "init" not in ablate:
        if "xhlper" not in ablate:
            # x is constant across init — build the [N,128] hi|lo gather
            # operand ONCE per complex instead of once per tile (v10.1):
            # hi|lo halves tiled to full lane width because narrow-output
            # gather dots run the MXU at ~12% utilization
            x_cur = xfull[:, :]
            x_hi = x_cur.astype(dtype)
            x_lo = (x_cur - x_hi.astype(jnp.float32)).astype(dtype)
            xhl_s[:, :] = jnp.concatenate(
                [x_hi, jnp.zeros((N, 5), dtype), x_lo, jnp.zeros((N, 5), dtype)]
                * 8, 1
            )
        jax.lax.fori_loop(0, T, init_tile, 0, unroll=False)

    def stage_node(h_in, w1iq, b1q, qlns, qlnb, qw2, qb2, rows=None):
        """Destination-side node precomputes in ONE [rows, 3H] first dot:
        ni = h @ w1i_kv + b1 (k|v halves) and the query MLP's first layer
        (last H lanes), then the query LN + second matmul. rows=None writes
        all N rows (pass A); pass B stages only the ligand tail — h2x reads
        nothing else (v10.1, saves a [N,3H] dot + LN per layer)."""
        sl = slice(None) if rows is None else rows
        z3 = jnp.dot(h_in, w1iq, preferred_element_type=jnp.float32) + b1q
        ni[sl, :] = z3[:, : 2 * H]
        z = _ln_relu(z3[:, 2 * H :], qlns, qlnb, out_dtype=dtype, mode=ln_mode)
        nq[sl, :] = jnp.dot(z, qw2, preferred_element_type=jnp.float32) + qb2

    def edge_mlp_kv(hj, feat, hi_kv_rep, w1er, w1j,
                    lns, lnb, w2_k, b2_k, w2_v, b2_v):
        """Fused k+v edge MLPs: first layers as one [*, 2H] dot each over
        the merged k|v weight stacks; LN/second-matmul per 128-lane half."""
        z = (
            jnp.dot(hj, w1j, preferred_element_type=jnp.float32)
            + jnp.dot(feat, w1er, preferred_element_type=jnp.float32)
            + hi_kv_rep
        )
        skip_ln = "ln" in ablate
        z_k = _ln_relu(z[:, :H], lns[0:1, :], lnb[0:1, :], out_dtype=dtype,
                       skip_ln=skip_ln, mode=ln_mode)
        z_v = _ln_relu(z[:, H:], lns[1:2, :], lnb[1:2, :], out_dtype=dtype,
                       skip_ln=skip_ln, mode=ln_mode)
        if "w2" in ablate:
            return z_k, z_v[:, : w2_v.shape[-1]]
        k = (jnp.dot(z_k, w2_k, preferred_element_type=jnp.float32) + b2_k).astype(dtype)
        v = (jnp.dot(z_v, w2_v, preferred_element_type=jnp.float32) + b2_v).astype(dtype)
        return k, v

    def att_out(k, v, q_tile, l0, l1):
        """x2h attention output [TI, H] in the SHIFT-FREE, LANE-REPLICATED
        formulation. A per-head softmax shift cancels in num/den, so no max
        pass is needed at all: exp runs on +-60-clipped logits, exact for
        any LN-bounded trained weights (the per-head 3D max/sub chain this
        replaces cost ~half the old softmax's 19 ms; a scalar tile-max
        shift cost ~10 ms — see ROADMAP). Logits come out of `prod @ S128` already replicated across
        each head's dh lanes, so the numerator AND the softmax denominator
        both aggregate over K through the same full-width SEG segment
        matmul, and normalization is one [TI, H] division after
        aggregation. No 16-lane tensor is ever materialized."""
        if "sa_qrep" in ablate:  # timing stand-in
            prod = k
        else:
            q_rep = jnp.broadcast_to(
                q_tile[:, None, :], (TI, K, H)
            ).reshape(TNK, H)
            prod = k * q_rep
        if "sa_lg" in ablate:  # timing stand-in
            lg = prod.astype(jnp.float32)
        else:
            lg = jnp.dot(prod, S128, preferred_element_type=jnp.float32)
        # shift-free: exp of +-60-clipped logits. Exact for |logits| <= 60
        # (always true for LN-bounded trained weights; e^+-60 is safely
        # inside f32/bf16 range on both num and den). A mask-aware scalar
        # tile-max shift was measured ~10 ms/call SLOWER (to-scalar
        # reduction + 3 extra full-lane passes) — don't reintroduce.
        # (running this chain in bf16 measured 5.6 ms WORSE — the casts/
        # relayouts eat the halved vregs, as with every bf16-elementwise
        # attempt in this kernel's history)
        # l0 = cached additive mask bias (see init), l1 = cached ew: the
        # mask multiply is folded into the clip+exp chain (one fewer
        # full-lane pass per tile per layer)
        g = jnp.exp(jnp.clip(lg + l0, -60.0, 60.0))
        if "sa_avm" in ablate:  # timing stand-in
            av = v
        else:
            av = (g * l1 * v.astype(jnp.float32)).astype(dtype)
        g16 = g.astype(dtype)
        out_un = jnp.dot(SEG, av, preferred_element_type=jnp.float32)
        if "sa_den" in ablate:  # timing stand-in
            return out_un
        # (merging num+den into one SEG dot via [av | g] concat measured
        # ~1 ms WORSE — the [TNK, 2H] concat copy outweighs the saved dot)
        den128 = jnp.dot(SEG, g16, preferred_element_type=jnp.float32)
        return out_un / jnp.maximum(den128, 1e-30)

    def layer_body(l, _):
        src = jax.lax.rem(l, 2)
        dst = jax.lax.rem(l + 1, 2)

        # geometry changed in the previous layer's h2x — but ONLY ligand
        # atoms move, so the update gathers just the [NLIG] delta block
        # (written into dnode by h2x) through the 128-lane ligand one-hot:
        # rel' = rel + d_i - oh_lig @ d_lig. NOTE a separate loop is the
        # MEASURED optimum: fusing this refresh into the x2h tile body
        # (to overlap with the gather matmul) regressed 67 -> 106 ms/call —
        # the in-tile ecache store->load hazard serializes the whole body.
        @pl.when(jnp.logical_and(l > 0, "regeo" not in ablate))
        def _():
            dl = dnode[NPAD:N, 0:3]
            d_hi = dl.astype(dtype)
            d_lo = (dl - d_hi.astype(jnp.float32)).astype(dtype)
            dlig[0:NLIG, 0:3] = d_hi.astype(jnp.float32)
            dlig[0:NLIG, 8:11] = d_lo.astype(jnp.float32)

            # v10.1: per-layer regeo flags fold the dependency cone into the
            # dirty rule (compute_tile_flags docstring) — a tile none of
            # whose x2h consumers is live at layer l skips its refresh, and
            # by monotone liveness is never refreshed or consumed again
            rbase = l * TR if per_layer_flags else 0

            def regeo_tile(ti, _, with_di):
                # DIRTY-TILE SKIP (v9): a tile whose edges involve NO ligand
                # atom (src or dst) has unchanged geometry — its ecache/relc
                # from init stay exact for the whole block. Flags come from
                # compute_tile_flags (per step, per complex) via SMEM; the
                # all-ones default reproduces v8 behavior.
                @pl.when(flags_ref[0, 0, rbase + ti] != 0)
                def _dirty():
                    rows = pl.ds(ti * TIR, TIR)
                    erows = pl.ds(ti * TNKR, TNKR)
                    rel_old = relc[erows, 0:3]
                    if olcache is None:
                        # the ligand one-hot IS ocache's 128-aligned tail slice
                        ohl = ocache[erows, NPAD:N]  # [tnkr, NLIG]
                        dop = dlig[0:NLIG, :]
                    else:
                        ohl = olcache[erows, :]
                        dop = dlig[:, :]
                    # 16 output lanes run the MXU at ~12% utilization; tiling
                    # the [*,16] delta operand to 128 lanes is ~free and makes
                    # the dot full-width (the hi/lo pattern repeats every 16)
                    dop8 = jnp.concatenate([dop.astype(dtype)] * 8, axis=1)
                    dj2 = jnp.dot(ohl, dop8,
                                  preferred_element_type=jnp.float32)
                    dj = dj2[:, 0:3] + dj2[:, 8:11]
                    if with_di:
                        d_rows = dnode[rows, 0:3]  # zero for protein rows
                        di = jnp.broadcast_to(
                            d_rows[:, None, :], (TIR, K, 3)
                        ).reshape(TNKR, 3)
                        rel = rel_old + di - dj
                    else:
                        # pure-protein destination tiles: di == 0 by construction
                        rel = rel_old - dj
                    dist = jnp.sqrt((rel * rel).sum(-1, keepdims=True) + 1e-16)
                    feat_store(erows, rel, rbf_of(dist), TNKR)
                return 0

            # tiles fully below the ligand tail never have a destination
            # delta — skip the di broadcast there
            jax.lax.fori_loop(
                0, TL0R, functools.partial(regeo_tile, with_di=False), 0,
                unroll=False,
            )
            jax.lax.fori_loop(
                TL0R, TR, functools.partial(regeo_tile, with_di=True), 0,
                unroll=False,
            )

        # ---- pass A: x2h (consumes hjc gathered from this layer's h) ----
        stage_node(hbuf[src], bp.h_w1iq[l], bp.h_b1q[l],
                   bp.hq_lns[l], bp.hq_lnb[l], bp.hq_w2[l], bp.hq_b2[l])

        def x2h_tile(ti, _):
            def _run():
                rows = pl.ds(ti * TI, TI)
                erows = pl.ds(ti * TNK, TNK)
                # raw 128-lane neighbor-h gather, computed in-tile: feeding the
                # projection dot directly avoids a [NK, H] scratch round-trip
                if "gather" in ablate:  # timing stand-in: destination-row bcast
                    hj = jnp.broadcast_to(
                        hbuf[src, rows, :][:, None, :], (TI, K, H)
                    ).reshape(TNK, H)
                else:
                    hj = jnp.dot(
                        ocache[erows, :], hbuf[src], preferred_element_type=jnp.float32
                    ).astype(dtype)
                feat = ecache[erows, 0:ER]
                hi_kv_rep = jnp.broadcast_to(
                    ni[rows, :][:, None, :], (TI, K, 2 * H)
                ).reshape(TNK, 2 * H)
                k, v = edge_mlp_kv(hj, feat, hi_kv_rep, bp.h_w1er[l], bp.h_w1j[l],
                                   bp.h_lns[l], bp.h_lnb[l],
                                   bp.h_w2k[l], bp.h_b2k[l], bp.h_w2v[l], bp.h_b2v[l])
                if "soft" in ablate:
                    out = jnp.dot(SEG, v, preferred_element_type=jnp.float32)
                else:
                    out = att_out(k, v, nq[rows, :].astype(dtype),
                                  lcache[erows, 0:1], lcache[erows, 1:2])
                hbuf[dst, rows, :] = (
                    out + hbuf[src, rows, :].astype(jnp.float32)
                ).astype(dtype)

            if need_full_h:
                _run()
            elif per_layer_flags:
                # PER-LAYER CONE SKIP (v10, sampling only): tile ti's h at
                # layer l feeds the sampled ligand outputs only if some row
                # is within hop L-l of the ligand in the reverse kNN graph
                # (compute_tile_flags num_layers docstring). Skipped rows go
                # stale in the ping-pong buffer and — liveness being
                # monotone in l — are never consumed; hout's protein rows
                # are NOT valid in this mode (same contract as v9).
                pl.when(flags_ref[0, 0, L * TR + l * T + ti] != 0)(_run)
            else:
                # LAST-LAYER TILE SKIP (v9, sampling only): after the final
                # x2h, protein h is consumed ONLY as h2x gather sources of
                # ligand-destination edges. Tiles containing neither ligand
                # rows nor any such source (flag second half) are dead work
                # on the last layer; their hbuf[dst] rows go stale, so hout's
                # protein rows are NOT valid when need_full_h=False.
                pl.when(jnp.logical_or(
                    l < L - 1, flags_ref[0, 0, TR + ti] != 0
                ))(_run)
            return 0

        if "x2h" not in ablate:
            # (pairwise manual unroll measured 2.8 ms WORSE — Mosaic does
            # not cross-schedule independent tiles; keep one tile per iter)
            jax.lax.fori_loop(0, T, x2h_tile, 0, unroll=False)
        if train_mode:
            hck_ref[0, l + 1] = hbuf[dst].astype(jnp.float32)

        # ---- pass B: h2x, LIGAND-destination rows only ----
        # x updates are masked to ligand atoms (reference
        # models/uni_transformer.py:206), and ligand rows sit at the tail of
        # the composed layout — so the whole pass (edge MLPs, attention)
        # runs on just the last NLIG rows' LK = NLIG*K edges.
        if "h2x" in ablate:
            return 0
        lrows = pl.ds(NPAD, NLIG)
        if "bstagefull" in ablate:  # duel stand-in: the pre-v10.1 full-N stage
            stage_node(hbuf[dst], bp.x_w1iq[l], bp.x_b1q[l],
                       bp.xq_lns[l], bp.xq_lnb[l], bp.xq_w2[l], bp.xq_b2[l])
        else:
            stage_node(hbuf[dst, lrows, :], bp.x_w1iq[l], bp.x_b1q[l],
                       bp.xq_lns[l], bp.xq_lnb[l], bp.xq_w2[l], bp.xq_b2[l],
                       rows=lrows)
        lerows = pl.ds(NPAD * K, LK)
        hj = jnp.dot(
            ocache[lerows, :], hbuf[dst], preferred_element_type=jnp.float32
        ).astype(dtype)
        feat = ecache[lerows, 0:ER]
        rel = relc[lerows, 0:3]
        hi_kv_rep = jnp.broadcast_to(
            ni[lrows, :][:, None, :], (NLIG, K, 2 * H)
        ).reshape(LK, 2 * H)
        k, v16 = edge_mlp_kv(hj, feat, hi_kv_rep, bp.x_w1er[l], bp.x_w1j[l],
                             bp.x_lns[l], bp.x_lnb[l],
                             bp.x_w2k[l], bp.x_b2k[l], bp.x_w2v[l], bp.x_b2v[l])
        # same shift-free lane-replicated attention as x2h: v's [H, 16]
        # head-scalar columns are replicated to 128 lanes at param-stack
        # time (extract_block_params), so no 16-lane tensor appears here
        q_rep = jnp.broadcast_to(
            nq[lrows, :].astype(dtype)[:, None, :], (NLIG, K, H)
        ).reshape(LK, H)
        lg = jnp.dot(k * q_rep, S128, preferred_element_type=jnp.float32)
        # mask folded into exp as the cached additive bias (see init)
        g = jnp.exp(jnp.clip(lg + lcache[lerows, 0:1], -60.0, 60.0))
        denL = jnp.dot(SEGL, g.astype(dtype),
                       preferred_element_type=jnp.float32)  # [NLIG, H]
        den_rep = jnp.broadcast_to(
            denL[:, None, :], (NLIG, K, H)
        ).reshape(LK, H)
        w = g * lcache[lerows, 1:2] / jnp.maximum(den_rep, 1e-30)
        # sum over all H lanes counts each head dh times -> /H not /n_heads
        s = (w * v16.astype(jnp.float32)).sum(-1, keepdims=True) / H
        sr = s * rel
        delta = jnp.dot(SEGLf, sr, preferred_element_type=jnp.float32)
        delta = delta * mlig_ref[0, lrows, :]  # padded ligand rows stay put
        dnode[lrows, 0:3] = delta
        xfull[lrows, :] = xfull[lrows, :] + delta
        if train_mode:
            xck_ref[0, l + 1] = xfull[:, :]
        return 0

    jax.lax.fori_loop(0, L, layer_body, 0, unroll=False)

    last = L % 2
    hout_ref[0] = hbuf[last].astype(hout_ref.dtype)
    xout_ref[0] = xfull[:, :]


def _needs_olcache(N: int, n_ligand: int) -> bool:
    """The regeo ligand-delta gather can reuse ocache's tail columns as its
    one-hot iff the ligand block starts on a 128-lane tile boundary;
    otherwise a separate [N*K, 128] ligand one-hot cache is allocated."""
    return (N - n_ligand) % 128 != 0


def estimate_vmem_bytes(N: int, K: int, H: int = 128, n_ligand: int = 32) -> int:
    """Scratch VMEM the megakernel needs for one complex (dominated by the
    [N*K, N] one-hot cache). Used to gate the 'mega' path before Mosaic
    fails to allocate (ADVICE r2: hybrid-mode N=704/K=95 wants ~94 MB for
    ocache alone)."""
    NK = N * K
    return (
        2 * N * H * 2  # hbuf bf16
        + N * 3 * 4  # xfull f32
        + N * 8 * 4  # dnode f32
        + NK * 8 * 4  # lcache [mask | mask*ew]
        + NK * 128 * 2  # ecache bf16
        + NK * 128 * 2  # e4rep (static et masks) bf16
        + NK * 8 * 4  # relc f32
        + NK * N * 2  # ocache bf16
        + (NK * 128 * 2 if _needs_olcache(N, n_ligand) else 0)  # olcache
        + 128 * 16 * 4  # dlig
        + N * 2 * H * 4  # ni f32
        + N * H * 4  # nq f32
        + N * 128 * 2  # xhl_s bf16
    )


# leave headroom under the 96 MB raised scoped-VMEM limit for inputs
# (h/x/idx blocks + stacked layer params) and compiler temporaries
VMEM_SCRATCH_BUDGET = 72 * 1024 * 1024


def block_denoiser_fits(N: int, K: int, H: int = 128, n_ligand: int = 32) -> bool:
    return estimate_vmem_bytes(N, K, H, n_ligand) <= VMEM_SCRATCH_BUDGET


def choose_rtile(N: int, per_layer_flags: bool) -> int:
    """Duel-justified regeo tile size (round 5, same-process kduel at B=100
    on realistic pockets): under the v10.1 regeo-cone flags, finer regeo
    tiles pay only once the tile count is large enough for the cone to
    resolve — rt32 beat rt96 at N=672 (75.35 vs 76.10 ms/call) but LOST to
    rt104 at N=416 (55.73 vs 55.02), where 4 coarse tiles already skip
    cleanly. N=544 divides to 32 either way. Without cone flags the
    round-4 verdict stands (rt104)."""
    TIR = pick_tile(N, 104)
    if per_layer_flags and N // TIR >= 7:
        return pick_tile(N, 32)
    return TIR


def choose_x2h_tile(N: int, per_layer_flags: bool) -> int:
    """Duel-justified x2h tile size (round 5, same-process kduel duels at
    B=100 on realistic pockets): under v10 per-layer cone flags, FINER
    tiles skip more than their loop overhead costs — TI=32 beat the v8/v9
    optimum 104 at every class (N=416: 57.6 vs 59.7; N=544: 63.6 vs 68.3;
    N=672: 80.4 vs 86.6 ms/call; TI=16 regressed). Without cone flags the
    round-3 duels stand: 104."""
    return pick_tile(N, 32 if per_layer_flags else 104)


def pick_tile(N: int, tile: int = 104) -> int:
    """Largest 8-aligned divisor of N at most `tile` (whole-N fallback for
    small/unaligned N). Must match block_denoiser's internal choice — used
    by compute_tile_flags to size the per-tile flag vector."""
    TI = min(tile, N)
    if TI >= 8:
        TI -= TI % 8  # align the start, else the -8 walk never hits an
        # 8-aligned value (pick_tile(416, 52) walked down to 4)
    while TI > 8 and (N % TI or TI % 8):
        TI -= 8
    if N % TI:
        TI = N
    return TI


def compute_tile_flags(idx, nbr_mask, n_ligand: int, tile: int = 104,
                       rtile: int = 104, num_layers=None):
    """Per-complex, per-tile work flags for the v9/v10 megakernel
    (TR regeo tiles of rtile rows, T x2h tiles of `tile` rows).

    First TR entries (regeo-dirty): tile has >= 1 edge touching a ligand
    atom (valid ligand source, or the tile contains ligand-destination
    rows) — only those tiles' geometry changes between layers, so only they
    need the per-layer ecache/relc refresh.

    num_layers=None (v9, [B, TR + T]): last T entries are last-x2h-live —
    tile contains ligand rows or a valid SOURCE of a ligand-destination
    edge; with need_full_h=False the final x2h pass skips the rest (their
    h is consumed by nothing).

    num_layers=L (v10, [B, L*TR + L*T], both blocks layer-major): PER-LAYER
    liveness from the DEPENDENCY CONE of the sampling outputs. Only ligand
    h/x are consumed, so h_d after layer l matters iff d reaches the ligand
    within the remaining layers through the reverse kNN graph (hop(d) =
    reverse-BFS distance to the ligand; tile live at layer l iff
    hop <= L - l). l = L-1 gives hop <= 1, EXACTLY the v9 last-x2h
    row-level rule; earlier layers widen the cone by one TILE-granularity
    sweep each — a safe SUPERSET of the row-level cone (reaching any row
    of a tile marks the whole tile), chosen because the row-level
    scatter-min BFS measured 101 ms/call at B=100/N=416 on this image's
    XLA scatters (tools/flagbench.py) while these boolean tile sweeps are
    matmul-free elementwise passes. Rows outside the cone go stale in the
    ping-pong h buffer and are never consumed (tests/test_block_flags.py
    asserts ligand outputs equal to all-dirty).

    The first L*TR block intersects the dirty-regeo rule with the SAME
    cone, at regeo granularity (v10.1): the layer-l geometry refresh of
    regeo tile tr is consumed only by the x2h passes of live tiles sharing
    rows with tr (h2x reads only ligand-tail rows, whose tiles are live at
    every layer by hop = 0) — and liveness being monotone in l, a tile
    skipped at layer l is never refreshed or consumed again, so the skip
    is exact.

    All flags are EXACT properties of the step's kNN graph, recomputed per
    call; all-ones reproduces v8 behavior."""
    B, N, K = idx.shape
    TI = pick_tile(N, tile)
    T = N // TI
    TIR = pick_tile(N, rtile)
    TR = N // TIR
    NPAD = N - n_ligand
    valid = nbr_mask.astype(bool)
    row_lig = (jnp.arange(N) >= NPAD)[None, :]
    dirty = ((idx >= NPAD) & valid).any(-1) | row_lig
    regeo_f = dirty.reshape(B, TR, TIR).any(-1)
    # v9 last-x2h rule, scatter-free: a tile is live iff it contains ligand
    # rows or a source ROW of a ligand-destination edge — per-source-tile
    # membership tests on the [B, NL, K] ligand edge block (XLA scatters
    # serialize on TPU: the old .at[].max cost ~3.6 ms/call at B=100;
    # these compares are vector passes)
    lig_tsrc = jnp.where(valid[:, NPAD:, :], idx[:, NPAD:, :] // TI, -1)
    src_tile = jnp.stack(
        [(lig_tsrc == ts).any((-1, -2)) for ts in range(T)], axis=-1
    )  # [B, T]
    tile_has_lig = (jnp.arange(T) >= NPAD // TI)[None, :]
    hop1 = src_tile | tile_has_lig  # == the row-level v9 rule, tile-reduced
    if num_layers is None:
        return jnp.concatenate([regeo_f, hop1], axis=-1).astype(jnp.int32)

    L = int(num_layers)
    # tile adjacency: adj[b, td, ts] = any valid edge in dest-tile td whose
    # source row lies in tile ts
    tsrc = jnp.where(valid, idx // TI, -1)  # [B, N, K]
    adj = jnp.stack(
        [(tsrc == ts).any(-1).reshape(B, T, TI).any(-1) for ts in range(T)],
        axis=-1,
    )  # [B, T, T]
    reach = hop1
    lives = [reach]
    for _ in range(L - 1):  # sweep k+1: sources of any reached dest tile
        reach = reach | (adj & reach[:, :, None]).any(1)
        lives.append(reach)
    # layer l consumes sweep L-l (hop <= L-l); lives[k] holds hop <= k+1
    live = jnp.stack(lives[::-1], axis=1)  # [B, L, T]
    # regeo x cone (v10.1): dirty AND some overlapping x2h tile live at l.
    # The overlap map is static (TIR and TI need not nest, e.g. 104 vs 32).
    ov = np.zeros((T, TR), bool)
    for t in range(T):
        for tr in range(TR):
            ov[t, tr] = (t * TI < (tr + 1) * TIR) and ((t + 1) * TI > tr * TIR)
    xlive_r = (live[:, :, :, None] & jnp.asarray(ov)[None, None]).any(2)
    regeo_live = regeo_f[:, None, :] & xlive_r  # [B, L, TR]
    return jnp.concatenate(
        [regeo_live.reshape(B, L * TR), live.reshape(B, L * T)], axis=-1
    ).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "n_heads", "coeff", "dtype", "interpret",
                     "tile", "rtile", "n_ligand", "ablate", "need_full_h",
                     "train_checkpoints"),
)
def block_denoiser(
    h, x, idx, nbr_mask, mask_ligand, offsets,
    ew_params: EwParams, block_params: BlockParams,
    *, num_layers, n_heads=16, coeff=-0.5, dtype=jnp.bfloat16, interpret=False,
    tile=104, rtile=104, n_ligand=32, ablate=(), tile_flags=None,
    need_full_h=True, ew_in=None, train_checkpoints=False,
):
    """Run all `num_layers` attention layers for a batch of complexes in one
    pallas_call (inference megakernel).

    NUMERIC CONTRACT — |attention logit| <= 60: the shift-free softmax exps
    +-60-CLIPPED logits with no runtime guard. Any per-head uniform shift
    cancels in num/den, so the clip is EXACT whenever every |q.k/sqrt(dh)|
    <= 60 — always true for LN-bounded trained weights, but NOT for
    arbitrary synthetic weights (unit-scale random params reach |q.k| ~ 90).
    Out-of-envelope logits distort attention silently (e.g. a head whose
    logits all exceed +60 collapses to uniform). Vet a new checkpoint with
    `python tools/logit_envelope.py <ckpt>` which reports the true max
    |logit| over a forward pass (via the XLA path's 'stats' collection).
    The trainable VJP kernels (edge_layer_vjp.py) use max-shift softmax and
    carry no such contract.

    TRAIN-FORWARD MODE (round 4): ew_in=[B,N,K] supplies the edge weights
    from the differentiable XLA MLP (the in-kernel EwParams MLP is skipped),
    and train_checkpoints=True additionally returns per-layer checkpoint
    stacks (hck [B, L+1, N, H] f32, xck [B, L+1, N, 3] f32) for the
    whole-block fused backward (ops/pallas/block_vjp.py).
    """
    B, N, H = h.shape
    K = idx.shape[-1]
    if not interpret and not block_denoiser_fits(N, K, H, n_ligand):
        raise ValueError(
            f"block_denoiser scratch VMEM estimate "
            f"{estimate_vmem_bytes(N, K, H, n_ligand) >> 20} MB exceeds the "
            f"{VMEM_SCRATCH_BUDGET >> 20} MB budget at N={N}, K={K} "
            f"(the [N*K, N] one-hot cache dominates); use the per-layer "
            f"'layers' mode for this shape"
        )
    TI = pick_tile(N, tile)
    T = N // TI
    TIR = pick_tile(N, rtile)
    TR = N // TIR
    R = offsets.shape[-1]
    # the flag vector's length selects the scheme: [B, TR+T] = v9 (regeo +
    # last-x2h), [B, L*(TR+T)] = v10 (PER-LAYER regeo-cone + x2h cone)
    if tile_flags is None:
        tile_flags = jnp.ones((B, TR + T), jnp.int32)  # all-dirty == v8
    per_layer_flags = (
        num_layers > 1 and tile_flags.shape[-1] == num_layers * (TR + T)
    )
    NF = num_layers * (TR + T) if per_layer_flags else TR + T
    assert tile_flags.shape == (B, NF), (tile_flags.shape, B, NF)
    assert not (per_layer_flags and need_full_h), (
        "per-layer cone flags stale-protein contract requires need_full_h="
        "False (sampling); pass v9 [B, TR+T] flags otherwise"
    )

    NLIG = n_ligand
    assert NLIG <= 128, "ligand block must fit the 128-lane gather"
    assert (N - NLIG) % 8 == 0 and ((N - NLIG) * K) % 8 == 0, (
        "ligand tail block must be sublane-aligned", N, NLIG, K
    )
    train_mode = ew_in is not None
    assert not (train_checkpoints and not train_mode), "checkpoints need ew_in"
    L_ = num_layers
    if ew_in is None:
        ew_in = jnp.zeros((B, 1, K), jnp.float32)  # unused placeholder
        ew_block = (1, 1, K)
    else:
        ew_block = (1, N, K)
    kern = functools.partial(
        _block_kernel, N=N, H=H, K=K, L=num_layers, n_heads=n_heads,
        coeff=coeff, dtype=dtype, TI=TI, TIR=TIR, NLIG=NLIG, ablate=ablate,
        need_full_h=need_full_h, train_mode=train_mode,
        per_layer_flags=per_layer_flags,
    )

    n_ew = len(EwParams._fields)
    n_bp = len(BlockParams._fields)
    n_out = 4 if train_checkpoints else 2

    def wrapped(*refs):
        regular = refs[:12]
        ewp = EwParams(*refs[12 : 12 + n_ew])
        bpp = BlockParams(*refs[12 + n_ew : 12 + n_ew + n_bp])
        outs = list(refs[12 + n_ew + n_bp : 12 + n_ew + n_bp + n_out])
        if n_out == 2:
            outs += [None, None]
        scratch = refs[12 + n_ew + n_bp + n_out :]
        kern(*regular, ewp, bpp, *outs, *scratch)

    # complex-independent constants, hoisted out of the kernel body: the
    # head-sum/replicate matrix and the K-segment aggregation matrices
    # (constant index_map -> one DMA, VMEM-resident across the grid)
    dh_ = H // n_heads
    lane_i = jnp.arange(H)[:, None] // dh_
    lane_j = jnp.arange(H)[None, :] // dh_
    s128 = jnp.where(lane_i == lane_j, 1.0 / math.sqrt(dh_), 0.0).astype(dtype)
    TNK_ = TI * K
    seg = (jnp.arange(TNK_)[None, :] // K == jnp.arange(TI)[:, None]).astype(dtype)
    LK_ = NLIG * K
    seglf = (
        jnp.arange(LK_)[None, :] // K == jnp.arange(NLIG)[:, None]
    ).astype(jnp.float32)
    segl = seglf.astype(dtype)

    in_specs = (
        [
            # per-complex flag row in SMEM; the [B, 1, 2T] layout makes the
            # block's last two dims equal the array's, satisfying the
            # Pallas TPU (8,128)-divisibility rule, and avoids program_id
            # (unsupported by interpret-mode lowering on this image)
            pl.BlockSpec((1, 1, NF), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),  # per-tile work flags
            pl.BlockSpec((1, N, H), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, R), lambda b: (0, 0)),
            pl.BlockSpec(ew_block,
                         (lambda b: (b, 0, 0)) if train_mode
                         else (lambda b: (0, 0, 0))),  # ew_in (train mode)
            pl.BlockSpec((H, H), lambda b: (0, 0)),
            pl.BlockSpec((TI, TNK_), lambda b: (0, 0)),
            pl.BlockSpec((NLIG, LK_), lambda b: (0, 0)),
            pl.BlockSpec((NLIG, LK_), lambda b: (0, 0)),
        ]
        + [pl.BlockSpec(p.shape, lambda b: (0,) * p.ndim) for p in ew_params]
        + [pl.BlockSpec(p.shape, lambda b: (0,) * p.ndim) for p in block_params]
    )

    out_specs = [
        pl.BlockSpec((1, N, H), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N, H), h.dtype),
        jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
    ]
    if train_checkpoints:
        out_specs += [
            pl.BlockSpec((1, L_ + 1, N, H), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, L_ + 1, N, 3), lambda b: (b, 0, 0, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, L_ + 1, N, H), jnp.float32),
            jax.ShapeDtypeStruct((B, L_ + 1, N, 3), jnp.float32),
        ]

    outs = pl.pallas_call(
        wrapped,
        grid=(B,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, N, H), dtype),
            pltpu.VMEM((N, 3), jnp.float32),  # xfull: current positions
            pltpu.VMEM((N, 8), jnp.float32),  # dnode: last-h2x per-node delta
            pltpu.VMEM((N * K, 8), jnp.float32),  # lcache: [mask | mask*ew]
            pltpu.VMEM((N * K, 128), dtype),  # ecache
            pltpu.VMEM((N * K, 128), dtype),  # e4rep (static et masks)
            pltpu.VMEM((N * K, 8), jnp.float32),  # relc
            pltpu.VMEM((N * K, N), dtype),  # ocache
            pltpu.VMEM((128, 16), jnp.float32),  # dlig
            pltpu.VMEM((N, 2 * H), jnp.float32),  # ni
            pltpu.VMEM((N, H), jnp.float32),  # nq
            pltpu.VMEM((N, 128), dtype),  # xhl_s: hi|lo gather operand
        ]
        + ([pltpu.VMEM((N * K, 128), dtype)]  # olcache (unaligned tail only)
           if _needs_olcache(N, NLIG) else []),
        interpret=interpret,
    )(
        tile_flags.astype(jnp.int32)[:, None, :],
        h, x.astype(jnp.float32), idx.astype(jnp.int32),
        nbr_mask.astype(jnp.float32),
        mask_ligand.astype(jnp.float32)[..., None], offsets.reshape(1, -1),
        ew_in.astype(jnp.float32),
        s128, seg, segl, seglf,
        *ew_params, *block_params,
    )
    if train_checkpoints:
        return outs  # (hout, xout, hck, xck)
    return outs[0], outs[1]

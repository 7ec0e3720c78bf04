"""COMPILED-vs-interpret numeric diff of the block_denoiser megakernel on
the real TPU, at the true flagship shape (N=416, tile=104) with realistic
pocket geometry, per-tile work flags, and need_full_h=False.

Interpret-mode parity does NOT catch per-tile block-indexing bugs (interpret
evaluates slices against full arrays) — run this after ANY megakernel change
(verify skill). Checks ligand h rows + ALL x rows (the consumed outputs) and
flagged protein h tiles.

Usage: python tools/kparity.py [NPRO] [B] [geom]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.models.fast_forward import extract_block_params
    from targetdiff_tpu.ops.pallas.block_denoiser import (
        block_denoiser, pick_tile,
    )
    from targetdiff_tpu.ops.rbf import gaussian_smearing_offsets
    from __graft_entry__ import _flagship
    from _geom import kernel_inputs

    NPRO = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    geom = sys.argv[3] if len(sys.argv) > 3 else "pocket"
    NL, K, H, L, heads, tile, rtile = 32, 32, 128, 9, 16, 104, 104
    N = NPRO + NL

    model, b = _flagship(num_timesteps=1000, max_protein=NPRO, max_ligand=NL, batch=2)
    params = model.init(jax.random.PRNGKey(0), b)
    ew_p, block_p = extract_block_params(
        params["params"]["refine_net"], L, H, 20, dtype=jnp.bfloat16
    )
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)

    h, x, idx, nmask, mlig, flags = kernel_inputs(geom, B, NPRO, NL, K, H)
    h = jnp.asarray(h).astype(jnp.bfloat16)
    x, idx = jnp.asarray(x), jnp.asarray(idx)
    nmask, mlig = jnp.asarray(nmask), jnp.asarray(mlig)
    flags_j = None if flags is None else jnp.asarray(flags)
    v10 = len(sys.argv) > 4 and sys.argv[4] == "v10"
    if v10:  # per-layer dependency-cone flags (round 5)
        from targetdiff_tpu.ops.pallas.block_denoiser import (
            choose_rtile, choose_x2h_tile, compute_tile_flags,
        )

        tile = choose_x2h_tile(N, True)  # the production sampling tiles
        rtile = choose_rtile(N, True)
        flags_j = compute_tile_flags(idx, nmask, NL, tile=tile, rtile=rtile,
                                     num_layers=L)
        # protein-h spot check below uses the LAST layer's live tiles
        # (v10 layout: [L*TR regeo-cone | L*T x2h cone], both layer-major)
        TRv = N // pick_tile(N, rtile)
        Tv = N // pick_tile(N, tile)
        fj = np.asarray(flags_j)
        flags = np.concatenate(
            [fj[:, :TRv],
             fj[:, L * TRv + (L - 1) * Tv : L * TRv + L * Tv]], axis=-1,
        )

    def run(interpret):
        ho, xo = block_denoiser(
            h, x, idx, nmask, mlig, offsets, ew_p, block_p,
            num_layers=L, n_heads=heads, coeff=coeff, dtype=jnp.bfloat16,
            tile=tile, rtile=rtile, n_ligand=NL, interpret=interpret,
            tile_flags=flags_j, need_full_h=flags is None,
        )
        return np.asarray(ho, np.float32), np.asarray(xo)

    hc, xc = run(False)  # compiled on TPU
    hi, xi = run(True)  # interpret (ground truth slicing)

    def rel(a, c):
        return np.abs(a - c).max() / max(np.abs(c).max(), 1e-6)

    ex = rel(xc, xi)
    eh_lig = rel(hc[:, NPRO:], hi[:, NPRO:])
    print(f"x rel-err {ex:.2e}  ligand-h rel-err {eh_lig:.2e}")
    bad = (ex > 2e-2) or (eh_lig > 2e-2)
    if flags is not None:
        TR = N // pick_tile(N, rtile)  # regeo tiles; layout [TR | T]
        T = flags.shape[-1] - TR
        TI = pick_tile(N, tile)
        errs = []
        for bb in range(B):
            for t in range(T):
                if flags[bb, TR + t]:
                    sl = slice(t * TI, (t + 1) * TI)
                    errs.append(rel(hc[bb, sl], hi[bb, sl]))
        print(f"flagged-protein-h rel-err max {max(errs):.2e} over {len(errs)} tiles")
        bad = bad or max(errs) > 2e-2
    else:
        eh = rel(hc, hi)
        print(f"full-h rel-err {eh:.2e}")
        bad = bad or eh > 2e-2
    print("PARITY", "FAIL" if bad else "ok")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

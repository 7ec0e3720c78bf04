"""Pocket-size sweep of the denoiser step (VERDICT r3 #3): ms/call and
mol/s at NP in {384, 512, 640} (N = NP+32), megakernel where it fits and
the per-layer fallback where it doesn't, ALL in one process (same-chip
duel validity). Realistic pocket geometry + v9 flags.

Real CrossDocked 10A pockets run ~300-600 atoms
(reference: scripts/data_preparation/extract_pockets.py:30-46); rounds 1-3
only ever measured NP=384. Prints a size-weighted test-set throughput
estimate assuming pocket sizes uniform in [300, 600].

Usage: python tools/pocketbench.py [batch] [reps] [NP list]
  NP list: comma-separated entries, "512" (all rows valid) or "512@544"
  (512 valid protein atoms padded to 544 rows; N = rows + 32 ligand). e.g.
  `python tools/pocketbench.py 100 5 512,512@544` duels the 512-atom
  pocket class at its natural padding (N=544, TI=32) vs +32 padded rows
  (N=576, TI=96) — trading 6% more gather FLOPs for a 3x wider tile.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(run, h0, reps):
    meds = []
    for _ in range(3):
        hh = h0
        t0 = time.time()
        for _ in range(reps):
            ho, xo = run(hh)
            hh = ho
        np.asarray(xo[0, 0, 0])
        meds.append((time.time() - t0) / reps)
    return min(meds) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.models.fast_forward import extract_block_params
    from targetdiff_tpu.ops.pallas.block_denoiser import (
        block_denoiser, block_denoiser_fits, pick_tile,
    )
    from targetdiff_tpu.ops.rbf import gaussian_smearing_offsets
    from __graft_entry__ import _flagship
    from _geom import kernel_inputs

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    NL, K, H, L, heads = 32, 32, 128, 9, 16

    model, b = _flagship(num_timesteps=1000, max_protein=384, max_ligand=NL, batch=2)
    params = model.init(jax.random.PRNGKey(0), b)
    ew_p, block_p = extract_block_params(
        params["params"]["refine_net"], L, H, 20, dtype=jnp.bfloat16
    )
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)

    # entries are either "512" (all rows valid) or "512@576" (512 valid
    # protein atoms padded to 576 rows — the tile-aware padding question)
    np_list = (
        tuple(sys.argv[3].split(",")) if len(sys.argv) > 3
        else ("384", "512", "640")
    )
    results = {}
    for spec in np_list:
        NPRO, _, pad_s = spec.partition("@")
        NPRO = int(NPRO)
        NPP = int(pad_s) if pad_s else NPRO
        N = NPP + NL
        fits = block_denoiser_fits(N, K, H, NL)
        TI = pick_tile(N)
        h, x, idx, nmask, mlig, flags = kernel_inputs(
            "pocket", B, NPRO, NL, K, H,
            npro_pad=NPP if pad_s else None,
        )
        h = jnp.asarray(h).astype(jnp.bfloat16)
        x, idx = jnp.asarray(x), jnp.asarray(idx)
        nmask, mlig = jnp.asarray(nmask), jnp.asarray(mlig)
        fl = jnp.asarray(flags)

        def run(hh):
            return block_denoiser(
                hh, x, idx, nmask, mlig, offsets, ew_p, block_p,
                num_layers=L, n_heads=heads, coeff=coeff, dtype=jnp.bfloat16,
                n_ligand=NL, tile_flags=fl, need_full_h=False,
            )

        t0 = time.time()
        try:
            ho, xo = run(h)
            np.asarray(xo[0, 0, 0])
        except Exception as e:
            print(f"NP={spec} (N={N}, TI={TI}, fits={fits}): FAILED "
                  f"{type(e).__name__}: {e}", flush=True)
            continue
        med = chain_time(run, h, reps)
        results[spec] = med
        print(f"NP={spec} (N={N}, TI={TI}, mega_fits={fits}): "
              f"{med:8.2f} ms/call -> {B/med:.3f} mol/s at 1000 steps "
              f"(compile {time.time()-t0:.0f}s)", flush=True)

    if set(results) == {'384', '512', '640'}:
        # size-weighted: pockets uniform in [300, 600] -> padded NP buckets
        # 384 (300-384), 512 (385-512), 640 (513-600) with widths 85/128/88
        w = np.array([85, 128, 88], float)
        w /= w.sum()
        t = float((w * np.array([results['384'], results['512'], results['640']])).sum())
        print(f"size-weighted test-set estimate: {t:.1f} ms/step -> "
              f"{B/t:.3f} mol/s (1000-step DDPM, batch {B})")


if __name__ == "__main__":
    main()

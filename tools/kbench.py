"""Megakernel microbenchmark: time ONE block_denoiser call on the real TPU.

Usage: python tools/kbench.py [N_protein] [tile] [batch] [reps] [ablate,...] [geom]

geom: rand (default; uniform idx, all tiles dirty — v8-equivalent) or
pocket (realistic CrossDocked-like geometry + real kNN + per-tile work
flags + need_full_h=False — the v9 sampling configuration; see tools/_geom.py)

ablate options (comma-separated; timing attribution only — changes results):
regeo, x2h, h2x, init, gather, ln, soft, w2, sa_avm, sa_den, lndots, lnfull

Times the fused denoiser block alone (no sampler glue / kNN). Reps CHAIN
h_out -> h_in with a single scalar sync at the end: a per-rep
`np.asarray(out)` fetch costs ~100 ms over the axon tunnel and swamps the
kernel time (discovered round 3 — all earlier kbench figures carry that
constant). One TPU process at a time — do not run concurrently with bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.models.fast_forward import extract_block_params
    from targetdiff_tpu.ops.pallas.block_denoiser import block_denoiser
    from targetdiff_tpu.ops.rbf import gaussian_smearing_offsets
    from __graft_entry__ import _flagship

    NPRO = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 104
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    ablate = tuple(a for a in (sys.argv[5].split(",") if len(sys.argv) > 5 else ()) if a)
    geom = sys.argv[6] if len(sys.argv) > 6 else "rand"
    NL = 32
    N = NPRO + NL
    K, H, L, heads = 32, 128, 9, 16

    model, b = _flagship(num_timesteps=1000, max_protein=NPRO, max_ligand=NL, batch=2)
    params = model.init(jax.random.PRNGKey(0), b)
    rp = params["params"]["refine_net"]
    ew_p, block_p = extract_block_params(rp, L, H, 20, dtype=jnp.bfloat16)
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)

    from _geom import kernel_inputs

    h, x, idx, nmask, mlig, flags = kernel_inputs(geom, B, NPRO, NL, K, H)
    h = jnp.asarray(h).astype(jnp.bfloat16)
    x, idx = jnp.asarray(x), jnp.asarray(idx)
    nmask, mlig = jnp.asarray(nmask), jnp.asarray(mlig)
    flags = None if flags is None else jnp.asarray(flags)

    def run(hh):
        return block_denoiser(
            hh, x, idx, nmask, mlig, offsets, ew_p, block_p,
            num_layers=L, n_heads=heads, coeff=coeff, dtype=jnp.bfloat16,
            tile=tile, n_ligand=NL, ablate=ablate,
            tile_flags=flags, need_full_h=flags is None,
        )

    t0 = time.time()
    ho, xo = run(h)
    np.asarray(xo[0, 0, 0])
    print(f"compile+first: {time.time()-t0:.1f}s  (N={N} tile={tile} B={B} ablate={ablate})")

    rounds = []
    for _ in range(3):
        hh = h
        t0 = time.time()
        for _ in range(reps):
            ho, xo = run(hh)
            hh = ho
        np.asarray(xo[0, 0, 0])  # scalar sync: drains the dispatch queue
        rounds.append((time.time() - t0) / reps)
    med = min(rounds)
    print(f"block_denoiser: {med*1e3:.2f} ms/call  ({med/B*1e6:.1f} us/complex)  "
          f"rounds={[f'{r*1e3:.2f}' for r in rounds]}")


if __name__ == "__main__":
    main()

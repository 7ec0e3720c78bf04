"""Batch-size amortization duel: per-MOLECULE denoiser cost at several
batch sizes, in ONE process (chip drift makes cross-process comparisons
invalid). The megakernel grids over complexes, so per-complex compute is
flat — what amortizes with B is the per-call launch floor (~4 ms measured
by kablate) and the XLA glue (kNN, scan plumbing).

Usage: python tools/kbatch.py [NPRO] [reps] [B1,B2,...]
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
    from _geom import kernel_inputs

    NPRO = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batches = [int(b) for b in (sys.argv[3] if len(sys.argv) > 3 else "100,200").split(",")]
    NL, K, H, L, heads, tile = 32, 32, 128, 9, 16, 104

    model, b = _flagship(num_timesteps=1000, max_protein=NPRO, max_ligand=NL, batch=2)
    params = model.init(jax.random.PRNGKey(0), b)
    ew_p, block_p = extract_block_params(
        params["params"]["refine_net"], L, H, 20, dtype=jnp.bfloat16
    )
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)

    per_mol = {}
    for B in batches:
        h, x, idx, nmask, mlig, flags = kernel_inputs(
            "pocket", B, NPRO, NL, K, H
        )
        h = jnp.asarray(h).astype(jnp.bfloat16)
        x, idx = jnp.asarray(x), jnp.asarray(idx)
        nmask, mlig = jnp.asarray(nmask), jnp.asarray(mlig)
        flags = jnp.asarray(flags)

        def run(hh):
            return block_denoiser(
                hh, x, idx, nmask, mlig, offsets, ew_p, block_p,
                num_layers=L, n_heads=heads, coeff=coeff, dtype=jnp.bfloat16,
                tile=tile, rtile=104, n_ligand=NL, tile_flags=flags,
                need_full_h=False,
            )

        t0 = time.time()
        ho, xo = run(h)
        np.asarray(xo[0, 0, 0])
        compile_s = time.time() - t0
        meds = []
        for _ in range(3):
            hh = h
            t0 = time.time()
            for _ in range(reps):
                ho2, xo2 = run(hh)
                hh = ho2
            np.asarray(xo2[0, 0, 0])
            meds.append((time.time() - t0) / reps)
        ms = min(meds) * 1e3
        per_mol[B] = ms / B
        print(f"B={B:<4} {ms:8.2f} ms/call  {ms/B:6.3f} ms/mol  "
              f"(compile {compile_s:.0f}s)", flush=True)
    b0 = batches[0]
    for B in batches[1:]:
        d = per_mol[b0] - per_mol[B]
        print(f"B={B} vs B={b0}: {d:+.3f} ms/mol ({100*d/per_mol[b0]:.1f}%)")


if __name__ == "__main__":
    main()

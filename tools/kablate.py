"""Megakernel phase-ablation sweep: time block_denoiser under each ablate
config in ONE process (each variant pays its own remote compile).

Usage: python tools/kablate.py [N_protein] [tile] [batch] [reps] [cfgs]

cfgs: semicolon-separated ablate configs (e.g. "base;soft;ln,init"),
overriding the default sweep. "base" = no ablation.

Timing methodology (round 3): the naive per-rep `np.asarray(out)` fetch
costs ~100 ms over the axon tunnel and swamped every prior kbench number.
Here each rep CHAINS h_out -> h_in (async dispatch, no host round-trip) and
the clock stops on a single 4-byte scalar fetch after `reps` calls, so the
per-call figure is true device throughput.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    (),
    ("x2h", "h2x", "regeo", "init"),  # empty kernel: streaming+launch floor
    ("gather",),
    ("ln",),
    ("soft",),
    ("w2",),
    ("regeo",),
    ("h2x",),
    ("init",),
]


def chain_time(run, h0, reps):
    """Median of 3 rounds of `reps` chained calls with one scalar sync."""
    meds = []
    for _ in range(3):
        hh = h0
        t0 = time.time()
        for _ in range(reps):
            ho, xo = run(hh)
            hh = ho
        np.asarray(xo[0, 0, 0])  # scalar sync: drains the dispatch queue
        meds.append((time.time() - t0) / reps)
    return min(meds) * 1e3


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
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    configs = CONFIGS
    if len(sys.argv) > 5:
        configs = [
            () if c == "base" else tuple(c.split(","))
            for c in sys.argv[5].split(";")
        ]
    NL = 32
    N = NPRO + NL
    K, H, L, heads = 32, 128, 9, 16

    model, b = _flagship(num_timesteps=1000, max_protein=NPRO, max_ligand=NL, batch=2)
    params = model.init(jax.random.PRNGKey(0), b)
    rp = params["params"]["refine_net"]
    ew_p, block_p = extract_block_params(rp, L, H, 20, dtype=jnp.bfloat16)
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32)).astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 4)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
    nmask = jnp.asarray(rng.random((B, N, K)) > 0.1)
    mlig = jnp.asarray(np.arange(N)[None, :] >= NPRO).astype(jnp.bool_)
    mlig = jnp.broadcast_to(mlig, (B, N))

    base = None
    for ab in configs:
        def run(hh):
            return block_denoiser(
                hh, x, idx, nmask, mlig, offsets, ew_p, block_p,
                num_layers=L, n_heads=heads, coeff=coeff, dtype=jnp.bfloat16,
                tile=tile, n_ligand=NL, ablate=ab,
            )

        t0 = time.time()
        try:
            ho, xo = run(h)
            np.asarray(xo[0, 0, 0])
        except Exception as e:  # keep sweeping on a bad variant
            print(f"{','.join(ab) or 'baseline':<28} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        ct = time.time() - t0
        med = chain_time(run, h, reps)
        if ab == ():
            base = med
        delta = f"  d={base - med:+7.2f} ms" if base is not None and ab else ""
        print(f"{','.join(ab) or 'baseline':<28} {med:8.2f} ms/call"
              f"  (compile {ct:.0f}s){delta}", flush=True)


if __name__ == "__main__":
    main()

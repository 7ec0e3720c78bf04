"""Same-process duel of block_denoiser configurations (the chip drifts
10-100% between sessions — only same-process comparisons are valid).

Usage: python tools/kduel.py [NPRO] [B] [reps] [lig_sigma] [SPECS]

Times, in ONE process on the SAME pocket-geometry inputs:
  all-dirty   flags = ones (v8-equivalent work)
  flags       real compute_tile_flags + need_full_h=False (v9 sampling mode)
and prints the delta. lig_sigma adds Gaussian noise to ligand positions
(mimics mid-diffusion states where more tiles are dirty).

SPECS (optional): comma-separated extra v9 rows "TILE/RTILE", e.g.
`python tools/kduel.py 512 100 10 0 136/136,32/136` duels the 512-atom
class's two feasible x2h tiles (N=544 divides only by 32 and 136 in the
8-aligned <=136 range). TILE/RTILE must divide N=NPRO+32 or pick_tile
falls back to its largest feasible divisor.
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
    from targetdiff_tpu.ops.pallas.block_denoiser import block_denoiser
    from targetdiff_tpu.ops.rbf import gaussian_smearing_offsets
    from __graft_entry__ import _flagship
    from _geom import kernel_inputs

    # NPRO accepts the pocketbench "VALID@PAD" syntax, e.g. 448@512
    spec1 = sys.argv[1] if len(sys.argv) > 1 else "384"
    npro_s, _, pad_s = spec1.partition("@")
    NPRO = int(npro_s)
    NPP = int(pad_s) if pad_s else NPRO
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    lig_sigma = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    NL, K, H, L, heads, tile = 32, 32, 128, 9, 16, 104
    N = NPP + NL

    model, b = _flagship(num_timesteps=1000, max_protein=NPP, max_ligand=NL, batch=2)
    params = model.init(jax.random.PRNGKey(0), b)
    ew_p, block_p = extract_block_params(
        params["params"]["refine_net"], L, H, 20, dtype=jnp.bfloat16
    )
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)

    h, x, idx, nmask, mlig, flags = kernel_inputs(
        "pocket", B, NPRO, NL, K, H, lig_sigma=lig_sigma,
        npro_pad=NPP if NPP != NPRO else None,
    )
    h = jnp.asarray(h).astype(jnp.bfloat16)
    x, idx = jnp.asarray(x), jnp.asarray(idx)
    nmask, mlig = jnp.asarray(nmask), jnp.asarray(mlig)
    ones = jnp.ones_like(jnp.asarray(flags))
    flags = jnp.asarray(flags)

    def make(fl, nfh, rt=104, ti=None, ab=()):
        def run(hh):
            return block_denoiser(
                hh, x, idx, nmask, mlig, offsets, ew_p, block_p,
                num_layers=L, n_heads=heads, coeff=coeff, dtype=jnp.bfloat16,
                tile=ti if ti is not None else tile, rtile=rt, n_ligand=NL,
                tile_flags=fl, need_full_h=nfh, ablate=ab,
            )
        return run

    rows = [
        ("all-dirty", ones, True, 104, None, ()),
        ("flags", flags, False, 104, None, ()),
        ("flags-rt32", None, False, 32, None, ()),
    ]
    if len(sys.argv) > 5:  # extra rows: "136/136" tile/rtile, "v10", "v10@32"
        specs = sys.argv[5]
        if specs.startswith("only:"):  # skip the 3 default rows (3 compiles)
            rows = []
            specs = specs[5:]
        for spec in specs.split(","):
            # any row accepts "+abl1+abl2" ablate suffixes (duel stand-ins,
            # e.g. "v10@32+bstagefull" = the pre-v10.1 full-N pass-B stage)
            parts = spec.split("+")
            head, ab = parts[0], tuple(parts[1:])
            if head.startswith("v10"):  # per-layer dependency-cone flags,
                # optionally at forced tiles ("v10@32" x2h, "v10@32/52" x2h/
                # regeo); "v10d" forces the regeo block back to dirty-only
                # (pre-v10.1, for duels)
                mode, _, ti_s = head.partition("@")
                ti_rt = ti_s.split("/") if ti_s else []
                ti_v = int(ti_rt[0]) if ti_rt else None
                rt_v = int(ti_rt[1]) if len(ti_rt) > 1 else 104
                rows.append((f"flags-{spec}", mode, False, rt_v, ti_v, ab))
                continue
            ti_s, _, rt_s = head.partition("/")
            ti_v, rt_v = int(ti_s), int(rt_s or ti_s)
            rows.append((f"flags-t{ti_v}/r{rt_v}{''.join('+'+a for a in ab)}",
                         None, False, rt_v, ti_v, ab))

    results = {}
    from targetdiff_tpu.ops.pallas.block_denoiser import compute_tile_flags

    from targetdiff_tpu.ops.pallas.block_denoiser import pick_tile

    for name, fl, nfh, rt, ti, ab in rows:
        if fl is None or isinstance(fl, str):  # flags sized for this row
            mode = fl
            v10 = isinstance(mode, str) and mode.startswith("v10")
            fl = compute_tile_flags(idx, nmask, NL,
                                    tile=ti if ti is not None else tile,
                                    rtile=rt,
                                    num_layers=L if v10 else None)
            if mode == "v10d":  # pre-v10.1 regeo: dirty-only, every layer
                TRd = N // pick_tile(N, rt)
                f9 = compute_tile_flags(idx, nmask, NL,
                                        tile=ti if ti is not None else tile,
                                        rtile=rt)
                fl = fl.at[:, : L * TRd].set(jnp.tile(f9[:, :TRd], (1, L)))
        run = make(fl, nfh, rt, ti, ab)
        t0 = time.time()
        try:
            ho, xo = run(h)
            np.asarray(xo[0, 0, 0])
        except ValueError as e:  # VMEM budget at this tile
            print(f"{name:<16} does not fit: {e}", flush=True)
            continue
        med = chain_time(run, h, reps)
        results[name] = med
        print(f"{name:<16} {med:8.2f} ms/call  (compile {time.time()-t0:.0f}s)",
              flush=True)
    if "all-dirty" in results:
        best = min(v for k, v in results.items() if k != "all-dirty")
        d = results["all-dirty"] - best
        print(f"best-flags delta: {d:+.2f} ms "
              f"({100*d/results['all-dirty']:.1f}%)")


if __name__ == "__main__":
    main()

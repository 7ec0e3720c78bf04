"""Attribute sampling-step time on device: full step vs kernel-only vs kNN.

Usage: python tools/stepbench.py [mode ...] — modes: full kernel knn glue
(default: all). Each mode times a 100-iteration `lax.scan` dispatched once
(matching bench.py's chunked sampler), so axon-tunnel fetch costs amortize
to ~1 ms/step and the numbers are true device time.

One TPU process at a time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 100


def timed_scan(make_scan, label):
    import jax

    fn = jax.jit(make_scan)
    t0 = time.time()
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append((time.time() - t0) / STEPS)
    best = min(times) * 1e3
    print(f"{label:<10} {best:8.2f} ms/step   (compile+first {compile_s:.0f}s)",
          flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.models.fast_forward import extract_block_params
    from targetdiff_tpu.ops.pallas.block_denoiser import block_denoiser
    from targetdiff_tpu.ops.pallas.knn import knn_graph_pallas
    from targetdiff_tpu.ops.rbf import gaussian_smearing_offsets
    from targetdiff_tpu.sampling import init_ligand_state
    from __graft_entry__ import _flagship

    args = sys.argv[1:]
    VALID, NPRO = 330, 384
    if args and "@" in args[0]:  # pocketbench "VALID@PAD" size syntax
        v_s, _, p_s = args[0].partition("@")
        VALID, NPRO = int(v_s), int(p_s)
        args = args[1:]
    modes = args or ["full", "kernel", "knn"]
    B, NL = 100, 32
    N = NPRO + NL
    K, H, L, heads = 32, 128, 9, 16

    model, b = _flagship(num_timesteps=1000, max_protein=NPRO, max_ligand=NL, batch=B)
    model.net = model.net.clone(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    # realistic pocket geometry, matching bench.py (round 4): the v9 kernel
    # skips work from per-step graph structure
    from targetdiff_tpu.data.synth import synth_batch

    b = synth_batch(rng, B, max_protein=NPRO, max_ligand=NL,
                    n_protein_range=(VALID, VALID + 1),
                    n_ligand_range=(18, 28))
    params = model.init(jax.random.PRNGKey(0), b)
    key = jax.random.PRNGKey(1)
    init_pos, init_v = init_ligand_state(key, b, model.num_classes)

    if "full" in modes:
        def full_scan():
            r = model.sample_diffusion(
                params, key, b, init_pos, init_v, num_steps=STEPS,
                impl="fast", dtype=jnp.bfloat16, scan_chunk=None,
            )
            return r.pos

        timed_scan(full_scan, "full")

    rp = params["params"]["refine_net"]
    ew_p, block_p = extract_block_params(rp, L, H, 20, dtype=jnp.bfloat16)
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)
    h0 = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32)).astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 4)
    idx0 = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
    nm0 = jnp.asarray(rng.random((B, N, K)) > 0.1)
    mlig = jnp.broadcast_to(
        jnp.asarray(np.arange(N)[None, :] >= NPRO), (B, N)
    )

    if "kernel" in modes:
        def kernel_scan():
            def step(carry, _):
                hh, xx = carry
                ho, xo = block_denoiser(
                    hh, xx, idx0, nm0, mlig, offsets, ew_p, block_p,
                    num_layers=L, n_heads=heads, coeff=coeff,
                    dtype=jnp.bfloat16, n_ligand=NL,
                )
                return (ho, xo), None

            (ho, xo), _ = jax.lax.scan(step, (h0, x0), None, length=STEPS)
            return xo

        timed_scan(kernel_scan, "kernel")

    if "knn" in modes:
        allv = jnp.ones((B, N), bool)

        def knn_scan():
            def step(xx, _):
                idx, _nm = knn_graph_pallas(xx, allv, k=K)
                # tiny data dependence so the scan can't be collapsed
                return xx + idx[:, :1, :3].astype(jnp.float32) * 1e-9, None

            xx, _ = jax.lax.scan(step, x0, None, length=STEPS)
            return xx

        timed_scan(knn_scan, "knn")


if __name__ == "__main__":
    main()

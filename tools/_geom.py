"""Shared synthetic-geometry builders for the kernel benchmarks.

geom modes:
  rand    legacy: uniform-random kNN indices (no spatial structure; every
          tile dirty -> measures the v8-equivalent all-dirty path)
  pocket  realistic CrossDocked-like pocket: ligand = 1.5 A random walk,
          protein = uniform ~0.1 atom/A^3 shell 2-10 A from the ligand
          (the pocket10 extraction rule), protein rows sorted by DESCENDING
          distance to the pocket centroid so ligand-adjacent rows sit next
          to the ligand tail (maximizes clean regeo tiles); kNN computed
          from the geometry.
"""

import numpy as np


def pocket_positions(rng, NP, NL, lig_sigma=0.0):
    """One realistic pocket: returns (ppos [NP,3] sorted desc-by-centroid-
    distance, lpos [NL,3]). lig_sigma > 0 adds Gaussian noise to the ligand
    (mimics mid-diffusion states)."""
    steps = rng.normal(size=(NL, 3))
    steps /= np.linalg.norm(steps, axis=1, keepdims=True) + 1e-9
    lpos = np.cumsum(steps * 1.5, 0).astype(np.float32)
    lpos -= lpos.mean(0)
    cand = rng.uniform(-14, 14, size=(NP * 40, 3)).astype(np.float32)
    d = np.sqrt(((cand[:, None] - lpos[None]) ** 2).sum(-1)).min(1)
    keep = cand[(d > 2.0) & (d < 10.0)]
    while len(keep) < NP:  # top up (rare)
        extra = rng.uniform(-14, 14, size=(NP * 40, 3)).astype(np.float32)
        de = np.sqrt(((extra[:, None] - lpos[None]) ** 2).sum(-1)).min(1)
        keep = np.concatenate([keep, extra[(de > 2.0) & (de < 10.0)]])
    ppos = keep[:NP]
    if lig_sigma > 0:
        lpos = lpos + rng.normal(size=lpos.shape).astype(np.float32) * lig_sigma
    # sort by DESCENDING min-distance-to-ligand-atom (the production sort in
    # fast_forward): ligand-edge sources cluster adjacent to the ligand tail
    dmin = np.sqrt(((ppos[:, None] - lpos[None]) ** 2).sum(-1)).min(1)
    order = np.argsort(-dmin)
    return ppos[order], lpos


def kernel_inputs(geom, B, NPRO, NL, K, H, seed=0, lig_sigma=0.0,
                  npro_pad=None):
    """Build (h, x, idx, nmask, mlig, flags) numpy arrays for kbench/kablate.
    flags is None for geom='rand' (caller uses the all-dirty default).
    npro_pad > NPRO pads the protein block with masked rows (valid-vs-padded
    duels, e.g. 512 valid atoms at N=544/TI32 vs the same atoms at
    N=576/TI96)."""
    import jax.numpy as jnp

    from targetdiff_tpu.ops import graph as G
    from targetdiff_tpu.ops.pallas.block_denoiser import compute_tile_flags

    NPP = NPRO if npro_pad is None else npro_pad
    assert NPP >= NPRO
    N = NPP + NL
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(B, N, H)).astype(np.float32)
    mlig = np.broadcast_to(np.arange(N)[None, :] >= NPP, (B, N))
    if geom == "rand":
        assert npro_pad is None
        x = rng.normal(size=(B, N, 3)).astype(np.float32) * 4
        idx = rng.integers(0, N, (B, N, K)).astype(np.int32)
        nmask = rng.random((B, N, K)) > 0.1
        return h, x, idx, nmask, mlig, None
    assert geom == "pocket", geom
    x = np.zeros((B, N, 3), np.float32)
    node_mask = np.ones((B, N), bool)
    node_mask[:, NPRO:NPP] = False  # padded protein rows
    for b in range(B):
        pp, lp = pocket_positions(rng, NPRO, NL, lig_sigma=lig_sigma)
        x[b, :NPRO] = pp
        x[b, NPP:] = lp
    nbh = G.knn_graph(jnp.asarray(x), jnp.asarray(node_mask), K)
    idx = np.asarray(nbh.idx)
    nmask = np.asarray(nbh.mask)
    flags = np.asarray(compute_tile_flags(jnp.asarray(idx), jnp.asarray(nmask), NL))
    from targetdiff_tpu.ops.pallas.block_denoiser import pick_tile

    TR = N // pick_tile(N, 104)
    T = flags.shape[-1] - TR
    print(f"[geom=pocket] clean regeo tiles/complex: "
          f"{TR - flags[:, :TR].sum(-1).mean():.2f}/{TR}, "
          f"dead last-x2h tiles: {T - flags[:, TR:].sum(-1).mean():.2f}/{T}")
    return h, x, idx, nmask, mlig, flags

"""v9 megakernel work flags: dirty-tile regeo skip + last-x2h tile skip.

The flags are EXACT graph properties (compute_tile_flags), so skipping must
not change any consumed output: clean tiles' geometry caches stay valid by
construction, and last-x2h-dead tiles' h is consumed by nothing when
need_full_h=False. Verified in interpret mode on a two-cluster geometry
where half the tiles are genuinely clean.
"""

import jax
import jax.numpy as jnp
import numpy as np

from targetdiff_tpu.models.fast_forward import extract_block_params
from targetdiff_tpu.ops import graph as G
from targetdiff_tpu.ops.pallas.block_denoiser import (
    block_denoiser,
    compute_tile_flags,
    pick_tile,
)
from targetdiff_tpu.ops.rbf import gaussian_smearing_offsets
from __graft_entry__ import _flagship

B, NPRO, NL, K, H, L, HEADS, TILE = 2, 24, 8, 4, 128, 3, 16, 8
N = NPRO + NL


def _geometry():
    """Protein rows 0..15 = far cluster (100 A away, never neighbors of the
    ligand side), 16..23 = near cluster; ligand tail at the origin."""
    rng = np.random.default_rng(0)
    x = np.zeros((B, N, 3), np.float32)
    x[:, :16] = rng.normal(size=(B, 16, 3)) * 2 + np.array([100.0, 0, 0])
    x[:, 16:24] = rng.normal(size=(B, 8, 3)) * 2
    x[:, 24:] = rng.normal(size=(B, NL, 3))
    nbh = G.knn_graph(jnp.asarray(x), jnp.ones((B, N), bool), K)
    return jnp.asarray(x), nbh.idx, nbh.mask


def _params_and_run(x, idx, nmask, flags, need_full_h):
    model, b = _flagship(num_timesteps=10, max_protein=NPRO, max_ligand=NL, batch=2)
    params = model.init(jax.random.PRNGKey(0), b)
    ew_p, block_p = extract_block_params(
        params["params"]["refine_net"], L, H, 20, dtype=jnp.float32
    )
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
    mlig = jnp.asarray(np.broadcast_to(np.arange(N)[None] >= NPRO, (B, N)))
    return block_denoiser(
        h, x, idx, nmask, mlig, offsets, ew_p, block_p,
        num_layers=L, n_heads=HEADS, coeff=coeff, dtype=jnp.float32,
        interpret=True, tile=TILE, rtile=TILE, n_ligand=NL,
        tile_flags=flags, need_full_h=need_full_h,
    )


def test_flags_match_bruteforce():
    x, idx, nmask = _geometry()
    flags = np.asarray(compute_tile_flags(idx, nmask, NL, tile=TILE, rtile=TILE))
    TI = pick_tile(N, TILE)
    T = N // TI
    assert T == 4
    idx_np, m_np = np.asarray(idx), np.asarray(nmask)
    NPAD = N - NL
    for b in range(B):
        dirty_row = ((idx_np[b] >= NPAD) & m_np[b]).any(-1) | (np.arange(N) >= NPAD)
        src_of_lig = np.zeros(N, bool)
        for r in range(NPAD, N):
            src_of_lig[idx_np[b, r][m_np[b, r]]] = True
        need_row = src_of_lig | (np.arange(N) >= NPAD)
        for t in range(T):
            sl = slice(t * TI, (t + 1) * TI)
            assert flags[b, t] == int(dirty_row[sl].any()), (b, t)
            assert flags[b, T + t] == int(need_row[sl].any()), (b, t)
    # the far cluster (tiles 0-1) must actually be clean, or the test is vacuous
    assert flags[:, 0:2].sum() == 0 and flags[:, T : T + 2].sum() == 0


def test_skip_is_exact_for_consumed_outputs():
    x, idx, nmask = _geometry()
    flags = compute_tile_flags(idx, nmask, NL, tile=TILE, rtile=TILE)
    h_full, x_full = _params_and_run(x, idx, nmask, None, True)  # all-dirty v8
    h_flag, x_flag = _params_and_run(x, idx, nmask, flags, True)
    # regeo skip alone changes NOTHING (clean tiles recompute identical values)
    np.testing.assert_allclose(np.asarray(x_flag), np.asarray(x_full), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h_flag), np.asarray(h_full), atol=1e-5, rtol=1e-5
    )

    h_s, x_s = _params_and_run(x, idx, nmask, flags, False)  # + last-x2h skip
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_full), atol=1e-6)
    # ligand h (everything sampling consumes) must be exact; skipped protein
    # tiles' h is documented-stale
    np.testing.assert_allclose(
        np.asarray(h_s[:, NPRO:]), np.asarray(h_full[:, NPRO:]),
        atol=1e-5, rtol=1e-5,
    )
    # live protein tiles (flagged) must also be exact
    T = N // pick_tile(N, TILE)
    fl = np.asarray(flags)
    for b in range(B):
        for t in range(N // pick_tile(N, TILE)):
            if fl[b, T + t]:
                sl = slice(t * pick_tile(N, TILE), (t + 1) * pick_tile(N, TILE))
                np.testing.assert_allclose(
                    np.asarray(h_s[b, sl]), np.asarray(h_full[b, sl]),
                    atol=1e-5, rtol=1e-5,
                )


# ---- v10: per-layer dependency-cone flags (round 5) ------------------------


def _line_geometry():
    """All rows on a line, ligand block continuing the protein chain: hop
    distance to the ligand grows ~2 rows per hop under kNN-4 (sources of d
    are d-2..d+2), so tiles transition live->dead across layers."""
    rng = np.random.default_rng(2)
    x = np.zeros((B, N, 3), np.float32)
    x[:, :, 0] = np.arange(N)[None, :] * 1.5
    x += rng.normal(size=x.shape).astype(np.float32) * 0.01
    nbh = G.knn_graph(jnp.asarray(x), jnp.ones((B, N), bool), K)
    return jnp.asarray(x), nbh.idx, nbh.mask


def _tile_live_bruteforce(idx_np, m_np, n_ligand, L, TI):
    """Reference tile-level cone: sweep 1 = the v9 rule (tile has ligand
    rows or a source row of a ligand-destination edge); each further sweep
    adds source tiles of any valid edge out of a reached destination tile."""
    Nn = idx_np.shape[0]
    T = Nn // TI
    NPAD = Nn - n_ligand
    live = np.zeros(T, bool)
    live[NPAD // TI :] = True
    for d in range(NPAD, Nn):
        for k in range(idx_np.shape[1]):
            if m_np[d, k]:
                live[idx_np[d, k] // TI] = True
    adj = np.zeros((T, T), bool)
    for d in range(Nn):
        for k in range(idx_np.shape[1]):
            if m_np[d, k]:
                adj[d // TI, idx_np[d, k] // TI] = True
    lives = [live.copy()]
    for _ in range(L - 1):
        r = lives[-1]
        lives.append(r | (adj & r[:, None]).any(0))
    return lives  # lives[k] == "hop <= k+1"


def test_per_layer_cone_flags_match_bfs():
    L5 = 5
    x, idx, nmask = _line_geometry()
    flags = np.asarray(
        compute_tile_flags(idx, nmask, NL, tile=TILE, rtile=TILE, num_layers=L5)
    )
    TI = pick_tile(N, TILE)
    T = N // TI
    # v10 layout: [L*TR regeo-cone | L*T x2h cone], TR == T at this tile size
    assert flags.shape == (B, L5 * T + L5 * T)
    idx_np, m_np = np.asarray(idx), np.asarray(nmask)
    NPAD = N - NL
    for b in range(B):
        lives = _tile_live_bruteforce(idx_np[b], m_np[b], NL, L5, TI)
        dirty_row = ((idx_np[b] >= NPAD) & m_np[b]).any(-1) | (
            np.arange(N) >= NPAD
        )
        dirty = dirty_row.reshape(T, TI).any(-1)
        for l in range(L5):
            want = lives[L5 - 1 - l].astype(int)  # layer l: hop <= L-l
            np.testing.assert_array_equal(
                flags[b, L5 * T + l * T : L5 * T + (l + 1) * T], want,
                err_msg=f"x2h {b},{l}",
            )
            # regeo block = dirty AND cone-live (overlap is identity here)
            np.testing.assert_array_equal(
                flags[b, l * T : (l + 1) * T],
                (dirty & lives[L5 - 1 - l]).astype(int),
                err_msg=f"regeo {b},{l}",
            )
        # monotone: once dead, stays dead at later layers
        live = flags[b, L5 * T:].reshape(L5, T)
        assert (live[1:] <= live[:-1]).all()
    # the geometry must actually produce a live->dead transition per layer
    live = flags[0, L5 * T:].reshape(L5, T)
    assert live[0].sum() > live[-1].sum() >= 1
    # layer L-1 reduces exactly to the v9 last-x2h rule
    v9 = np.asarray(compute_tile_flags(idx, nmask, NL, tile=TILE, rtile=TILE))
    np.testing.assert_array_equal(live[-1], v9[0, T:])


def test_regeo_cone_mixed_granularity():
    """TIR != TI (e.g. production 104 vs 32): the regeo-cone must OR over
    every x2h tile sharing rows with the regeo tile."""
    L5 = 4
    x, idx, nmask = _line_geometry()
    TIR2 = 2 * TILE
    flags = np.asarray(
        compute_tile_flags(idx, nmask, NL, tile=TILE, rtile=TIR2,
                           num_layers=L5)
    )
    TI = pick_tile(N, TILE)
    T = N // TI
    TR = N // pick_tile(N, TIR2)
    assert flags.shape == (B, L5 * TR + L5 * T)
    idx_np, m_np = np.asarray(idx), np.asarray(nmask)
    NPAD = N - NL
    for b in range(B):
        lives = _tile_live_bruteforce(idx_np[b], m_np[b], NL, L5, TI)
        dirty_row = ((idx_np[b] >= NPAD) & m_np[b]).any(-1) | (
            np.arange(N) >= NPAD
        )
        dirty_r = dirty_row.reshape(TR, N // TR).any(-1)
        ratio = T // TR
        for l in range(L5):
            xl = lives[L5 - 1 - l].reshape(TR, ratio).any(-1)
            np.testing.assert_array_equal(
                flags[b, l * TR : (l + 1) * TR],
                (dirty_r & xl).astype(int), err_msg=f"{b},{l}",
            )


def test_per_layer_skip_is_exact_for_ligand_outputs():
    """v10 cone skipping vs all-dirty: the sampled outputs (ligand h, all x)
    must match exactly; skipped protein rows are documented-stale."""
    L5 = 5
    x, idx, nmask = _line_geometry()

    def run(flags, need_full_h):
        model, b = _flagship(num_timesteps=10, max_protein=NPRO, max_ligand=NL, batch=2)
        params = model.init(jax.random.PRNGKey(0), b)
        ew_p, block_p = extract_block_params(
            params["params"]["refine_net"], L5, H, 20, dtype=jnp.float32
        )
        offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)
        rng = np.random.default_rng(1)
        h = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        mlig = jnp.asarray(np.broadcast_to(np.arange(N)[None] >= NPRO, (B, N)))
        return block_denoiser(
            h, x, idx, nmask, mlig, offsets, ew_p, block_p,
            num_layers=L5, n_heads=HEADS, coeff=coeff, dtype=jnp.float32,
            interpret=True, tile=TILE, rtile=TILE, n_ligand=NL,
            tile_flags=flags, need_full_h=need_full_h,
        )

    h_full, x_full = run(None, True)  # all-dirty v8
    cone = compute_tile_flags(idx, nmask, NL, tile=TILE, rtile=TILE,
                              num_layers=L5)
    h_c, x_c = run(cone, False)
    np.testing.assert_allclose(np.asarray(x_c), np.asarray(x_full), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h_c[:, NPRO:]), np.asarray(h_full[:, NPRO:]),
        atol=1e-5, rtol=1e-5,
    )


def test_per_layer_flags_rejected_with_need_full_h():
    L5 = 5
    x, idx, nmask = _line_geometry()
    cone = compute_tile_flags(idx, nmask, NL, tile=TILE, rtile=TILE,
                              num_layers=L5)
    model, b = _flagship(num_timesteps=10, max_protein=NPRO, max_ligand=NL, batch=2)
    params = model.init(jax.random.PRNGKey(0), b)
    ew_p, block_p = extract_block_params(
        params["params"]["refine_net"], L5, H, 20, dtype=jnp.float32
    )
    offsets, coeff = gaussian_smearing_offsets(0.0, 10.0, 20)
    h = jnp.zeros((B, N, H), jnp.float32)
    mlig = jnp.asarray(np.broadcast_to(np.arange(N)[None] >= NPRO, (B, N)))
    import pytest

    with pytest.raises(AssertionError):
        block_denoiser(
            h, x, idx, nmask, mlig, offsets, ew_p, block_p,
            num_layers=L5, n_heads=HEADS, coeff=coeff, dtype=jnp.float32,
            interpret=True, tile=TILE, rtile=TILE, n_ligand=NL,
            tile_flags=cone, need_full_h=True,
        )

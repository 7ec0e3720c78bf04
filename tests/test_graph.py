"""Tests of dense padded graph construction (ops/graph.py) against brute-force
NumPy reference semantics of torch_cluster knn_graph / the reference's hybrid
connection (models/common.py:165-212)."""

import jax.numpy as jnp
import numpy as np

from targetdiff_tpu.ops import graph as G


def brute_knn(pos, mask, k):
    """Brute-force kNN (source->target, no self loops) per batch row."""
    B, N, _ = pos.shape
    idx = np.zeros((B, N, k), np.int32)
    m = np.zeros((B, N, k), bool)
    for b in range(B):
        for i in range(N):
            if not mask[b, i]:
                continue
            d = np.linalg.norm(pos[b] - pos[b, i], axis=-1)
            d[~mask[b]] = np.inf
            d[i] = np.inf
            order = np.argsort(d, kind="stable")
            nn = [j for j in order[:k] if np.isfinite(d[j])]
            idx[b, i, : len(nn)] = nn
            m[b, i, : len(nn)] = True
    return idx, m


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, N, k = 3, 24, 5
    pos = rng.normal(size=(B, N, 3)).astype(np.float32) * 3
    mask = rng.random((B, N)) > 0.2
    nbh = G.knn_graph(jnp.asarray(pos), jnp.asarray(mask), k)
    ref_idx, ref_mask = brute_knn(pos, mask, k)

    got_idx = np.asarray(nbh.idx)
    got_mask = np.asarray(nbh.mask)
    np.testing.assert_array_equal(got_mask.sum(-1) * mask, ref_mask.sum(-1) * mask)
    for b in range(B):
        for i in range(N):
            if not mask[b, i]:
                assert not got_mask[b, i].any()
                continue
            # neighbor sets must match (order may differ on exact ties)
            assert set(got_idx[b, i][got_mask[b, i]]) == set(ref_idx[b, i][ref_mask[b, i]])


def test_knn_excludes_self_and_padding():
    B, N, k = 1, 10, 4
    pos = jnp.asarray(np.random.default_rng(1).normal(size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray([[True] * 6 + [False] * 4])
    nbh = G.knn_graph(pos, mask, k)
    idx, m = np.asarray(nbh.idx), np.asarray(nbh.mask)
    for i in range(6):
        nbrs = idx[0, i][m[0, i]]
        assert i not in nbrs
        assert (nbrs < 6).all()  # never a padded node
    assert not m[0, 6:].any()


def test_edge_types():
    # 2 protein + 2 ligand nodes; hand-build a neighborhood
    mask_ligand = jnp.asarray([[False, False, True, True]])
    idx = jnp.asarray([[[1, 2], [0, 3], [0, 3], [2, 0]]], jnp.int32)
    m = jnp.ones((1, 4, 2), bool)
    et = np.asarray(G.edge_types(G.Neighborhood(idx, m), mask_ligand))
    # dst=0 (protein): src 1 (protein) -> type 3; src 2 (ligand) -> type 1
    assert et[0, 0, 0].argmax() == 3
    assert et[0, 0, 1].argmax() == 1
    # dst=2 (ligand): src 0 (protein) -> 2; src 3 (ligand) -> 0
    assert et[0, 2, 0].argmax() == 2
    assert et[0, 2, 1].argmax() == 0


def test_hybrid_graph_semantics():
    rng = np.random.default_rng(2)
    NP_, NL, k = 12, 5, 3
    N = NP_ + NL
    pos = rng.normal(size=(1, N, 3)).astype(np.float32) * 4
    node_mask = np.ones((1, N), bool)
    node_mask[0, 10:12] = False  # two padded protein slots
    mask_ligand = np.zeros((1, N), bool)
    mask_ligand[0, NP_:] = True

    nbh = G.hybrid_graph(jnp.asarray(pos), jnp.asarray(node_mask), jnp.asarray(mask_ligand),
                         k=k, max_ligand=NL)
    idx, m = np.asarray(nbh.idx), np.asarray(nbh.mask)

    for i in range(NP_, N):  # ligand centers
        nbrs = set(idx[0, i][m[0, i]])
        # all other ligand atoms present
        expected_lig = set(range(NP_, N)) - {i}
        assert expected_lig <= nbrs
        # plus exactly k protein atoms (the k nearest valid ones)
        prot = [j for j in nbrs if j < NP_]
        assert len(prot) == k
        d = np.linalg.norm(pos[0, :10] - pos[0, i], axis=-1)
        assert set(prot) == set(np.argsort(d)[:k])

    for i in range(10):  # valid protein centers: plain knn among all valid
        nbrs = [j for j in idx[0, i][m[0, i]]]
        assert len(nbrs) == k
        d = np.linalg.norm(pos[0] - pos[0, i], axis=-1)
        d[~node_mask[0]] = np.inf
        d[i] = np.inf
        assert set(nbrs) == set(np.argsort(d)[:k])


def test_compose_context_order():
    B, NP_, NL, H = 2, 3, 2, 4
    hp = jnp.ones((B, NP_, H))
    hl = jnp.full((B, NL, H), 2.0)
    pp = jnp.zeros((B, NP_, 3))
    pl = jnp.ones((B, NL, 3))
    pmask = jnp.asarray([[True, True, False], [True, True, True]])
    lmask = jnp.asarray([[True, True], [True, False]])
    h, pos, mask_all, mask_lig = G.compose_context(hp, hl, pp, pl, pmask, lmask)
    assert h.shape == (B, NP_ + NL, H)
    # protein first, ligand after
    np.testing.assert_array_equal(np.asarray(mask_lig[0]), [False, False, False, True, True])
    np.testing.assert_array_equal(np.asarray(mask_lig[1]), [False, False, False, True, False])
    np.testing.assert_array_equal(
        np.asarray(mask_all[0]), [True, True, False, True, True]
    )

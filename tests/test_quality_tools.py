"""Unit tests for the quality-gate tooling (tools/quality_gate.py,
tools/prop_quality_gate.py): metric helpers and profile plumbing, CPU-only.
The full trained-vs-untrained gates run on the real chip (results committed
as quality_gate.json / prop_quality_gate.json); these tests pin the metric
math and data contracts they rely on."""

import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import quality_gate as qg  # noqa: E402


def test_atom_type_jsd_identical_and_disjoint():
    train = Counter({6: 72, 7: 12, 8: 13, 9: 3})
    assert qg._atom_type_jsd(train, train) == 0.0
    far = qg._atom_type_jsd(Counter({16: 100}), train)
    assert far is not None and far > 0.5
    assert qg._atom_type_jsd(Counter(), train) is None
    # a near-train mixture scores between the two
    near = qg._atom_type_jsd(Counter({6: 70, 7: 14, 8: 13, 9: 3}), train)
    assert 0.0 < near < far


def test_bond_jsd_common_types_only():
    from targetdiff_tpu.evaluation.eval_bond_length import (
        get_bond_length_profile,
    )

    rng = np.random.default_rng(0)
    cc = [((6, 6, 1), float(d)) for d in rng.normal(1.54, 0.02, 500)]
    co = [((6, 8, 1), float(d)) for d in rng.normal(1.43, 0.02, 500)]
    train = get_bond_length_profile(cc + co)
    # same distribution -> ~0; a 0.2 A shifted C-C -> clearly larger
    same = get_bond_length_profile(
        [((6, 6, 1), float(d)) for d in rng.normal(1.54, 0.02, 500)]
    )
    shifted = get_bond_length_profile(
        [((6, 6, 1), float(d)) for d in rng.normal(1.74, 0.02, 500)]
    )
    jsd_same, det_same = qg._bond_jsd(same, train)
    jsd_shift, det_shift = qg._bond_jsd(shifted, train)
    assert set(det_same) == {"6-6|1"}  # only the common type is compared
    assert jsd_same < 0.15 < jsd_shift
    # disjoint types -> None
    none_jsd, none_det = qg._bond_jsd(
        get_bond_length_profile([((7, 7, 1), 1.45)]), {}
    )
    assert none_jsd is None and none_det == {}


def test_bond_jsd_frequency_weighting_drops_rare_types():
    from collections import Counter

    from targetdiff_tpu.evaluation.eval_bond_length import (
        get_bond_length_profile,
    )

    rng = np.random.default_rng(1)
    cc = [((6, 6, 1), float(d)) for d in rng.normal(1.54, 0.02, 970)]
    rare = [((8, 9, 1), 1.42)] * 30  # 3% — at the min_frac cutoff edge
    train = get_bond_length_profile(cc + rare)
    counts = Counter({(6, 6, 1): 970, (8, 9, 1): 30})
    # model matches C-C, misses the rare type entirely
    model = get_bond_length_profile(
        [((6, 6, 1), float(d)) for d in rng.normal(1.54, 0.02, 500)]
        + [((8, 9, 1), 1.80)] * 5
    )
    unweighted, _ = qg._bond_jsd(model, train)
    weighted, det = qg._bond_jsd(model, train, train_counts=counts,
                                 min_frac=0.05)
    assert set(det) == {"6-6|1"}  # rare type dropped below min_frac
    assert weighted < unweighted  # the max-JSD rare type no longer dominates


def test_train_profile_contains_all_three_blocks():
    pool = qg.make_pool(seed=0, pool=8)
    prof = qg.train_profile(pool, n=8)
    assert set(prof) == {"pair", "atom", "bond", "bond_counts"}
    assert sum(prof["bond_counts"].values()) > 0
    assert "CC_2A" in prof["pair"] and "All_12A" in prof["pair"]
    # round-5 chemistry: C/N/O/F plus the S/P/Cl vocabulary
    assert set(prof["atom"]) <= {6, 7, 8, 9, 15, 16, 17}
    assert prof["atom"][6] > 0
    # tree ligands with ideal geometry must reconstruct C-C single bonds
    assert any(bt[:2] in ((6, 6),) for bt in prof["bond"])


def test_train_profile_has_aromatic_and_double_bond_rows():
    """The widened corpus must produce aromatic order-4 and order-2 bond
    types in the training profile — the rows the round-5 bond-JSD gate
    compares (reference: utils/evaluation/eval_bond_length_config.py:3-13
    spans the same aromatic types)."""
    pool = qg.make_pool(seed=0, pool=48)
    prof = qg.train_profile(pool, n=48)
    orders = {bt[2] for bt in prof["bond"]}
    assert 4 in orders, sorted(prof["bond"])
    assert 2 in orders, sorted(prof["bond"])
    # the dominant aromatic row is C-C|4
    assert (6, 6, 4) in prof["bond"]


def test_evaluate_on_train_ligands_scores_near_zero_jsd():
    """Feeding the training ligands straight through evaluate() (which now
    drives the production cli.evaluate_diffusion.evaluate_results) must
    produce tiny JSDs vs their own profile and high stability — the fixed
    point the trained-model gate is anchored to."""
    pool = qg.make_pool(seed=1, pool=16)
    prof = qg.train_profile(pool, n=16)
    mols = qg.corpus_mols(pool, 16)
    ev = qg.evaluate(mols, prof)
    assert ev["recon_success"] == 1.0
    assert ev["atom_stable"] > 0.93
    assert ev["atom_type_jsd_vs_train"] < 0.1
    assert ev["bond_jsd_vs_train"] < 0.1
    assert ev["pair_jsd_vs_train"] < 0.2
    # the corpus's own aromatic systems reconstruct to aromatic rings
    assert ev["n_aromatic_predicted"] > 0
    assert ev["ring_recovery"] >= 0.9
    assert ev["n_classes"] >= 8


def test_broken_aromatics_trip_the_gate():
    """Deliberately-broken aromatic channels must FAIL the gate's aromatic
    checks (VERDICT r4 #1 sanity requirement): (a) a type-channel regression
    that stops emitting aromatic classes, (b) a geometry regression that
    scatters the ring atoms."""
    pool = qg.make_pool(seed=2, pool=24)
    prof = qg.train_profile(pool, n=24)
    mols = qg.corpus_mols(pool, 24)
    clean = qg.evaluate(mols, prof)
    checks_clean = qg.gate_checks(clean, clean)
    assert checks_clean["ring_recovery"] and checks_clean["aromatics_emitted"]
    assert checks_clean["class_coverage"]

    # (a) aromatic classes silently mapped to their non-aromatic twins
    # (6,True)->(6,False) etc: indices 2->1, 4->3, 6->5, 9->8, 11->10
    demote = {2: 1, 4: 3, 6: 5, 9: 8, 11: 10}
    broken_v = [
        {"pos": m["pos"], "v": np.array([demote.get(int(x), int(x)) for x in m["v"]])}
        for m in mols
    ]
    ev_a = qg.evaluate(broken_v, prof)
    assert not qg.gate_checks(ev_a, ev_a)["aromatics_emitted"]

    # (b) ring geometry destroyed (atoms jittered 1.5 A): flagged aromatic
    # systems no longer reconstruct to rings
    rng = np.random.default_rng(0)
    broken_g = [
        {"pos": m["pos"] + rng.normal(0, 1.5, m["pos"].shape), "v": m["v"]}
        for m in mols
    ]
    ev_b = qg.evaluate(broken_g, prof)
    assert not qg.gate_checks(ev_b, ev_b)["ring_recovery"]


def test_prop_gate_dataset_signal_is_structural():
    """The planted affinity must correlate with the structural features it
    is built from, and splits must be disjoint."""
    import prop_quality_gate as pq

    b, y, contacts_ret = pq.make_dataset(seed=0)
    assert y.shape == (pq.POOL + pq.TEST,)
    assert 0.8 < float(np.std(y)) < 1.3
    # rebuild the contact feature and check correlation survives the noise
    ppos = np.asarray(b.protein_pos)
    pmask = np.asarray(b.protein_mask)
    lpos = np.asarray(b.ligand_pos)
    lmask = np.asarray(b.ligand_mask)
    contacts = []
    for i in range(len(y)):
        lp = lpos[i][lmask[i]]
        pp = ppos[i][pmask[i]]
        d = np.sqrt(((lp[:, None] - pp[None]) ** 2).sum(-1))
        contacts.append((d < 4.5).sum() / max(len(lp), 1))
    np.testing.assert_allclose(contacts, contacts_ret)
    r = np.corrcoef(contacts, y)[0, 1]
    assert r > 0.4

    batches = pq.make_prop_batches(b, y, np.arange(pq.POOL))
    tb = batches[0]
    assert tb.ligand_feat.shape[-1] == 13
    assert tb.y.shape == (pq.BATCH,)
    # kinds planted round-robin over 1..3 so the 3-way head is exercised
    kinds = np.concatenate([np.asarray(t.kind) for t in batches])
    assert set(np.unique(kinds)) == {1, 2, 3}


def test_prop_gate_auroc_helper():
    import prop_quality_gate as pq

    assert pq._auroc([2, 3, 4], [0, 1, 1.5]) == 1.0
    assert pq._auroc([0, 1], [2, 3]) == 0.0
    assert pq._auroc([1, 1], [1, 1]) == 0.5


def test_prop_gate_enc_batches_carry_features():
    """make_prop_batches with enc features populates the PropBatch fields
    the PropPredNetEnc consumes."""
    import prop_quality_gate as pq

    b, y, _ = pq.make_dataset(seed=1)
    n = pq.POOL + pq.TEST
    enc_graph = np.random.default_rng(0).normal(size=(n, 1)).astype(np.float32)
    enc_node = np.zeros((n, pq.NP_ + pq.NL, 4), np.float32)
    tb = pq.make_prop_batches(b, y, np.arange(pq.BATCH), enc_graph=enc_graph,
                              enc_node=enc_node)[0]
    assert tb.enc_graph_feat.shape == (pq.BATCH, 1)
    assert tb.enc_node_feat.shape == (pq.BATCH, pq.NP_ + pq.NL, 4)

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
    # synthetic chemistry is C/N/O/F
    assert set(prof["atom"]) <= {6, 7, 8, 9}
    assert prof["atom"][6] > 0
    # tree ligands with ideal geometry must reconstruct C-C single bonds
    assert any(bt[:2] in ((6, 6),) for bt in prof["bond"])


def test_evaluate_on_train_ligands_scores_near_zero_jsd():
    """Feeding the training ligands straight through evaluate() must produce
    tiny JSDs vs their own profile and high stability — the fixed point the
    trained-model gate is anchored to."""
    pool = qg.make_pool(seed=1, pool=16)
    prof = qg.train_profile(pool, n=16)
    lp = np.asarray(pool.ligand_pos)
    lv = np.asarray(pool.ligand_v)
    lm = np.asarray(pool.ligand_mask)
    mols = [
        {"pos": lp[i][lm[i]], "v": lv[i][lm[i]]} for i in range(16)
    ]
    ev = qg.evaluate(mols, prof)
    assert ev["recon_success"] == 1.0
    assert ev["atom_stable"] > 0.95
    assert ev["atom_type_jsd_vs_train"] < 0.1
    assert ev["bond_jsd_vs_train"] < 0.1
    assert ev["pair_jsd_vs_train"] < 0.2


def test_prop_gate_dataset_signal_is_structural():
    """The planted affinity must correlate with the structural features it
    is built from, and splits must be disjoint."""
    import prop_quality_gate as pq

    b, y = pq.make_dataset(seed=0)
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
    r = np.corrcoef(contacts, y)[0, 1]
    assert r > 0.4

    batches = pq.make_prop_batches(b, y, np.arange(pq.POOL))
    tb = batches[0]
    assert tb.ligand_feat.shape[-1] == 13
    assert tb.y.shape == (pq.BATCH,)

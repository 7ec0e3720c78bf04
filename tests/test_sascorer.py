"""Exact Ertl SA scorer: vendored table + formula pipeline.

Reference: utils/evaluation/sascorer.py + fpscores.pkl.gz."""

import math
import os

import numpy as np
import pytest

from targetdiff_tpu.chem import sascorer as S
from targetdiff_tpu.chem.sdf import read_sdf, remove_hydrogens

EXAMPLE_LIGAND = os.path.join(
    os.path.dirname(__file__), "..", "examples", "3ug2_ligand.sdf"
)


def test_table_vendored_and_sorted():
    bits, scores = S._table()
    assert bits.dtype == np.uint64 and scores.dtype == np.float32
    assert len(bits) == len(scores) == 705292  # exact count from fpscores.pkl.gz
    assert (np.diff(bits.astype(np.int64) // 2 * 2) >= 0).all() or (
        np.diff(bits) >= 0
    ).all()
    # score range matches the published table
    assert scores.min() >= -5.0 and scores.max() <= 5.0


def test_fragment_score_known_and_unknown():
    bits, scores = S._table()
    b0, s0 = int(bits[1000]), float(scores[1000])
    assert S.fragment_score({b0: 1}) == pytest.approx(s0, abs=1e-6)
    # weighted mean of two known fragments
    b1, s1 = int(bits[2000]), float(scores[2000])
    got = S.fragment_score({b0: 3, b1: 1})
    assert got == pytest.approx((3 * s0 + s1) / 4, abs=1e-6)
    # unknown fragment contributes -4 (reference sascorer.py:64)
    unknown = int(bits[-1]) + 1
    assert S.fragment_score({unknown: 2}) == pytest.approx(-4.0, abs=1e-6)


def test_scale_matches_reference_formula():
    # reference sascorer.py:101-113
    def ref_scale(raw):
        sa = 11.0 - (raw - (-4.0) + 1.0) / (2.5 - (-4.0)) * 9.0
        if sa > 8.0:
            sa = 8.0 + math.log(sa + 1.0 - 9.0)
        if sa > 10.0:
            sa = 10.0
        elif sa < 1.0:
            sa = 1.0
        return sa

    for raw in (-6.0, -4.0, -2.0, 0.0, 1.3, 2.5, 4.0):
        assert S._scale(raw) == pytest.approx(ref_scale(raw), abs=1e-9)


def test_feature_scores_penalties():
    base2, base3 = S._feature_scores(30, 0, 0, 0, 0, 25)
    chiral2, _ = S._feature_scores(30, 2, 0, 0, 0, 25)
    macro2, _ = S._feature_scores(30, 0, 0, 0, 1, 25)
    assert chiral2 < base2  # stereo centers penalize
    assert macro2 == pytest.approx(base2 - math.log10(2), abs=1e-12)
    # symmetry bonus only when atoms outnumber unique fragments
    _, s3a = S._feature_scores(30, 0, 0, 0, 0, 30)
    _, s3b = S._feature_scores(30, 0, 0, 0, 0, 10)
    assert s3a == 0.0 and s3b > 0.0


def test_native_sa_gefitinib():
    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    sa = S.sa_score_native(mol)
    # RDKit exact scorer gives ~2.3 for gefitinib; native surrogate must land
    # in the same easy-synthesis band
    assert 1.0 <= sa <= 4.0
    assert S._native_chiral_centers(mol) == 0  # gefitinib is achiral


def test_exact_scorer_with_rdkit():
    rdkit = pytest.importorskip("rdkit")
    from targetdiff_tpu.chem.backend import to_rdkit

    mol = remove_hydrogens(read_sdf(EXAMPLE_LIGAND))
    rd = to_rdkit(mol)
    assert rd is not None
    sa = S.calculate_sa(rd)
    assert sa == pytest.approx(2.3, abs=0.4)  # published-ish value for gefitinib

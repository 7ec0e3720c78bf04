"""Utility-layer tests: profiling timer, misc helpers, native fallback."""

import time

import numpy as np

from targetdiff_tpu.utils.misc import BlackHole, count_parameters, get_new_log_dir, seed_all
from targetdiff_tpu.utils.profiling import Timer


def test_timer_phases():
    t = Timer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        time.sleep(0.02)
    with t.phase("a"):
        time.sleep(0.01)
    assert t.laps["a"] >= 0.02
    assert t.laps["b"] >= 0.02
    s = t.summary()
    assert "a" in s and "b" in s and "total" in s


def test_blackhole():
    bh = BlackHole()
    bh.add_scalar("x", 1.0, 2)  # swallows anything
    bh.foo.bar(3)(4)
    bh.attr = 5


def test_count_parameters():
    params = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert count_parameters(params) == 17


def test_log_dir_and_seed(tmp_path):
    d = get_new_log_dir(str(tmp_path), prefix="x", tag="y")
    import os

    assert os.path.isdir(d)
    seed_all(3)
    a = np.random.rand(3)
    seed_all(3)
    np.testing.assert_array_equal(a, np.random.rand(3))


def test_native_fallback_paths():
    """Force the pure-Python fallbacks once to keep them exercised."""
    import targetdiff_tpu.utils.native as NV
    from targetdiff_tpu.chem.pdb import PDBProtein
    from targetdiff_tpu.chem.reconstruct import reconstruct_from_generated

    old_mod, old_failed = NV._module, NV._failed
    try:
        NV._module, NV._failed = None, True
        p = PDBProtein("examples/1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb")
        assert len(p.element) > 300
        mol = reconstruct_from_generated(
            np.array([[0, 0, 0], [1.54, 0, 0]]), [6, 6]
        )
        assert mol.to_smiles() == "CC"
    finally:
        NV._module, NV._failed = old_mod, old_failed

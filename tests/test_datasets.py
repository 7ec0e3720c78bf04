"""Dataset layer round trip: build a RecordStore-backed PocketLigandPairDataset
from a synthetic raw dir (using the reference's example files as fixtures),
featurize, collate and iterate."""

import os
import pickle
import shutil

import numpy as np
import pytest

from targetdiff_tpu.data.datasets import (
    PaddedLoader,
    PocketLigandPairDataset,
    collate_padded,
    get_dataset,
    inf_iterator,
)
from targetdiff_tpu.data.store import RecordStore, RecordStoreWriter
from targetdiff_tpu.data.transforms import (
    Compose,
    FeaturizeLigandAtom,
    FeaturizeLigandBond,
    FeaturizeProteinAtom,
    RandomRotation,
)

POCKET = "examples/1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb"
LIGAND = "examples/3ug2_ligand.sdf"


def test_record_store_roundtrip(tmp_path):
    path = str(tmp_path / "store")
    with RecordStoreWriter(path) as w:
        w.put_obj("0", {"a": np.arange(5)})
        w.put_obj("1", {"b": "hello"})
    s = RecordStore(path)
    assert len(s) == 2
    np.testing.assert_array_equal(s.get_obj("0")["a"], np.arange(5))
    assert s.get_obj("1")["b"] == "hello"
    # picklable (loader workers)
    import pickle as pk

    s2 = pk.loads(pk.dumps(s))
    assert s2.get_obj("1")["b"] == "hello"


@pytest.fixture(scope="module")
def raw_dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("crossdocked_mini")
    raw = root / "raw"
    raw.mkdir()
    shutil.copyfile(POCKET, raw / "pocket.pdb")
    shutil.copyfile(LIGAND, raw / "ligand.sdf")
    index = [("pocket.pdb", "ligand.sdf", 0.5)] * 4  # 4 identical pairs
    with open(raw / "index.pkl", "wb") as f:
        pickle.dump(index, f)
    return str(raw)


def test_pocket_ligand_pair_dataset(raw_dataset_dir):
    transform = Compose(
        [FeaturizeProteinAtom(), FeaturizeLigandAtom("add_aromatic"), FeaturizeLigandBond()]
    )
    ds = PocketLigandPairDataset(raw_dataset_dir, transform=transform)
    assert len(ds) == 4
    d = ds[0]
    assert d["protein_atom_feature"].shape[-1] == 27
    assert d["ligand_atom_feature_full"].max() < 13
    assert d["ligand_pos"].shape == (31, 3)
    assert d["ligand_bond_feature"].shape[-1] == 5

    batch = collate_padded([ds[0], ds[1]], max_protein=640, max_ligand=48)
    assert batch.protein_pos.shape == (2, 640, 3)
    assert int(np.asarray(batch.ligand_mask).sum()) == 62

    loader = PaddedLoader(ds, batch_size=2, max_protein=640, max_ligand=48)
    it = inf_iterator(loader)
    b1 = next(it)
    assert b1.num_graphs == 2


def test_get_dataset_factory(raw_dataset_dir, tmp_path):
    import torch

    split_path = str(tmp_path / "split.pt")
    torch.save({"train": [0, 1, 2], "test": [3]}, split_path)
    ds, subsets = get_dataset(
        {"name": "pl", "path": raw_dataset_dir, "split": split_path},
        transform=Compose([FeaturizeProteinAtom(), FeaturizeLigandAtom("add_aromatic")]),
    )
    assert len(subsets["train"]) == 3
    assert len(subsets["test"]) == 1
    assert subsets["test"][0]["ligand_element"].shape == (31,)


def test_random_rotation_transform(raw_dataset_dir):
    ds = PocketLigandPairDataset(raw_dataset_dir)
    d = ds[0]
    pp, lp = d["protein_pos"].copy(), d["ligand_pos"].copy()
    d2 = RandomRotation(np.random.default_rng(0))(d)
    # rigid: pairwise distances preserved
    rd = np.linalg.norm(d2["ligand_pos"][0] - d2["protein_pos"][0])
    od = np.linalg.norm(lp[0] - pp[0])
    assert abs(rd - od) < 1e-3
    assert not np.allclose(d2["ligand_pos"], lp)

"""Full CLI integration: build a mini dataset, train for a few iterations via
the real train CLI, then sample from the saved checkpoint via the real sample
CLI — the complete reference workflow (train_diffusion.py ->
sample_diffusion.py) on CPU."""

import glob
import os
import pickle
import shutil

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini")
    raw = root / "raw"
    raw.mkdir()
    shutil.copyfile("examples/1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb",
                    raw / "pocket.pdb")
    shutil.copyfile("examples/3ug2_ligand.sdf", raw / "ligand.sdf")
    index = [("pocket.pdb", "ligand.sdf", 0.5)] * 6
    with open(raw / "index.pkl", "wb") as f:
        pickle.dump(index, f)
    import torch

    split = str(root / "split.pt")
    torch.save({"train": [0, 1, 2, 3], "test": [4, 5]}, split)
    return str(raw), split, root


def test_train_then_sample_cli(mini_dataset, tmp_path):
    raw, split, root = mini_dataset
    cfg = {
        "data": {
            "name": "pl", "path": raw, "split": split,
            "transform": {"ligand_atom_mode": "add_aromatic", "random_rot": False},
        },
        "model": {
            "model_mean_type": "C0", "beta_schedule": "sigmoid",
            "beta_start": 1.0e-7, "beta_end": 2.0e-3, "v_beta_schedule": "cosine",
            "v_beta_s": 0.01, "num_diffusion_timesteps": 12, "loss_v_weight": 100.0,
            "sample_time_method": "symmetric", "time_emb_dim": 0,
            "time_emb_mode": "simple", "center_pos_mode": "protein",
            "node_indicator": True, "model_type": "uni_o2", "num_blocks": 1,
            "num_layers": 1, "hidden_dim": 16, "n_heads": 2, "edge_feat_dim": 4,
            "num_r_gaussian": 20, "knn": 6, "num_node_types": 8, "act_fn": "relu",
            "norm": True, "cutoff_mode": "knn", "ew_net_type": "global",
            "num_x2h": 1, "num_h2x": 1, "r_max": 10.0, "x2h_out_fc": False,
            "sync_twoup": False,
        },
        "train": {
            "seed": 1, "batch_size": 2, "num_workers": 0, "n_acc_batch": 1,
            "max_iters": 4, "val_freq": 2, "pos_noise_std": 0.1,
            "max_grad_norm": 8.0,
            "optimizer": {"type": "adam", "lr": 1.0e-3, "weight_decay": 0,
                          "beta1": 0.95, "beta2": 0.999},
            "scheduler": {"type": "plateau", "factor": 0.6, "patience": 10,
                          "min_lr": 1.0e-6},
        },
    }
    cfg_path = str(tmp_path / "train.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from targetdiff_tpu.cli import train_diffusion

    logdir = str(tmp_path / "logs")
    train_diffusion.main([cfg_path, "--logdir", logdir,
                          "--max_protein", "640", "--max_ligand", "40",
                          "--train_report_iter", "1"])
    ckpts = glob.glob(os.path.join(logdir, "*", "ckpt_*.npz"))
    assert ckpts, "training produced no checkpoint"

    sample_cfg = {
        "model": {"checkpoint": ckpts[-1]},
        "sample": {"seed": 7, "num_samples": 3, "num_steps": 6,
                   "pos_only": False, "center_pos_mode": "protein",
                   "sample_num_atoms": "prior"},
    }
    scfg_path = str(tmp_path / "sample.yml")
    with open(scfg_path, "w") as f:
        yaml.safe_dump(sample_cfg, f)

    from targetdiff_tpu.cli import sample_diffusion

    outdir = str(tmp_path / "outputs")
    sample_diffusion.main([scfg_path, "-i", "0", "--result_path", outdir,
                           "--batch_size", "3", "--save_traj", "2",
                           "--max_protein", "640", "--max_ligand", "40"])
    results = glob.glob(os.path.join(outdir, "result_*.pkl"))
    assert results
    with open(results[0], "rb") as f:
        res = pickle.load(f)
    assert len(res["pred_ligand_pos"]) == 3
    for pos, v in zip(res["pred_ligand_pos"], res["pred_ligand_v"]):
        assert np.isfinite(pos).all() and len(pos) == len(v)
    # --save_traj 2: trajectory at stride 2, [steps, atoms, 3] per sample
    assert len(res["pred_ligand_pos_traj"]) == 3
    assert res["pred_ligand_pos_traj"][0].ndim == 3
    assert res["pred_ligand_pos_traj"][0].shape[1:] == res["pred_ligand_pos"][0].shape

    # evaluate the results through the evaluation CLI machinery
    from targetdiff_tpu.cli.evaluate_diffusion import evaluate_results

    summary, _ = evaluate_results(results, "add_aromatic")
    assert 0 <= summary["validity"]["mol_stable"] <= 1
    assert summary["atom_type_jsd"] is not None
    # reference's --eval_step: evaluate an intermediate trajectory step
    s_mid, _ = evaluate_results(results, "add_aromatic", eval_step=0)
    assert 0 <= s_mid["validity"]["atm_stable"] <= 1

    # likelihood + embedding export from the same checkpoint
    from targetdiff_tpu.cli import likelihood_est_diffusion

    likedir = str(tmp_path / "likelihood")
    likelihood_est_diffusion.main([
        scfg_path, "--split", "test", "--result_path", likedir,
        "--t_stride", "4", "--max_protein", "640", "--max_ligand", "40",
        "--limit", "1",
    ])
    with open(os.path.join(likedir, "crossdocked_test.pkl"), "rb") as f:
        entries = pickle.load(f)
    assert len(entries) == 1
    e = entries[0]
    assert np.isfinite(e["nll"])
    assert e["final_ligand_h"].shape[0] == 31  # gefitinib heavy atoms
    assert np.allclose(e["pred_ligand_v"].sum(-1), 1.0, atol=1e-4)

    # whole-test-set sampling via the mesh-sharded HBM-chunked path
    # (replaces the reference's batch_sample_diffusion.sh)
    sharddir = str(tmp_path / "sharded")
    sample_diffusion.main([scfg_path, "--all", "--sharded",
                           "--chunk_rows", "8", "--result_path", sharddir,
                           "--max_protein", "640", "--max_ligand", "40"])
    shard_results = sorted(glob.glob(os.path.join(sharddir, "result_*.pkl")))
    assert len(shard_results) == 2  # both test pockets
    for rp in shard_results:
        with open(rp, "rb") as f:
            res = pickle.load(f)
        assert len(res["pred_ligand_pos"]) == 3
        for pos, v in zip(res["pred_ligand_pos"], res["pred_ligand_v"]):
            assert np.isfinite(pos).all() and len(pos) == len(v) >= 1


def test_prop_pipeline(tmp_path):
    """PDBBind-style prop training batchry end-to-end on synthetic labels."""
    import jax
    import numpy as np

    from targetdiff_tpu.chem.pdb import PDBProtein
    from targetdiff_tpu.chem.sdf import parse_sdf_file, read_sdf, remove_hydrogens
    from targetdiff_tpu.data.transforms_prop import (
        FeaturizeLigandAtomProp,
        FeaturizeProteinAtom,
        ligand_atom_feature_matrix,
    )
    from targetdiff_tpu.models.prop.prop_model import PropPredNet, prop_loss_fn
    from targetdiff_tpu.utils.misc_prop import collate_prop, get_eval_scores

    pocket = PDBProtein("examples/1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb").to_dict_atom()
    ligand = parse_sdf_file("examples/3ug2_ligand.sdf")
    mol = remove_hydrogens(read_sdf("examples/3ug2_ligand.sdf"))
    data = {
        "protein_element": pocket["element"],
        "protein_pos": pocket["pos"],
        "protein_is_backbone": pocket["is_backbone"],
        "protein_atom_to_aa_type": pocket["atom_to_aa_type"],
        "ligand_element": ligand["element"],
        "ligand_pos": ligand["pos"],
        "ligand_atom_feature": ligand_atom_feature_matrix(mol),
        "y": 5.6,
        "kind": 2,
    }
    data = FeaturizeProteinAtom()(data)
    data = FeaturizeLigandAtomProp()(data)
    assert data["ligand_atom_feature_full"].shape[-1] == 30

    batch = collate_prop([data, data], max_protein=640, max_ligand=40)
    cfg = dict(
        hidden_channels=16,
        encoder=dict(name="egnn", num_layers=1, hidden_dim=16, edge_dim=0,
                     num_r_gaussian=8, act_fn="relu", norm=False, knn=8, cutoff=10.0),
    )
    model = PropPredNet(config=cfg, output_dim=3)
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, pred = prop_loss_fn(model, params, jax.random.PRNGKey(1), batch, 0.1)
    assert np.isfinite(float(loss))
    scores = get_eval_scores(np.asarray(pred) + 1e-3 * np.arange(2), np.asarray(batch.y))
    assert np.isfinite(scores["rmse"])


def test_enc_affinity_pipeline(mini_dataset, tmp_path):
    """The full Enc affinity experiment (SURVEY §3.5, VERDICT r2 next #6):
    train diffusion -> likelihood/embedding export -> PDBBind emb merge ->
    PropPredNetEnc (enc_feature_type=final_h) training -> eval, all through
    the real CLIs."""
    raw, split, root = mini_dataset
    hidden = 16
    cfg = {
        "data": {
            "name": "pl", "path": raw, "split": split,
            "transform": {"ligand_atom_mode": "add_aromatic", "random_rot": False},
        },
        "model": {
            "model_mean_type": "C0", "beta_schedule": "sigmoid",
            "beta_start": 1.0e-7, "beta_end": 2.0e-3, "v_beta_schedule": "cosine",
            "v_beta_s": 0.01, "num_diffusion_timesteps": 8, "loss_v_weight": 100.0,
            "sample_time_method": "symmetric", "time_emb_dim": 0,
            "time_emb_mode": "simple", "center_pos_mode": "protein",
            "node_indicator": True, "model_type": "uni_o2", "num_blocks": 1,
            "num_layers": 1, "hidden_dim": hidden, "n_heads": 2, "edge_feat_dim": 4,
            "num_r_gaussian": 20, "knn": 6, "num_node_types": 8, "act_fn": "relu",
            "norm": True, "cutoff_mode": "knn", "ew_net_type": "global",
            "num_x2h": 1, "num_h2x": 1, "r_max": 10.0, "x2h_out_fc": False,
            "sync_twoup": False,
        },
        "train": {
            "seed": 1, "batch_size": 2, "num_workers": 0, "n_acc_batch": 1,
            "max_iters": 2, "val_freq": 2, "pos_noise_std": 0.1,
            "max_grad_norm": 8.0,
            "optimizer": {"type": "adam", "lr": 1.0e-3, "weight_decay": 0,
                          "beta1": 0.95, "beta2": 0.999},
            "scheduler": {"type": "plateau", "factor": 0.6, "patience": 10,
                          "min_lr": 1.0e-6},
        },
    }
    cfg_path = str(tmp_path / "train.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from targetdiff_tpu.cli import train_diffusion

    logdir = str(tmp_path / "logs")
    train_diffusion.main([cfg_path, "--logdir", logdir,
                          "--max_protein", "640", "--max_ligand", "40",
                          "--train_report_iter", "1"])
    ckpt = sorted(glob.glob(os.path.join(logdir, "*", "ckpt_*.npz")))[-1]

    # 1) likelihood + embedding export (the emb feed for the Enc model)
    scfg_path = str(tmp_path / "sample.yml")
    with open(scfg_path, "w") as f:
        yaml.safe_dump({"model": {"checkpoint": ckpt},
                        "sample": {"seed": 7, "num_samples": 1, "num_steps": 4}}, f)
    from targetdiff_tpu.cli import likelihood_est_diffusion

    likedir = str(tmp_path / "likelihood")
    likelihood_est_diffusion.main([
        scfg_path, "--split", "train", "--result_path", likedir,
        "--t_stride", "4", "--max_protein", "640", "--max_ligand", "40",
        "--limit", "2", "--batch_complexes", "2",
    ])
    emb_path = os.path.join(likedir, "crossdocked_train.pkl")
    with open(emb_path, "rb") as f:
        entries = pickle.load(f)
    assert entries and entries[0]["final_h"].shape[-1] == hidden
    # composed protein+ligand node count (un-padded)
    n_prot = 572  # 1h36 pocket heavy atoms after PDB parse
    assert entries[0]["final_h"].shape[0] == n_prot + len(entries[0]["final_ligand_h"])

    # 2) PDBBind-style index re-using the same files -> emb merge by filename
    import torch

    pb_index = [
        {"pocket": "pocket.pdb", "ligand": "ligand.sdf", "pk": 5.6, "kind": 2},
    ] * 4
    pb_index_path = os.path.join(raw, "pdbbind_index.pkl")
    with open(pb_index_path, "wb") as f:
        pickle.dump(pb_index, f)
    pb_split = str(tmp_path / "pb_split.pt")
    torch.save({"train": [0, 1], "test": [2, 3]}, pb_split)

    # 3) Enc prop config mirroring configs/prop/pdbbind_general_egnn_enc_final_h.yml
    enc_cfg = {
        "data": {"name": "pdbbind", "path": pb_index_path, "split": pb_split,
                 "emb_path": emb_path},
        "model": {
            "hidden_channels": 16,
            "enc_ligand_dim": 0, "enc_node_dim": hidden, "enc_graph_dim": 0,
            "enc_feature_type": "final_h",
            "encoder": {"name": "egnn_enc", "num_layers": 1, "hidden_dim": 16,
                        "edge_dim": 0, "num_r_gaussian": 8, "act_fn": "relu",
                        "norm": False, "cutoff": 10.0, "knn": 8},
        },
        "train": {
            "seed": 2021, "batch_size": 2, "max_epochs": 2, "pos_noise_std": 0.1,
            "max_grad_norm": 10.0,
            "optimizer": {"type": "adam", "lr": 1.0e-4, "weight_decay": 0,
                          "beta1": 0.99, "beta2": 0.999},
            "scheduler": {"type": "plateau", "factor": 0.6, "patience": 10,
                          "min_lr": 1.0e-5},
        },
    }
    enc_cfg_path = str(tmp_path / "enc.yml")
    with open(enc_cfg_path, "w") as f:
        yaml.safe_dump(enc_cfg, f)

    from targetdiff_tpu.cli import train_prop

    prop_logdir = str(tmp_path / "logs_prop")
    train_prop.main([enc_cfg_path, "--logdir", prop_logdir,
                     "--max_protein", "640", "--max_ligand", "40"])
    prop_ckpts = glob.glob(os.path.join(prop_logdir, "*", "prop_ckpt_*.npz"))
    assert prop_ckpts, "enc prop training produced no checkpoint"

    # 4) eval from the checkpoint (model rebuilt from the embedded config)
    from targetdiff_tpu.cli import eval_prop

    eval_prop.main([sorted(prop_ckpts)[-1],
                    "--max_protein", "640", "--max_ligand", "40",
                    "--batch_size", "2"])

"""Real-chip throughput through the PRODUCTION sharded sampling path.

Usage: python tools/shardedbench.py [n_pockets] [samples_per_pocket] [steps]

Drives `sampling.sample_testset_sharded` — the same function behind
`cli/sample_diffusion.py --all --sharded` — on a real featurized pocket
(examples/1h36_*_pocket10.pdb, trimmed to the 330 atoms nearest its
centroid so the workload shape matches bench.py: batch 100, 384-atom
protein pad, 32-atom ligands, 1000 DDPM steps). VERDICT r2 #7: CLI-path
throughput must land within ~10% of bench.py's number, and the per-pocket
times it reports must be measured, not wall-clock split evenly.

One TPU process at a time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POCKET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "1h36_A_rec_1h36_r88_lig_tt_docked_0_pocket10.pdb",
)


def main():
    import jax

    from __graft_entry__ import _flagship
    from targetdiff_tpu.cli.sample_for_pocket import pdb_to_pocket_data
    from targetdiff_tpu.data.transforms import FeaturizeProteinAtom
    from targetdiff_tpu.sampling import sample_testset_sharded

    n_pockets = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    model, b = _flagship(num_timesteps=1000, max_protein=384, max_ligand=32,
                         batch=2)
    params = model.init(jax.random.PRNGKey(0), b)

    data = pdb_to_pocket_data(POCKET, FeaturizeProteinAtom())
    pos = np.asarray(data["protein_pos"], np.float32)
    feat = np.asarray(data["protein_atom_feature"], np.float32)
    # trim to the 330 atoms nearest the pocket centroid (bench.py workload)
    d = np.linalg.norm(pos - pos.mean(0), axis=1)
    keep = np.argsort(d)[:330]
    pos, feat = pos[keep], feat[keep]
    pockets = [{"protein_pos": pos, "protein_feat": feat}] * n_pockets

    t0 = time.time()
    results = sample_testset_sharded(
        model, params, pockets,
        num_samples_per_pocket=n_samples,
        key=jax.random.PRNGKey(0),
        num_steps=steps,
        sample_num_atoms="prior",
        max_protein=384, max_ligand=32,
        chunk_rows=100, impl="auto",
        rng=np.random.default_rng(0),
    )
    elapsed = time.time() - t0
    times = [r["time"] for r in results]
    n_mols = n_pockets * n_samples
    print(f"sharded CLI path: {n_pockets} pockets x {n_samples} samples x "
          f"{steps} steps in {elapsed:.1f}s wall "
          f"({n_mols / elapsed:.3f} mol/s incl. compile+host)")
    print(f"per-pocket device times: {[f'{t:.1f}' for t in times]} s "
          f"-> {n_mols / sum(times):.3f} mol/s device")


if __name__ == "__main__":
    main()

"""Trained-vs-untrained generation quality gate (VERDICT r3 #2).

The reference's de-facto regression harness is trained-model behavior:
best-val checkpointing feeding the stability / reconstruction / JSD metrics
pipeline (reference: scripts/train_diffusion.py:153-228 +
scripts/evaluate_diffusion.py:150-201). CrossDocked is absent from this
image, so this gate trains the flagship architecture on the synthetic
chemically-sane corpus (targetdiff_tpu/data/synth.py), samples with the
fused Pallas kernels (--impl fast), reconstructs, and evaluates — asserting
the trained model beats the untrained one by wide margins on:

  * molecule stability rate (analyze.check_stability)
  * atom stability rate
  * reconstruction success rate (chem/reconstruct.py)
  * pair-distance JSD vs the TRAINING distribution (the model's target —
    the frozen CrossDocked tables are a different chemistry)
  * atom-TYPE distribution JSD vs the training corpus (the reference's
    eval_atom_type metric, retargeted at the in-image training chemistry)
  * bond-length JSD by bond type on RECONSTRUCTED molecules vs the
    training corpus (the reference's eval_bond_length table metric;
    bonds inferred by the same reconstruction pipeline on both sides)

Writes quality_gate.json next to this file's invocation dir and exits 1 if
any gate fails. Repeatable: fixed seeds; ~10-20 min on one v5e chip.

Usage: python tools/quality_gate.py [train_steps] [n_sample] [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GRAFT_CPU"):  # plumbing smoke off-TPU (sitecustomize
    # pins the axon platform, so the jax config must be set before use)
    import jax

    jax.config.update("jax_platforms", "cpu")

NP_, NL = 128, 32  # pocket/ligand padding (synthetic pockets 96-128 atoms)
BATCH = 32


def build_model():
    import jax

    from __graft_entry__ import _flagship

    model, _ = _flagship(num_timesteps=1000, max_protein=NP_, max_ligand=NL,
                         batch=BATCH)
    return model


def make_pool(seed=0, pool=1024):
    from targetdiff_tpu.data.synth import synth_batch

    rng = np.random.default_rng(seed)
    return synth_batch(rng, pool, max_protein=NP_, max_ligand=NL)


def train(model, pool, steps, seed=1, log=print):
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.config import Config
    from targetdiff_tpu.trainer import create_train_state, make_train_step
    from targetdiff_tpu.utils.train import get_optimizer

    opt = get_optimizer(
        Config(dict(type="adam", lr=5e-4, weight_decay=0, beta1=0.95,
                    beta2=0.999, max_grad_norm=8.0))
    )
    first = jax.tree_util.tree_map(lambda x: x[:BATCH], pool)
    state = create_train_state(model, opt, jax.random.PRNGKey(seed), first)
    # the train step DONATES its state argument — keep an independent copy
    # of the untrained params or they are deleted at the first step
    untrained = jax.tree_util.tree_map(jnp.copy, state.params)
    impl = "fast" if jax.default_backend() in ("tpu", "axon") else "xla"
    step_fn = make_train_step(model, opt, pos_noise_std=0.1, impl=impl)
    key = jax.random.PRNGKey(seed + 1)
    P = pool.protein_pos.shape[0]
    rng = np.random.default_rng(seed + 2)
    t0 = time.time()
    loss_hist = []
    for i in range(steps):
        sel = jnp.asarray(rng.integers(0, P, BATCH))
        batch = jax.tree_util.tree_map(lambda x: x[sel], pool)
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        if i % 200 == 0 or i == steps - 1:
            loss = float(metrics["loss"])
            loss_hist.append(loss)
            log(f"  step {i}: loss {loss:.4f} ({time.time()-t0:.0f}s)")
    return untrained, state.params, loss_hist


def sample(model, params, pool, n_mols, seed=3, num_steps=1000,
           sampler="ddpm", eta=0.0, ddim_spacing="uniform"):
    """Sample n_mols ligands across synthetic pockets with the fast impl."""
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.sampling import init_ligand_state

    impl = "fast" if jax.default_backend() in ("tpu", "axon") else "xla"
    sel = jnp.asarray(np.arange(n_mols) % pool.protein_pos.shape[0])
    batch = jax.tree_util.tree_map(lambda x: x[sel], pool)
    key = jax.random.PRNGKey(seed)
    init_pos, init_v = init_ligand_state(key, batch, model.num_classes)
    res = model.sample_diffusion(
        params, key, batch, init_pos, init_v, num_steps=num_steps, impl=impl,
        scan_chunk=100, sampler=sampler, eta=eta, ddim_spacing=ddim_spacing,
    )
    pos = np.asarray(res.pos)
    v = np.asarray(res.v)
    lm = np.asarray(batch.ligand_mask)
    return [
        {"pos": pos[i][lm[i]], "v": v[i][lm[i]]} for i in range(n_mols)
    ]


def _atom_type_jsd(counter, train_counter):
    """JSD between two atomic-number histograms over the union of elements
    (the reference's eval_atom_type.eval_atom_type_distribution, retargeted
    at the training corpus distribution instead of frozen CrossDocked)."""
    from targetdiff_tpu.evaluation import analyze

    keys = sorted(set(train_counter) | set(counter))
    p = np.array([counter.get(k, 0) for k in keys], float)
    q = np.array([train_counter.get(k, 0) for k in keys], float)
    if p.sum() == 0 or q.sum() == 0:
        return None
    return float(analyze.js_divergence(p / p.sum(), q / q.sum()))


def _bond_jsd(bond_profile, train_bond_profile, train_counts=None,
              min_frac=0.03):
    """JSD over the bond types present in BOTH profiles (the reference's
    eval_bond_length table, vs the training corpus). With train_counts, the
    mean is WEIGHTED by the training corpus's bond-type frequency and types
    below min_frac of all train bonds are dropped — a handful of rare-type
    bonds otherwise dominate the mean with pure histogram noise."""
    from targetdiff_tpu.evaluation import analyze, eval_bond_length

    common = [bt for bt in train_bond_profile if bt in bond_profile]
    if train_counts:
        total = sum(train_counts.values())
        common = [
            bt for bt in common if train_counts.get(bt, 0) >= min_frac * total
        ]
    if not common:
        return None, {}
    detail = {
        eval_bond_length._bond_type_str(bt): float(
            analyze.js_divergence(bond_profile[bt], train_bond_profile[bt])
        )
        for bt in common
    }
    if train_counts:
        w = np.array([train_counts[bt] for bt in common], float)
        vals = np.array(
            [detail[eval_bond_length._bond_type_str(bt)] for bt in common]
        )
        return float((w * vals).sum() / w.sum()), detail
    return float(np.mean(list(detail.values()))), detail


def evaluate(mols, profiles):
    from collections import Counter

    from targetdiff_tpu.chem.reconstruct import (
        MolReconsError, reconstruct_from_generated,
    )
    from targetdiff_tpu.data.transforms import (
        get_atomic_number_from_index, is_aromatic_from_index,
    )
    from targetdiff_tpu.evaluation import analyze, eval_bond_length

    n = len(mols)
    n_stable = n_recon = 0
    atom_stable = atom_total = 0
    pair = []
    atoms = Counter()
    bonds = []
    for m in mols:
        z = get_atomic_number_from_index(m["v"], "add_aromatic")
        arom = is_aromatic_from_index(m["v"], "add_aromatic")
        stable, ns, na = analyze.check_stability(m["pos"], z)
        n_stable += int(stable)
        atom_stable += ns
        atom_total += na
        pair += eval_bond_length.pair_distance_from_pos_v(m["pos"], z)
        atoms.update(int(zz) for zz in z)
        try:
            mol = reconstruct_from_generated(m["pos"], z, arom)
            n_recon += 1
            bonds += eval_bond_length.bond_distance_from_mol(mol)
        except (MolReconsError, Exception):
            pass
    prof = eval_bond_length.get_pair_length_profile(pair)
    jsd = {
        k: analyze.js_divergence(prof[k], profiles["pair"][k])
        for k in profiles["pair"]
        if k in prof
    }
    bond_jsd, bond_detail = _bond_jsd(
        eval_bond_length.get_bond_length_profile(bonds), profiles["bond"],
        train_counts=profiles.get("bond_counts"),
    )
    return {
        "mol_stable": n_stable / n,
        "atom_stable": atom_stable / max(atom_total, 1),
        "recon_success": n_recon / n,
        "pair_jsd_vs_train": float(np.mean(list(jsd.values()))) if jsd else None,
        "pair_jsd_detail": {k: float(v) for k, v in jsd.items()},
        "atom_type_jsd_vs_train": _atom_type_jsd(atoms, profiles["atom"]),
        "bond_jsd_vs_train": bond_jsd,
        "bond_jsd_detail": bond_detail,
        "n": n,
    }


def train_profile(pool, n=256):
    """Pair-distance / atom-type / bond-length profiles of the synthetic
    training ligands. Bonds come from the SAME reconstruction pipeline the
    sampled molecules go through, so the bond-JSD comparison is apples to
    apples."""
    from collections import Counter

    from targetdiff_tpu.chem.reconstruct import (
        MolReconsError, reconstruct_from_generated,
    )
    from targetdiff_tpu.data.transforms import (
        get_atomic_number_from_index, is_aromatic_from_index,
    )
    from targetdiff_tpu.evaluation import eval_bond_length

    lp = np.asarray(pool.ligand_pos)
    lv = np.asarray(pool.ligand_v)
    lm = np.asarray(pool.ligand_mask)
    pair = []
    atoms = Counter()
    bonds = []
    for i in range(min(n, len(lp))):
        z = get_atomic_number_from_index(lv[i][lm[i]], "add_aromatic")
        arom = is_aromatic_from_index(lv[i][lm[i]], "add_aromatic")
        pair += eval_bond_length.pair_distance_from_pos_v(lp[i][lm[i]], z)
        atoms.update(int(zz) for zz in z)
        try:
            mol = reconstruct_from_generated(lp[i][lm[i]], z, arom)
            bonds += eval_bond_length.bond_distance_from_mol(mol)
        except (MolReconsError, Exception):
            pass
    from targetdiff_tpu.evaluation.eval_bond_length import _format_bond_type

    return {
        "pair": eval_bond_length.get_pair_length_profile(pair),
        "atom": atoms,
        "bond": eval_bond_length.get_bond_length_profile(bonds),
        "bond_counts": Counter(_format_bond_type(bt) for bt, _ in bonds),
    }


# minimum margins the trained model must beat the untrained one by; plus
# absolute floors pinned below the first measured trained run (2026-08-18:
# mol_stable 0.51, atom_stable 0.97, recon 1.0, JSD 0.267 vs untrained
# 0.0 / 0.24 / 0.97 / 0.392) so a silent equivariance/masking regression
# trips the gate. NOTE the recon margin is CAPPED: the reconstructor is
# deliberately robust to garbage geometry (untrained measured 0.97), so
# "untrained + margin" can exceed the attainable 1.0 — the discriminating
# recon signal is the absolute floor, not the margin.
GATES = dict(
    mol_stable_margin=0.10,
    atom_stable_margin=0.15,
    recon_margin=0.15,
    recon_margin_cap=0.95,
    jsd_improvement=0.05,
    mol_stable_floor=0.35,
    atom_stable_floor=0.65,
    recon_floor=0.90,
    # reference-eval extensions (round 4 cont.): atom-TYPE distribution JSD
    # and reconstructed bond-length JSD, both vs the training corpus.
    # Ceilings pinned above the first measured trained run; the improvement
    # margins catch a model that stops learning the type/bond distributions.
    atom_jsd_improvement=0.05,
    atom_jsd_ceiling=0.15,
    bond_jsd_ceiling=0.35,
)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_mols = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    out_path = sys.argv[3] if len(sys.argv) > 3 else "quality_gate.json"
    num_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 1000

    model = build_model()
    pool = make_pool()
    prof = train_profile(pool)
    print(f"training {steps} steps on {pool.protein_pos.shape[0]} synthetic complexes...")
    untrained, trained, loss_hist = train(model, pool, steps)
    print("sampling untrained...")
    mols_u = sample(model, untrained, pool, n_mols, num_steps=num_steps)
    print("sampling trained...")
    mols_t = sample(model, trained, pool, n_mols, seed=4, num_steps=num_steps)
    ev_u = evaluate(mols_u, prof)
    ev_t = evaluate(mols_t, prof)
    report = {"untrained": ev_u, "trained": ev_t, "loss_hist": loss_hist,
              "train_steps": steps}
    print(json.dumps(report, indent=1))

    g = GATES
    checks = {
        "mol_stable": ev_t["mol_stable"] >= ev_u["mol_stable"] + g["mol_stable_margin"],
        "atom_stable": ev_t["atom_stable"] >= ev_u["atom_stable"] + g["atom_stable_margin"],
        "recon": ev_t["recon_success"]
        >= min(ev_u["recon_success"] + g["recon_margin"], g["recon_margin_cap"]),
        "jsd": (ev_u["pair_jsd_vs_train"] or 1) - (ev_t["pair_jsd_vs_train"] or 1)
        >= g["jsd_improvement"],
        "mol_stable_floor": ev_t["mol_stable"] >= g["mol_stable_floor"],
        "atom_stable_floor": ev_t["atom_stable"] >= g["atom_stable_floor"],
        "recon_floor": ev_t["recon_success"] >= g["recon_floor"],
        # atom-type JSD: must both beat untrained and be small in absolute
        # terms (untrained samples uniform types -> far from the corpus mix)
        "atom_type_jsd": (
            ev_t["atom_type_jsd_vs_train"] is not None
            and ev_t["atom_type_jsd_vs_train"] <= g["atom_jsd_ceiling"]
            and (
                ev_u["atom_type_jsd_vs_train"] is None
                or ev_t["atom_type_jsd_vs_train"]
                <= ev_u["atom_type_jsd_vs_train"] - g["atom_jsd_improvement"]
            )
        ),
        # bond-length JSD: untrained geometry may reconstruct too few bonds
        # for a stable profile, so the gate is an absolute ceiling on the
        # trained model (bond types shared with the training corpus)
        "bond_jsd": (
            ev_t["bond_jsd_vs_train"] is not None
            and ev_t["bond_jsd_vs_train"] <= g["bond_jsd_ceiling"]
        ),
    }
    report["checks"] = checks
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    failed = [k for k, ok in checks.items() if not ok]
    print("GATE", "FAIL: " + ", ".join(failed) if failed else "ok")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

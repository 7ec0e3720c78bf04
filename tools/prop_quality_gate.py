"""Affinity-regressor quality gate: the prop model must LEARN on synthetic
complexes with a planted structural signal.

The reference pins its affinity numbers on PDBBind (README.md:192-194,
RMSE 1.316 / Pearson 0.797), which is absent from this image. This gate
provides the in-image analogue of that regression harness (reference:
scripts/property_prediction/train_prop.py + utils/misc_prop.py metrics):
train PropPredNet (EGNN encoder) on synthetic pocket/ligand complexes whose
affinity is a deterministic function of STRUCTURE plus noise, and assert on
a held-out split that

  * Pearson r >= 0.5  (the model finds the structural signal)
  * RMSE <= 0.85 * std(y)  (beats the best constant predictor by >= 15%)
  * trained RMSE <= 0.7 * untrained RMSE  (learning actually happened)

The planted signal is learnable only by reading 3D structure: a
contact-count term (protein atoms within 4.5 A of ligand atoms) plus a
ligand-composition term (heteroatom fraction), standardized, plus N(0, 0.3)
label noise (so the Bayes-optimal RMSE is ~0.3 in std units).

Writes prop_quality_gate.json; exit 1 on gate failure. ~5 min on CPU or one
v5e chip. Usage: python tools/prop_quality_gate.py [epochs] [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GRAFT_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

NP_, NL = 128, 32
POOL, TEST = 448, 64
BATCH = 32
NOISE = 0.3  # label noise in std units -> Bayes RMSE floor


def make_dataset(seed=0):
    """Synthetic complexes + standardized structural affinity labels."""
    from targetdiff_tpu.data.synth import synth_batch

    rng = np.random.default_rng(seed)
    b = synth_batch(rng, POOL + TEST, max_protein=NP_, max_ligand=NL)
    ppos = np.asarray(b.protein_pos)
    pmask = np.asarray(b.protein_mask)
    lpos = np.asarray(b.ligand_pos)
    lv = np.asarray(b.ligand_v)
    lmask = np.asarray(b.ligand_mask)

    n = len(ppos)
    contacts = np.zeros(n)
    hetero = np.zeros(n)
    for i in range(n):
        lp = lpos[i][lmask[i]]
        pp = ppos[i][pmask[i]]
        d = np.sqrt(((lp[:, None] - pp[None]) ** 2).sum(-1))
        contacts[i] = (d < 4.5).sum() / max(len(lp), 1)
        # vocab index 0 is carbon (add_aromatic, aromatic=False classes)
        hetero[i] = (lv[i][lmask[i]] != 0).mean()
    sig = (
        (contacts - contacts.mean()) / (contacts.std() + 1e-9) * 0.8
        + (hetero - hetero.mean()) / (hetero.std() + 1e-9) * 0.6
    )
    sig = (sig - sig.mean()) / (sig.std() + 1e-9)
    y = sig + np.random.default_rng(seed + 1).normal(0, NOISE, n)
    return b, y.astype(np.float32)


def make_prop_batches(b, y, idx):
    """PropBatch views over the synthetic ComplexBatch: protein feats as-is
    (27-dim), ligand feats = one-hot of the atom-type vocab index."""
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.models.prop.prop_model import PropBatch

    lv = np.asarray(b.ligand_v)
    NUM_V = 13
    lfeat = np.eye(NUM_V, dtype=np.float32)[lv]
    out = []
    for s in range(0, len(idx), BATCH):
        sel = idx[s : s + BATCH]
        if len(sel) < BATCH:
            break
        take = lambda x: jnp.asarray(np.asarray(x)[sel])
        out.append(
            PropBatch(
                protein_pos=take(b.protein_pos),
                protein_feat=take(b.protein_feat),
                protein_mask=take(b.protein_mask),
                ligand_pos=take(b.ligand_pos),
                ligand_feat=jnp.asarray(lfeat[sel]),
                ligand_mask=take(b.ligand_mask),
                y=jnp.asarray(y[sel]),
                kind=jnp.ones((len(sel),), jnp.int32),  # all Ki
            )
        )
    return out


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out_path = sys.argv[2] if len(sys.argv) > 2 else "prop_quality_gate.json"

    import jax
    import optax

    from targetdiff_tpu.config import Config
    from targetdiff_tpu.models.prop.prop_model import prop_loss_fn
    from targetdiff_tpu.utils import train as train_utils
    from targetdiff_tpu.utils.misc_prop import get_eval_scores, get_prop_model

    b, y = make_dataset()
    order = np.random.default_rng(2).permutation(POOL + TEST)
    train_idx, test_idx = order[:POOL], order[POOL:]
    test_batches = make_prop_batches(b, y, test_idx)

    # reduced flagship prop config (configs/prop/pdbbind_general_egnn.yml
    # halved: the synthetic corpus is small and pockets are 128 atoms)
    model_cfg = Config(
        dict(
            hidden_channels=128,
            encoder=dict(
                name="egnn", num_layers=3, hidden_dim=128, edge_dim=0,
                num_r_gaussian=20, act_fn="relu", norm=False, knn=24,
                cutoff=10.0,
            ),
        )
    )
    model = get_prop_model(model_cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, test_batches[0])

    optimizer = train_utils.get_optimizer(
        Config(dict(type="adam", lr=5e-4, weight_decay=0, beta1=0.95,
                    beta2=0.999, max_grad_norm=8.0))
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        (loss, pred), grads = jax.value_and_grad(
            lambda p: prop_loss_fn(model, p, key, batch, 0.05), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, batch):
        return model.apply(params, batch)

    def eval_params(params):
        ys, ps = [], []
        for tb in test_batches:
            # PropPredNet applies the per-kind head mask internally -> [B]
            ps.append(np.asarray(predict(params, tb)))
            ys.append(np.asarray(tb.y))
        return get_eval_scores(np.concatenate(ps), np.concatenate(ys))

    ev_untrained = eval_params(params)
    rng = np.random.default_rng(3)
    t0 = time.time()
    for ep in range(epochs):
        perm = rng.permutation(train_idx)
        losses = []
        for tb in make_prop_batches(b, y, perm):
            key, sk = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state, tb, sk)
            losses.append(float(loss))
        if ep % 5 == 0 or ep == epochs - 1:
            print(f"epoch {ep}: loss {np.mean(losses):.4f} ({time.time()-t0:.0f}s)")

    ev = eval_params(params)
    std = float(np.std(y[test_idx]))
    report = {
        "untrained": ev_untrained,
        "trained": ev,
        "y_std": std,
        "label_noise": NOISE,
        "epochs": epochs,
    }
    checks = {
        "pearson": ev["pearson"] >= 0.5,
        "beats_mean_predictor": ev["rmse"] <= 0.85 * std,
        "learned": ev["rmse"] <= 0.7 * ev_untrained["rmse"],
    }
    report["checks"] = checks
    print(json.dumps(report, indent=1))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    failed = [k for k, ok in checks.items() if not ok]
    print("PROP GATE", "FAIL: " + ", ".join(failed) if failed else "ok")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

"""Checkpoint logit-envelope check for the inference megakernel.

The megakernel's shift-free softmax exps +-60-clipped logits
(ops/pallas/block_denoiser.py — NUMERIC CONTRACT |logit| <= 60). This tool
measures the TRUE max |attention logit| of a checkpoint over a forward pass
(via the XLA path's 'stats' sow collection in models/uni_transformer.py) at
a spread of diffusion timesteps, so an out-of-envelope checkpoint fails
LOUDLY here instead of sampling silently-wrong molecules (ADVICE r3).

Usage: python tools/logit_envelope.py [ckpt.npz]
       (no argument: checks the flagship random-init, which is EXPECTED to
        be near/over the envelope — trained LN-bounded weights are not)

Exit code 1 if max |logit| > 60.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENVELOPE = 60.0


def measure(model, params, batch, timesteps=(0, 250, 500, 750, 999)):
    """Max |masked attention logit| over a forward at each timestep."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from targetdiff_tpu.ops import diffusion as D

    worst = 0.0
    per_t = {}
    B = batch.num_graphs
    protein_pos, ligand_pos, _ = D.center_pos_protein(
        batch.protein_pos, batch.ligand_pos, batch.protein_mask, "protein"
    )
    cbatch = batch._replace(protein_pos=protein_pos)
    for t in timesteps:
        ts = jnp.full((B,), t, jnp.int32)
        # perturb to the timestep's marginal like the loss does, so logits
        # are measured on the distribution sampling actually visits
        kp, kv = jax.random.split(jax.random.PRNGKey(t))
        pos, _ = D.perturb_pos(model.pos_sched, kp, ligand_pos, ts)
        log_v0 = D.index_to_log_onehot(batch.ligand_v, model.num_classes)
        v, _ = D.q_v_sample(model.v_sched, kv, log_v0, ts, model.num_classes)
        _, varz = model.apply(params, cbatch, pos, v, ts, mutable=["stats"])
        stats = jax.tree_util.tree_leaves(varz["stats"])
        m = float(np.max([np.asarray(s) for s in stats]))
        per_t[t] = m
        worst = max(worst, m)
    return worst, per_t


def main():
    import jax

    from __graft_entry__ import _flagship

    model, batch = _flagship(num_timesteps=1000, max_protein=128, max_ligand=32, batch=4)
    if len(sys.argv) > 1:
        from targetdiff_tpu.utils.checkpoint import load_checkpoint

        template = model.init(jax.random.PRNGKey(0), batch)
        params = load_checkpoint(sys.argv[1], params_template=template)["params"]
        src = sys.argv[1]
    else:
        params = model.init(jax.random.PRNGKey(0), batch)
        src = "flagship random-init"

    worst, per_t = measure(model, params, batch)
    for t, m in per_t.items():
        print(f"  t={t:4d}: max |logit| = {m:.2f}")
    ok = worst <= ENVELOPE
    print(f"{src}: max |attention logit| = {worst:.2f} "
          f"({'OK' if ok else 'EXCEEDS'} the +-{ENVELOPE:.0f} megakernel envelope)")
    if not ok:
        print("=> impl='fast' sampling would silently distort attention for "
              "this checkpoint; use --impl xla or retrain with normalization")
        sys.exit(1)


if __name__ == "__main__":
    main()

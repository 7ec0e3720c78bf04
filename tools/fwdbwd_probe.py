"""Split the fast train step into forward-rule vs backward+optimizer time.

python tools/fwdbwd_probe.py [batch]  — jits (a) jax.vjp forward only (the
custom_vjp fwd rule incl. checkpoint emission; the 4-output pallas_call is
opaque to DCE) and (b) the full value_and_grad, chained reps, one sync per
round (axon rule). Same process => valid duel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import targetdiff_tpu
from __graft_entry__ import _flagship

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
model, b = _flagship(num_timesteps=1000, max_protein=384, max_ligand=32, batch=B)
rng = np.random.default_rng(0)
pmask = np.zeros((B, 384), bool); pmask[:, :330] = True
lmask = np.arange(32)[None, :] < rng.integers(18, 33, size=(B,))[:, None]
b = b._replace(protein_mask=jnp.asarray(pmask), ligand_mask=jnp.asarray(lmask))
params = model.init(jax.random.PRNGKey(0), b)
key = jax.random.PRNGKey(7)
t = jnp.asarray(rng.integers(0, 1000, (B,)).astype(np.int32))


def loss(p):
    return model.get_diffusion_loss(p, key, b, time_step=t, impl="fast")["loss"]


def bench(fn, label, reps=10, rounds=3):
    t0 = time.time(); r = fn(params); jax.tree_util.tree_map(np.asarray, r)
    print(f"compile {label}: {time.time()-t0:.1f}s")
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            r = fn(params)
        jax.tree_util.tree_map(lambda a: np.asarray(a) if hasattr(a, "shape") and a.ndim == 0 else a,
                               jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.time() - t0) / reps)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return best


# argv[2]: comma-separated BWD_ABLATE specs to duel in THIS process
# (same-process = valid comparison); "none" = production. Env is read at
# trace time inside _block_bwd; a fresh lambda per spec forces a retrace.
specs = (sys.argv[2] if len(sys.argv) > 2 else "none").split(",")

fwd = jax.jit(lambda p: jax.vjp(loss, p)[0])
f = bench(fwd, "fwd-rule only")
base = None
for spec in specs:
    os.environ["BWD_ABLATE"] = "" if spec == "none" else spec
    g = bench(jax.jit(lambda p, _s=spec: jax.value_and_grad(loss)(p)),
              f"value_and_grad[{spec}]")
    if spec == "none":
        base = g
    elif base is not None:
        print(f"  phase '{spec}': {(base - g)*1e3:.1f} ms of the backward")
os.environ.pop("BWD_ABLATE", None)
if base is not None:
    print(f"backward-only estimate: {(base - f)*1e3:.1f} ms  (B={B})")

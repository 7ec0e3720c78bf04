"""Compiled-gradient check on the real TPU: full-model xla-vs-fast grads.

Usage: python tools/tpu_gradcheck.py [batch] [impl]  (impl: fast|fast_bf16)

Interpret-mode parity does NOT catch per-tile block-indexing bugs (interpret
evaluates slices against full arrays) — run this after ANY kernel change.
Expected: zero bad leaves (mathematically-zero k-branch b2 grads may flag
at the 1e-6 scale floor; softmax is invariant to uniform per-head shifts).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import targetdiff_tpu
from __graft_entry__ import _flagship

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
IMPL = sys.argv[2] if len(sys.argv) > 2 else "fast"
model, b = _flagship(num_timesteps=1000, max_protein=384, max_ligand=32, batch=B)
rng = np.random.default_rng(0)
pmask = np.zeros((B, 384), bool); pmask[:, :330] = True
lmask = np.arange(32)[None, :] < rng.integers(18, 33, size=(B,))[:, None]
b = b._replace(protein_mask=jnp.asarray(pmask), ligand_mask=jnp.asarray(lmask))
params = model.init(jax.random.PRNGKey(0), b)
key = jax.random.PRNGKey(7)
t = jnp.asarray(rng.integers(0, 1000, (B,)).astype(np.int32))

def loss_impl(p, impl):
    return model.get_diffusion_loss(p, key, b, time_step=t, impl=impl)["loss"]

la, ga = jax.jit(jax.value_and_grad(lambda p: loss_impl(p, "xla")))(params)
lf, gf = jax.jit(jax.value_and_grad(lambda p: loss_impl(p, IMPL)))(params)
print(f"B={B} loss xla={float(la):.4f} {IMPL}={float(lf):.4f}")
fa, tree = jax.tree_util.tree_flatten_with_path(ga)
fb = jax.tree_util.tree_leaves(gf)
bad = 0
for (path, a), g2 in zip(fa, fb):
    a, g2 = np.asarray(a), np.asarray(g2)
    sc = max(np.abs(a).max(), 1e-6)
    err = np.abs(a - g2).max()
    tol = 0.03 if IMPL == "fast" else 0.08  # bf16-apt tolerance
    if err > tol * sc:
        bad += 1
        if bad <= 12:
            print(f"MISMATCH {jax.tree_util.keystr(path)}: err {err:.3e} scale {sc:.3e}")
print("total leaves:", len(fa), "bad:", bad)

"""Train-step throughput: python tools/trainbench.py [batch] [xla|fast].

Measures jitted optimizer steps (flagship config, 330-atom pockets) in
CHAINED rounds of 10 with one device fetch per round: a per-rep fetch costs
~100 ms of axon-tunnel latency and swamped round-2's numbers. fast = Pallas
layers with Pallas backwards (ops/pallas/edge_layer_vjp.py). One TPU process
at a time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import targetdiff_tpu
from __graft_entry__ import _flagship
from targetdiff_tpu.config import Config
from targetdiff_tpu.trainer import create_train_state, make_train_step
from targetdiff_tpu.utils.train import get_optimizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
impls = (sys.argv[2] if len(sys.argv) > 2 else "xla").split(",")
model, b = _flagship(num_timesteps=1000, max_protein=384, max_ligand=32, batch=B)
rng = np.random.default_rng(0)
pmask = np.zeros((B, 384), bool); pmask[:, :330] = True
lmask = np.arange(32)[None, :] < rng.integers(18, 33, size=(B,))[:, None]
b = b._replace(protein_mask=jnp.asarray(pmask), ligand_mask=jnp.asarray(lmask))
opt = get_optimizer(Config(dict(type="adam", lr=1e-3, weight_decay=0.0,
                                beta1=0.95, beta2=0.999, max_grad_norm=8.0)))
for impl in impls:  # comma-separated impls duel in ONE process (chip drift)
    label = impl
    # round-5 train work-flag duel markers (trace-time toggles):
    #   fast      = production (per-layer cone flags + protein sort)
    #   fastv9    = regeo-clean flags + sort only (need_full_h stays True)
    #   fastoff   = round-4 all-dirty baseline (no flags, no sort)
    #   fastnogc  = production flags, backward geometry cache OFF
    import targetdiff_tpu.models.fast_forward as FF
    import targetdiff_tpu.ops.pallas.block_vjp as BV
    if impl.startswith("fastoff"):
        impl = "fast" + impl[len("fastoff"):]
        FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS = False, False, False
    elif impl.startswith("fastv9"):
        impl = "fast" + impl[len("fastv9"):]
        FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS = False, True, True
    elif impl.startswith("fastnogc"):
        impl = "fast" + impl[len("fastnogc"):]
        FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS = True, True, True
        BV.BWD_GEOM_CACHE = False
    else:
        FF.TRAIN_CONE_FLAGS, FF.TRAIN_SORT, BV.TRAIN_TILE_FLAGS = True, True, True
        BV.BWD_GEOM_CACHE = True
    # "<impl>16" clones the net to bf16 compute (params stay f32) — e.g.
    # xla16 probes whether the HBM-bound XLA fallback halves with bf16
    m_i = model
    if impl.endswith("16"):
        impl = impl[:-2]
        import copy

        m_i = copy.copy(model)
        m_i.net = model.net.clone(dtype=jnp.bfloat16)
    # fresh state per impl: the jitted step donates its state buffers
    state = create_train_state(m_i, opt, jax.random.PRNGKey(0), b)
    step = make_train_step(m_i, opt, pos_noise_std=0.1, impl=impl)
    t0 = time.time()
    state, m = step(state, b, jax.random.PRNGKey(1))
    np.asarray(m["loss"])
    print(f"compile+first: {time.time()-t0:.1f}s  B={B} impl={label}")
    times = []
    for r in range(3):
        t0 = time.time()
        for i in range(10):
            state, m = step(state, b, jax.random.fold_in(jax.random.PRNGKey(2), r * 10 + i))
        np.asarray(m["loss"])  # one sync per round of 10 chained steps
        times.append((time.time() - t0) / 10)
    print(f"train step B={B} impl={label}: best {min(times)*1e3:.1f} ms  "
          f"rounds={[f'{t*1e3:.1f}' for t in times]}  loss={float(m['loss']):.3f}")

"""Cost of compute_tile_flags (v9 vs v10 per-layer cone) as per-step XLA
glue: the v10 reverse-BFS runs L scatter-mins per sampling step, which must
stay negligible next to the ~60-85 ms megakernel call.

Usage: python tools/flagbench.py [NPRO] [B] [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.ops.pallas.block_denoiser import compute_tile_flags
    from _geom import kernel_inputs

    NPRO = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    NL, K, H, L = 32, 32, 128, 9

    _, _, idx, nmask, _, _ = kernel_inputs("pocket", B, NPRO, NL, K, H)
    idx, nmask = jnp.asarray(idx), jnp.asarray(nmask)

    for name, fn in (
        ("v9", jax.jit(lambda i, m: compute_tile_flags(i, m, NL))),
        ("v10", jax.jit(lambda i, m: compute_tile_flags(i, m, NL, num_layers=L))),
    ):
        out = fn(idx, nmask)
        np.asarray(out)
        meds = []
        for _ in range(3):
            t0 = time.time()
            o = out
            for _ in range(reps):
                o = fn(idx + (o[:, :1, None] & 0), nmask)  # chain dependency
            np.asarray(o[0, 0])
            meds.append((time.time() - t0) / reps)
        print(f"{name:<4} {min(meds)*1e3:7.3f} ms/call")


if __name__ == "__main__":
    main()

"""Probe Mosaic support for in-kernel dynamic gathers on this image.

If any of these compile AND return correct values on hardware, the
megakernel's one-hot gather encoding ([N*K, N] matmul operand, ~8.4 ms of
the 57 ms step plus the ~8 ms init build) can be replaced outright.
Round-2 probes failed on every variant; re-run after image/jax upgrades.

Each probe is tried independently; prints ok / COMPILE-FAIL / WRONG per
variant and exits 0 so it can run in CI-ish contexts.
"""

import functools
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _run(name, kernel, out_shape, inputs, expect):
    try:
        fn = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(*out_shape))
        got = np.asarray(jax.jit(fn)(*inputs))
        ok = np.allclose(got, expect, atol=1e-5)
        print(f"{name:<28} {'ok' if ok else 'WRONG (compiles, bad values)'}")
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:100]
        print(f"{name:<28} COMPILE-FAIL: {msg}")
        return False


def main():
    N, K, H = 256, 32, 128
    rng = np.random.default_rng(0)
    h = rng.normal(size=(N, H)).astype(np.float32)
    idx = rng.integers(0, N, size=(N, K)).astype(np.int32)
    expect = h[idx.reshape(-1)]  # [N*K, H]

    def k_take_along(h_ref, i_ref, o_ref):
        ii = jnp.broadcast_to(i_ref[...].reshape(N * K, 1), (N * K, H))
        o_ref[...] = jnp.take_along_axis(h_ref[...], ii, axis=0)

    def k_take(h_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(h_ref[...], i_ref[...].reshape(-1), axis=0)

    def k_index(h_ref, i_ref, o_ref):
        o_ref[...] = h_ref[...][i_ref[...].reshape(-1)]

    def k_dynamic_rows(h_ref, i_ref, o_ref):
        # per-row dynamic slice in a fori_loop (scalar index from SMEM-ish)
        def body(r, _):
            o_ref[pl.ds(r, 1), :] = h_ref[pl.ds(i_ref[r // K, r % K], 1), :]
            return 0

        jax.lax.fori_loop(0, N * K, body, 0)

    out = ((N * K, H), jnp.float32)
    results = {}
    for name, k in (
        ("take_along_axis", k_take_along),
        ("take", k_take),
        ("int-array indexing", k_index),
        ("fori dynamic-row ds", k_dynamic_rows),
    ):
        results[name] = _run(name, k, out, (jnp.asarray(h), jnp.asarray(idx)), expect)
    if any(results.values()):
        print("SUPPORTED: a one-hot-free gather path is now possible — see "
              "ROADMAP 'Megakernel VPU diet' item.")
    else:
        print("unsupported on this image (as in round 2)")


if __name__ == "__main__":
    main()

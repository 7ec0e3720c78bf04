"""Benchmark: molecules/sec/chip for pocket-conditioned sampling.

Workload matches the reference's headline sampling job (reference:
configs/sampling.yml — 100 samples per pocket, 1000 DDPM steps, batch 100)
with the released model config (configs/training.yml: uni_o2, 1x9 layers,
hidden 128, 16 heads, knn 32): the full reverse process runs in one
`jax.lax.scan` on device.

HEADLINE (round 5): the SIZE-WEIGHTED test-set throughput. Real pockets
from the reference's 10 A extraction rule span ~300-600 atoms
(reference: scripts/data_preparation/extract_pockets.py:30-46), so the
benchmark measures the three padded size classes (384/512/640) at their
class-midpoint valid counts and weights them by the mass a U[300,600]
size distribution puts on each class. The single-size 330-atom number of
rounds 1-4 is still reported as `headline_330_mol_per_sec` for
continuity.

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
PyTorch reference on an A100 runs the same 9-layer denoiser 1000x per batch
through ragged scatter/gather kernels with a per-step host sync; public
TargetDiff reproduction reports put it at roughly 8-20 min per 100-molecule
pocket => ~0.1-0.2 mol/s. We use 0.2 mol/s/GPU as a *generous* reference
point for vs_baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_MOL_PER_SEC = 0.2  # generous estimate of reference A100 throughput
PEAK_BF16_TFLOPS = 197.0  # TPU v5e per-chip bf16 peak

# padded size classes and the probability mass U[300, 600] puts on each:
# sizes 300-384 pad to 384, 385-512 to 512, 513-600 to 640. Valid counts
# are the class midpoints (the unbiased per-class representative).
SIZE_CLASSES = [
    dict(pad=384, valid=342, weight=(384 - 300) / 300.0),
    dict(pad=512, valid=448, weight=(512 - 384) / 300.0),
    dict(pad=640, valid=556, weight=(600 - 512) / 300.0),
]


def analytic_step_tflops(batch, NP=384, NL=32, H=128, K=32, L=9, R=20):
    """Analytic model FLOPs for ONE denoiser step of the whole batch, at the
    padded compute shapes. Counts the math any implementation must do
    (node folds, q MLPs, per-edge MLPs, attention); the one-hot gather
    matmuls are an implementation artifact and are excluded, so mfu measures
    honest progress toward speed-of-light (VERDICT r2 next #8)."""
    N = NP + NL
    NK = N * K
    ER = 4 + 4 * R  # edge-feature first-layer width
    per_pass = (
        4 * 2 * N * H * H  # k/v node folds (w1i, w1j)
        + 2 * 2 * N * H * H  # q MLP (2 layers)
        + 2 * NK * ER * (2 * H)  # edge-feature part of k/v first layers
        + 2 * 2 * NK * H * H  # k/v second matmuls
        + 4 * NK * H  # attention logits + weighted aggregation
    )
    ew = 2 * N * K * R * H * 2  # global edge-weight MLP, once per block
    return batch * (2 * L * per_pass + ew) / 1e12


def _make_batch(batch, pad, valid, seed=0):
    from targetdiff_tpu.data.synth import synth_batch

    # realistic pocket/ligand GEOMETRY (round 4): valid pocket atoms fill a
    # 2-10A shell around a covalent-geometry ligand (the crossdocked
    # pocket10 extraction rule) — not a Gaussian blob. This matters because
    # the v9 megakernel skips work via per-step graph structure (dirty
    # tiles), which random blobs under-represent (BASELINE.md round-4).
    rng = np.random.default_rng(seed)
    return synth_batch(rng, batch, max_protein=pad, max_ligand=32,
                       n_protein_range=(valid, valid + 1),
                       n_ligand_range=(18, 28))


def _time_sampling(model, params, b, num_steps, n_rep, key):
    import jax

    from targetdiff_tpu.sampling import init_ligand_state

    init_pos, init_v = init_ligand_state(key, b, model.num_classes)

    def fn(p, k, bb, ip, iv):
        # no outer jit: sample_diffusion jits its scan chunks internally
        # (long single device executions trip the remote-TPU RPC watchdog)
        return model.sample_diffusion(
            p, k, bb, ip, iv, num_steps=num_steps, impl=IMPL,
            dtype=DTYPE, scan_chunk=100,
        )

    # warmup/compile. NOTE: on the tunneled TPU, block_until_ready() returns
    # before remote compute finishes — only an actual device->host fetch
    # (np.asarray) observes completion, so every timed rep ends with one.
    res = fn(params, key, b, init_pos, init_v)
    np.asarray(res.pos)
    times = []
    for i in range(n_rep):
        t0 = time.time()
        res = fn(params, jax.random.fold_in(key, i), b, init_pos, init_v)
        np.asarray(res.pos)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    spread = (max(times) - min(times)) / dt if n_rep > 1 else 0.0
    return dt, spread


IMPL = "fast"
DTYPE = None


def main():
    global IMPL, DTYPE
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    num_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    IMPL = sys.argv[3] if len(sys.argv) > 3 else "fast"  # fused Pallas kernels
    n_rep = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    DTYPE = jnp.bfloat16

    model, b0 = _flagship(num_timesteps=1000, max_protein=384, max_ligand=32,
                          batch=batch)
    model.net = model.net.clone(dtype=DTYPE)
    params = model.init(jax.random.PRNGKey(0), b0)
    key = jax.random.PRNGKey(1)

    # ---- headline-continuity leg: 330-atom pocket, full num_steps reps ----
    b330 = _make_batch(batch, 384, 330)
    dt330, spread = _time_sampling(model, params, b330, num_steps, n_rep, key)
    headline_330 = batch / dt330

    # ---- size-weighted leg: the three padded classes at their midpoint
    # valid counts. Step time is scan-amortized and steady, so each class
    # is measured on a shorter scan (300 steps x 2 reps) and reported as
    # ms/step.
    per_class = []
    for sc in SIZE_CLASSES:
        steps_c = min(num_steps, 300)
        bc = _make_batch(batch, sc["pad"], sc["valid"], seed=2)
        dtc, _ = _time_sampling(model, params, bc, steps_c, 2,
                                jax.random.fold_in(key, sc["pad"]))
        per_class.append(dict(pad=sc["pad"], valid=sc["valid"],
                              weight=round(sc["weight"], 4),
                              ms_per_step=round(1e3 * dtc / steps_c, 2)))
    sw_ms = sum(c["weight"] * c["ms_per_step"] for c in per_class)
    size_weighted = batch / (sw_ms * 1e-3 * num_steps)

    # ---- training leg at its best measured shape (B=32, VERDICT r4 #6) ----
    train_b = 32
    train_sps = _bench_train(model, _make_batch(train_b, 384, 330, seed=3),
                             train_b)
    # train step ~= forward + backward ~= 3x forward model FLOPs (standard
    # fwd:bwd FLOP ratio for matmul-dominated nets)
    train_mfu = (
        round(3 * analytic_step_tflops(train_b) * train_sps / PEAK_BF16_TFLOPS, 4)
        if train_sps else None
    )

    step_tflops_sw = sum(
        c["weight"] * analytic_step_tflops(batch, NP=c["pad"])
        for c in per_class
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"size-weighted sampling throughput ({num_steps}-step DDPM, "
                    f"batch {batch}, pockets U[300,600] per the 10A rule)"
                ),
                "value": round(size_weighted, 4),
                "unit": "molecules/sec/chip",
                "vs_baseline": round(size_weighted / BASELINE_MOL_PER_SEC, 2),
                "rep_spread": round(spread, 3),
                "headline_330_mol_per_sec": round(headline_330, 4),
                "size_classes": per_class,
                "size_weighted_ms_per_step": round(sw_ms, 2),
                "train_batch": train_b,
                "train_steps_per_sec": train_sps,
                "train_complexes_per_sec": (
                    round(train_sps * train_b, 1) if train_sps else None
                ),
                "train_mfu": train_mfu,
                "tflops_per_step": round(step_tflops_sw, 3),
                "achieved_tflops": round(step_tflops_sw / (sw_ms * 1e-3), 1),
                "mfu": round(
                    step_tflops_sw / (sw_ms * 1e-3) / PEAK_BF16_TFLOPS, 4
                ),
            }
        )
    )


def _bench_train(model, b, batch, n_steps: int = 20):
    """Train-step throughput (Pallas fwd+bwd kernels) as a secondary
    metric; returns steps/sec or None if it fails."""
    import jax

    from targetdiff_tpu.config import Config
    from targetdiff_tpu.trainer import create_train_state, make_train_step
    from targetdiff_tpu.utils.train import get_optimizer

    try:
        tb = jax.tree_util.tree_map(lambda x: x[:batch], b)
        opt = get_optimizer(
            Config(dict(type="adam", lr=5e-4, weight_decay=0, beta1=0.95,
                        beta2=0.999, max_grad_norm=8.0))
        )
        state = create_train_state(model, opt, jax.random.PRNGKey(0), tb)
        # training fast path: Pallas layers with hand-written Pallas backwards
        step_fn = make_train_step(model, opt, pos_noise_std=0.1, impl="fast")
        key = jax.random.PRNGKey(2)
        state, metrics = step_fn(state, tb, key)  # compile
        np.asarray(metrics["loss"])
        t0 = time.time()
        for i in range(n_steps):
            state, metrics = step_fn(state, tb, jax.random.fold_in(key, i))
        np.asarray(metrics["loss"])
        return round(n_steps / (time.time() - t0), 2)
    except Exception as e:
        sys.stderr.write(f"[bench] train bench skipped ({type(e).__name__}: {e})\n")
        return None


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # fall back to the XLA path if a kernel faults
        sys.stderr.write(f"[bench] fast path failed ({type(e).__name__}: {e}); "
                         "retrying with XLA impl\n")
        sys.argv = [sys.argv[0], sys.argv[1] if len(sys.argv) > 1 else "1000",
                    sys.argv[2] if len(sys.argv) > 2 else "100", "xla"]
        main()

"""Benchmark: molecules/sec/chip for pocket-conditioned sampling.

Workload matches the reference's headline sampling job (reference:
configs/sampling.yml — 100 samples per pocket, 1000 DDPM steps, batch 100)
with the released model config (configs/training.yml: uni_o2, 1x9 layers,
hidden 128, 16 heads, knn 32): the full reverse process runs in one
`jax.lax.scan` on device.

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


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from targetdiff_tpu.sampling import init_ligand_state

    num_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    impl = sys.argv[3] if len(sys.argv) > 3 else "fast"  # fused Pallas kernels
    dtype = jnp.bfloat16

    # realistic pocket/ligand GEOMETRY (round 4): ~330 valid pocket atoms
    # filling a 2-10A shell around a covalent-geometry ligand of 18-28 atoms
    # (the crossdocked pocket10 extraction rule) — not the round-1..3
    # Gaussian blob. Same padded shapes/workload; this matters because the
    # v9 megakernel skips work via per-step graph structure (dirty tiles),
    # which random blobs under-represent (see BASELINE.md round-4 notes).
    model, b = _flagship(num_timesteps=1000, max_protein=384, max_ligand=32, batch=batch)
    model.net = model.net.clone(dtype=dtype)
    from targetdiff_tpu.data.synth import synth_batch

    rng = np.random.default_rng(0)
    b = synth_batch(rng, batch, max_protein=384, max_ligand=32,
                    n_protein_range=(330, 331), n_ligand_range=(18, 28))

    params = model.init(jax.random.PRNGKey(0), b)
    key = jax.random.PRNGKey(1)
    init_pos, init_v = init_ligand_state(key, b, model.num_classes)

    # no outer jit: sample_diffusion jits its scan chunks internally (long
    # single device executions trip the remote-TPU RPC watchdog)
    def fn(p, k, bb, ip, iv):
        return model.sample_diffusion(
            p, k, bb, ip, iv, num_steps=num_steps, impl=impl, dtype=dtype,
            scan_chunk=100,
        )

    # warmup/compile. NOTE: on the tunneled TPU, block_until_ready() returns
    # before remote compute finishes — only an actual device->host fetch
    # (np.asarray) observes completion, so every timed rep ends with one.
    res = fn(params, key, b, init_pos, init_v)
    np.asarray(res.pos)

    n_rep = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    times = []
    for i in range(n_rep):
        t0 = time.time()
        res = fn(params, jax.random.fold_in(key, i), b, init_pos, init_v)
        np.asarray(res.pos)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    spread = (max(times) - min(times)) / dt if n_rep > 1 else 0.0

    train_sps = _bench_train(model, b)
    # train step ~= forward + backward ~= 3x forward model FLOPs (standard
    # fwd:bwd FLOP ratio for matmul-dominated nets), batch 16
    train_mfu = (
        round(3 * analytic_step_tflops(16) * train_sps / PEAK_BF16_TFLOPS, 4)
        if train_sps else None
    )

    mol_per_sec = batch / dt
    n_chips = 1  # single-chip benchmark; sampling scales linearly over dp
    value = mol_per_sec / n_chips
    step_tflops = analytic_step_tflops(batch)
    step_time = dt / num_steps
    print(
        json.dumps(
            {
                "metric": f"sampling throughput ({num_steps}-step DDPM, batch {batch}, 330-atom pocket)",
                "value": round(value, 4),
                "unit": "molecules/sec/chip",
                "vs_baseline": round(value / BASELINE_MOL_PER_SEC, 2),
                "rep_spread": round(spread, 3),
                "train_steps_per_sec": train_sps,
                "train_mfu": train_mfu,
                "tflops_per_step": round(step_tflops, 3),
                "achieved_tflops": round(step_tflops / step_time, 1),
                "mfu": round(step_tflops / step_time / PEAK_BF16_TFLOPS, 4),
            }
        )
    )


def _bench_train(model, b, n_steps: int = 20):
    """Train-step throughput (batch 16, Pallas fwd+bwd kernels) as a
    secondary metric; returns steps/sec or None if it fails."""
    import jax
    import jax.numpy as jnp

    from targetdiff_tpu.config import Config
    from targetdiff_tpu.trainer import create_train_state, make_train_step
    from targetdiff_tpu.utils.train import get_optimizer

    try:
        tb = jax.tree_util.tree_map(lambda x: x[:16], b)
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

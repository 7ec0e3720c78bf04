"""Worker for the multi-host tests (not a test module itself).

Run as:  python tests/multihost_worker.py PID PORT [MODE]
  PID >= 0: join a 2-process jax.distributed run (4 local CPU devices each,
            8 global) over the process-spanning mesh.
  PID = -1: single-process reference (8 local CPU devices), same mesh shape.
  MODE: "train" (default) — one train step, prints ``LOSS=``/``VAL=``;
        "sample" — the production sharded test-set sampler
        (sampling.sample_testset_sharded) over the same mesh, prints
        ``POS=``/``V=`` digests of the full gathered result.

All invocations of a mode must agree — verifying the SURVEY §5 multi-host
path (jax.distributed + global arrays + psum/allgather over the
process-spanning mesh) for BOTH training and sampling.
"""

import os
import sys


def main(pid: int, port: int, mode: str = "train") -> None:
    n_local = 8 if pid < 0 else 4
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local} "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from targetdiff_tpu.parallel.mesh import (
        init_distributed,
        make_mesh,
        replicate_state,
        shard_batch,
    )

    if pid >= 0:
        assert init_distributed(f"localhost:{port}", 2, pid)

    import jax.numpy as jnp
    import numpy as np

    from targetdiff_tpu.data.batch import ComplexBatch
    from targetdiff_tpu.models.score_model import DiffusionModel
    from targetdiff_tpu.trainer import create_train_state, make_train_step
    from targetdiff_tpu.utils import train as train_utils
    from targetdiff_tpu.config import Config

    cfg = Config(
        dict(
            model_mean_type="C0", beta_schedule="sigmoid", beta_start=1e-7,
            beta_end=2e-3, v_beta_schedule="cosine", v_beta_s=0.01,
            num_diffusion_timesteps=10, loss_v_weight=100.0,
            sample_time_method="symmetric", time_emb_dim=0,
            time_emb_mode="simple", center_pos_mode="protein",
            node_indicator=True, model_type="uni_o2", num_blocks=1,
            num_layers=1, hidden_dim=16, n_heads=2, edge_feat_dim=4,
            num_r_gaussian=20, knn=6, num_node_types=8, act_fn="relu",
            norm=True, cutoff_mode="knn", ew_net_type="global", num_x2h=1,
            num_h2x=1, r_max=10.0, x2h_out_fc=False, sync_twoup=False,
        )
    )
    B, NP_, NL, FP, NC = 8, 16, 8, 27, 13
    rng = np.random.default_rng(42)
    batch = ComplexBatch(
        jnp.asarray(rng.normal(size=(B, NP_, 3)).astype(np.float32) * 3),
        jnp.asarray((rng.random((B, NP_, FP)) > 0.7).astype(np.float32)),
        jnp.asarray(np.ones((B, NP_), bool)),
        jnp.asarray(rng.normal(size=(B, NL, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, NC, (B, NL)).astype(np.int32)),
        jnp.asarray(np.ones((B, NL), bool)),
    )

    model = DiffusionModel(cfg, FP, NC, max_protein=NP_, max_ligand=NL)

    if mode == "sample":
        from targetdiff_tpu.sampling import sample_testset_sharded

        params = model.init(jax.random.PRNGKey(0), batch)
        mesh = make_mesh(n_dp=8, n_mp=1)
        prng = np.random.default_rng(42)
        pockets = [
            {
                "protein_pos": prng.normal(size=(12, 3)).astype(np.float32) * 3,
                "protein_feat": (prng.random((12, FP)) > 0.7).astype(np.float32),
            }
            for _ in range(2)
        ]
        out = sample_testset_sharded(
            model, params, pockets, 4, jax.random.PRNGKey(5), mesh=mesh,
            num_steps=4, sample_num_atoms="ref", ref_sizes=[4, 5],
            max_protein=NP_, max_ligand=NL, impl="xla",
            rng=np.random.default_rng(0), chunk_rows=8,
        )
        pos_all = np.concatenate(
            [p.ravel() for e in out for p in e["pos"]]
        ).astype(np.float64)
        v_all = np.concatenate([v.ravel() for e in out for v in e["v"]])
        # POS as a rounded checksum (cross-process bitwise equality is
        # asserted separately on the exact digest), V as the full sequence
        import hashlib

        digest = hashlib.md5(pos_all.tobytes()).hexdigest()
        print(f"POS={pos_all.sum():.10f}", flush=True)
        print(f"POSDIGEST={digest}", flush=True)
        print(f"V={','.join(str(int(x)) for x in v_all)}", flush=True)
        return

    optimizer = train_utils.get_optimizer(
        Config(dict(type="adam", lr=1e-3, weight_decay=0.0, beta1=0.95,
                    beta2=0.999, max_grad_norm=8.0))
    )
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), batch)

    mesh = make_mesh(n_dp=8, n_mp=1)
    state = state._replace(
        params=replicate_state(state.params, mesh),
        opt_state=replicate_state(state.opt_state, mesh),
    )
    gbatch = shard_batch(batch, mesh)
    train_step = make_train_step(model, optimizer, pos_noise_std=0.0, mesh=mesh)
    state, metrics = train_step(state, gbatch, jax.random.PRNGKey(7))
    print(f"LOSS={float(metrics['loss']):.10f}", flush=True)

    # validation step over the same mesh: every process must see the
    # identical val loss (keeps LR scheduler / best-val decisions in sync)
    from targetdiff_tpu.trainer import make_eval_step

    eval_step = make_eval_step(model)
    out = eval_step(state.params, gbatch, 5, jax.random.PRNGKey(11))
    print(f"VAL={float(out['loss']):.10f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]),
         sys.argv[3] if len(sys.argv) > 3 else "train")

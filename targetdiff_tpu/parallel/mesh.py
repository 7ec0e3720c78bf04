"""Device mesh + sharding layout for multi-chip training and sampling.

This module is the framework's entire distributed story, replacing the
reference's shell-script GPU sharding (reference:
scripts/batch_sample_diffusion.sh:15-21 — zero-communication index sharding of
pockets across processes) with a first-class `jax.sharding.Mesh`:

  * axis "dp": data parallel — complexes (training) or pocketxsample rows
    (sampling) are sharded on the leading batch axis; XLA inserts the psum
    for gradients over ICI.
  * axis "mp": tensor parallel — the hidden dimension of the denoiser MLP
    kernels is sharded; GSPMD propagates the activation shardings and places
    the collectives.

Sampling needs no collectives at all (perfectly parallel over rows), so it
scales linearly across a slice; training is standard DP(+TP) pjit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_dp: Optional[int] = None, n_mp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_mp
    assert n_dp * n_mp <= len(devices), (n_dp, n_mp, len(devices))
    grid = np.array(devices[: n_dp * n_mp]).reshape(n_dp, n_mp)
    return Mesh(grid, axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel parameter layout: shard the output dim of 2D kernels
    over "mp" when divisible; replicate everything else. With n_mp == 1 this
    is plain replication (pure DP)."""
    n_mp = mesh.shape["mp"]

    def spec_for(path, leaf):
        if leaf.ndim == 2 and leaf.shape[-1] % n_mp == 0 and leaf.shape[-1] >= n_mp:
            return NamedSharding(mesh, P(None, "mp"))
        if leaf.ndim == 1 and leaf.shape[0] % n_mp == 0 and leaf.shape[0] >= max(n_mp, 8):
            return NamedSharding(mesh, P("mp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_batch(batch, mesh: Mesh):
    """Place a ComplexBatch (or any pytree with leading batch axis) onto the
    mesh, sharded over dp. Works single-process (device_put) and
    multi-process (each process materializes only its addressable shards of
    the identical global batch)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(lambda x: global_array(x, sh), batch)


# ---------------------------------------------------------------------------
# multi-host (DCN) support — SURVEY §5 "TPU-native equivalent: jax.distributed
# + multi-host pjit". The reference has no distributed runtime at all; its
# only multi-device mechanism is shell-script process sharding
# (scripts/batch_sample_diffusion.sh:15-21).
# ---------------------------------------------------------------------------


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process JAX runtime (call BEFORE anything touches
    the backend — the first `jax.devices()` locks it). On TPU pods the three
    arguments auto-detect from the environment; on CPU/GPU they must be
    given. Returns True when running multi-process."""
    if coordinator_address is None and num_processes is None:
        # single-host run, or TPU-pod auto-detection explicitly not requested
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def global_array(x, sharding: NamedSharding):
    """Build a global jax.Array spanning all processes from an identical
    host-local copy of the full value (every process holds the same global
    batch; each materializes only its addressable shards)."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def replicate_state(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across every device of a
    process-spanning mesh."""
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(lambda x: global_array(x, sh), tree)

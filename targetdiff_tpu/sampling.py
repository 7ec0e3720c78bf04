"""High-level sampling pipeline: many molecules per pocket, fully on device.

Counterpart of the reference's `sample_diffusion_ligand`
(reference: scripts/sample_diffusion.py:31-116), redesigned for TPU:

  * one pocket is padded once and replicated across the batch axis;
  * per-sample ligand sizes come from the atom-count prior on the host and
    become static-shape masks (no ragged batching, no size bucketing needed);
  * init positions = pocket COM + N(0,1), init types ~ uniform Gumbel
    (reference :61-70);
  * the full 1000-step reverse process runs inside `jax.lax.scan`
    (models/score_model.py), and results are un-padded on the host once at
    the end — versus the reference's per-step device->host trajectory
    offload;
  * across many pockets/devices, rows shard over the mesh "dp" axis with no
    collectives (replacing scripts/batch_sample_diffusion.sh).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.batch import ComplexBatch
from .models.score_model import DiffusionModel
from .utils import atom_num


def init_ligand_state(
    key: jax.Array, batch: ComplexBatch, num_classes: int, pos_only: bool = False
):
    """Initial reverse-process state: positions at pocket COM + unit Gaussian,
    types uniform (reference: scripts/sample_diffusion.py:60-70)."""
    k_pos, k_v = jax.random.split(key)
    m = batch.protein_mask.astype(jnp.float32)[..., None]
    com = (batch.protein_pos * m).sum(1, keepdims=True) / jnp.maximum(m.sum(1, keepdims=True), 1.0)
    init_pos = com + jax.random.normal(k_pos, batch.ligand_pos.shape)
    if pos_only:
        init_v = batch.ligand_v
    else:
        uniform_logits = jnp.zeros(batch.ligand_v.shape + (num_classes,))
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(k_v, uniform_logits.shape) + 1e-30) + 1e-30)
        init_v = jnp.argmax(gumbel + uniform_logits, axis=-1)
    return init_pos, init_v


def sample_ligand_sizes(
    protein_pos: np.ndarray,
    n: int,
    mode: str = "prior",
    ref_size: Optional[int] = None,
    max_ligand: int = 64,
    rng: Optional[np.random.Generator] = None,
    start_index: int = 0,
) -> np.ndarray:
    """Per-sample ligand atom counts (reference: scripts/sample_diffusion.py:45-57).
    mode: prior | range | ref."""
    rng = rng or np.random.default_rng()
    if mode == "prior":
        space = atom_num.get_space_size(protein_pos)
        sizes = np.array([atom_num.sample_atom_num(space, rng) for _ in range(n)])
    elif mode == "range":
        sizes = np.arange(start_index + 1, start_index + n + 1)
    elif mode == "ref":
        assert ref_size is not None
        sizes = np.full(n, ref_size)
    else:
        raise ValueError(mode)
    return np.clip(sizes, 1, max_ligand).astype(np.int32)


def choose_protein_padding(np_max: int, max_protein: int,
                           max_ligand: int) -> int:
    """Protein padding for the sharded sampler: the next multiple of 64.

    Trading extra padded rows for a WIDER megakernel tile was measured and
    REJECTED (tools/pocketbench.py `512,512@544` duel, 2026-08-18, v5e,
    realistic geometry): 512 valid atoms at N=544/TI=32 ran 71.4 ms/call
    vs 73.6 at N=576/TI=96 — the finer tiling skips MORE work via the v9
    per-tile flags (65% of regeo tiles clean vs 56%; 73% of last-x2h tiles
    dead vs 66%), which outweighs the narrow tile's loop overhead. Natural
    padding wins; do not reintroduce a tile-widening bump without a duel.
    """
    if np_max > max_protein:
        raise ValueError(
            f"largest pocket has {np_max} atoms but max_protein={max_protein}"
        )
    return min(max_protein, -(-np_max // 64) * 64)


def sample_diffusion_ligand(
    model: DiffusionModel,
    params,
    pocket: Dict[str, np.ndarray],  # {'protein_pos': [NP,3], 'protein_feat': [NP,FP]}
    num_samples: int,
    key: jax.Array,
    batch_size: int = 100,
    num_steps: Optional[int] = None,
    pos_only: bool = False,
    center_pos_mode: str = "protein",
    sample_num_atoms: str = "prior",
    ref_ligand: Optional[Dict[str, np.ndarray]] = None,  # for mode 'ref'/pos_only
    max_protein: Optional[int] = None,
    max_ligand: Optional[int] = None,
    return_traj: bool = False,
    traj_stride: int = 1,
    rng: Optional[np.random.Generator] = None,
    impl: str = "auto",
    sampler: str = "ddpm",
    eta: float = 0.0,
    ddim_spacing: str = "uniform",
) -> Dict[str, Any]:
    """Generate `num_samples` molecules for one pocket. Returns numpy results
    un-padded per sample, mirroring the reference's output lists
    (reference: scripts/sample_diffusion.py:87-116). `sampler='ddim'`
    strides the full schedule over `num_steps` jumps (score_model.py
    sample_diffusion) — no reference counterpart."""
    from .models.fast_forward import resolve_impl

    max_protein = max_protein or model.max_protein
    max_ligand = max_ligand or model.max_ligand
    rng = rng or np.random.default_rng(0)
    impl = resolve_impl(model.config, impl)

    ppos = np.asarray(pocket["protein_pos"], np.float32)
    pfeat = np.asarray(pocket["protein_feat"], np.float32)
    NP_ = len(ppos)
    if NP_ > max_protein:
        raise ValueError(
            f"pocket has {NP_} atoms but max_protein={max_protein}; "
            f"re-run with --max_protein >= {NP_} (rounded up to a multiple of 128 "
            f"keeps TPU tiling efficient)"
        )

    all_pos: List[np.ndarray] = []
    all_v: List[np.ndarray] = []
    all_pos_traj: List[np.ndarray] = []
    all_v_traj: List[np.ndarray] = []
    time_list: List[float] = []

    def run_sampler(p, k, b, ip, iv):
        # no outer jit: sample_diffusion chunk-jits its scan internally so a
        # single device execution stays below remote-RPC watchdog limits
        return model.sample_diffusion(
            p, k, b, ip, iv,
            num_steps=num_steps, center_pos_mode=center_pos_mode,
            pos_only=pos_only, return_traj=return_traj, impl=impl,
            sampler=sampler, eta=eta, ddim_spacing=ddim_spacing,
        )

    done = 0
    while done < num_samples:
        n = min(batch_size, num_samples - done)
        if sample_num_atoms == "ref":
            ref_size = len(ref_ligand["ligand_pos"])
            sizes = sample_ligand_sizes(ppos, n, "ref", ref_size=ref_size, max_ligand=max_ligand)
        else:
            sizes = sample_ligand_sizes(
                ppos, n, sample_num_atoms, max_ligand=max_ligand, rng=rng, start_index=done
            )

        # build padded batch (host); protein padded to a bucket boundary so at
        # most a handful of compile variants cover the whole test set
        NPpad = min(max_protein, -(-NP_ // 64) * 64)
        ppad = np.zeros((NPpad, 3), np.float32)
        fpad = np.zeros((NPpad, pfeat.shape[-1]), np.float32)
        ppad[:NP_] = ppos
        fpad[:NP_] = pfeat
        pmask = np.zeros((n, NPpad), bool)
        pmask[:, :NP_] = True
        batch = ComplexBatch(
            protein_pos=jnp.asarray(np.broadcast_to(ppad, (n, NPpad, 3))),
            protein_feat=jnp.asarray(np.broadcast_to(fpad, (n, NPpad, pfeat.shape[-1]))),
            protein_mask=jnp.asarray(pmask),
            ligand_pos=jnp.zeros((n, max_ligand, 3), jnp.float32),
            ligand_v=jnp.zeros((n, max_ligand), jnp.int32),
            ligand_mask=jnp.asarray(np.arange(max_ligand)[None, :] < sizes[:, None]),
        )
        if pos_only and ref_ligand is not None:
            lv = np.zeros((n, max_ligand), np.int32)
            lv[:, : len(ref_ligand["ligand_v"])] = ref_ligand["ligand_v"]
            batch = batch._replace(ligand_v=jnp.asarray(lv))

        key, k_init, k_samp = jax.random.split(key, 3)
        init_pos, init_v = init_ligand_state(k_init, batch, model.num_classes, pos_only)

        t1 = time.time()
        res = run_sampler(params, k_samp, batch, init_pos, init_v)
        # np.asarray is the reliable device sync on remote-attached TPUs
        # (block_until_ready can return before remote compute finishes)
        pos_np = np.asarray(res.pos, np.float64)
        v_np = np.asarray(res.v)
        time_list.append(time.time() - t1)
        for i in range(n):
            s = int(sizes[i])
            all_pos.append(pos_np[i, :s])
            all_v.append(v_np[i, :s])
        if return_traj:
            pt = np.asarray(res.pos_traj, np.float64)[::traj_stride]
            vt = np.asarray(res.v_traj)[::traj_stride]
            for i in range(n):
                s = int(sizes[i])
                all_pos_traj.append(pt[:, i, :s])
                all_v_traj.append(vt[:, i, :s])
        done += n

    return {
        "pos": all_pos,
        "v": all_v,
        "pos_traj": all_pos_traj,
        "v_traj": all_v_traj,
        "time": time_list,
    }


def _fetch_global(x) -> np.ndarray:
    """Device->host fetch that works on process-spanning shardings: with one
    process this is np.asarray; with several, the dp-sharded global array is
    all-gathered so every process sees the full value."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def sample_testset_sharded(
    model: DiffusionModel,
    params,
    pockets: List[Dict[str, np.ndarray]],
    num_samples_per_pocket: int,
    key: jax.Array,
    mesh=None,
    num_steps: Optional[int] = None,
    sample_num_atoms: str = "prior",
    max_protein: Optional[int] = None,
    max_ligand: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
    chunk_rows: Optional[int] = None,
    impl: str = "auto",
    ref_sizes: Optional[List[int]] = None,
    sampler: str = "ddpm",
    eta: float = 0.0,
    ddim_spacing: str = "uniform",
) -> List[Dict[str, Any]]:
    """Multi-pocket sampling with rows sharded over the mesh "dp" axis — the
    mesh-native replacement for the reference's shell-script GPU sharding
    (reference: scripts/batch_sample_diffusion.sh:15-21, which forks one
    process per GPU and splits pockets by index modulo).

    Pocket x sample rows are processed in HBM-bounded chunks of `chunk_rows`
    (default 100, rounded to a dp multiple): each pocket is uploaded to the
    device bank once, chunk batches are gathered on device from that bank,
    and the chunk's leading axis is dp-sharded. Sampling needs no
    collectives, so throughput scales linearly with chips, and peak memory
    is chunk_rows x max_protein activations regardless of the test-set size
    (100 pockets x 100 samples runs in 100-row slices).

    Returns one result dict per pocket ({'pos': [...], 'v': [...],
    'time': measured device seconds attributed to this pocket's rows}).
    """
    from .models.fast_forward import resolve_impl
    from .parallel.mesh import make_mesh, shard_batch

    max_protein = max_protein or model.max_protein
    max_ligand = max_ligand or model.max_ligand
    rng = rng or np.random.default_rng(0)
    impl = resolve_impl(model.config, impl)
    if sample_num_atoms == "ref" and ref_sizes is None:
        raise ValueError(
            "sample_num_atoms='ref' needs ref_sizes (one reference ligand "
            "size per pocket) in the sharded path"
        )
    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()
    n_dp = mesh.shape["dp"] if mesh is not None else 1

    P = len(pockets)
    S = num_samples_per_pocket
    rows = P * S

    # ---- pocket bank: each pocket uploaded ONCE, [P, NPpad, *] on device ----
    fp = pockets[0]["protein_feat"].shape[-1]
    np_max = max(len(p["protein_pos"]) for p in pockets)
    if np_max > max_protein:
        raise ValueError(
            f"largest pocket has {np_max} atoms but max_protein={max_protein}"
        )
    NPpad = choose_protein_padding(np_max, max_protein, max_ligand)
    bank_pos = np.zeros((P, NPpad, 3), np.float32)
    bank_feat = np.zeros((P, NPpad, fp), np.float32)
    bank_len = np.zeros((P,), np.int32)
    row_sizes = np.ones((rows,), np.int32)
    for pi, pocket in enumerate(pockets):
        pp = np.asarray(pocket["protein_pos"], np.float32)
        bank_pos[pi, : len(pp)] = pp
        bank_feat[pi, : len(pp)] = np.asarray(pocket["protein_feat"], np.float32)
        bank_len[pi] = len(pp)
        row_sizes[pi * S : (pi + 1) * S] = sample_ligand_sizes(
            pp, S, sample_num_atoms, max_ligand=max_ligand, rng=rng,
            ref_size=None if ref_sizes is None else ref_sizes[pi],
        )
    row_pocket = np.repeat(np.arange(P, dtype=np.int32), S)
    bank_pos_d = jnp.asarray(bank_pos)
    bank_feat_d = jnp.asarray(bank_feat)
    bank_len_d = jnp.asarray(bank_len)

    # ---- HBM-bounded chunking: at most `chunk_rows` complexes in flight ----
    if chunk_rows is None:
        chunk_rows = 100
    chunk_rows = max(n_dp, (chunk_rows // n_dp) * n_dp)

    pos_out: List[Optional[np.ndarray]] = [None] * rows
    v_out: List[Optional[np.ndarray]] = [None] * rows
    pocket_time = np.zeros((P,), np.float64)
    for start in range(0, rows, chunk_rows):
        idx = np.arange(start, min(start + chunk_rows, rows))
        pad = (-len(idx)) % n_dp
        ids = np.concatenate([row_pocket[idx], np.zeros(pad, np.int32)])
        szs = np.concatenate([row_sizes[idx], np.ones(pad, np.int32)])
        C = len(ids)
        ids_d = jnp.asarray(ids)
        # device-side gather from the bank — the pocket is never replicated
        # on the host (reference's shell sharding re-reads it per process)
        batch = ComplexBatch(
            protein_pos=jnp.take(bank_pos_d, ids_d, axis=0),
            protein_feat=jnp.take(bank_feat_d, ids_d, axis=0),
            protein_mask=jnp.arange(NPpad)[None, :] < bank_len_d[ids_d][:, None],
            ligand_pos=jnp.zeros((C, max_ligand, 3), jnp.float32),
            ligand_v=jnp.zeros((C, max_ligand), jnp.int32),
            ligand_mask=jnp.asarray(np.arange(max_ligand)[None, :] < szs[:, None]),
        )
        if mesh is not None:
            batch = shard_batch(batch, mesh)

        key, k_init, k_samp = jax.random.split(key, 3)
        init_pos, init_v = init_ligand_state(k_init, batch, model.num_classes)
        t1 = time.time()
        res = model.sample_diffusion(
            params, k_samp, batch, init_pos, init_v, num_steps=num_steps,
            impl=impl, sampler=sampler, eta=eta, ddim_spacing=ddim_spacing,
        )
        # np.asarray is the reliable device sync on remote-attached TPUs.
        # Multi-host: the result rows are dp-sharded across processes, so a
        # plain fetch would only see addressable shards — all-gather the
        # global value so every process returns the identical full result
        # (tested: tests/test_multihost.py 2-process sampling)
        pos_np = np.asarray(_fetch_global(res.pos), np.float64)
        v_np = _fetch_global(res.v)
        chunk_t = time.time() - t1
        # honest per-pocket timing: attribute the measured chunk time to
        # pockets by their share of the chunk's real (non-pad) rows
        for pi2, cnt in zip(*np.unique(row_pocket[idx], return_counts=True)):
            pocket_time[pi2] += chunk_t * cnt / len(idx)
        for ci, r in enumerate(idx):
            s = int(row_sizes[r])
            pos_out[r] = pos_np[ci, :s]
            v_out[r] = v_np[ci, :s]

    out = []
    for pi in range(P):
        entry = {"pos": [], "v": [], "time": float(pocket_time[pi])}
        for si in range(S):
            r = pi * S + si
            entry["pos"].append(pos_out[r])
            entry["v"].append(v_out[r])
        out.append(entry)
    return out

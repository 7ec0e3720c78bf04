"""Dense padded batch containers — the TPU-native replacement for PyG's
ragged `Batch.from_data_list` collation (reference: datasets/pl_data.py:39-49,
scripts/train_diffusion.py:88-98).

Each complex is padded to fixed (max_protein, max_ligand) shapes with boolean
validity masks; batches are plain NamedTuple pytrees that flow through
jit/vmap/pjit and shard cleanly on the leading batch axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class ComplexBatch(NamedTuple):
    """A batch of protein-ligand complexes, dense-padded.

    protein_pos:   [B, NP, 3] float32 — pocket atom coordinates (Angstrom)
    protein_feat:  [B, NP, FP] float32 — one-hot element+AA+backbone features
    protein_mask:  [B, NP] bool
    ligand_pos:    [B, NL, 3] float32
    ligand_v:      [B, NL] int32 — ligand atom-type class indices
    ligand_mask:   [B, NL] bool
    """

    protein_pos: jnp.ndarray
    protein_feat: jnp.ndarray
    protein_mask: jnp.ndarray
    ligand_pos: jnp.ndarray
    ligand_v: jnp.ndarray
    ligand_mask: jnp.ndarray

    @property
    def num_graphs(self) -> int:
        return self.protein_pos.shape[0]

    @property
    def max_protein(self) -> int:
        return self.protein_pos.shape[1]

    @property
    def max_ligand(self) -> int:
        return self.ligand_pos.shape[1]


def pad_complex(
    protein_pos: np.ndarray,
    protein_feat: np.ndarray,
    ligand_pos: Optional[np.ndarray],
    ligand_v: Optional[np.ndarray],
    max_protein: int,
    max_ligand: int,
) -> ComplexBatch:
    """Pad a single complex to fixed shapes (batch of 1)."""
    np_, nl = len(protein_pos), 0 if ligand_pos is None else len(ligand_pos)
    if np_ > max_protein:
        raise ValueError(f"protein has {np_} atoms > max_protein={max_protein}")
    if nl > max_ligand:
        raise ValueError(f"ligand has {nl} atoms > max_ligand={max_ligand}")
    fp = protein_feat.shape[-1]

    ppos = np.zeros((1, max_protein, 3), np.float32)
    pfeat = np.zeros((1, max_protein, fp), np.float32)
    pmask = np.zeros((1, max_protein), bool)
    ppos[0, :np_] = protein_pos
    pfeat[0, :np_] = protein_feat
    pmask[0, :np_] = True

    lpos = np.zeros((1, max_ligand, 3), np.float32)
    lv = np.zeros((1, max_ligand), np.int32)
    lmask = np.zeros((1, max_ligand), bool)
    if nl:
        lpos[0, :nl] = ligand_pos
        lv[0, :nl] = ligand_v
        lmask[0, :nl] = True

    return ComplexBatch(
        protein_pos=jnp.asarray(ppos),
        protein_feat=jnp.asarray(pfeat),
        protein_mask=jnp.asarray(pmask),
        ligand_pos=jnp.asarray(lpos),
        ligand_v=jnp.asarray(lv),
        ligand_mask=jnp.asarray(lmask),
    )


def stack_complexes(batches: Sequence[ComplexBatch]) -> ComplexBatch:
    """Concatenate single-complex batches along the batch axis."""
    return ComplexBatch(*[jnp.concatenate([getattr(b, f) for b in batches], axis=0)
                          for f in ComplexBatch._fields])


def replicate(batch: ComplexBatch, n: int) -> ComplexBatch:
    """Tile one pocket n times — the reference's Batch.from_data_list([data]*n)
    pattern for many samples per pocket (reference: scripts/sample_diffusion.py:42)."""
    return ComplexBatch(*[jnp.repeat(getattr(batch, f), n, axis=0) for f in ComplexBatch._fields])

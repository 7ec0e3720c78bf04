"""Radial basis (Gaussian smearing) distance featurization.

The reference uses a hand-fixed 20-knot offset table by default
(reference: models/common.py:7-26); we reproduce both the fixed table and the
linspace variant. Pure functions of arrays — usable inside jit/scan/pallas.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Hand-tuned RBF knots (reference: models/common.py:15)
FIXED_OFFSETS = np.array(
    [0, 1, 1.25, 1.5, 1.75, 2, 2.25, 2.5, 2.75, 3, 3.5, 4, 4.5, 5, 5.5, 6, 7, 8, 9, 10],
    dtype=np.float32,
)


def gaussian_smearing_offsets(
    start: float = 0.0, stop: float = 5.0, num_gaussians: int = 50, fixed_offset: bool = True
):
    """Returns (offsets [G], coeff scalar). coeff = -0.5/(offset[1]-offset[0])^2
    (reference: models/common.py:13-18)."""
    if fixed_offset:
        offsets = FIXED_OFFSETS
    else:
        offsets = np.linspace(start, stop, num_gaussians, dtype=np.float32)
    coeff = -0.5 / float(offsets[1] - offsets[0]) ** 2
    return jnp.asarray(offsets), coeff


def gaussian_smearing(dist: jnp.ndarray, offsets: jnp.ndarray, coeff: float) -> jnp.ndarray:
    """dist [..., 1] or [...] -> [..., G] Gaussian RBF features
    (reference: models/common.py:24-26)."""
    if dist.shape[-1] == 1:
        dist = dist[..., 0]
    d = dist[..., None] - offsets
    return jnp.exp(coeff * d * d)

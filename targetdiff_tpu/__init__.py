"""targetdiff_tpu — a TPU-native JAX framework for target-aware 3D molecule
generation and binding-affinity prediction.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
the TargetDiff reference (guanjq/targetdiff): hybrid diffusion (Gaussian on
ligand coordinates, categorical on ligand atom types) conditioned on a rigid
protein pocket, SE(3)-equivariant denoisers, on-device `lax.scan` sampling,
molecule reconstruction and evaluation, likelihood estimation, and
binding-affinity prediction.

Architecture stance (vs the PyTorch/PyG reference):
  * dense padded per-complex tensors + masks instead of ragged PyG batches
  * kNN graphs via masked pairwise distances + top_k instead of torch_cluster
  * masked dense multi-head attention instead of torch_scatter segment ops
  * the full reverse-diffusion loop inside one `jax.lax.scan` on device
  * samples x pockets sharded over a `jax.sharding.Mesh` instead of the
    reference's shell-script GPU sharding (batch_sample_diffusion.sh)
"""

__version__ = "0.1.0"

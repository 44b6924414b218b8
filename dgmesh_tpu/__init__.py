"""dgmesh_tpu — a TPU-native reimplementation of DG-Mesh (arXiv:2404.12379).

Dynamic Gaussians Mesh: time-consistent mesh reconstruction from monocular
video, rebuilt from scratch for TPU on JAX/XLA/Pallas.

Architecture (vs the CUDA/PyTorch reference at Isabella98Liu/DG-Mesh):
  - Canonical 3D Gaussians live in fixed-capacity padded buffers with an
    ``alive`` mask so the whole training step stays inside one ``jit``
    (the reference mutates tensor sizes + Adam state mid-iteration).
  - Gaussian splatting is a tile-binned rasterizer built from XLA sort /
    segment ops and an MXU-friendly cumprod-compositing formulation
    (reference: submodules/diff-gaussian-rasterization CUDA kernels).
  - DPSR is jnp.fft (reference: nvdiffrast_utils/dpsr.py).
  - Iso-surface extraction is differentiable marching tetrahedra with
    size-bounded compaction (reference: external `diso` DiffMC).
  - Mesh rasterization is a z-buffered barycentric rasterizer with a soft
    silhouette for mask gradients (reference: external nvdiffrast).
"""

__version__ = "0.1.0"

"""Gaussian-mixture occupancy field on a regular grid.

reference: utils/mesh_utils.py get_opacity_field_from_gaussians :7-77 — used
once at dpsr_iter to initialise normals (occupancy grid → marching cubes →
surface sample → kNN normal transfer, gaussian_model_dpsr_dynamic_anchor.py
:684-734).

The reference evaluates Σᵢ opacityᵢ·exp(-½ dᵀΣᵢ⁻¹d) block-tiled with
per-block culling of far Gaussians.  On TPU we chunk over grid points ×
Gaussians; the quadratic form is einsum-friendly and the one-shot cost is
irrelevant (runs once per training).

KNOWN BACKEND FAULT (r3, axon/v5e): this program crashes the TPU worker
("kernel fault") at res ≥ 192 with M=131072, in every chunking variant
tried (8192/2048, grid constant folded or generated in-body, default or
HIGHEST einsum precision), while res ≤ 128 runs fine and minimal same-shape
scan repros pass.  Training therefore defaults to cfg.tpu.occ_res = 128
(config.py) for the one-shot normal init; revisit if the backend updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternion import quat_to_rotmat


def gaussian_occupancy_grid(xyz, scaling, rotation, opacity, alive,
                            center, half_extent, res: int,
                            chunk: int = 8_192, g_chunk: int = 8_192,
                            cutoff: float = 3.0):
    """Evaluate the opacity field on a res³ grid spanning center ± half_extent.

    Returns (res,res,res) float32.  ``cutoff`` (in σ) truncates like the
    reference's minimum-scale culling (mesh_utils.py:48-54).  Double-chunked
    (grid points × gaussians) so peak memory is O(chunk·g_chunk).
    """
    N = xyz.shape[0]
    R = quat_to_rotmat(rotation)                       # (N,3,3)
    inv_s = 1.0 / jnp.maximum(scaling, 1e-8)           # (N,3)
    # Σ = R S² Rᵀ ⇒ Σ⁻¹ = R S⁻² Rᵀ; with d'=Rᵀd the form is q = ‖d'/s‖²
    op = jnp.where(alive, opacity.reshape(-1), 0.0)

    gc = min(g_chunk, N)
    ng = -(-N // gc)
    padn = ng * gc - N
    Rt = jnp.pad(jnp.swapaxes(R, -1, -2), ((0, padn), (0, 0), (0, 0)))
    inv_s_p = jnp.pad(inv_s, ((0, padn), (0, 0)))
    xyz_p = jnp.pad(xyz, ((0, padn), (0, 0)))
    op_p = jnp.pad(op, (0, padn))

    n_pts = res * res * res
    n_chunks = -(-n_pts // chunk)
    center = jnp.asarray(center)

    # Cell coordinates are derived INSIDE the scan body from the chunk index
    # (one 8k iota decode per step) instead of materializing the res³×3 grid
    # up front: at res ≥ 192 XLA constant-folds the meshgrid into a 10²-MB
    # program constant, which faults the TPU worker outright (r3: first
    # normal-init step at 192³/256³ crashed the device; 128³ survived).
    def body(_, ci):
        flat = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        ii = flat // (res * res)
        jj = (flat // res) % res
        kk = flat % res
        cell = (jnp.stack([ii, jj, kk], -1).astype(jnp.float32) + 0.5) \
            / res * 2.0 - 1.0
        p = cell * half_extent + center                # (chunk,3)

        def g_step(acc, gi):
            xs = jax.lax.dynamic_slice_in_dim(xyz_p, gi * gc, gc)
            rs = jax.lax.dynamic_slice_in_dim(Rt, gi * gc, gc)
            ss = jax.lax.dynamic_slice_in_dim(inv_s_p, gi * gc, gc)
            os_ = jax.lax.dynamic_slice_in_dim(op_p, gi * gc, gc)
            d = p[:, None, :] - xs[None, :, :]         # (chunk,gc,3)
            local = jnp.einsum("nij,cnj->cni", rs, d,
                               precision=jax.lax.Precision.HIGHEST)
            q = jnp.sum((local * ss[None]) ** 2, axis=-1)
            val = os_[None, :] * jnp.exp(-0.5 * q)
            val = jnp.where(q < cutoff * cutoff * 3.0, val, 0.0)
            return acc + val.sum(axis=1), None

        acc, _ = jax.lax.scan(g_step, jnp.zeros(chunk), jnp.arange(ng))
        return _, acc

    _, vals = jax.lax.scan(body, None, jnp.arange(n_chunks, dtype=jnp.int32))
    return vals.reshape(-1)[:n_pts].reshape(res, res, res)


def sample_mesh_surface(key, verts, faces, face_valid, n_samples: int):
    """Uniform area-weighted surface sampling (replaces trimesh.sample used in
    normal_initialization :712-717).  Returns (pts (S,3), normals (S,3))."""
    from .laplacian import face_areas, face_normals
    areas = face_areas(verts, faces, face_valid)
    p = areas / jnp.maximum(areas.sum(), 1e-12)
    k1, k2 = jax.random.split(key)
    # inverse-CDF categorical: cumsum + sorted search.  gumbel-argmax
    # (jax.random.categorical) broadcasts an (S, F) logits+noise tensor —
    # 503 GB at the quality shapes (S=131k, F=960k); XLA:TPU fuses it into
    # the reduce but XLA:CPU materializes it and OOMs.  O(F + S·logF) either
    # way beats O(S·F).
    cdf = jnp.cumsum(p)
    u = jax.random.uniform(k1, (n_samples,), maxval=cdf[-1])
    fidx = jnp.clip(jnp.searchsorted(cdf, u, side="right"),
                    0, p.shape[0] - 1)
    tri = verts[faces[fidx]]                           # (S,3,3)
    uv = jax.random.uniform(k2, (n_samples, 2))
    su = jnp.sqrt(uv[:, :1])
    b0 = 1.0 - su
    b1 = su * (1.0 - uv[:, 1:])
    b2 = su * uv[:, 1:]
    pts = b0 * tri[:, 0] + b1 * tri[:, 1] + b2 * tri[:, 2]
    nrm = face_normals(verts, faces, face_valid)[fidx]
    return pts, nrm

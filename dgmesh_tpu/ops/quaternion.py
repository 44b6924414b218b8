"""Quaternion and 3D-covariance helpers.

reference: utils/general_utils.py build_rotation/build_scaling_rotation and
gaussian_renderer/__init__.py:20-29 quaternion_multiply.  Quaternions are
(w, x, y, z) like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q, eps: float = 1e-12):
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_multiply(q1, q2):
    """Hamilton product, (w,x,y,z) layout (reference: gaussian_renderer/__init__.py:20)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_to_rotmat(q):
    """Unit quaternion → rotation matrix (..., 3, 3)."""
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([r0, r1, r2], axis=-2)


def build_covariance(scales, quats):
    """Σ = R S Sᵀ Rᵀ per Gaussian.

    reference: forward.cu computeCov3D :118-152 (without the symmetric-packing;
    we keep the full (...,3,3) matrix — XLA fuses it anyway).
    """
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]           # R @ diag(s)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def rotate_vec(q, v):
    """Rotate vectors v by unit quaternions q."""
    return jnp.einsum("...ij,...j->...i", quat_to_rotmat(q), v,
                      precision=jax.lax.Precision.HIGHEST)

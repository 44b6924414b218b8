"""SE(3)/SO(3) exponential maps for the optional 6-DoF deformation head.

reference: utils/rigid_utils.py — skew :4, exp_so3 :40, exp_se3 :60-83,
to/from_homogenous :86-107.  Used when ModelParams.is_6dof (off in all
shipped configs, kept for API parity).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(w):
    """(...,3) → (...,3,3) cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
    ], -2)


def exp_so3(w, theta):
    """Rodrigues: exp([w]θ), w unit axis (...,3), theta (...,1)."""
    W = skew(w)
    t = theta[..., None]
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + jnp.sin(t) * W + (1.0 - jnp.cos(t)) * (W @ W)


def exp_se3(S, theta):
    """SE(3) exp of screw axis S=(w,v) (...,6) × theta (...,1) → (...,4,4)."""
    w, v = S[..., :3], S[..., 3:]
    W = skew(w)
    R = exp_so3(w, theta)
    t = theta[..., None]
    eye = jnp.eye(3, dtype=S.dtype)
    V = (eye * t + (1.0 - jnp.cos(t)) * W
         + (t - jnp.sin(t)) * (W @ W))
    p = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, p[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], S.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)


def se3_transform_points(xyz, S, theta):
    """Apply per-point screw motions to points (reference DeformNetwork
    is_6dof branch, utils/time_utils.py:117-124)."""
    T = exp_se3(S, theta)
    hom = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], -1)
    out = (T @ hom[..., None])[..., 0]
    return out[..., :3] / jnp.maximum(out[..., 3:], 1e-9)

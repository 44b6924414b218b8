"""Canonical Gaussian point-set state, padded for jit.

Replaces the reference's ``GaussianModelDPSRDynamicAnchor``
(scene/gaussian_model_dpsr_dynamic_anchor.py:46-873) with a flat pytree of
fixed-capacity arrays plus an ``alive`` mask.  All structural mutations
(densify / prune / anchor merge+spawn) become masked writes inside jit; Adam
moment "surgery" (reference :364-446) is just zeroing moments under the same
mask.

Parameter layout (activations match reference :73-81 and :122-149):
  xyz       (M,3)   raw positions
  f_dc      (M,1,3) SH DC coefficients
  f_rest    (M,15,3) SH higher-order coefficients
  scaling   (M,3)   log-scale (activation exp)
  rotation  (M,4)   unnormalised quaternion wxyz (activation normalize)
  opacity   (M,1)   logit (activation sigmoid)
  normal    (M,3)   oriented point normal for DPSR (reference :183)
  density_thres ()  learnable iso-level offset (reference :201, lr 0.01)

Non-learnable:
  alive     (M,)    bool slot mask
  max_radii2d, xyz_grad_accum, denom — densification statistics
  gaussian_center (3,), gaussian_scale () — DPSR normalization frame
  (reference :94-120 update_scale_center).
"""

from __future__ import annotations

import struct
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class GaussianParams(NamedTuple):
    """Learnable leaves (everything the optimizer touches)."""
    xyz: jnp.ndarray
    f_dc: jnp.ndarray
    f_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    normal: jnp.ndarray
    density_thres: jnp.ndarray


class GaussianStats(NamedTuple):
    """Non-learnable companions."""
    alive: jnp.ndarray            # (M,) bool
    max_radii2d: jnp.ndarray      # (M,)
    xyz_grad_accum: jnp.ndarray   # (M,)
    denom: jnp.ndarray            # (M,)
    gaussian_center: jnp.ndarray  # (3,)
    gaussian_scale: jnp.ndarray   # ()


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


# --- activations (reference: gaussian_model.py:73-81) -----------------------

def get_scaling(p: GaussianParams):
    return jnp.exp(p.scaling)


def get_opacity(p: GaussianParams):
    return jax.nn.sigmoid(p.opacity)


def get_rotation(p: GaussianParams):
    n = jnp.linalg.norm(p.rotation, axis=-1, keepdims=True)
    return p.rotation / (n + 1e-12)


def get_features(p: GaussianParams):
    """(M, 16, 3) concatenated SH coefficients, storage layout."""
    return jnp.concatenate([p.f_dc, p.f_rest], axis=1)


def num_alive(s: GaussianStats):
    return jnp.sum(s.alive.astype(jnp.int32))


def create_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                    sh_degree: int = 3,
                    init_density_threshold: float = 0.0) -> Tuple[GaussianParams, GaussianStats]:
    """Initialise from a point cloud (reference: create_from_pcd :155-184).

    Scale init = log(sqrt(mean 3-NN squared distance)); opacity = logit(0.1);
    rotation = identity; normals start at zero (filled at dpsr_iter by
    normal_initialization).
    """
    from ..ops.knn import mean_knn_dist2
    from ..ops.sh import rgb_to_sh

    n = points.shape[0]
    assert n <= capacity, f"{n} points exceed capacity {capacity}"
    M = capacity

    xyz = np.zeros((M, 3), np.float32)
    xyz[:n] = points
    fused_color = rgb_to_sh(jnp.asarray(colors, jnp.float32))
    f_dc = np.zeros((M, 1, 3), np.float32)
    f_dc[:n, 0] = np.asarray(fused_color)
    n_rest = 15  # (3+1)^2 - 1
    f_rest = np.zeros((M, n_rest, 3), np.float32)

    alive = np.zeros(M, bool)
    alive[:n] = True
    d2 = np.asarray(mean_knn_dist2(jnp.asarray(xyz), jnp.asarray(alive), k=3))
    d2 = np.clip(d2, 1e-7, None)
    scaling = np.zeros((M, 3), np.float32)
    scaling[:n] = np.log(np.sqrt(d2[:n]))[:, None]

    rotation = np.zeros((M, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full((M, 1), float(inverse_sigmoid(jnp.asarray(0.1))), np.float32)
    normal = np.zeros((M, 3), np.float32)

    params = GaussianParams(
        xyz=jnp.asarray(xyz), f_dc=jnp.asarray(f_dc), f_rest=jnp.asarray(f_rest),
        scaling=jnp.asarray(scaling), rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(opacity), normal=jnp.asarray(normal),
        density_thres=jnp.asarray(float(init_density_threshold), jnp.float32))
    stats = GaussianStats(
        alive=jnp.asarray(alive), max_radii2d=jnp.zeros(M),
        xyz_grad_accum=jnp.zeros(M), denom=jnp.zeros(M),
        gaussian_center=jnp.zeros(3), gaussian_scale=jnp.asarray(1.0))
    return params, stats


def update_scale_center(params: GaussianParams, stats: GaussianStats,
                        gaussian_ratio: float,
                        fixed_center=None) -> GaussianStats:
    """Fit the DPSR normalization frame around the live point set.

    reference: update_scale_center :94-120 — center = bbox midpoint (or the
    config's fixed gaussian_center), scale = gaussian_ratio × max half-extent.
    """
    big = 1e9
    x = jnp.where(stats.alive[:, None], params.xyz, jnp.nan)
    mins = jnp.nanmin(jnp.where(jnp.isnan(x), big, x), axis=0)
    maxs = jnp.nanmax(jnp.where(jnp.isnan(x), -big, x), axis=0)
    center = (mins + maxs) / 2.0 if fixed_center is None else jnp.asarray(fixed_center)
    half = jnp.max(jnp.abs(jnp.stack([maxs - center, center - mins]))) if fixed_center is None \
        else jnp.max(jnp.maximum(jnp.abs(maxs - center), jnp.abs(center - mins)))
    scale = half * gaussian_ratio
    return stats._replace(gaussian_center=center, gaussian_scale=scale)


# --- PLY IO (reference schema: save_ply :253-289 / load_ply :296-362) -------

def _ply_property_list(n_rest: int):
    props = ["x", "y", "z", "nx", "ny", "nz"]
    props += [f"f_dc_{i}" for i in range(3)]
    props += [f"f_rest_{i}" for i in range(3 * n_rest)]
    props += ["opacity"]
    props += [f"scale_{i}" for i in range(3)]
    props += [f"rot_{i}" for i in range(4)]
    props += ["density_thres", "gaussian_center", "gaussian_scale"]
    return props


def save_ply(path: str, params: GaussianParams, stats: GaussianStats):
    """Binary little-endian PLY with the reference's extended schema so its
    checkpoints/viewers interoperate (gaussian_model_dpsr_dynamic_anchor.py:253-289:
    extra per-vertex floats density_thres, gaussian_center, gaussian_scale;
    center is broadcast per-axis into the nx-ny-nz-free layout the reference
    uses — it stores center component-wise in the first three rows' spare
    columns; we store the scalar per vertex and the 3-vector in a comment for
    robustness, and read either form back).
    """
    alive = np.asarray(stats.alive)
    idx = np.nonzero(alive)[0]
    n = len(idx)
    n_rest = params.f_rest.shape[1]

    xyz = np.asarray(params.xyz)[idx]
    normal = np.asarray(params.normal)[idx]
    # explicit column counts so n == 0 (fully-pruned cloud) still reshapes
    f_dc = np.asarray(params.f_dc)[idx].transpose(0, 2, 1).reshape(n, 3)
    f_rest = np.asarray(params.f_rest)[idx].transpose(0, 2, 1).reshape(n, 3 * n_rest)
    opacity = np.asarray(params.opacity)[idx]
    scale = np.asarray(params.scaling)[idx]
    rot = np.asarray(params.rotation)[idx]
    dt = np.full((n, 1), float(params.density_thres), np.float32)
    center = np.asarray(stats.gaussian_center)
    gc = np.tile(center.mean(), (n, 1)).astype(np.float32)  # scalar column (see header comment)
    gs = np.full((n, 1), float(stats.gaussian_scale), np.float32)

    data = np.concatenate([xyz, normal, f_dc, f_rest, opacity, scale, rot, dt, gc, gs],
                          axis=1).astype("<f4")
    props = _ply_property_list(n_rest)
    assert data.shape[1] == len(props)

    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"comment gaussian_center {center[0]} {center[1]} {center[2]}",
                  f"element vertex {n}"]
        header += [f"property float {p}" for p in props]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(data.tobytes())


def load_ply(path: str, capacity: int) -> Tuple[GaussianParams, GaussianStats]:
    """Read our PLY (or a reference-schema PLY without the extras)."""
    with open(path, "rb") as f:
        props = []
        center = None
        n = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float"):
                props.append(line.split()[-1])
            elif line.startswith("comment gaussian_center"):
                center = np.array([float(v) for v in line.split()[-3:]], np.float32)
            elif line == "end_header":
                break
        data = np.frombuffer(f.read(n * len(props) * 4), dtype="<f4").reshape(n, len(props))
    col = {p: i for i, p in enumerate(props)}

    def grab(names):
        return data[:, [col[p] for p in names]]

    M = capacity
    assert n <= M, f"PLY has {n} points > capacity {M}"
    n_rest = sum(1 for p in props if p.startswith("f_rest_")) // 3

    def pad(x, shape_tail):
        out = np.zeros((M,) + shape_tail, np.float32)
        out[:n] = x.reshape((n,) + shape_tail)
        return jnp.asarray(out)

    xyz = grab(["x", "y", "z"])
    normal = grab(["nx", "ny", "nz"])
    f_dc = grab([f"f_dc_{i}" for i in range(3)]).reshape(n, 3, 1).transpose(0, 2, 1)
    f_rest = grab([f"f_rest_{i}" for i in range(3 * n_rest)]).reshape(n, 3, n_rest).transpose(0, 2, 1)
    opacity = grab(["opacity"])
    scaling = grab([f"scale_{i}" for i in range(3)])
    rot = grab([f"rot_{i}" for i in range(4)])
    dt = float(data[0, col["density_thres"]]) if "density_thres" in col else 0.0
    gs = float(data[0, col["gaussian_scale"]]) if "gaussian_scale" in col else 1.0
    if center is None:
        center = np.zeros(3, np.float32)

    params = GaussianParams(
        xyz=pad(xyz, (3,)), f_dc=pad(f_dc, (1, 3)), f_rest=pad(f_rest, (n_rest, 3)),
        scaling=pad(scaling, (3,)), rotation=pad(rot, (4,)),
        opacity=pad(opacity, (1,)), normal=pad(normal, (3,)),
        density_thres=jnp.asarray(dt, jnp.float32))
    alive = np.zeros(M, bool)
    alive[:n] = True
    stats = GaussianStats(
        alive=jnp.asarray(alive), max_radii2d=jnp.zeros(M),
        xyz_grad_accum=jnp.zeros(M), denom=jnp.zeros(M),
        gaussian_center=jnp.asarray(center), gaussian_scale=jnp.asarray(gs))
    return params, stats


def random_init_cloud(rng: np.random.Generator, n: int = 100_000,
                      extent: float = 1.3):
    """Random init cloud used when a dataset ships no SfM points
    (reference: dataset_readers.py:330-341 — uniform in a 2.6-side cube,
    random SH colors)."""
    points = (rng.random((n, 3)) * 2 - 1) * extent
    colors = rng.random((n, 3))
    return points.astype(np.float32), colors.astype(np.float32)

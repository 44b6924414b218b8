"""Synthetic GT-MESH dataset generator (finetune-nerf layout).

No reference equivalent ships in this container — the reference's DG-Mesh
synthetic benchmark (README.md:117-142) is a Blender-rendered dynamic-object
dataset with per-frame ground-truth meshes, evaluated by mesh_evaluation.py
CD/EMD.  This module procedurally builds the same *shape* of dataset so the
full quality gate can run end-to-end:

- an analytic deforming icosphere (watertight, genus 0) with a smooth
  time-dependent radial deformation — exact GT surface at every time;
- 800×800 RGBA frames rendered with OUR differentiable mesh rasterizer
  (Blinn-Phong × positional albedo vertex colors) on orbiting cameras;
- D-NeRF transforms_{train,test}.json + per-frame GT meshes in the
  finetune-nerf layout (`mesh/frame_<N>.ply`, dataset_readers.py:355-453)
  plus an `.obj` GT sequence at uniform times for cli/mesh_evaluation.py.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np


# ---------------------------------------------------------------- icosphere
def icosphere(subdiv: int = 5):
    """Unit icosphere via midpoint subdivision: 10242 verts / 20480 faces at
    subdiv=5.  Watertight by construction."""
    t = (1.0 + math.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    for _ in range(subdiv):
        vlist = list(verts)
        cache = {}

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = vlist[a] + vlist[b]
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)
    return verts.astype(np.float32), faces.astype(np.int32)


# ------------------------------------------------------------- deformation
def deform_icosphere(unit_verts: np.ndarray, t: float, base_r: float = 0.5):
    """Smooth, exactly-known radial deformation of the unit sphere at time t
    ∈ [0,1]: breathing + two rotating low-order lobes.  Max radius ≈ 0.66 —
    inside the Gaussian init shell and the DPSR unit cube."""
    x, y, z = unit_verts[:, 0], unit_verts[:, 1], unit_verts[:, 2]
    w = 2 * math.pi * t
    r = base_r * (1.0
                  + 0.10 * math.sin(w)
                  + 0.14 * math.sin(w) * (z * z - 1.0 / 3.0) * 3.0 / 2.0
                  + 0.10 * math.cos(w) * (x * y) * 3.0)
    return (unit_verts * r[:, None]).astype(np.float32)


def albedo(unit_verts: np.ndarray):
    """Smooth positional albedo so the appearance net has structure to fit."""
    v = unit_verts
    c = 0.5 + 0.5 * np.stack([
        np.sin(3.1 * v[:, 0] + 0.5),
        np.sin(2.7 * v[:, 1] + 2.1),
        np.sin(3.7 * v[:, 2] + 4.0)], -1)
    return (0.15 + 0.85 * c).astype(np.float32)


# -------------------------------------------------------------- rendering
_render_cache = {}


def _render_mesh_frame(verts, faces, vtx_color, cam, width, height,
                       max_per_tile=256, use_pallas=False):
    """Jitted (once per image size) GT frame render — eager TPU dispatch over
    the remote tunnel is orders of magnitude slower than one compiled call."""
    import jax
    import jax.numpy as jnp
    from ..cameras import gl_projection_from_K
    from ..ops import mesh_raster as MR

    key = (width, height, faces.shape[0], max_per_tile, use_pallas)
    if key not in _render_cache:
        # backface cull: exact for the hard image/mask on closed outward
        # meshes (see test_backface_cull_exact_on_closed_mesh), halves tile
        # load.  Default is the plain-XLA shading path: dataset generation is
        # offline, and the Pallas shade kernel's remote compile time grows
        # sharply with K (K>=128 observed to hang the remote compiler).
        cfg = MR.MeshRasterConfig(width=width, height=height,
                                  max_per_tile=max_per_tile,
                                  max_dup=1 << 20, tile_chunk=64,
                                  use_pallas=use_pallas, cull_backface=True)

        @jax.jit
        def fn(v, f, c, pose, proj):
            fv = jnp.ones(f.shape[0], bool)
            out = MR.render_mesh(v, f, fv, c, pose, proj, jnp.zeros(3), cfg,
                                 want_soft=False)
            return out["rgb"], out["mask"], out["aux"]["tile_overflow"]

        _render_cache[key] = fn
    pose = jnp.asarray(cam.mesh_pose())
    proj = jnp.asarray(gl_projection_from_K(cam.intrinsics, width, height))
    rgb, mask, ovf = _render_cache[key](jnp.asarray(verts), jnp.asarray(faces),
                                        jnp.asarray(vtx_color), pose, proj)
    assert int(np.asarray(ovf)) == 0
    return np.clip(np.asarray(rgb), 0, 1), np.clip(np.asarray(mask), 0, 1)


def generate_mesh_dataset(out_dir: str, n_frames: int = 40, width: int = 800,
                          height: int = 800, n_test: int = 8, subdiv: int = 5,
                          fovx: float = 0.8, radius: float = 2.8,
                          n_eval_meshes: int = 0, seed: int = 0,
                          max_per_tile: int = 256):
    """Write the full finetune-nerf-layout dataset under out_dir.

    Layout:
      transforms_{train,test}.json  (D-NeRF, `time` per frame)
      train/r_<N>.png, test/r_<N>.png   (RGBA, alpha = coverage mask)
      mesh/frame_<N>.ply, mesh_test/frame_<N>.ply   (GT mesh per frame)
      gt_eval/frame_<NNNNN>.obj   (GT at n_eval_meshes uniform times, for
                                   cli/mesh_evaluation.py vs exported meshes)
      points3d.ply                 (noisy surface samples, SfM-like init)
    """
    from PIL import Image
    from ..cameras import camera_from_c2w_blender, orbit_camera_poses
    from ..utils_io import write_mesh_ply, write_obj

    unit_v, faces = icosphere(subdiv)
    col = albedo(unit_v)
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from ..ops import mesh_raster as MR

    @jax.jit
    def _shade_jit(verts, cam_center):
        fv = jnp.ones(faces.shape[0], bool)
        return MR.phong_vertex_colors(verts, jnp.asarray(faces), fv, cam_center)

    def shade(verts, cam_center):
        s = np.asarray(_shade_jit(jnp.asarray(verts), jnp.asarray(cam_center)))
        return np.clip(s * col, 0, 1).astype(np.float32)

    def make_split(split, n, mesh_dir, pose_offset=0.0):
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        os.makedirs(os.path.join(out_dir, mesh_dir), exist_ok=True)
        poses = orbit_camera_poses(n, radius=radius,
                                   elevation=0.35 + pose_offset)
        frames = []
        for i in range(n):
            t = i / max(n - 1, 1)
            verts = deform_icosphere(unit_v, t)
            cam = camera_from_c2w_blender(i, poses[i], fovx, width, height, t)
            cam_center = poses[i][:3, 3].astype(np.float32)
            rgb, alpha = _render_mesh_frame(verts, faces, shade(verts, cam_center),
                                            cam, width, height,
                                            max_per_tile=max_per_tile)
            rgba = np.concatenate([rgb, alpha[..., None]], -1)
            fname = f"{split}/r_{i:03d}"
            Image.fromarray((rgba * 255).astype(np.uint8)).save(
                os.path.join(out_dir, fname + ".png"))
            write_mesh_ply(os.path.join(out_dir, mesh_dir, f"frame_{i}.ply"),
                           verts, faces)
            frames.append(dict(file_path=fname, time=t,
                               transform_matrix=poses[i].tolist()))
            print(f"  {fname} done", flush=True)
        meta = dict(camera_angle_x=fovx, frames=frames)
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)

    make_split("train", n_frames, "mesh")
    make_split("test", n_test, "mesh_test", pose_offset=0.15)

    if n_eval_meshes:
        gdir = os.path.join(out_dir, "gt_eval")
        os.makedirs(gdir, exist_ok=True)
        for i in range(n_eval_meshes):
            t = i / max(n_eval_meshes - 1, 1)
            write_obj(os.path.join(gdir, f"frame_{i:05d}.obj"),
                      deform_icosphere(unit_v, t), faces)

    # noisy GT-surface samples as the SfM-like init cloud
    rng = np.random.default_rng(seed + 1)
    v0 = deform_icosphere(unit_v, 0.0)
    pick = rng.integers(0, len(v0), 20_000)
    pts = v0[pick] + rng.normal(scale=0.02, size=(len(pick), 3)).astype(np.float32)
    from .synthetic import _write_points_ply
    _write_points_ply(os.path.join(out_dir, "points3d.ply"),
                      pts.astype(np.float32), col[pick])
    print("dataset written to", out_dir, flush=True)

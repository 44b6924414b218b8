"""Synthetic D-NeRF-format dataset generator.

No reference equivalent — the container ships no datasets, so benchmarks and
end-to-end tests render ground truth with OUR splat renderer from a
procedural dynamic Gaussian scene (a breathing/oscillating blob).  The output
directory is a valid D-NeRF dataset (transforms_train.json + RGBA pngs), so
it exercises the real Blender reader and the full training stack.
"""

from __future__ import annotations

import json
import math
import os
from typing import Tuple

import numpy as np


def gt_gaussian_scene(n: int = 2000, seed: int = 0):
    """A colored sphere-shell blob with a time-dependent squash deformation."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = 0.45 + 0.05 * rng.random(n)
    base = d * r[:, None]
    colors = 0.5 + 0.5 * np.stack([d[:, 0], d[:, 1], d[:, 2]], -1)
    scales = np.full((n, 3), 0.04, np.float32)
    opac = np.full(n, 0.85, np.float32)

    def at_time(t):
        squash = 1.0 + 0.25 * math.sin(2 * math.pi * t)
        pts = base.copy()
        pts[:, 2] *= squash
        pts[:, 0] /= math.sqrt(squash)
        pts[:, 1] /= math.sqrt(squash)
        return pts.astype(np.float32)

    return dict(base=base.astype(np.float32), colors=colors.astype(np.float32),
                scales=scales, opacity=opac, at_time=at_time)


def render_gt_frame(scene, cam, width, height):
    """Render one GT frame + alpha with the splat renderer (deg-0 SH)."""
    import jax.numpy as jnp
    from ..ops import splat
    from ..ops.sh import rgb_to_sh

    pts = scene["pts"]
    n = pts.shape[0]
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1
    shs = rgb_to_sh(jnp.asarray(scene["colors"]))[:, None, :]
    cfg = splat.SplatConfig(width=width, height=height, max_per_tile=512,
                            max_dup=1 << 18, tile_chunk=16)
    out = splat.render(jnp.asarray(pts), jnp.asarray(scene["scales"]),
                       jnp.asarray(quats), jnp.asarray(scene["opacity"]),
                       shs, jnp.ones(n, bool),
                       splat.CameraArrays.from_camera(cam),
                       jnp.zeros(3), cfg, sh_degree=0)
    rgb = np.asarray(out["render"]).transpose(1, 2, 0)
    alpha = np.asarray(out["alpha"])
    return np.clip(rgb, 0, 1), np.clip(alpha, 0, 1)


def generate_dataset(out_dir: str, n_frames: int = 20, width: int = 128,
                     height: int = 128, n_gaussians: int = 2000,
                     fovx: float = 0.9, radius: float = 2.8,
                     n_test: int = 4, seed: int = 0):
    """Write a D-NeRF-format dataset under out_dir; returns the scene dict."""
    from PIL import Image
    from ..cameras import camera_from_c2w_blender, orbit_camera_poses

    g = gt_gaussian_scene(n_gaussians, seed)
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "test"), exist_ok=True)

    def make_split(split, n, pose_offset=0.0):
        poses = orbit_camera_poses(n, radius=radius, elevation=0.35 + pose_offset)
        frames = []
        for i in range(n):
            t = i / max(n - 1, 1)
            cam = camera_from_c2w_blender(i, poses[i], fovx, width, height, t)
            rgb, alpha = render_gt_frame(
                dict(pts=g["at_time"](t), colors=g["colors"],
                     scales=g["scales"], opacity=g["opacity"]),
                cam, width, height)
            rgba = np.concatenate([rgb, alpha[..., None]], -1)
            fname = f"{split}/r_{i:03d}"
            Image.fromarray((rgba * 255).astype(np.uint8)).save(
                os.path.join(out_dir, fname + ".png"))
            frames.append(dict(file_path=fname, time=t,
                               transform_matrix=poses[i].tolist()))
        meta = dict(camera_angle_x=fovx, frames=frames)
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)

    make_split("train", n_frames)
    make_split("test", n_test, pose_offset=0.15)

    # seed point cloud near the object (like SfM points); exercised by the
    # reader's points3d.ply path
    rng = np.random.default_rng(seed + 1)
    n_pts = min(4 * n_gaussians, 20_000)
    d = rng.normal(size=(n_pts, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d * (0.4 + 0.15 * rng.random((n_pts, 1)))
    _write_points_ply(os.path.join(out_dir, "points3d.ply"),
                      pts.astype(np.float32),
                      rng.random((n_pts, 3)).astype(np.float32))
    return g


def _write_points_ply(path, pts, colors):
    n = len(pts)
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
               "property float x", "property float y", "property float z",
               "property uchar red", "property uchar green", "property uchar blue",
               "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
        rec["xyz"] = pts
        rec["rgb"] = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        f.write(rec.tobytes())

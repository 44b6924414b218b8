"""Sharded mesh raster (per-chip face binning + all_to_all tile exchange)
vs the single-device renderer — image/mask/soft parity and gradient parity.

Same exactness argument as test_sharded_splat.py: per-chip top-K tile lists
merged on (merge_depth_rank, global face id) reproduce the unsharded lists,
so the z-buffer winners, interpolated colors and the soft-silhouette product
are the same arithmetic on the same operands.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgmesh_tpu.ops import mesh_raster as mr
from dgmesh_tpu.parallel.sharding import make_mesh
from dgmesh_tpu.parallel.sharded_mr import render_mesh_sharded

N_DEV = 8


def _icosphere(subdiv=2):
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(subdiv):
        mid = {}
        verts = list(map(tuple, v))
        nf = []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                p = (np.array(verts[a]) + np.array(verts[b])) / 2
                p /= np.linalg.norm(p)
                verts.append(tuple(p))
                mid[key] = len(verts) - 1
            return mid[key]

        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.array(verts)
        f = np.array(nf)
    return v.astype(np.float32), f.astype(np.int32)


def _setup(rng, subdiv=2, W=128, H=96, max_per_tile=64, pad_faces=None):
    verts, faces = _icosphere(subdiv)
    F = len(faces)
    pad_faces = pad_faces or (-(-F // N_DEV) * N_DEV)
    face_valid = np.zeros(pad_faces, bool)
    face_valid[:F] = True
    faces_p = np.zeros((pad_faces, 3), np.int32)
    faces_p[:F] = faces
    colors = rng.random((len(verts), 3)).astype(np.float32)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -3.0  # camera at +3z looking down -z (GL modelview)
    fov = 1.0
    fy = fx = 0.5 * W / np.tan(fov / 2)
    near, far = 0.01, 100.0
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 2 * fx / W
    proj[1, 1] = 2 * fy / H
    proj[2, 2] = -(far + near) / (far - near)
    proj[2, 3] = -2 * far * near / (far - near)
    proj[3, 2] = -1.0

    cfg = mr.MeshRasterConfig(width=W, height=H, tile_h=16, tile_w=16,
                              max_per_tile=max_per_tile, max_dup=1 << 14,
                              tile_chunk=8)
    return (jnp.asarray(verts), jnp.asarray(faces_p), jnp.asarray(face_valid),
            jnp.asarray(colors), jnp.asarray(pose), jnp.asarray(proj), cfg)


@pytest.mark.parametrize("max_per_tile", [64, 8])
def test_sharded_mr_matches_single_device(rng, max_per_tile):
    """Exact tile-list parity → image/mask parity, incl. K-truncation (K=8)."""
    verts, faces, fv, colors, pose, proj, cfg = _setup(
        rng, max_per_tile=max_per_tile)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    ref = mr.render_mesh(verts, faces, fv, colors, pose, proj, bg, cfg)
    mesh = make_mesh(N_DEV, devices=jax.devices("cpu"))
    out = render_mesh_sharded(mesh, verts, faces, fv, colors, pose, proj,
                              bg, cfg, axis="dev")
    np.testing.assert_allclose(np.asarray(out["mask"]),
                               np.asarray(ref["mask"]), atol=0)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out["soft_mask"]),
                               np.asarray(ref["soft_mask"]), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(out["st_mask"]),
                                  np.asarray(out["mask"]))
    # winner faces agree wherever covered
    cov = np.asarray(ref["mask"]) > 0.5
    np.testing.assert_array_equal(np.asarray(out["face_id"])[cov],
                                  np.asarray(ref["face_id"])[cov])


def test_sharded_mr_gradient_parity(rng):
    """d loss / d verts and d loss / d colors match the single-device path
    (rgb + soft-silhouette pathways, the two the train step uses)."""
    verts, faces, fv, colors, pose, proj, cfg = _setup(rng, subdiv=1)
    bg = jnp.zeros(3, jnp.float32)
    mesh = make_mesh(N_DEV, devices=jax.devices("cpu"))

    def loss_single(v, c):
        o = mr.render_mesh(v, faces, fv, c, pose, proj, bg, cfg)
        return (o["rgb"].sum() + (o["soft_mask"] ** 2).sum()
                + (o["st_mask"] * 0.5).sum())

    def loss_sharded(v, c):
        o = render_mesh_sharded(mesh, v, faces, fv, c, pose, proj, bg, cfg,
                                axis="dev")
        return (o["rgb"].sum() + (o["soft_mask"] ** 2).sum()
                + (o["st_mask"] * 0.5).sum())

    g_ref = jax.grad(loss_single, argnums=(0, 1))(verts, colors)
    g_out = jax.grad(loss_sharded, argnums=(0, 1))(verts, colors)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

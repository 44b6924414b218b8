"""IO + native library tests: PLY/OBJ roundtrips, checkpoint, native chamfer."""

import numpy as np
import pytest


def test_native_chamfer_matches_numpy(rng):
    from dgmesh_tpu.native import chamfer_cpu, get_lib
    a = rng.normal(size=(300, 3)).astype(np.float32)
    b = rng.normal(size=(200, 3)).astype(np.float32)
    cd, d_ab, d_ba = chamfer_cpu(a, b)
    d = ((a[:, None] - b[None]) ** 2).sum(-1)
    ref = d.min(1).mean() + d.min(0).mean()
    np.testing.assert_allclose(cd, ref, rtol=1e-5)


def test_obj_roundtrip(tmp_path, rng):
    from dgmesh_tpu.utils_io import read_obj, write_obj
    v = rng.normal(size=(10, 3)).astype(np.float32)
    f = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    p = str(tmp_path / "m.obj")
    write_obj(p, v, f)
    v2, f2 = read_obj(p)
    np.testing.assert_allclose(v, v2, rtol=1e-5)
    assert (f == f2).all()


def test_mesh_ply_roundtrip(tmp_path, rng):
    from dgmesh_tpu.utils_io import read_mesh_ply, write_mesh_ply
    v = rng.normal(size=(12, 3)).astype(np.float32)
    f = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    c = rng.random((12, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    write_mesh_ply(p, v, f, c)
    v2, f2 = read_mesh_ply(p)
    np.testing.assert_allclose(v, v2, atol=1e-6)
    assert (f == f2).all()


def test_gaussian_ply_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    from dgmesh_tpu.models import gaussians as G
    pts = rng.normal(size=(50, 3)).astype(np.float32) * 0.3
    cols = rng.random((50, 3)).astype(np.float32)
    gp, gs = G.create_from_pcd(pts, cols, capacity=64)
    gs = G.update_scale_center(gp, gs, 1.5)
    p = str(tmp_path / "gs.ply")
    G.save_ply(p, gp, gs)
    gp2, gs2 = G.load_ply(p, capacity=64)
    np.testing.assert_allclose(np.asarray(gp.xyz[:50]), np.asarray(gp2.xyz[:50]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp.scaling[:50]),
                               np.asarray(gp2.scaling[:50]), atol=1e-6)
    np.testing.assert_allclose(float(gs.gaussian_scale), float(gs2.gaussian_scale),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gs.gaussian_center),
                               np.asarray(gs2.gaussian_center), atol=1e-6)
    assert int(gs2.alive.sum()) == 50


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from dgmesh_tpu.config import Config
    from dgmesh_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from dgmesh_tpu.train.state import init_state

    cfg = Config()
    cfg.tpu.max_gaussians = 64
    rng = np.random.default_rng(0)
    state = init_state(cfg, rng.normal(size=(20, 3)).astype(np.float32),
                       rng.random((20, 3)).astype(np.float32))
    state = state._replace(step=state.step + 42)
    save_checkpoint(state, str(tmp_path), 42)
    fresh = init_state(cfg, rng.normal(size=(20, 3)).astype(np.float32),
                       rng.random((20, 3)).astype(np.float32))
    loaded = load_checkpoint(fresh, str(tmp_path))
    assert int(loaded.step) == 42
    np.testing.assert_allclose(np.asarray(state.gp.xyz), np.asarray(loaded.gp.xyz))
    # nets restored exactly
    for a, b in zip(jax.tree.leaves(state.nets), jax.tree.leaves(loaded.nets)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_colmap_binary_roundtrip(tmp_path):
    """Write a tiny COLMAP binary model and parse it (native + python)."""
    import struct
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    # cameras.bin: 1 PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 60.0, 60.0, 32.0, 24.0))
    # images.bin: 2 images
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", 1, 0, 0, 0))
            f.write(struct.pack("<ddd", 0, 0, float(i)))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))
    # points3D.bin: 3 points
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", i, i * 2, i * 3))
            f.write(struct.pack("<BBB", 10 * i, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 0, 0))

    from dgmesh_tpu.data import colmap as C
    cams = C.read_cameras(str(sparse))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    ims = C.read_images(str(sparse))
    assert len(ims) == 2 and ims[1].name == "img_0.png"
    pts, cols = C.read_points3d(str(sparse))
    assert pts.shape == (3, 3)
    np.testing.assert_allclose(pts[2], [2, 4, 6])
    np.testing.assert_allclose(cols[1][0], 10 / 255.0, atol=1e-6)

"""Tests: pointcloud scatter render, resolution policy."""

import numpy as np


def test_pointcloud_scatter(tmp_path, rng):
    from dgmesh_tpu.cameras import camera_from_c2w_blender
    from dgmesh_tpu.eval.testing import pointcloud_scatter_render
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    cam = camera_from_c2w_blender(0, c2w, 1.0, 64, 48, 0.0)
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 0.3
    img = pointcloud_scatter_render(pts, cam,
                                    out_path=str(tmp_path / "pc.png"),
                                    colors=rng.random((500, 3)))
    assert img.shape == (48, 64, 3)
    assert img.std() > 0.01  # something got drawn
    assert (tmp_path / "pc.png").exists()


def test_resolution_policy(rng):
    from dgmesh_tpu.cameras import Camera
    from dgmesh_tpu.data.scene import apply_resolution_policy
    img = rng.random((100, 200, 3)).astype(np.float32)
    cam = Camera(uid=0, R=np.eye(3), T=np.zeros(3), fovx=1.0, fovy=0.5,
                 image=img, alpha_mask=np.ones((100, 200, 1), np.float32),
                 fid=0.0, width=200, height=100)
    out = apply_resolution_policy([cam], 2)
    assert out[0].width == 100 and out[0].height == 50
    assert out[0].image.shape == (50, 100, 3)
    assert out[0].alpha_mask.shape == (50, 100, 1)
    # resolution 1 → unchanged
    same = apply_resolution_policy([cam], 1)
    assert same[0].width == 200

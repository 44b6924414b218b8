"""Dataset-reader tests on synthetic fixtures for each format."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def test_nerfies_reader(tmp_path, rng):
    root = str(tmp_path)
    ids = ["000", "001", "002", "003"]
    with open(os.path.join(root, "scene.json"), "w") as f:
        json.dump(dict(scale=2.0, center=[0.1, 0.2, 0.3]), f)
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump(dict(train_ids=ids[:3], val_ids=ids[3:]), f)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump({i: dict(time_id=k, warp_id=k) for k, i in enumerate(ids)}, f)
    os.makedirs(os.path.join(root, "camera"), exist_ok=True)
    for i in ids:
        with open(os.path.join(root, "camera", i + ".json"), "w") as f:
            json.dump(dict(orientation=np.eye(3).tolist(),
                           position=[0, 0, 4.0], focal_length=100.0,
                           principal_point=[32.0, 24.0]), f)
        _png(os.path.join(root, "rgb", "2x", i + ".png"),
             rng.random((48, 64, 3)))
        mask = np.zeros((48, 64, 3))
        mask[10:30, 20:50] = 1.0
        _png(os.path.join(root, "mask-tracking", "2x", "Annotations", i + ".png"),
             mask)
    np.save(os.path.join(root, "points.npy"), rng.normal(size=(100, 3)))

    from dgmesh_tpu.data.readers import read_nerfies_scene
    info = read_nerfies_scene(root, white_background=False, eval_split=True,
                              nerfies_ratio=0.5)
    assert len(info.train_cameras) == 3 and len(info.test_cameras) == 1
    cam = info.train_cameras[0]
    assert cam.width == 64 and cam.height == 48
    assert cam.K is not None and np.isclose(cam.K[0, 0], 50.0)  # focal × ratio
    # masked background must be black
    assert cam.image[0, 0].max() == 0.0
    assert cam.image[15, 30].max() >= 0.0
    assert info.point_cloud.points.shape[0] == 100
    # time normalized to [0,1]
    fids = [c.fid for c in info.train_cameras + info.test_cameras]
    assert max(fids) == 1.0 and min(fids) == 0.0


def test_plenoptic_reader(tmp_path, rng):
    root = str(tmp_path)
    n_cams = 3
    poses = np.zeros((n_cams, 3, 5))
    for i in range(n_cams):
        poses[i, :, :4] = np.concatenate([np.eye(3), [[0], [0], [3.0]]], 1)
        poses[i, :, 4] = [48, 64, 80.0]  # H, W, focal
    pb = np.concatenate([poses.reshape(n_cams, 15), np.ones((n_cams, 2))], 1)
    np.save(os.path.join(root, "poses_bounds.npy"), pb)
    for i in range(n_cams):
        for k in range(4):
            _png(os.path.join(root, "frames", f"cam{i:02d}", f"{k:04d}.png"),
                 rng.random((48, 64, 3)))

    from dgmesh_tpu.data.readers import read_plenoptic_scene
    info = read_plenoptic_scene(root, eval_split=True, num_images=4, hold_id=(0,))
    assert len(info.train_cameras) == 8   # 2 train cams × 4 frames
    assert len(info.test_cameras) == 4
    assert info.train_cameras[0].width == 64


def test_dtu_reader(tmp_path, rng):
    root = str(tmp_path)
    n = 3
    cam_dict = {}
    for i in range(n):
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        Rt = np.eye(4)
        Rt[2, 3] = 4.0
        P = np.eye(4)
        P[:3, :4] = K @ Rt[:3, :4]
        cam_dict[f"world_mat_{i}"] = P
        cam_dict[f"scale_mat_{i}"] = np.eye(4)
        cam_dict[f"fid_{i}"] = np.asarray(float(i))
    np.savez(os.path.join(root, "cameras_sphere.npz"), **cam_dict)
    for i in range(n):
        _png(os.path.join(root, "image", f"{i:03d}.png"), rng.random((48, 64, 3)))
        _png(os.path.join(root, "mask", f"{i:03d}.png"), np.ones((48, 64, 3)))

    from dgmesh_tpu.data.readers import read_dtu_scene
    info = read_dtu_scene(root)
    assert len(info.train_cameras) == 3
    c = info.train_cameras[0]
    assert c.width == 64 and np.isfinite(c.R).all()


def test_scene_type_detection(tmp_path):
    from dgmesh_tpu.data.scene import detect_scene_type
    (tmp_path / "transforms_train.json").write_text("{}")
    assert detect_scene_type(str(tmp_path)) == "Blender"
    assert detect_scene_type(str(tmp_path), "Nerfies") == "nerfies"
    assert detect_scene_type(str(tmp_path), "NeuralActor") == "NeuralActor"

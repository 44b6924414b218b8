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


def test_iphone_reader(tmp_path, rng):
    """Real-dump-shaped iPhone fixture (dataset_readers.py:680-800): warp_id-
    only metadata, ratio-1 `rgb/1x` layout, grayscale SAM masks, no
    scene.json recentring; checks the OpenCV→Blender convention flip too."""
    root = str(tmp_path)
    ids = ["0_00000", "0_00001", "0_00002"]
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump(dict(train_ids=ids[:2], val_ids=ids[2:]), f)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump({i: dict(warp_id=k) for k, i in enumerate(ids)}, f)
    os.makedirs(os.path.join(root, "camera"), exist_ok=True)
    Rm = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)  # 90° yaw
    for i in ids:
        with open(os.path.join(root, "camera", i + ".json"), "w") as f:
            json.dump(dict(orientation=Rm.tolist(),
                           position=[0.5, -0.2, 3.0], focal_length=120.0,
                           principal_point=[32.0, 24.0]), f)
        _png(os.path.join(root, "rgb", "1x", i + ".png"),
             rng.random((48, 64, 3)))
        # SAM masks are single-channel (mask.ndim == 2 branch)
        m = np.zeros((48, 64), np.uint8)
        m[5:40, 10:60] = 255
        os.makedirs(os.path.join(root, "mask-tracking", "1x", "Annotations"),
                    exist_ok=True)
        Image.fromarray(m, mode="L").save(
            os.path.join(root, "mask-tracking", "1x", "Annotations", i + ".png"))
    np.save(os.path.join(root, "points.npy"), rng.normal(size=(64, 3)))

    from dgmesh_tpu.data.readers import read_iphone_scene
    info = read_iphone_scene(root, white_background=True, eval_split=True)
    assert len(info.train_cameras) == 2 and len(info.test_cameras) == 1
    cam = info.train_cameras[0]
    # ratio 1.0: focal unscaled
    assert np.isclose(cam.K[0, 0], 120.0)
    # white background outside the SAM mask
    assert cam.image[0, 0].min() == 1.0
    # no recentring: position used as-is in w2c
    w2c = np.eye(4)
    w2c[:3, :3] = cam.R.T
    w2c[:3, 3] = cam.T
    c2w_cv = np.linalg.inv(w2c)
    want = c2w_cv.copy()
    want[:3, 1:3] *= -1  # reference flips to Blender/OpenGL (:750-752)
    np.testing.assert_allclose(cam.orig_transform, want, atol=1e-5)
    # warp_id time normalization
    fids = sorted(c.fid for c in info.train_cameras + info.test_cameras)
    np.testing.assert_allclose(fids, [0.0, 0.5, 1.0])


def test_neural_actor_reader(tmp_path, rng):
    """NeuralActor fixture (dataset_readers.py:803-905): per-frame intrinsic
    matrices, OpenCV c2w poses, training_mask/Annotations DEVA (3-channel)
    mask layout."""
    root = str(tmp_path)
    K = [[90.0, 0, 32], [0, 90.0, 24], [0, 0, 1]]
    for split, n in (("train", 3), ("test", 2)):
        sub = "training" if split == "train" else "testing"
        frames = []
        for k in range(n):
            c2w = np.eye(4)
            c2w[2, 3] = 3.0
            frames.append(dict(
                transform_matrix=c2w.tolist(), intrinsic=K,
                time=k / max(n - 1, 1),
                file_path=f"{sub}/cam00/{k:04d}.png"))
            _png(os.path.join(root, sub, "cam00", f"{k:04d}.png"),
                 rng.random((48, 64, 3)))
            mask = np.zeros((48, 64, 3))
            mask[8:40, 8:56] = 1.0   # DEVA masks are RGB label images
            _png(os.path.join(root, f"{sub}_mask", "Annotations", "cam00",
                              f"{k:04d}.png"), mask)
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(dict(frames=frames), f)

    from dgmesh_tpu.data.readers import read_neural_actor_scene
    info = read_neural_actor_scene(root, white_background=False,
                                   eval_split=True)
    assert len(info.train_cameras) == 3 and len(info.test_cameras) == 2
    cam = info.train_cameras[0]
    assert np.isclose(cam.K[0, 0], 90.0)
    assert cam.image[0, 0].max() == 0.0          # black outside DEVA mask
    assert cam.image[20, 30] is not None
    assert 0.0 <= cam.fid <= 1.0


def test_finetune_nerf_reader(tmp_path, rng):
    """finetune-nerf fixture (dataset_readers.py:355-453): Blender transforms
    whose frames each attach a GT mesh frame_<N>.ply from mesh_path (train)
    and mesh_path_test (test)."""
    from dgmesh_tpu.utils_io import write_mesh_ply

    root = str(tmp_path)
    mdir, mdir_t = os.path.join(root, "meshes"), os.path.join(root, "meshes_t")
    os.makedirs(mdir), os.makedirs(mdir_t)
    verts = rng.random((8, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    for split, n, md in (("train", 3, mdir), ("test", 2, mdir_t)):
        frames = []
        for k in range(n):
            c2w = np.eye(4)
            c2w[2, 3] = 4.0
            frames.append(dict(file_path=f"{split}/r_{k}",
                               transform_matrix=c2w.tolist(),
                               time=k / max(n - 1, 1)))
            rgba = np.concatenate([rng.random((48, 64, 3)),
                                   np.ones((48, 64, 1))], -1)
            _png(os.path.join(root, split, f"r_{k}.png"), rgba)
            write_mesh_ply(os.path.join(md, f"frame_{k}.ply"), verts, faces)
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(dict(camera_angle_x=0.7, frames=frames), f)

    from dgmesh_tpu.data.readers import read_finetune_nerf_scene
    info = read_finetune_nerf_scene(root, white_background=False,
                                    eval_split=True, mesh_path=mdir,
                                    mesh_path_test=mdir_t)
    assert len(info.train_cameras) == 3 and len(info.test_cameras) == 2
    for cam in info.train_cameras + info.test_cameras:
        assert cam.mesh_verts is not None and cam.mesh_verts.shape == (8, 3)
        assert cam.mesh_faces.shape == (2, 3)
    np.testing.assert_allclose(info.train_cameras[0].mesh_verts, verts,
                               atol=1e-6)

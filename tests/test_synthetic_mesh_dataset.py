"""Generator ↔ reader integration for the synthetic GT-mesh benchmark dataset.

data/synthetic_mesh.py writes the finetune-nerf layout (reference
dataset_readers.py:355-453); the Scene/reader stack must load it with correct
cameras, per-frame times, alpha masks, GT-mesh attachment, and an init cloud
near the GT surface — this is the dataset behind the full CD/EMD quality gate.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_mesh_ds(tmp_path_factory):
    from dgmesh_tpu.data.synthetic_mesh import generate_mesh_dataset
    out = str(tmp_path_factory.mktemp("meshds"))
    generate_mesh_dataset(out, n_frames=3, width=64, height=64, n_test=2,
                          subdiv=2, n_eval_meshes=2, max_per_tile=64)
    return out


def test_layout(tiny_mesh_ds):
    d = tiny_mesh_ds
    assert os.path.isfile(os.path.join(d, "transforms_train.json"))
    assert os.path.isfile(os.path.join(d, "transforms_test.json"))
    assert sorted(os.listdir(os.path.join(d, "mesh"))) == [
        "frame_0.ply", "frame_1.ply", "frame_2.ply"]
    assert len(os.listdir(os.path.join(d, "gt_eval"))) == 2
    meta = json.load(open(os.path.join(d, "transforms_train.json")))
    times = [f["time"] for f in meta["frames"]]
    assert times == sorted(times) and times[0] == 0.0 and times[-1] == 1.0


def test_scene_loads_with_gt_meshes(tiny_mesh_ds):
    from dgmesh_tpu.config import Config
    from dgmesh_tpu.data.scene import Scene

    cfg = Config()
    cfg.model.source_path = tiny_mesh_ds
    cfg.model.data_type = "finetune-nerf"
    cfg.model.is_blender = True
    cfg.model.eval = True
    cfg.model.pretrain_mesh_path = os.path.join(tiny_mesh_ds, "mesh")
    cfg.model.pretrain_mesh_path_test = os.path.join(tiny_mesh_ds, "mesh_test")
    scene = Scene(cfg, shuffle=False)

    assert len(scene.train_cameras) == 3
    assert len(scene.test_cameras) == 2
    cam = scene.train_cameras[0]
    assert cam.image.shape == (64, 64, 3)
    assert cam.alpha_mask is not None
    # GT mesh attached per frame (icosphere subdiv2: 162 verts / 320 faces)
    assert cam.mesh_verts.shape == (162, 3) and cam.mesh_faces.shape == (320, 3)
    # frames carry distinct times
    fids = sorted(c.fid for c in scene.train_cameras)
    assert fids == [0.0, 0.5, 1.0]

    # init cloud hugs the GT surface (deformed icosphere, base_r=0.5,
    # noise sigma=0.02)
    pts = scene.point_cloud.points
    r = np.linalg.norm(pts, axis=1)
    assert 0.35 < np.median(r) < 0.7

    # the rendered alpha covers a plausible silhouette (object visible)
    cov = float(cam.alpha_mask.mean())
    assert 0.02 < cov < 0.9


def test_gt_mesh_watertight_and_outward(tiny_mesh_ds):
    """GT meshes must satisfy the same closed/outward-winding contract the
    backface cull relies on (and that marching-tets output guarantees)."""
    from dgmesh_tpu.utils_io import read_mesh_ply

    v, f = read_mesh_ply(os.path.join(tiny_mesh_ds, "mesh", "frame_1.ply"))
    # every edge appears exactly twice with opposite orientation
    edges = {}
    for tri in f:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    assert all(c == 1 for c in edges.values())
    assert all((b, a) in edges for (a, b) in edges)
    # signed volume positive => outward winding
    tri = v[f]
    vol = np.einsum("ij,ij->i", tri[:, 0],
                    np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0
    assert vol > 0

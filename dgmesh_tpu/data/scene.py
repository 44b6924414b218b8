"""Scene orchestration: dataset dispatch, camera shuffling, extent.

reference: scene/__init__.py Scene :25-141 — dataset-type sniffing
(`sparse/` → Colmap, `transforms_train.json` → Blender, `cameras_sphere.npz` →
DTU, `poses_bounds.npy` → Plenoptic; explicit `data_type` wins), camera
shuffle, cameras_extent from NeRF++ normalization, Gaussian init from the
point cloud.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional

import numpy as np

from ..cameras import Camera, focal2fov, fov2focal
from ..config import Config
from .readers import SCENE_READERS, SceneInfo


def apply_resolution_policy(cams: List, resolution: int) -> List:
    """Resize loaded images per the reference's loadCam policy
    (utils/camera_utils.py:23-63): resolution in {1,2,4,8} divides; -1 keeps
    native unless width > 1600, which auto-downscales to 1600 (with the
    one-time warning); other values are treated as a target global scale.
    """
    import numpy as np
    from PIL import Image

    out = []
    warned = False
    for cam in cams:
        w = cam.width
        if resolution in (1, -1, None) and (resolution != -1 or w <= 1600):
            out.append(cam)
            continue
        if resolution == -1:
            if not warned:
                print("[INFO] big images detected: auto-downscaling to 1.6K. "
                      "Use --resolution 1 to keep native size.")
                warned = True
            scale = w / 1600.0
        elif resolution > 0:
            scale = float(resolution)
        else:
            out.append(cam)
            continue
        nw, nh = round(w / scale), round(cam.height / scale)

        def rz(img, size):
            if img is None:
                return None
            arr = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)
                                  .squeeze())
            arr = arr.resize(size, Image.LANCZOS)
            res = np.asarray(arr).astype(np.float32) / 255.0
            if res.ndim == 2:
                res = res[..., None]
            return res

        K = None
        if cam.K is not None:
            K = cam.K.copy()
            K[:2] *= (nw / w)
        out.append(Camera(
            uid=cam.uid, R=cam.R, T=cam.T, fovx=cam.fovx, fovy=cam.fovy,
            image=rz(cam.image, (nw, nh)),
            alpha_mask=rz(cam.alpha_mask, (nw, nh)),
            fid=cam.fid, width=nw, height=nh, image_name=cam.image_name,
            K=K, orig_transform=cam.orig_transform))
    return out


def detect_scene_type(path: str, data_type: str = "") -> str:
    if data_type:
        mapping = {"Nerfies": "nerfies", "iPhone": "iPhone",
                   "NeuralActor": "NeuralActor", "finetune-nerf": "finetune-nerf"}
        return mapping.get(data_type, data_type)
    if os.path.exists(os.path.join(path, "sparse")):
        return "Colmap"
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        return "Blender"
    if os.path.exists(os.path.join(path, "cameras_sphere.npz")):
        return "DTU"
    if os.path.exists(os.path.join(path, "poses_bounds.npy")):
        return "PlenopticVideo"
    if os.path.exists(os.path.join(path, "dataset.json")):
        return "nerfies"
    raise ValueError(f"Could not infer scene type for {path}")


class Scene:
    def __init__(self, cfg: Config, shuffle: bool = True, seed: int = 0,
                 max_frames: Optional[int] = None):
        self.cfg = cfg
        path = cfg.model.source_path
        stype = detect_scene_type(path, cfg.model.data_type)
        reader = SCENE_READERS[stype]
        # per-type reader args, mirroring reference scene/__init__.py:47-85
        m = cfg.model
        kwargs = {}
        if stype == "Blender":
            kwargs = dict(white_background=m.white_background,
                          max_frames=max_frames, downsample=m.downsample)
        elif stype == "Colmap":
            kwargs = dict(images=m.images,
                          white_background=m.white_background,
                          eval_split=m.eval)
        elif stype == "nerfies":
            kwargs = dict(white_background=m.white_background,
                          eval_split=m.eval, nerfies_ratio=m.nerfies_ratio)
        elif stype in ("iPhone", "NeuralActor"):
            kwargs = dict(white_background=m.white_background, eval_split=m.eval)
        elif stype == "finetune-nerf":
            kwargs = dict(white_background=m.white_background, eval_split=m.eval,
                          downsample=m.downsample,
                          mesh_path=m.pretrain_mesh_path or None,
                          mesh_path_test=m.pretrain_mesh_path_test or None,
                          max_frames=max_frames)
        self.info: SceneInfo = reader(path, **kwargs)
        if cfg.model.resolution not in (1, None):
            self.info.train_cameras[:] = apply_resolution_policy(
                self.info.train_cameras, cfg.model.resolution)
            self.info.test_cameras[:] = apply_resolution_policy(
                self.info.test_cameras, cfg.model.resolution)
        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(self.info.train_cameras)   # reference scene/__init__.py:102-104
        self.cameras_extent = self.info.nerf_normalization["radius"]

    @property
    def train_cameras(self):
        return self.info.train_cameras

    @property
    def test_cameras(self):
        return self.info.test_cameras

    @property
    def point_cloud(self):
        return self.info.point_cloud

    @property
    def time_interval(self) -> float:
        return 1.0 / max(len(self.info.train_cameras), 1)

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

from ..config import Config
from .readers import SCENE_READERS, SceneInfo


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
        kwargs = {}
        if stype in ("Blender",):
            kwargs = dict(white_background=cfg.model.white_background,
                          max_frames=max_frames)
        elif stype == "Colmap":
            kwargs = dict(images=cfg.model.images,
                          white_background=cfg.model.white_background,
                          eval_split=cfg.model.eval)
        self.info: SceneInfo = reader(path, **kwargs)
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

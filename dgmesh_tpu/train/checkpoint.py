"""Checkpoint / resume.

reference: per-module files (PLY for gaussians, .pth per MLP —
scene/__init__.py:129-131, deform_model.py:30-41, train.py:532-538) and NO
optimizer state saved.  We improve on that: one flax-serialized blob holds
params + Adam moments + step (full resume), while the reference's on-disk
layout (point_cloud/iteration_N/point_cloud.ply + <net>/iteration_N/) is still
written for interoperability.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import flax.serialization as fser

from ..models import gaussians as G
from .state import TrainState


def save_checkpoint(state: TrainState, model_path: str, iteration: int):
    ckpt_dir = os.path.join(model_path, "checkpoint")
    os.makedirs(ckpt_dir, exist_ok=True)
    blob = fser.to_bytes(state)
    with open(os.path.join(ckpt_dir, f"state_{iteration}.msgpack"), "wb") as f:
        f.write(blob)
    # reference-compatible PLY (Scene.save, scene/__init__.py:129-131)
    ply_dir = os.path.join(model_path, "point_cloud", f"iteration_{iteration}")
    G.save_ply(os.path.join(ply_dir, "point_cloud.ply"), state.gp, state.gs)
    # per-net blobs mirroring <name>/iteration_N/<name>.pth
    for name in state.nets._fields:
        net_dir = os.path.join(model_path, name, f"iteration_{iteration}")
        os.makedirs(net_dir, exist_ok=True)
        with open(os.path.join(net_dir, f"{name}.msgpack"), "wb") as f:
            f.write(fser.to_bytes(getattr(state.nets, name)))


def search_max_iteration(folder: str) -> Optional[int]:
    """reference: utils/system_utils.py searchForMaxIteration :29-31."""
    if not os.path.isdir(folder):
        return None
    iters = []
    for name in os.listdir(folder):
        m = re.search(r"(\d+)", name)
        if m:
            iters.append(int(m.group(1)))
    return max(iters) if iters else None


def load_checkpoint(template: TrainState, model_path: str,
                    iteration: int = -1) -> TrainState:
    ckpt_dir = os.path.join(model_path, "checkpoint")
    if iteration == -1:
        iteration = search_max_iteration(ckpt_dir)
        if iteration is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    with open(os.path.join(ckpt_dir, f"state_{iteration}.msgpack"), "rb") as f:
        return fser.from_bytes(template, f.read())

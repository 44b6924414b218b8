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
        blob = f.read()
    try:
        return fser.from_bytes(template, blob)
    except (ValueError, KeyError) as e:
        # FORMAT BREAK (2026-08): the deform/appearance trunks moved from
        # inline nn.Dense layers (params `Dense_i/kernel`) into the shared
        # MLPTrunk module (`MLPTrunk_0/w_i,b_i`, head numbering shifted).
        # Checkpoints written before that commit cannot load into the new
        # tree; the auto-numbering shift depends on net variant flags, so we
        # fail loudly instead of guessing a remap.
        if b"Dense_" in blob and b"MLPTrunk_0" not in blob:
            raise ValueError(
                f"checkpoint {ckpt_dir}/state_{iteration}.msgpack predates "
                "the MLPTrunk param-tree rename (Dense_i/kernel -> "
                "MLPTrunk_0/w_i) and cannot be loaded by this version; "
                "re-train or export the Gaussians via the PLY path "
                "(point_cloud/iteration_N/point_cloud.ply) which is "
                "unaffected") from e
        raise

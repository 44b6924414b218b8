"""Regression test for the r4 mesh-phase divergence (VERDICT r4 weak #7).

The r4 quality run survived NaN-free but never learned: density_thres ran to
its projection bound within ~100 mesh iterations, mesh PSNR stayed flat, and
the mesh-branch gradients eventually destroyed the Gaussian render too.  No
test asserted that the mesh phase *optimizes* — the e2e smoke regime (mesh
at iter 40 of a 120-iter fit) is legitimately hostile and cannot.

This test trains the reference-shaped schedule in miniature on a synthetic
GT-mesh dataset (the quality-dataset generator): a real GS warm-up long
enough to fit the object, then the mesh phase.  It asserts the three
properties whose absence defined the r4 failure (train_log analysis in
VERDICT r4 "What's missing" #1):

  1. mesh PSNR RISES over the mesh phase (it was flat 14-18 for 2,500 iters);
  2. the GS render is NOT destroyed by mesh-branch gradients (img_psnr fell
     41 -> 14 from iter 6300);
  3. density_thres does NOT pin at its +-DENSITY_THRES_BOUND projection bound
     (it ran to the bound within 100 mesh iterations and sat there).

reference: train.py:248-321 trains mask/mesh-img/laplacian losses through
15k+ iterations and improves.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh_fit(tmp_path_factory):
    from dgmesh_tpu.config import Config
    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.data.synthetic_mesh import generate_mesh_dataset
    from dgmesh_tpu.train.loop import Trainer

    out = str(tmp_path_factory.mktemp("mesh_ds"))
    generate_mesh_dataset(out, n_frames=6, width=64, height=64, n_test=1,
                          subdiv=3, n_eval_meshes=0, max_per_tile=1024)

    cfg = Config()
    cfg.model.source_path = out
    cfg.model.data_type = "finetune-nerf"
    cfg.model.is_blender = True
    cfg.model.white_background = False
    # grid 24 keeps marching-tets triangles ~3 px at 64², so each 16×16
    # tile's visible set (≤ #pixels winners) stays well under K=512 and the
    # raster runs truncation-free — the property DESIGN.md §5c shows is
    # REQUIRED for the mask gradient to be sane (at grid 32 / K=64 this very
    # regime reproduces the r4 GS-destruction: img 32→17 dB, |n|→5.1)
    cfg.model.grid_res = 24
    cfg.model.sh_degree = 1
    cfg.model.gaussian_ratio = 1.2
    o = cfg.optimization
    o.iterations = 420
    o.warm_up = 30
    o.dpsr_iter = 220          # mesh phase opens on a fitted GS model
    o.normal_warm_up = 40
    o.normal_net_warmup = 60
    o.anchor_iter = 10_000     # anchoring is covered by the e2e test
    o.densify_from_iter = 30
    o.densify_until_iter = 150
    o.densification_interval = 50
    o.opacity_reset_interval = 100_000
    o.dpsr_sig = 2.0
    o.mask_loss_weight = 1.0
    t = cfg.tpu
    t.max_gaussians = 2048
    t.max_verts = 16384
    t.max_faces = 32768
    t.max_gaussians_per_tile = 128
    t.max_dup = 1 << 15
    t.max_faces_per_tile = 512
    t.max_face_dup = 1 << 17
    t.tile_chunk = 8

    scene = Scene(cfg, shuffle=True)
    trainer = Trainer(cfg, scene)
    history = trainer.train(iterations=o.iterations, log_every=20)
    return trainer, history


def test_mesh_psnr_rises(mesh_fit):
    _, history = mesh_fit
    mesh_rows = [m for m in history if "mesh_psnr" in m]
    assert len(mesh_rows) >= 5, "mesh phase produced too few log rows"
    first = np.mean([m["mesh_psnr"] for m in mesh_rows[:2]])
    last = np.mean([m["mesh_psnr"] for m in mesh_rows[-2:]])
    assert last > first + 1.0, (
        f"mesh_psnr did not rise over the mesh phase: {first:.2f} -> "
        f"{last:.2f} (r4 divergence signature: flat)")


def test_gs_not_destroyed(mesh_fit):
    _, history = mesh_fit
    pre_mesh = [m for m in history if "mesh_psnr" not in m]
    mesh_rows = [m for m in history if "mesh_psnr" in m]
    gs_before = max(m["img_psnr"] for m in pre_mesh[-3:])
    gs_after = np.mean([m["img_psnr"] for m in mesh_rows[-2:]])
    assert gs_after > gs_before - 3.0, (
        f"mesh-branch gradients destroyed the GS render: img_psnr "
        f"{gs_before:.2f} -> {gs_after:.2f} (r4 signature: 41 -> 14)")


def test_density_thres_not_pinned(mesh_fit):
    from dgmesh_tpu.train.state import DENSITY_THRES_BOUND
    trainer, history = mesh_fit
    thr = float(np.asarray(trainer.state.gp.density_thres).reshape(()))
    assert abs(thr) < DENSITY_THRES_BOUND - 0.01, (
        f"density_thres pinned at its projection bound: {thr} "
        f"(bound {DENSITY_THRES_BOUND})")


def test_mesh_has_geometry(mesh_fit):
    _, history = mesh_fit
    mesh_rows = [m for m in history if "mesh_psnr" in m]
    assert mesh_rows[-1].get("mesh_n_verts", 0) > 100, (
        "final mesh nearly empty")
    assert all(m.get("mesh_overflow", 0) == 0 for m in mesh_rows)

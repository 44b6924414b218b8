"""Held-out evaluation: render GS + mesh on test cameras, compute metrics.

reference: train.py testing() :559-760 — per test camera: deform → GS render +
mesh render → PSNR / SSIM / MS-SSIM / LPIPS(alex,vgg) ×{GS,mesh} (LPIPS
columns appear automatically when converted weights are present — this
environment has no egress, see eval/lpips_jax.py for the offline conversion
step), image dumps, per-frame mesh export, fps.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import gaussians as G
from ..ops import losses as L
from ..ops import mesh_raster as MR
from ..ops import splat
from ..train.loop import make_batch
from ..train.step import StepContext, extract_mesh, _mesh_colors, _deform_all, StepFlags
from ..utils_io import save_image, write_mesh_ply


def render_frame(ctx: StepContext, state, batch, sh_degree: int,
                 with_mesh: bool = True):
    """One inference render: returns dict with gs image, mesh image, mask, mesh."""
    ctx = ctx.f32()  # eval/metric path: nets always apply f32 (mixed-precision policy)
    gp, gs, nets = state.gp, state.gs, state.nets
    flags = StepFlags(warm=False, mesh=with_mesh, use_normal=with_mesh,
                      freeze_pos=False, sh_degree=sh_degree)
    d_xyz, d_rot, d_scale, d_normal = _deform_all(ctx, nets, gp.xyz, batch.fid,
                                                  0.0, flags)
    out = splat.render(gp.xyz + d_xyz, G.get_scaling(gp) + d_scale,
                       G.get_rotation(gp) + d_rot, G.get_opacity(gp),
                       G.get_features(gp), gs.alive, batch.cam, batch.bg,
                       ctx.splat_cfg, sh_degree=sh_degree)
    res = dict(render=out["render"])
    if with_mesh:
        mesh = extract_mesh(ctx, gp, gs, d_xyz, d_normal, freeze_pos=False)
        vtx_color = _mesh_colors(ctx, nets, mesh.verts, mesh.vert_valid, batch.fid)
        mout = MR.render_mesh(mesh.verts, mesh.faces, mesh.face_valid, vtx_color,
                              batch.mesh_pose, batch.mesh_proj, batch.bg,
                              ctx.mr_cfg, want_soft=False)
        res.update(mesh_image=mout["rgb"].transpose(2, 0, 1), mask=mout["mask"],
                   verts=mesh.verts, faces=mesh.faces,
                   n_verts=mesh.n_verts, n_faces=mesh.n_faces,
                   vtx_color=vtx_color)
    return res


def pointcloud_scatter_render(points: np.ndarray, cam, out_path: str = None,
                              colors=None, s: float = 0.5):
    """Matplotlib scatter render of a Gaussian point cloud from a camera pose
    (reference: utils/renderer.py pointcloud_renderer :322-374, used in
    render_trajectory for the Gaussian panel)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w2v = cam.world_view
    pts_h = np.concatenate([points, np.ones((len(points), 1))], 1)
    pv = pts_h @ w2v.T
    proj = cam.full_proj
    ph = pts_h @ proj.T
    ok = ph[:, 3] > 1e-6
    ndc = ph[ok, :2] / ph[ok, 3:4]
    fig = plt.figure(figsize=(cam.width / 100, cam.height / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    c = None if colors is None else np.clip(colors[ok], 0, 1)
    order = np.argsort(-pv[ok, 2])  # far first
    ax.scatter(ndc[order, 0], -ndc[order, 1], s=s,
               c=None if c is None else c[order])
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.axis("off")
    import io as _io
    buf = _io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    buf.seek(0)
    from PIL import Image
    img = np.asarray(Image.open(buf)).astype(np.float32)[..., :3] / 255.0
    if out_path:
        from ..utils_io import save_image
        save_image(out_path, img)
    return img


def export_dynamic_meshes(cfg: Config, trainer, scene, out_dir: str,
                          n_frames: int = 200):
    """Export the reconstructed mesh at n_frames uniform time steps.

    reference: train.py:389-423 — the end-of-training 200-frame dynamic mesh
    dump used for the CD/EMD evaluation against GT mesh sequences.
    """
    import functools
    ctx = trainer.ctx.f32()  # exported meshes feed CD/EMD eval: f32 nets
    state = trainer.state
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def mesh_at(fid):
        gp, gs, nets = state.gp, state.gs, state.nets
        M = gp.xyz.shape[0]
        t_in = jnp.full((M, 1), fid)
        d_xyz, _, _, _ = ctx.nets_def.deform.apply(nets.deform, gp.xyz, t_in)
        d_normal = ctx.nets_def.deform_normal.apply(nets.deform_normal,
                                                    gp.xyz, t_in)
        m = extract_mesh(ctx, gp, gs, d_xyz, d_normal, freeze_pos=False)
        color = _mesh_colors(ctx, nets, m.verts, m.vert_valid, fid)
        return m.verts, m.faces, m.n_verts, m.n_faces, color

    for i in range(n_frames):
        fid = i / max(n_frames - 1, 1)
        verts, faces, nv, nf, color = mesh_at(jnp.asarray(fid, jnp.float32))
        nv, nf = int(nv), int(nf)
        write_mesh_ply(os.path.join(out_dir, f"mesh_{i:05d}.ply"),
                       np.asarray(verts)[:nv], np.asarray(faces)[:nf],
                       np.asarray(color)[:nv])
    print(f"exported {n_frames} meshes to {out_dir}", flush=True)


def run_testing(cfg: Config, trainer, scene, save_dir: str = None,
                with_mesh: bool = True) -> Dict[str, float]:
    ctx = trainer.ctx
    state = trainer.state
    sh_degree = cfg.model.sh_degree
    from ..utils_jit import jit_options
    fn = jax.jit(lambda st, b: render_frame(ctx, st, b, sh_degree, with_mesh),
                 **jit_options(cfg))

    # LPIPS alex+vgg for GS and mesh renders when converted weights exist
    # (reference train.py:646-697 + utils/metric_utils.py:18-23)
    from .lpips_jax import lpips_available, rgb_lpips
    lpips_nets = [n for n in ("alex", "vgg") if lpips_available(n)]

    metrics = {k: [] for k in ("psnr", "ssim", "ms_ssim",
                               "mesh_psnr", "mesh_ssim", "mesh_ms_ssim")}
    for n in lpips_nets:
        metrics[f"lpips_{n}"] = []
        metrics[f"mesh_lpips_{n}"] = []
    t_total = 0.0
    for i, cam in enumerate(scene.test_cameras):
        batch = make_batch(cam, scene.time_interval, trainer.bg)
        t0 = time.time()
        out = fn(state, batch)
        jax.block_until_ready(out["render"])
        t_total += time.time() - t0
        gt = batch.gt_image
        img = jnp.clip(out["render"], 0, 1)
        metrics["psnr"].append(float(L.psnr(img, gt)))
        metrics["ssim"].append(float(L.ssim(img, gt)))
        if img.shape[1] >= 176 and img.shape[2] >= 176:
            metrics["ms_ssim"].append(float(L.ms_ssim(img, gt)))
        for n in lpips_nets:
            metrics[f"lpips_{n}"].append(rgb_lpips(img, gt, n))
        if with_mesh:
            mimg = jnp.clip(out["mesh_image"], 0, 1)
            metrics["mesh_psnr"].append(float(L.psnr(mimg, gt)))
            metrics["mesh_ssim"].append(float(L.ssim(mimg, gt)))
            if mimg.shape[1] >= 176 and mimg.shape[2] >= 176:
                metrics["mesh_ms_ssim"].append(float(L.ms_ssim(mimg, gt)))
            for n in lpips_nets:
                metrics[f"mesh_lpips_{n}"].append(rgb_lpips(mimg, gt, n))
        if save_dir:
            save_image(os.path.join(save_dir, f"render_{i:03d}.png"),
                       np.asarray(img).transpose(1, 2, 0))
            if with_mesh:
                save_image(os.path.join(save_dir, f"mesh_{i:03d}.png"),
                           np.asarray(out["mesh_image"]).transpose(1, 2, 0))
                nv, nf = int(out["n_verts"]), int(out["n_faces"])
                write_mesh_ply(os.path.join(save_dir, f"mesh_{i:03d}.ply"),
                               np.asarray(out["verts"])[:nv],
                               np.asarray(out["faces"])[:nf],
                               np.asarray(out["vtx_color"])[:nv])

    result = {k: float(np.mean(v)) for k, v in metrics.items() if v}
    n = max(len(scene.test_cameras), 1)
    result["fps"] = n / t_total if t_total > 0 else 0.0
    return result

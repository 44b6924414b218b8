"""Orbit-trajectory rendering CLI (reference: dgmesh/render_trajectory.py :43-174).

Renders a turntable video of the reconstructed dynamic mesh: textured mesh
render + a Lambertian "shape" render (grey, headlight shading — stands in for
the reference's pytorch3d SoftPhong shape pass, :236-319).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from . import apply_platform_override
    apply_platform_override()
    parser = argparse.ArgumentParser()
    from ..config import add_config_args, config_from_args
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--n_views", type=int, default=60)
    parser.add_argument("--radius", type=float, default=3.0)
    parser.add_argument("--elevation", type=float, default=0.3)
    parser.add_argument("--out", type=str, default=None)
    add_config_args(parser)
    args = parser.parse_args(argv)
    cfg = config_from_args(args, args.config)
    stored = os.path.join(cfg.model.model_path, "cfg_args.json")
    if os.path.exists(stored):
        from ..config import Config
        base = Config.load(stored)
        base.model.model_path = cfg.model.model_path
        cfg = base

    import jax
    import jax.numpy as jnp
    from ..cameras import camera_from_c2w_blender, orbit_camera_poses
    from ..data.scene import Scene
    from ..eval.testing import render_frame
    from ..train.checkpoint import load_checkpoint
    from ..train.loop import Trainer, make_batch
    from ..utils_io import save_image

    scene = Scene(cfg, shuffle=False)
    trainer = Trainer(cfg, scene)
    trainer.state = load_checkpoint(trainer.state, cfg.model.model_path,
                                    args.iteration)
    cam0 = scene.train_cameras[0]
    out_dir = args.out or os.path.join(cfg.model.model_path, "trajectory")
    os.makedirs(out_dir, exist_ok=True)

    poses = orbit_camera_poses(args.n_views, radius=args.radius,
                               elevation=args.elevation)
    fn = jax.jit(lambda st, b: render_frame(trainer.ctx, st, b,
                                            cfg.model.sh_degree, True))
    frames = []
    for i in range(args.n_views):
        t = i / max(args.n_views - 1, 1)
        cam = camera_from_c2w_blender(i, poses[i], cam0.fovx, cam0.width,
                                      cam0.height, t,
                                      image=np.zeros((cam0.height, cam0.width, 3),
                                                     np.float32))
        batch = make_batch(cam, scene.time_interval, trainer.bg)
        out = fn(trainer.state, batch)
        mesh_img = np.asarray(jnp.clip(out["mesh_image"], 0, 1)).transpose(1, 2, 0)

        # shape render: per-pixel Blinn-Phong shaded white mesh (reference:
        # utils/renderer.py mesh_shape_renderer :236-319 — DirectionalLight
        # from the camera toward the mesh center, specular 0.2/shininess 10)
        from ..ops import mesh_raster as MR
        fvalid = jnp.arange(out["faces"].shape[0]) < out["n_faces"]
        sout = MR.render_mesh_shape(out["verts"], out["faces"], fvalid,
                                    batch.mesh_pose, batch.mesh_proj,
                                    jnp.asarray(cam.camera_center),
                                    trainer.ctx.mr_cfg)
        shape_img = np.asarray(jnp.clip(sout["rgb"], 0, 1))
        panel = np.concatenate([mesh_img, shape_img], axis=1)
        save_image(os.path.join(out_dir, f"frame_{i:03d}.png"), panel)
        frames.append((panel * 255).astype(np.uint8))

    try:
        import imageio.v2 as imageio
        imageio.mimsave(os.path.join(out_dir, "trajectory.gif"), frames, fps=15)
    except Exception as e:
        print(f"gif export skipped: {e}")
    print(f"wrote {len(frames)} frames to {out_dir}", flush=True)


if __name__ == "__main__":
    main()

"""Test-set rendering CLI (reference: dgmesh/render_test.py :42-226).

Loads a checkpoint, renders GS + mesh on the test cameras, stacks
[gt | mesh image | mesh shape] panels and writes per-frame pngs + an mp4/gif
when imageio-ffmpeg is available.
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

    from ..data.scene import Scene
    from ..train.loop import Trainer
    from ..train.checkpoint import load_checkpoint
    from ..eval.testing import run_testing

    scene = Scene(cfg, shuffle=False)
    trainer = Trainer(cfg, scene)
    trainer.state = load_checkpoint(trainer.state, cfg.model.model_path,
                                    args.iteration)
    out_dir = args.out or os.path.join(cfg.model.model_path, "test_renders")
    results = run_testing(cfg, trainer, scene, save_dir=out_dir)
    print(results, flush=True)

    # assemble side-by-side video (gt | mesh)
    try:
        import imageio.v2 as imageio
        frames = []
        for i, cam in enumerate(scene.test_cameras):
            gt = (np.clip(cam.image, 0, 1) * 255).astype(np.uint8)
            mesh_p = os.path.join(out_dir, f"mesh_{i:03d}.png")
            if os.path.exists(mesh_p):
                mesh = imageio.imread(mesh_p)
                frames.append(np.concatenate([gt, mesh[..., :3]], axis=1))
        if frames:
            imageio.mimsave(os.path.join(out_dir, "test.gif"), frames, fps=10)
    except Exception as e:  # video assembly is best-effort
        print(f"video export skipped: {e}")


if __name__ == "__main__":
    main()

"""Training CLI (reference: dgmesh/train.py __main__ :858-949).

Usage:  python -m dgmesh_tpu.cli.train --config configs/d-nerf/jumpingjacks.yaml \
            -s /data/jumpingjacks -m output/jj

Matches the reference's flag surface (flat names from the three param groups,
YAML config taking precedence over CLI), fixed seeds (:888-891), cfg dump
(:919-934), periodic checkpoints, and a final testing() pass.
"""

from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np


def main(argv=None):
    from . import apply_platform_override
    apply_platform_override()
    parser = argparse.ArgumentParser(description="dgmesh_tpu trainer")
    from ..config import add_config_args, config_from_args
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--seed", type=int, default=6666)  # reference train.py:888
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--quit_after", type=int, default=None,
                        help="stop after N iterations (debug)")
    parser.add_argument("--profile_iters", type=int, default=0,
                        help="wrap the first N iterations in a jax.profiler "
                             "trace written to <model_path>/profile (SURVEY §5: "
                             "tracing as a first-class metric)")
    parser.add_argument("--log_images", action="store_true",
                        help="periodic image/mesh dumps to logs/ + logs_geo/ "
                             "(reference train.py:323-386)")
    parser.add_argument("--export_meshes", type=int, default=0,
                        help="export N-frame dynamic mesh sequence at the end "
                             "(reference exports 200)")
    add_config_args(parser)
    args = parser.parse_args(argv)
    cfg = config_from_args(args, args.config)

    random.seed(args.seed)
    np.random.seed(args.seed % (2 ** 31))

    if not cfg.model.model_path:
        import uuid
        cfg.model.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
    os.makedirs(cfg.model.model_path, exist_ok=True)
    cfg.save(os.path.join(cfg.model.model_path, "cfg_args.json"))
    print(f"Output folder: {cfg.model.model_path}", flush=True)

    from ..data.scene import Scene
    from ..train.loop import Trainer
    from ..train.checkpoint import save_checkpoint, load_checkpoint

    scene = Scene(cfg, shuffle=True, seed=args.seed)
    trainer = Trainer(cfg, scene, seed=args.seed)
    if args.start_checkpoint:
        trainer.state = load_checkpoint(trainer.state, args.start_checkpoint)
        print(f"Resumed from {args.start_checkpoint} at step "
              f"{int(trainer.state.step)}", flush=True)

    iterations = args.quit_after or cfg.optimization.iterations
    save_at = set(args.save_iterations or [iterations])

    first_iter = int(trainer.state.step) + 1

    def on_log(m):
        with open(os.path.join(cfg.model.model_path, "train_log.jsonl"), "a") as f:
            f.write(json.dumps(m) + "\n")

    if args.profile_iters:
        import jax
        with jax.profiler.trace(os.path.join(cfg.model.model_path, "profile")):
            trainer.train(iterations=min(first_iter + args.profile_iters - 1,
                                         iterations),
                          log_every=min(cfg.optimization.log_every, 100),
                          first_iter=first_iter, on_log=on_log)
        first_iter = int(trainer.state.step) + 1
    trainer.train(iterations=iterations,
                  log_every=min(cfg.optimization.log_every, 100),
                  first_iter=first_iter, on_log=on_log,
                  image_log_every=cfg.optimization.log_every if args.log_images else 0,
                  image_log_dir=cfg.model.model_path,
                  save_at={i for i in save_at if i < iterations},
                  save_dir=cfg.model.model_path)
    save_checkpoint(trainer.state, cfg.model.model_path, iterations)
    print("Training complete.", flush=True)

    # final test pass (reference train.py:540-555 → testing())
    if scene.test_cameras:
        from ..eval.testing import run_testing
        results = run_testing(cfg, trainer, scene)
        out = os.path.join(cfg.model.model_path, "test_results")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "test_result.txt"), "w") as f:
            for k, v in results.items():
                f.write(f"{k}: {v}\n")
        print("Test results:", results, flush=True)

    # dynamic mesh sequence export (reference train.py:389-423)
    if args.export_meshes > 0:
        from ..eval.testing import export_dynamic_meshes
        export_dynamic_meshes(cfg, trainer, scene,
                              os.path.join(cfg.model.model_path, "meshes"),
                              n_frames=args.export_meshes)


if __name__ == "__main__":
    main()

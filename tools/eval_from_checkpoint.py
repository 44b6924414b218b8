"""Run the full end-of-training evaluation from a saved checkpoint.

Chains run_testing (PSNR/SSIM/MS-SSIM x {GS, mesh} + fps) + the 200-frame
dynamic mesh export + CD/EMD mesh_evaluation — the same pipeline train.py
runs at completion (reference train.py:559-760 + :389-423 +
mesh_evaluation.py:98-178) — so an interrupted run can still produce the
quality numbers from its latest mid-run checkpoint.

Usage:
  python tools/eval_from_checkpoint.py -m output/quality_run -s output/quality_ds \
      [--iteration N] [--n_meshes 200] [--skip_cd]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--n_meshes", type=int, default=200)
    ap.add_argument("--skip_cd", action="store_true")
    ap.add_argument("--emd_samples", type=int, default=2048)
    args = ap.parse_args()

    from dgmesh_tpu.config import Config
    cfg = Config.load(os.path.join(args.model_path, "cfg_args.json"))
    cfg.model.model_path = args.model_path
    cfg.model.source_path = args.source_path

    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.train.loop import Trainer
    from dgmesh_tpu.train.checkpoint import load_checkpoint
    from dgmesh_tpu.eval.testing import run_testing, export_dynamic_meshes

    scene = Scene(cfg, shuffle=False)
    trainer = Trainer(cfg, scene)
    trainer.state = load_checkpoint(trainer.state, args.model_path,
                                    args.iteration)
    step = int(trainer.state.step)
    print(f"loaded checkpoint at step {step}", flush=True)

    res = run_testing(cfg, trainer, scene,
                      save_dir=os.path.join(args.model_path, "test_results"))
    print(res, flush=True)

    mesh_dir = os.path.join(args.model_path, "meshes")
    export_dynamic_meshes(cfg, trainer, scene, mesh_dir,
                          n_frames=args.n_meshes)
    print(f"exported {args.n_meshes} meshes to {mesh_dir}", flush=True)

    if not args.skip_cd:
        from dgmesh_tpu.cli.mesh_evaluation import main as me_main
        gt_dir = os.path.join(args.source_path, "gt_eval")
        out = os.path.join(args.model_path, "eval_results.txt")
        me_main(["--gt_dir", gt_dir, "--pred_dir", mesh_dir,
                 "--transforms",
                 os.path.join(args.source_path, "transforms_train.json"),
                 "--emd_samples", str(args.emd_samples), "--out", out])
        print(open(out).read().splitlines()[-3:], flush=True)


if __name__ == "__main__":
    main()

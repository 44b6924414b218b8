"""Bisect which mesh-branch loss destroys the Gaussian render.

The r4 quality run (and the r5 CPU mini-repro, tests/test_mesh_phase_learns
.py) shows the mesh phase *learning* (mesh PSNR rises) while the GS render
collapses (img_psnr 41->14 at scale, 32->16 in the mini repro).  The mesh
losses share gp.xyz / deform with the GS branch — this tool trains the mini
regime to the mesh boundary once, checkpoints, then replays the mesh phase
under per-loss ablations (mask / mesh_img / laplacian zeroed one at a time)
and logs the img_psnr + cycle_loss trajectory of each arm, answering which
gradient channel does the damage.

CPU-friendly (~5 min/arm at the mini shapes).  Results -> stdout + JSONL.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ALWAYS CPU: this is a forensics tool meant to run alongside a TPU training
# job — it must never touch the one-client axon tunnel.  The container's
# sitecustomize re-asserts JAX_PLATFORMS=axon, so pin the config value too
# (same recipe as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build(out_dir: str):
    from dgmesh_tpu.config import Config

    cfg = Config()
    cfg.model.source_path = out_dir
    cfg.model.data_type = "finetune-nerf"
    cfg.model.is_blender = True
    cfg.model.grid_res = 32
    cfg.model.sh_degree = 1
    cfg.model.gaussian_ratio = 1.2
    o = cfg.optimization
    o.iterations = 420
    o.warm_up = 30
    o.dpsr_iter = 220
    o.normal_warm_up = 40
    o.normal_net_warmup = 60
    o.anchor_iter = 10_000
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
    t.max_faces_per_tile = 64
    t.max_face_dup = 1 << 15
    t.tile_chunk = 8
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ds", default="/tmp/bisect_ds")
    ap.add_argument("--out", default="/tmp/gs_bisect.jsonl")
    ap.add_argument("--mesh_iters", type=int, default=160)
    ap.add_argument("--arms", nargs="+",
                    default=["all", "no_mask", "no_mesh_img", "no_laplacian",
                             "none"])
    ap.add_argument("--k_faces", type=int, default=0,
                    help="override max_faces_per_tile (0 = config default); "
                         "arm-A test: does killing tile-K truncation fix the "
                         "mask-gradient damage? (VERDICT r4 #1b)")
    ap.add_argument("--mask_sigma", type=float, default=0.0,
                    help="override the SoftRas sigma (0 = default 2e-5); "
                         "arm-B test: is the soft-silhouette gradient scale "
                         "the damage channel?")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.ds, "transforms_train.json")):
        from dgmesh_tpu.data.synthetic_mesh import generate_mesh_dataset
        generate_mesh_dataset(args.ds, n_frames=6, width=64, height=64,
                              n_test=1, subdiv=3, n_eval_meshes=0,
                              max_per_tile=1024)

    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.train.loop import Trainer

    cfg = build(args.ds)
    if args.k_faces:
        cfg.tpu.max_faces_per_tile = args.k_faces
        cfg.tpu.max_face_dup = max(cfg.tpu.max_face_dup, 1 << 17)
    if args.mask_sigma:
        cfg.tpu.mask_sigma = args.mask_sigma
    scene = Scene(cfg, shuffle=True)
    trainer = Trainer(cfg, scene)
    o = cfg.optimization

    # phase 1: GS fit to the mesh boundary (once)
    print("== GS fit to iter", o.dpsr_iter - 1, flush=True)
    trainer.train(iterations=o.dpsr_iter - 1, log_every=40)
    base_state = jax.tree.map(lambda x: np.asarray(x), trainer.state)

    results = {}
    fh = open(args.out, "w")
    for arm in args.arms:
        cfg2 = copy.deepcopy(cfg)
        if arm in ("no_mask", "none"):
            cfg2.optimization.mask_loss_weight = 0.0
        if arm in ("no_mesh_img", "none"):
            cfg2.optimization.mesh_img_loss_weight = 0.0
        if arm in ("no_laplacian", "none"):
            cfg2.model.laplacian_loss_weight = 0.0
        tr = Trainer(cfg2, scene)
        import jax.numpy as jnp
        tr.state = jax.tree.map(jnp.asarray, base_state)
        print(f"== arm {arm}: mesh phase {o.dpsr_iter}.."
              f"{o.dpsr_iter + args.mesh_iters}", flush=True)
        hist = tr.train(iterations=o.dpsr_iter + args.mesh_iters,
                        first_iter=o.dpsr_iter, log_every=20)
        rows = [{k: float(v) for k, v in m.items()} for m in hist]
        for r in rows:
            fh.write(json.dumps({"arm": arm, **r}) + "\n")
        fh.flush()
        mesh_rows = [m for m in rows if "mesh_psnr" in m]
        results[arm] = dict(
            img_psnr_end=np.mean([m["img_psnr"] for m in mesh_rows[-2:]]),
            mesh_psnr_end=np.mean([m["mesh_psnr"] for m in mesh_rows[-2:]]),
            thr_end=mesh_rows[-1].get("density_thres", 0.0),
            cycle_end=mesh_rows[-1].get("cycle_loss", 0.0),
            normal_norm=mesh_rows[-1].get("normal_norm", 0.0),
        )
        print(f"   -> {results[arm]}", flush=True)

    print("\n== summary (img_psnr at end of mesh window; GS had ~32 dB)")
    for arm, r in results.items():
        print(f"  {arm:14s} img={r['img_psnr_end']:6.2f} "
              f"mesh={r['mesh_psnr_end']:6.2f} thr={r['thr_end']:+.4f} "
              f"cycle={r['cycle_end']:.5f}")
    fh.close()


if __name__ == "__main__":
    main()

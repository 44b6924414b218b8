"""A/B the one-shot normal-init occupancy resolution: 128 (TPU workaround)
vs 256 (reference, gaussian_model_dpsr_dynamic_anchor.py:695-704).

VERDICT r3 next #4: the TPU path runs the init occupancy at 128³ to dodge an
axon backend fault at ≥192³; nothing showed the 128-seeded normals are
equivalent.  This runs BOTH resolutions on the SAME checkpointed state (CPU —
the op is pure jax), then compares:

  * seeded normal directions per alive Gaussian (angular error distribution);
  * the first extracted mesh each seed produces (grid_res DPSR → MT),
    via symmetric Chamfer distance between surface samples and V/F counts.

Usage (CPU):
  JAX_PLATFORMS=cpu python tools/occ_ab.py --run output/quality_run \
      --config configs/synthetic-quality-full.yaml > /tmp/occ_ab.log 2>&1
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic-quality-full.yaml")
    ap.add_argument("--run", default="output/quality_run")
    ap.add_argument("--source", default="output/quality_ds")
    ap.add_argument("--ckpt_iter", type=int, default=-1)
    ap.add_argument("--res", type=int, nargs="+", default=[128, 256])
    ap.add_argument("--cd_samples", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=6666)
    args = ap.parse_args()

    from dgmesh_tpu.config import add_config_args, config_from_args
    p2 = argparse.ArgumentParser()
    p2.add_argument("--config", default=None)
    add_config_args(p2)
    cfg = config_from_args(
        p2.parse_args(["--config", args.config, "-s", args.source,
                       "-m", args.run + "_occab",
                       "--pretrain_mesh_path", args.source + "/mesh",
                       "--pretrain_mesh_path_test", args.source + "/mesh_test"]),
        args.config)

    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.train.loop import Trainer
    from dgmesh_tpu.train.checkpoint import load_checkpoint
    from dgmesh_tpu.train.densify import normal_initialization
    from dgmesh_tpu.train.step import extract_mesh
    from dgmesh_tpu.ops.chamfer import chamfer

    scene = Scene(cfg, shuffle=True, seed=args.seed)
    trainer = Trainer(cfg, scene, seed=args.seed)
    trainer.state = load_checkpoint(trainer.state, args.run, args.ckpt_iter)
    state = trainer.state
    n_alive = int(np.asarray(state.gs.alive).sum())
    print(f"state at step {int(state.step)}, alive={n_alive}", flush=True)

    # Compact to alive rows (padded to a chunk multiple): dead gaussians
    # contribute zero opacity to the occupancy and zeros elsewhere, and the
    # CPU brute-force is O(cells x M) — at M=131072 padded vs ~16k alive
    # that's the difference between hours and minutes per resolution.
    alive_idx = np.flatnonzero(np.asarray(state.gs.alive))
    Mc = max(8192, int(-(-n_alive // 8192) * 8192))
    sel = jnp.asarray(np.concatenate(
        [alive_idx, np.zeros(Mc - n_alive, dtype=np.int64)]))
    keep = jnp.asarray(np.arange(Mc) < n_alive)
    M_full = state.gp.xyz.shape[0]

    def take(a):
        return (a[sel] if getattr(a, "ndim", 0) >= 1
                and a.shape[0] == M_full else a)

    state = state._replace(gp=jax.tree.map(take, state.gp),
                           gs=jax.tree.map(take, state.gs))
    state = state._replace(gs=state.gs._replace(alive=keep))

    it = cfg.optimization.dpsr_iter
    cam = trainer.next_camera(it)
    batch = trainer.get_batch(cam)
    _, _, k3 = jax.random.split(jax.random.fold_in(trainer.base_key, it), 3)

    ctx32 = trainer.ctx.f32()
    M = state.gp.xyz.shape[0]

    # jit both stages: eager execution materializes full-size intermediates
    # (the first run of this tool OOM'd at 320 GiB inside the unjitted
    # pipeline); under jit the double-chunked occupancy scan and the slab
    # rasterizer keep peak memory at their designed O(chunk) footprints
    @partial(jax.jit, static_argnames=("res",))
    def seed_at(gp, gs, nets, fid, key, res):
        gp2, m_init = normal_initialization(cfg, ctx32.nets_def, gp, gs,
                                            nets, fid, key, occ_res=res)
        t_in = jnp.full((M, 1), fid)
        d_xyz, _, _, _ = ctx32.nets_def.deform.apply(nets.deform, gp2.xyz,
                                                     t_in)
        mesh = extract_mesh(ctx32, gp2, gs, d_xyz, jnp.zeros((M, 3)),
                            freeze_pos=True)
        return gp2, m_init, mesh

    results = {}
    for res in args.res:
        print(f"--- normal_initialization at occ_res={res} ---", flush=True)
        gp, m_init, mesh = seed_at(state.gp, state.gs, state.nets, batch.fid,
                                   k3, res)
        nv, nf = int(mesh.n_verts), int(mesh.n_faces)
        results[res] = dict(normals=np.asarray(gp.normal),
                            verts=np.asarray(mesh.verts),
                            faces=np.asarray(mesh.faces)[:nf],
                            valid=np.asarray(mesh.vert_valid), V=nv, F=nf,
                            occV=int(m_init.n_verts), occF=int(m_init.n_faces))
        print(f"occ mesh V={results[res]['occV']} F={results[res]['occF']}; "
              f"first training mesh V={nv} F={nf}", flush=True)

    if len(args.res) < 2:
        return
    a, b = (results[r] for r in args.res[:2])
    alive = np.asarray(state.gs.alive)
    na, nb = a["normals"][alive], b["normals"][alive]
    cosang = np.clip((na * nb).sum(-1), -1.0, 1.0)
    ang = np.degrees(np.arccos(cosang))
    print(f"normal angular diff (deg) over {alive.sum()} alive: "
          f"mean={ang.mean():.2f} p50={np.percentile(ang, 50):.2f} "
          f"p90={np.percentile(ang, 90):.2f} p99={np.percentile(ang, 99):.2f} "
          f"max={ang.max():.2f} frac>30deg={(ang > 30).mean():.4f} "
          f"frac>90deg={(ang > 90).mean():.4f}", flush=True)

    rng = np.random.default_rng(0)

    def surf_sample(r):
        v, f, nv = r["verts"], r["faces"], r["V"]
        vv = np.asarray(r["valid"])[: v.shape[0]]
        tri = v[f]
        ok = vv[f].all(1)
        tri = tri[ok]
        area = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1)
        p = area / area.sum()
        idx = rng.choice(tri.shape[0], args.cd_samples, p=p)
        u = rng.random((args.cd_samples, 1))
        w = rng.random((args.cd_samples, 1))
        flip = (u + w) > 1
        u = np.where(flip, 1 - u, u)
        w = np.where(flip, 1 - w, w)
        t = tri[idx]
        return t[:, 0] + u * (t[:, 1] - t[:, 0]) + w * (t[:, 2] - t[:, 0])

    sa = jnp.asarray(surf_sample(a), jnp.float32)
    sb = jnp.asarray(surf_sample(b), jnp.float32)
    cd = float(chamfer(sa, sb))
    print(f"chamfer(first mesh @{args.res[0]} vs @{args.res[1]}) = {cd:.6e} "
          f"(world units²; object scale ~1)", flush=True)


if __name__ == "__main__":
    main()

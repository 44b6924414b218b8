"""Instrumented replay of the r3 quality-run mesh-phase collapse.

The r3 full-scale run produced a real 257k-vertex surface at iter 5000, an
EMPTY mesh by 5100, and NaN loss from 5600 (VERDICT r3 missing #1).  During
that window (freeze_pos) the mesh branch can move exactly two things:
``gp.density_thres`` (iso-level, lr ~1.5e-3 at iter 5000) and ``gp.normal``
(lr ~5.6e-4) — so this tool replays from a pre-collapse checkpoint with the
trainer's own wiring and answers, with measurements instead of theory:

  1. per-iteration field health once the mesh phase opens: psr min/max/corner,
     density_thres, mean |normal|, V/F, every loss component, overflow
     counters (the step metrics already carry these via extract_mesh diag);
  2. at selected iterations, d(loss_k)/d(density_thres) and the rms/max of
     d(loss_k)/d(normal) for every loss component separately — which loss
     pushes the iso-level, which way, and how hard;
  3. an exact per-tile face-duplicate histogram of the current mesh under the
     rasterizer's binning geometry (and the backface-cull split), to size
     ``max_faces_per_tile`` from data (VERDICT r3 next #3).

Usage (TPU, from /root/repo — holds the axon tunnel):
  nohup python tools/replay_collapse.py --run output/quality_run \
      --config configs/synthetic-quality-full.yaml --to 5200 \
      > /tmp/replay.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOSS_NAMES = ("mask_loss", "mesh_img_loss", "laplacian_loss", "img_loss",
              "cycle_loss")


def make_dissector(trainer, flags):
    """One jit-compiled per-loss-component gradient probe.

    Uses a single vjp traced once and scanned over the loss basis — one
    backward-pass of memory, one compile, five sequential backwards.
    """
    import jax
    import jax.numpy as jnp
    from dgmesh_tpu.train.step import loss_and_aux

    ctx = trainer.ctx

    def dissect(state, batch, key, step_f):
        M = state.gp.xyz.shape[0]

        def stacked(thr, normal):
            gp2 = state.gp._replace(density_thres=thr, normal=normal)
            _, aux = loss_and_aux(ctx, gp2, state.nets, jnp.zeros((M, 2)),
                                  state.gs, batch, key, step_f, flags, None,
                                  with_live_losses=True)
            lv = aux["losses_live"]
            return jnp.stack([lv.get(n, jnp.asarray(0.0)) for n in LOSS_NAMES])

        vals, vjp_fn = jax.vjp(stacked, state.gp.density_thres,
                               state.gp.normal)
        alive = state.gs.alive

        def body(carry, e):
            g_thr, g_n = vjp_fn(e)
            g_n = jnp.where(alive[:, None], g_n, 0.0)
            rms = jnp.sqrt(jnp.sum(g_n ** 2)
                           / jnp.maximum(alive.sum() * 3, 1))
            return carry, (jnp.reshape(g_thr, ()), rms, jnp.max(jnp.abs(g_n)))

        _, (g_thrs, g_rms, g_max) = jax.lax.scan(
            body, 0, jnp.eye(len(LOSS_NAMES), dtype=jnp.float32))
        return vals, g_thrs, g_rms, g_max

    return jax.jit(dissect)


def tile_demand_probe(trainer, it):
    """Exact per-tile face-duplicate counts for the CURRENT mesh under the
    rasterizer's binning geometry — numpy, no capacity caps.  Reports the
    histogram with and without backface culling so max_faces_per_tile can be
    sized from data instead of guesses."""
    import jax
    import jax.numpy as jnp
    from dgmesh_tpu.train.step import extract_mesh, _deform_all

    ctx = trainer.ctx
    state = trainer.state
    cam = trainer.next_camera(it)
    batch = trainer.get_batch(cam)
    flags = trainer.flags_for(it)

    @jax.jit
    def mesh_now(state):
        d_xyz, _, _, d_normal = _deform_all(ctx, state.nets, state.gp.xyz,
                                            batch.fid, 0.0, flags)
        return extract_mesh(ctx, state.gp, state.gs, d_xyz, d_normal,
                            flags.freeze_pos)

    m = mesh_now(state)
    nv, nf = int(m.n_verts), int(m.n_faces)
    verts = np.asarray(m.verts)
    faces = np.asarray(m.faces)[:nf]
    fvalid = np.asarray(m.face_valid)[:nf]

    cfg = ctx.mr_cfg
    pose = np.asarray(batch.mesh_pose)
    proj = np.asarray(batch.mesh_proj)
    hom = np.concatenate([verts, np.ones((verts.shape[0], 1))], -1)
    clip = hom @ (proj @ pose).T
    w = clip[:, 3]
    ok = w > cfg.eps_w
    ndc = clip[:, :3] / np.where(ok, w, 1.0)[:, None]
    px = (ndc[:, 0] * 0.5 + 0.5) * cfg.width
    py = (0.5 - ndc[:, 1] * 0.5) * cfg.height
    tri = np.stack([px, py], -1)[faces]          # (F,3,2)
    valid = fvalid & ok[faces].all(1)

    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    area2 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    front = area2 < 0.0

    def demand(mask):
        x0 = np.clip(np.floor(tri[..., 0].min(1) - 1), 0, cfg.width - 1)
        x1 = np.clip(np.ceil(tri[..., 0].max(1) + 1), 0, cfg.width)
        y0 = np.clip(np.floor(tri[..., 1].min(1) - 1), 0, cfg.height - 1)
        y1 = np.clip(np.ceil(tri[..., 1].max(1) + 1), 0, cfg.height)
        tx0 = (x0 // cfg.tile_w).astype(int)
        tx1 = (np.maximum(x1 - 1, x0) // cfg.tile_w).astype(int)
        ty0 = (y0 // cfg.tile_h).astype(int)
        ty1 = (np.maximum(y1 - 1, y0) // cfg.tile_h).astype(int)
        counts = np.zeros((cfg.tiles_y, cfg.tiles_x), np.int64)
        idx = np.nonzero(mask)[0]
        for f in idx:
            counts[ty0[f]:ty1[f] + 1, tx0[f]:tx1[f] + 1] += 1
        return counts

    out = {}
    for name, mask in (("all", valid), ("front", valid & front)):
        c = demand(mask).ravel()
        nz = c[c > 0]
        out[name] = dict(
            faces=int(mask.sum()), dups=int(c.sum()),
            tiles_nonzero=int((c > 0).sum()),
            p50=float(np.percentile(nz, 50)) if nz.size else 0.0,
            p90=float(np.percentile(nz, 90)) if nz.size else 0.0,
            p99=float(np.percentile(nz, 99)) if nz.size else 0.0,
            max=int(nz.max()) if nz.size else 0,
            over_K=int((c > cfg.max_per_tile).sum()),
            dropped_at_K=int(np.maximum(c - cfg.max_per_tile, 0).sum()),
        )
    out["mesh"] = dict(V=nv, F=nf, front_frac=float(front[valid].mean())
                       if valid.any() else 0.0)
    out["K"] = cfg.max_per_tile
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic-quality-full.yaml")
    ap.add_argument("--run", default="output/quality_run")
    ap.add_argument("--source", default="output/quality_ds")
    ap.add_argument("--ckpt_iter", type=int, default=-1)
    ap.add_argument("--to", type=int, default=5200)
    ap.add_argument("--dissect", type=int, nargs="+",
                    default=[5000, 5010, 5050, 5090])
    ap.add_argument("--snap_at", type=int, nargs="+", default=[],
                    help="checkpoint the state BEFORE these iterations "
                         "(forensics: replay the exact failing step offline)")
    ap.add_argument("--seed", type=int, default=6666)
    ap.add_argument("--out", default="output/replay_collapse.jsonl")
    args = ap.parse_args()

    from dgmesh_tpu.config import add_config_args, config_from_args
    p2 = argparse.ArgumentParser()
    p2.add_argument("--config", default=None)
    add_config_args(p2)
    cfg = config_from_args(
        p2.parse_args(["--config", args.config, "-s", args.source,
                       "-m", args.run + "_replay",
                       "--pretrain_mesh_path", args.source + "/mesh",
                       "--pretrain_mesh_path_test", args.source + "/mesh_test"]),
        args.config)

    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.train.loop import Trainer, TrainingHalted
    from dgmesh_tpu.train.checkpoint import load_checkpoint

    scene = Scene(cfg, shuffle=True, seed=args.seed)
    trainer = Trainer(cfg, scene, seed=args.seed)
    trainer.state = load_checkpoint(trainer.state, args.run, args.ckpt_iter)
    start = int(trainer.state.step)
    print(f"resumed at step {start}; replaying to {args.to}", flush=True)

    dpsr_iter = cfg.optimization.dpsr_iter
    dissect_at = set(args.dissect)
    dissector = None
    fout = open(args.out, "w")
    t0 = time.time()

    import jax

    for it in range(start + 1, args.to + 1):
        if it in dissect_at and it >= dpsr_iter:
            flags = trainer.flags_for(it)
            if dissector is None or dissector[0] != flags:
                dissector = (flags, make_dissector(trainer, flags))
            cam = trainer.next_camera(it)
            batch = trainer.get_batch(cam)
            _, k2, _ = jax.random.split(
                jax.random.fold_in(trainer.base_key, it), 3)
            step_f = trainer.state.step.astype("float32")
            vals, g_thr, g_rms, g_max = dissector[1](trainer.state, batch,
                                                     k2, step_f)
            rec = dict(kind="dissect", iter=it)
            for i, n in enumerate(LOSS_NAMES):
                rec[n] = dict(value=float(vals[i]), g_thr=float(g_thr[i]),
                              g_normal_rms=float(g_rms[i]),
                              g_normal_max=float(g_max[i]))
            print("DISSECT", json.dumps(rec), flush=True)
            fout.write(json.dumps(rec) + "\n")
            fout.flush()
            if it == min(dissect_at):
                probe = tile_demand_probe(trainer, it)
                probe["kind"] = "tile_demand"
                probe["iter"] = it
                print("TILE_DEMAND", json.dumps(probe), flush=True)
                fout.write(json.dumps(probe) + "\n")
                fout.flush()

        if it in set(args.snap_at):
            from dgmesh_tpu.train.checkpoint import save_checkpoint
            save_checkpoint(trainer.state, args.run + "_replay", it - 1)
            print(f"snapped pre-{it} state -> {args.run}_replay "
                  f"checkpoint/state_{it - 1}.msgpack", flush=True)

        try:
            m = trainer.run_iteration(it)
        except TrainingHalted as e:
            print(f"HALTED: {e}", flush=True)
            break
        if it >= dpsr_iter - 5 or it % 100 == 0:
            rec = {k: float(v) for k, v in m.items()
                   if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
            rec["iter"] = it
            rec["kind"] = "step"
            fout.write(json.dumps(rec) + "\n")
            if it % 10 == 0 or it >= dpsr_iter:
                fout.flush()
            if it % 25 == 0 or (it >= dpsr_iter and it % 5 == 0):
                line = (f"[{it}] loss={rec.get('loss', 0):.4f} "
                        f"V={int(rec.get('mesh_n_verts', -1))} "
                        f"thr={rec.get('density_thres', 0):.4f} "
                        f"psr[{rec.get('psr_min', 0):.3f},"
                        f"{rec.get('psr_max', 0):.3f}] "
                        f"|n|={rec.get('normal_norm', 0):.3f} "
                        f"rovf={int(rec.get('raster_overflow', 0))} "
                        f"({(time.time() - t0):.0f}s)")
                print(line, flush=True)

        # the observation is done once the mesh has been empty for a while
        if (it >= dpsr_iter and m.get("mesh_n_verts") is not None
                and int(m["mesh_n_verts"]) == 0 and it > dpsr_iter + 60):
            print(f"mesh empty at {it}; stopping replay", flush=True)
            break

    fout.close()
    print("replay done", flush=True)


if __name__ == "__main__":
    main()

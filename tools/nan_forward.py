"""Localize the forward NaN in the mesh color path (r3 collapse forensics).

The instrumented replays (tools/replay_collapse.py) pinned the r3 quality-run
killer to a FORWARD NaN in mesh_img_loss while mask_loss, psr, normals and
the mesh itself stayed finite — i.e. the NaN is born inside
_mesh_colors / render_mesh on specific cameras, with healthy parameters
(`output/quality_run_replay/checkpoint/state_5005.msgpack` is the pre-failure
state; iter 5006's forward is NaN).

This tool loads that state and bisects the forward tensor-by-tensor:
  stage 0: parameter health (NaN/Inf count per param tree leaf);
  stage 1: deform outputs, psr field, mesh verts, vertex colors (d_back,
           canon, appearance output);
  stage 2: rasterize() products (tri, inv_w, pack);
  stage 3: per-chunk shading internals (bary, zi, pw, vcol, rgb, soft) —
           NaN/Inf counts per chunk, then a detail dump of the worst chunk.

Usage (TPU):
  python tools/nan_forward.py --ckpt output/quality_run_replay \
      --ckpt_iter 5005 --config configs/synthetic-quality-full.yaml \
      --its 5006 5007 5008 5001
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def nan_inf(x):
    import jax.numpy as jnp
    return (jnp.isnan(x).sum().astype(jnp.int32),
            jnp.isinf(x).sum().astype(jnp.int32),
            jnp.nanmax(jnp.abs(x)).astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic-quality-full.yaml")
    ap.add_argument("--ckpt", default="output/quality_run_replay")
    ap.add_argument("--source", default="output/quality_ds")
    ap.add_argument("--ckpt_iter", type=int, default=5005)
    ap.add_argument("--its", type=int, nargs="+", default=[5006, 5007, 5008])
    args = ap.parse_args()

    from dgmesh_tpu.config import add_config_args, config_from_args
    p2 = argparse.ArgumentParser()
    p2.add_argument("--config", default=None)
    add_config_args(p2)
    cfg = config_from_args(
        p2.parse_args(["--config", args.config, "-s", args.source,
                       "-m", args.ckpt + "_nanfwd",
                       "--pretrain_mesh_path", args.source + "/mesh",
                       "--pretrain_mesh_path_test", args.source + "/mesh_test"]),
        args.config)

    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.train.loop import Trainer
    from dgmesh_tpu.train.checkpoint import load_checkpoint

    scene = Scene(cfg, shuffle=True, seed=6666)
    trainer = Trainer(cfg, scene, seed=6666)
    trainer.state = load_checkpoint(trainer.state, args.ckpt, args.ckpt_iter)
    state = trainer.state
    print(f"loaded state at step {int(state.step)}", flush=True)

    import jax
    import jax.numpy as jnp
    from dgmesh_tpu.train import step as S
    from dgmesh_tpu.ops import mesh_raster as MR

    # ---- stage 0: parameter health (host-side, cheap) ----
    bad = []
    for tree_name in ("gp", "nets"):
        tree = getattr(state, tree_name)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            a = np.asarray(leaf)
            n_nan = int(np.isnan(a).sum())
            n_inf = int(np.isinf(a).sum())
            if n_nan or n_inf:
                bad.append((tree_name + jax.tree_util.keystr(path), n_nan, n_inf))
    print("stage0 param health:", "CLEAN" if not bad else bad, flush=True)

    ctx = trainer.ctx

    def probe(state, batch, key, flags):
        gp, gs, nets = state.gp, state.gs, state.nets
        rep = {}
        d_xyz, d_rot, d_scale, d_normal = S._deform_all(
            ctx, nets, gp.xyz, batch.fid, 0.0, flags)
        rep["d_xyz"] = nan_inf(d_xyz)
        rep["d_normal"] = nan_inf(d_normal)
        mesh = S.extract_mesh(ctx, gp, gs, d_xyz, d_normal, flags.freeze_pos)
        rep["verts"] = nan_inf(mesh.verts)
        rep["n_verts"] = mesh.n_verts

        # _mesh_colors, piecewise
        V = mesh.verts.shape[0]
        t_in = jnp.full((V, 1), batch.fid)
        d_back, _, _, _ = S.chunked_apply(
            ctx.nets_def.deform_back.apply, nets.deform_back,
            jax.lax.stop_gradient(mesh.verts), t_in, ctx.mlp_chunk)
        rep["d_back"] = nan_inf(d_back)
        canon = mesh.verts + d_back
        rep["canon"] = nan_inf(canon)
        color = S.chunked_apply(ctx.nets_def.appearance.apply,
                                nets.appearance, canon, t_in, ctx.mlp_chunk)
        rep["appearance_raw"] = nan_inf(color)
        vtx_color = jnp.where(mesh.vert_valid[:, None], color, 0.0)
        rep["vtx_color"] = nan_inf(vtx_color)

        # rasterize products
        cfgmr = ctx.mr_cfg
        rast = MR.rasterize(mesh.verts, mesh.faces, mesh.face_valid,
                            batch.mesh_pose, batch.mesh_proj, cfgmr)
        rep["tri"] = nan_inf(rast["tri"])
        rep["inv_w"] = nan_inf(rast["inv_w"])
        rep["pack"] = nan_inf(rast["pack"])

        # per-chunk shading internals
        bins = rast["bins"]
        T, C = cfgmr.num_tiles, cfgmr.tile_chunk
        n_chunks = -(-T // C)
        padn = n_chunks * C - T
        all_tiles = jnp.arange(T + padn, dtype=jnp.int32) % T
        tidx = bins.tile_idx
        tidx_pad = (jnp.pad(tidx, ((0, padn), (0, 0)), constant_values=-1)
                    if padn else tidx)

        def chunk_stats(args_):
            tids, tix = args_
            gi = jnp.maximum(tix, 0)
            gvalid = tix >= 0
            g = rast["pack"][gi]
            tri = g[..., 0:6].reshape(g.shape[:2] + (3, 2))
            inv_w = g[..., 6:9]
            px, py = MR._tile_pixels(tids, cfgmr)
            bary, area, alive = MR._bary_2d(tri, px, py)
            inside = (bary >= 0.0).all(axis=-1) & gvalid[:, :, None] & alive
            zi = jnp.einsum("ckpj,ckj->ckp", bary, inv_w,
                            precision=jax.lax.Precision.HIGHEST)
            zkey = jnp.where(inside, zi, -jnp.inf)
            win = jnp.argmax(zkey, axis=1)
            covered = jnp.take_along_axis(inside, win[:, None, :], axis=1)[:, 0, :]
            bary_w = jnp.take_along_axis(
                bary, win[:, None, :, None].astype(jnp.int32), axis=1)[:, 0]
            invw_w = jax.vmap(lambda iw, wn: iw[wn])(inv_w, win)
            pw = bary_w * invw_w
            pw = pw / jnp.maximum(pw.sum(-1, keepdims=True), 1e-12)
            fid = jnp.take_along_axis(gi, win, axis=1)
            vidx = mesh.faces[fid]
            vcol = vtx_color[vidx]
            rgb = jnp.einsum("cpj,cpjd->cpd", pw, vcol,
                             precision=jax.lax.Precision.HIGHEST)
            rgb_masked = jnp.where(covered[..., None], rgb, batch.bg[None, None, :])
            d = MR._edge_distance(tri, px, py)
            signed = jnp.where(inside, -d, d)
            s = jax.nn.sigmoid(-signed / cfgmr.sigma)
            s = jnp.where(gvalid[:, :, None], s, 0.0)
            log_keep = jnp.log1p(-jnp.clip(s, 0.0, 1.0 - 1e-6))
            soft = 1.0 - jnp.exp(jnp.sum(log_keep, axis=1))

            def cnt(x):
                return jnp.stack([jnp.isnan(x).sum(), jnp.isinf(x).sum()])
            return dict(bary=cnt(bary), area=cnt(area), zi=cnt(zi),
                        pw=cnt(pw), pw_cov=cnt(jnp.where(covered[..., None], pw, 0.0)),
                        vcol=cnt(vcol), rgb=cnt(rgb),
                        rgb_masked=cnt(rgb_masked), soft=cnt(soft),
                        covered=covered.sum())

        tids = all_tiles.reshape(n_chunks, C)
        tix = tidx_pad.reshape(n_chunks, C, cfgmr.max_per_tile)
        per_chunk = jax.lax.map(chunk_stats, (tids, tix))
        return rep, per_chunk

    probe_j = jax.jit(probe, static_argnames=("flags",))

    for it in args.its:
        flags = trainer.flags_for(it)
        cam = trainer.next_camera(it)
        batch = trainer.get_batch(cam)
        rep, per_chunk = jax.device_get(probe_j(state, batch, jnp.zeros(2), flags))
        print(f"\n=== it {it} (cam fid={float(batch.fid):.4f}) "
              f"V={int(rep.pop('n_verts'))}", flush=True)
        for k, (n, i, mx) in rep.items():
            tag = " <-- " if (n or i) else ""
            print(f"  {k:16s} nan={int(n):8d} inf={int(i):8d} "
                  f"max|x|={float(mx):.4g}{tag}", flush=True)
        for k, v in per_chunk.items():
            if k == "covered":
                continue
            tot = np.asarray(v).sum(0)
            if tot[0] or tot[1]:
                worst = int(np.asarray(v)[:, 0].argmax())
                print(f"  chunk.{k:12s} nan={int(tot[0]):8d} "
                      f"inf={int(tot[1]):8d}  worst_chunk={worst}", flush=True)
        print(f"  covered px total = {int(np.asarray(per_chunk['covered']).sum())}",
              flush=True)


if __name__ == "__main__":
    main()

"""Bisect the NaN-minting backward pass of the r3 mesh-phase collapse.

tools/nan_forward.py established that at `state_5005` (post-step-5005 params)
the ENTIRE appearance net is NaN while every other net — including
deform_back, which shares the backward path through `canon` — is clean.
That signature constrains the event: the cotangent into the appearance
parameters went nonfinite in ONE update while the cotangent leaving it
(into canon) stayed benign.

Given the pre-step state (state_5004 from tools/replay_collapse.py
--snap_at), this tool reproduces step 5005's gradient computation and
reports, per loss component and per tensor:

  1. full train-step grads: nan/inf/max per param-tree leaf;
  2. d loss / d vtx_color, d loss / d mesh_image (the raster cotangents);
  3. the same split per loss component (mask vs mesh_img vs laplacian);
  4. pallas-vs-jnp-twin backward A/B for the shading kernel at this state.

Usage (TPU):
  python tools/grad_bisect.py --ckpt output/quality_run_replay \
      --ckpt_iter 5004 --it 5005
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stats(name, g):
    a = np.asarray(g)
    n_nan, n_inf = int(np.isnan(a).sum()), int(np.isinf(a).sum())
    finite = a[np.isfinite(a)]
    mx = float(np.abs(finite).max()) if finite.size else 0.0
    flag = "  <--" if (n_nan or n_inf or mx > 1e12) else ""
    print(f"  {name:44s} nan={n_nan:8d} inf={n_inf:8d} max|g|={mx:12.4g}{flag}",
          flush=True)


def tree_stats(prefix, tree):
    import jax
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        n_nan, n_inf = int(np.isnan(a).sum()), int(np.isinf(a).sum())
        finite = a[np.isfinite(a)]
        mx = float(np.abs(finite).max()) if finite.size else 0.0
        if n_nan or n_inf or mx > 1e8:
            print(f"  {prefix}{jax.tree_util.keystr(path):40s} "
                  f"nan={n_nan:8d} inf={n_inf:8d} max|g|={mx:12.4g}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic-quality-full.yaml")
    ap.add_argument("--ckpt", default="output/quality_run_replay")
    ap.add_argument("--source", default="output/quality_ds")
    ap.add_argument("--ckpt_iter", type=int, default=5004)
    ap.add_argument("--it", type=int, default=5005)
    args = ap.parse_args()

    from dgmesh_tpu.config import add_config_args, config_from_args
    p2 = argparse.ArgumentParser()
    p2.add_argument("--config", default=None)
    add_config_args(p2)
    cfg = config_from_args(
        p2.parse_args(["--config", args.config, "-s", args.source,
                       "-m", args.ckpt + "_gb",
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
    print(f"loaded state at step {int(state.step)}; probing iter {args.it}",
          flush=True)

    import jax
    import jax.numpy as jnp
    from dgmesh_tpu.train import step as S
    from dgmesh_tpu.ops import mesh_raster as MR
    from dgmesh_tpu.ops import losses as L

    ctx = trainer.ctx
    it = args.it
    flags = trainer.flags_for(it)
    cam = trainer.next_camera(it)
    batch = trainer.get_batch(cam)
    key = jax.random.split(jax.random.fold_in(trainer.base_key, it), 3)[1]
    step_f = state.step.astype("float32")
    M = state.gp.xyz.shape[0]

    # ---- 1. full-loss grads wrt (gp, nets) ----
    def total_loss(gp, nets):
        loss, aux = S.loss_and_aux(ctx, gp, nets, jnp.zeros((M, 2)), state.gs,
                                   batch, key, step_f, flags, None)
        return loss, aux["losses"]

    (loss, lvals), (g_gp, g_nets) = jax.jit(
        jax.value_and_grad(total_loss, argnums=(0, 1), has_aux=True))(
            state.gp, state.nets)
    print(f"\n== total loss {float(loss):.5f} "
          f"components={{ {', '.join(f'{k}={float(v):.4f}' for k, v in lvals.items())} }}",
          flush=True)
    print("-- nonfinite/huge grads (full loss):", flush=True)
    tree_stats("gp", g_gp)
    tree_stats("nets", g_nets)

    # ---- 2./3. piecewise mesh-branch: cotangents at the raster boundary ----
    @jax.jit
    def mesh_pieces(gp, nets):
        d_xyz, _, _, d_normal = S._deform_all(ctx, nets, gp.xyz, batch.fid,
                                              0.0, flags)
        mesh = S.extract_mesh(ctx, gp, state.gs, d_xyz, d_normal,
                              flags.freeze_pos)
        vtx_color = S._mesh_colors(ctx, nets, mesh.verts, mesh.vert_valid,
                                   batch.fid)
        return mesh, vtx_color

    mesh, vtx_color = mesh_pieces(state.gp, state.nets)

    o = cfg.optimization

    def raster_losses(verts, vcol):
        mout = MR.render_mesh(verts, mesh.faces, mesh.face_valid, vcol,
                              batch.mesh_pose, batch.mesh_proj, batch.bg,
                              ctx.mr_cfg, want_soft=True)
        mask_loss = (L.l1_loss(mout["st_mask"], batch.gt_mask)
                     * 100.0 * o.mask_loss_weight)  # st_mask: mirror train/step.py
        mesh_image = mout["rgb"].transpose(2, 0, 1)
        img_loss = (L.image_loss(mesh_image, batch.gt_image, o.lambda_dssim)
                    * o.mesh_img_loss_weight)
        return jnp.stack([mask_loss, img_loss]), mout["rgb"]

    def comp(i):
        def f(verts, vcol):
            return raster_losses(verts, vcol)[0][i]
        return f

    for i, name in enumerate(("mask_loss", "mesh_img_loss")):
        gv, gc = jax.jit(jax.grad(comp(i), argnums=(0, 1)))(mesh.verts,
                                                            vtx_color)
        print(f"\n-- {name} cotangents at raster boundary:", flush=True)
        stats("d/d verts", gv)
        stats("d/d vtx_color", gc)

    # cotangent into mesh_image from the image loss alone (g_rgb magnitude)
    vals, rgb = jax.jit(raster_losses)(mesh.verts, vtx_color)
    print(f"\nraster loss values: mask={float(vals[0]):.4f} "
          f"img={float(vals[1]):.4f}", flush=True)

    def img_loss_of(rgb_img):
        mesh_image = rgb_img.transpose(2, 0, 1)
        return (L.image_loss(mesh_image, batch.gt_image, o.lambda_dssim)
                * o.mesh_img_loss_weight)

    g_rgb = jax.jit(jax.grad(img_loss_of))(rgb)
    stats("d img_loss/d mesh_image", g_rgb)

    # ---- 4. pallas analytic bwd vs jnp-twin bwd on this exact state ----
    from dgmesh_tpu.ops import mesh_raster_pallas as MRP

    rast = jax.jit(lambda v: MR.rasterize(v, mesh.faces, mesh.face_valid,
                                          batch.mesh_pose, batch.mesh_proj,
                                          ctx.mr_cfg))(mesh.verts)
    cfgmr = ctx.mr_cfg
    bins = rast["bins"]
    tidx = bins.tile_idx
    T, K = tidx.shape

    @jax.jit
    def build_attrs(pack, vcol):
        gi = jnp.maximum(tidx, 0)
        gvalid = (tidx >= 0).astype(jnp.float32)
        return jnp.concatenate([
            pack[gi], gvalid[..., None],
            vcol[mesh.faces[gi]].reshape(T, K, 9),
            gi[..., None].astype(jnp.float32), jnp.zeros((T, K, 4)),
        ], axis=-1)

    attrs = build_attrs(rast["pack"], vtx_color)
    tids = jnp.arange(T, dtype=jnp.float32)
    origins = jnp.stack([(tids % cfgmr.tiles_x) * cfgmr.tile_w,
                         (tids // cfgmr.tiles_x) * cfgmr.tile_h], axis=-1)

    for analytic in (True, False):
        fn = MRP.make_shade_tiles(cfgmr.tiles_x, cfgmr.tile_h, cfgmr.tile_w,
                                  cfgmr.sigma, analytic_bwd=analytic)

        def loss_of_attrs(a):
            rgb_t, hard, soft, _ = fn(a, origins)
            return rgb_t.sum() * 1e-6 + soft.sum() * 1e-6

        g_attr = jax.jit(jax.grad(loss_of_attrs))(attrs)
        lbl = "pallas-analytic" if analytic else "jnp-twin-autodiff"
        print(f"\n-- shading backward ({lbl}), uniform cotangent:", flush=True)
        for sl, nm in ((slice(0, 6), "d screen-tri"), (slice(6, 9), "d inv_w"),
                       (slice(10, 19), "d colors")):
            stats(nm, g_attr[..., sl])


if __name__ == "__main__":
    main()

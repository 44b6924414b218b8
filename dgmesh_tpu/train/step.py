"""The compiled training step — the reference's entire hot loop in one jit.

Replicates train.py's per-iteration schedule (reference train.py:129-530):
deform → GS splat render → cycle-consistency → DPSR → marching-tets → mesh
render → mask/mesh-image/laplacian losses → (anchor) → GS image loss → one
backward → per-group Adam.  Phase gates that the reference drives with Python
ifs become STATIC flags (a handful of jit variants over a run):

  warm        iter <  warm_up                    (train.py:154-175)
  mesh        iter >= dpsr_iter                  (:248)
  freeze_pos  iter <  dpsr_iter + normal_warm_up (:250, renderer.py:150-152)
  use_normal  iter >= dpsr_iter + 2000           (:127 hardcoded NORMAL_WARMUP_ITER)
  anchor      every anchor_interval after anchor_iter (:287-304)
  skip_gaussian_update — on densify/anchor iterations the reference swaps the
      param tensors before optimizer.step(), so Adam sees grad=None and skips
      every Gaussian group; we reproduce that by flag.

Structural ops (densify/prune/anchor writes) land in the padded buffers with
masked scatters; Adam moments are zeroed under the same masks (the
reference's optimizer-state surgery, gaussian_model_dpsr_dynamic_anchor.py
:364-446).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import gaussians as G
from ..models import mlp
from ..models.mlp import chunked_apply
from ..ops import losses as L
from ..ops import splat
from ..ops.dpsr import DPSR
from ..ops.laplacian import laplacian_uniform_tri
from ..ops.marching_tets import MTConfig, marching_tets
from ..ops import mesh_raster as MR
from ..schedules import linear_noise
from .state import (NetParams, TrainState, gaussian_adam_update, net_adam_update,
                    build_nets, gaussian_group_lrs, net_lrs)

SMALL = 1e-6


class StepFlags(NamedTuple):
    warm: bool = False
    mesh: bool = False
    freeze_pos: bool = False
    use_normal: bool = False
    anchor: bool = False
    skip_gaussian_update: bool = False
    densify_stats: bool = True
    sh_degree: int = 3


class Batch(NamedTuple):
    cam: splat.CameraArrays
    mesh_pose: jnp.ndarray      # (4,4) blender-GL w2c
    mesh_proj: jnp.ndarray      # (4,4) GL projection
    gt_image: jnp.ndarray       # (3,H,W)
    gt_mask: jnp.ndarray        # (H,W)
    fid: jnp.ndarray            # ()
    time_interval: jnp.ndarray  # ()
    bg: jnp.ndarray             # (3,)


class StepContext:
    """Static pieces shared by all step variants (shapes, operators, configs).

    ``device_mesh`` (optional jax.sharding.Mesh): when set, the Gaussian
    splat runs through parallel/sharded_splat.render_sharded — per-chip
    binning + one all_to_all tile exchange instead of GSPMD's all-gathered
    global sort (DESIGN.md §5).  Exact same numerics (pinned by
    tests/test_sharded_splat.py); axis name comes from cfg.tpu.mesh_axis.
    """

    def __init__(self, cfg: Config, width: int, height: int, device_mesh=None):
        self.cfg = cfg
        self.device_mesh = device_mesh
        t = cfg.tpu
        if device_mesh is not None:
            # Validate the sharding contract HERE, not deep inside the jitted
            # step (ADVICE r3 #4): every index-sharded capacity must divide
            # evenly across chips.
            n = device_mesh.devices.size
            if t.max_gaussians % n:
                raise ValueError(
                    f"tpu.max_gaussians={t.max_gaussians} is not divisible by "
                    f"the {n}-device mesh; pick a multiple of {n} (sharded "
                    "splat index-shards the padded Gaussian axis)")
        self.splat_cfg = splat.SplatConfig(
            width=width, height=height, tile_h=t.tile_h, tile_w=t.tile_w,
            max_per_tile=t.max_gaussians_per_tile, max_dup=t.max_dup,
            tile_chunk=t.tile_chunk, use_pallas=t.use_pallas)
        self.mr_cfg = MR.MeshRasterConfig(
            width=width, height=height, tile_h=t.tile_h, tile_w=t.tile_w,
            max_per_tile=t.max_faces_per_tile, max_dup=t.max_face_dup,
            tile_chunk=t.tile_chunk,
            use_pallas=t.use_pallas and t.mr_use_pallas,
            sigma=t.mask_sigma, cull_backface=t.mr_cull_backface)
        self.mt_cfg = MTConfig(res=cfg.model.grid_res, max_verts=t.max_verts,
                               max_faces=t.max_faces,
                               max_cubes=max(t.max_verts, t.max_faces // 2),
                               use_narrow_band=t.mt_narrow_band)
        # NB: the jax.checkpoint wrapper stays on even with the fused trunk
        # (it double-runs the cheap fwd kernel, but removing the remat
        # boundary made XLA re-materialize unrelated DPSR ops — measured
        # +80 ms/step)
        self.mlp_chunk = t.mlp_chunk
        self.dpsr = DPSR((cfg.model.grid_res,) * 3, sig=cfg.optimization.dpsr_sig,
                         div_mode="splat" if t.dpsr_div_splat else "spectral",
                         fft_impl="matmul" if t.dpsr_fft_matmul else "xla")
        self.nets_def = build_nets(cfg)
        # f32 twins of the net *definitions* (same param trees, compute dtype
        # pinned to f32): the per-phase mixed-precision policy.  mlp_bf16 only
        # affects the gradient train steps; geometry-critical and metric paths
        # (anchor mesh extraction + anchor applies, one-shot normal init,
        # eval/test rendering, mesh export) always run f32 — bf16 trunk noise
        # (~3e-3 rel) is comparable to anchor_search_radius and corrupts
        # anchor partitions / reported metrics otherwise (STATUS r1 A/B).
        if t.mlp_bf16:
            self.nets_def_f32 = type(self.nets_def)(
                *[m.clone(dtype=None, fuse=False) for m in self.nets_def])
        else:
            self.nets_def_f32 = self.nets_def
        self._f32_view = None

    def f32(self) -> "StepContext":
        """A shallow view of this context whose nets apply in f32 — pass to
        _deform_all / render_frame / _mesh_colors on precision-critical paths."""
        if self.nets_def_f32 is self.nets_def:
            return self
        if self._f32_view is None:
            import copy
            v = copy.copy(self)
            v.nets_def = self.nets_def_f32
            v.nets_def_f32 = v.nets_def
            v._f32_view = v  # idempotent: v.f32() is v
            self._f32_view = v
        return self._f32_view


def _deform_all(ctx: StepContext, nets, xyz, fid, noise, flags: StepFlags):
    """Forward deformation offsets (reference train.py:154-175)."""
    M = xyz.shape[0]
    t_in = jnp.full((M, 1), fid) + noise
    xyz_sg = jax.lax.stop_gradient(xyz)
    if flags.warm:
        z3 = jnp.zeros((M, 3))
        return z3, jnp.zeros((M, 4)), z3, z3
    # chunked + remat: keeps trunk activations VMEM-resident AND bounds
    # backward memory (unchunked 8×256 activations over M points are GBs)
    ch = ctx.mlp_chunk
    d_xyz, d_rot, d_scale, _ = chunked_apply(
        ctx.nets_def.deform.apply, nets.deform, xyz_sg, t_in, ch)
    if flags.use_normal:
        d_normal = chunked_apply(ctx.nets_def.deform_normal.apply,
                                 nets.deform_normal, xyz_sg, t_in, ch)
    else:
        d_normal = jnp.zeros((M, 3))
    return d_xyz, d_rot, d_scale, d_normal


def extract_mesh(ctx: StepContext, gp: G.GaussianParams, gs: G.GaussianStats,
                 d_xyz, d_normal, freeze_pos: bool, with_diag: bool = False):
    """DPSR → marching tets → world-space mesh (reference renderer.py:150-175).

    with_diag=True additionally returns a dict of stop-gradient field health
    scalars (psr range, corner level) — the collapse tripwire's instruments
    (VERDICT r3: the mesh emptied at iter ~5100 with nothing logging why).
    """
    pts = gp.xyz + d_xyz
    if freeze_pos:
        pts = jax.lax.stop_gradient(pts)
    p01 = (pts - gs.gaussian_center) / gs.gaussian_scale / 2.0 + 0.5
    p01 = jnp.clip(p01, SMALL, 1.0 - SMALL)
    normals = gp.normal + d_normal
    if (ctx.device_mesh is not None and ctx.dpsr.div_mode == "splat"
            and ctx.dpsr.res[0] % ctx.device_mesh.devices.size == 0):
        from ..parallel.sharded_dpsr import dpsr_sharded
        psr = dpsr_sharded(ctx.device_mesh, ctx.dpsr, p01, normals, gs.alive,
                           axis=ctx.cfg.tpu.mesh_axis)
    else:
        psr = ctx.dpsr(p01, normals, gs.alive)
    sign = jnp.sign(jax.lax.stop_gradient(psr[0, 0, 0]))
    sign = jnp.where(sign == 0, 1.0, sign)
    psr = psr * sign - gp.density_thres
    if (ctx.device_mesh is not None and not ctx.mt_cfg.use_narrow_band
            and ctx.mt_cfg.res % ctx.device_mesh.devices.size == 0):
        from ..parallel.sharded_mt import marching_tets_sharded
        # block-prefix validity layout (see parallel/sharded_mt.py): every
        # in-step consumer below is vert_valid/face_valid mask-driven
        m = marching_tets_sharded(ctx.device_mesh, psr, ctx.mt_cfg,
                                  axis=ctx.cfg.tpu.mesh_axis)
    else:
        m = marching_tets(psr, ctx.mt_cfg)
    verts_w = (m.verts * 2.0 - 1.0) * gs.gaussian_scale + gs.gaussian_center
    verts_w = jnp.where(m.vert_valid[:, None], verts_w, 0.0)
    m = m._replace(verts=verts_w)
    if not with_diag:
        return m
    sg = jax.lax.stop_gradient
    alive_n = jnp.maximum(gs.alive.sum(), 1)
    diag = dict(
        psr_min=sg(psr.min()), psr_max=sg(psr.max()),
        psr_corner=sg(psr[0, 0, 0]),
        normal_norm=sg(jnp.sum(jnp.where(gs.alive, jnp.linalg.norm(normals, axis=-1), 0.0)) / alive_n),
        density_thres=sg(gp.density_thres),
    )
    return m, diag


def _mesh_colors(ctx: StepContext, nets, verts_w, vert_valid, fid):
    """deform_back to canonical + appearance colors (renderer.py:177-181)."""
    V = verts_w.shape[0]
    t_in = jnp.full((V, 1), fid)
    ch = ctx.mlp_chunk
    d_back, _, _, _ = chunked_apply(ctx.nets_def.deform_back.apply,
                                    nets.deform_back,
                                    jax.lax.stop_gradient(verts_w), t_in, ch)
    canon = verts_w + d_back
    color = chunked_apply(ctx.nets_def.appearance.apply,
                          nets.appearance, canon, t_in, ch)
    return jnp.where(vert_valid[:, None], color, 0.0)


def loss_and_aux(ctx: StepContext, gp: G.GaussianParams, nets: NetParams,
                 screen_offset, gs: G.GaussianStats, batch: Batch, key,
                 step_f, flags: StepFlags, anchor_info=None,
                 with_live_losses: bool = False):
    """Total loss (reference train.py:193-321). Returns (loss, aux).

    with_live_losses=True additionally returns the NON-stop-gradient loss
    components under aux["losses_live"] so diagnostic tools
    (tools/replay_collapse.py) can take per-component gradients; the train
    step never sets it."""
    cfg = ctx.cfg
    o = cfg.optimization
    M = gp.xyz.shape[0]
    aux = {}
    losses = {}

    k1, k2 = jax.random.split(key)
    if cfg.model.is_blender:
        noise1 = noise2 = 0.0
    else:
        mag = batch.time_interval * linear_noise(step_f)
        noise1 = jax.random.normal(k1, ()) * mag
        noise2 = jax.random.normal(k2, ()) * mag

    d_xyz, d_rot, d_scale, d_normal = _deform_all(ctx, nets, gp.xyz, batch.fid,
                                                  noise1, flags)

    # --- Gaussian splat render (gaussian_renderer/__init__.py:32-119) ---
    means3d = gp.xyz + d_xyz
    scales = G.get_scaling(gp) + d_scale
    rots = G.get_rotation(gp) + d_rot
    if ctx.device_mesh is not None:
        from ..parallel.sharded_splat import render_sharded
        out = render_sharded(ctx.device_mesh, means3d, scales, rots,
                             G.get_opacity(gp), G.get_features(gp), gs.alive,
                             batch.cam, batch.bg, ctx.splat_cfg,
                             sh_degree=flags.sh_degree,
                             screen_offset=screen_offset,
                             axis=cfg.tpu.mesh_axis)
    else:
        out = splat.render(means3d, scales, rots, G.get_opacity(gp),
                           G.get_features(gp), gs.alive, batch.cam, batch.bg,
                           ctx.splat_cfg, sh_degree=flags.sh_degree,
                           screen_offset=screen_offset)
    image = out["render"]
    aux["radii"] = out["radii"]
    aux["visibility"] = out["visibility"]
    aux["splat_overflow"] = out["aux"]["tile_overflow"]
    # duplicate-list truncation (distinct failure mode from tile-K: it drops
    # whole tile entries before depth sorting) — silent in r3 (ADVICE #1)
    aux["splat_dup_overflow"] = out["aux"]["dup_overflow"]

    # --- cycle consistency (train.py:198-240) ---
    if not flags.warm:
        M_t = jnp.full((M, 1), batch.fid) + noise2
        d_back, d_rot_back, d_scale_back, _ = chunked_apply(
            ctx.nets_def.deform_back.apply, nets.deform_back,
            jax.lax.stop_gradient(means3d), M_t, ctx.mlp_chunk)

        def masked_l1(a, b):
            diff = jnp.where(gs.alive[:, None], a - b, 0.0)
            return jnp.abs(diff).sum() / jnp.maximum(gs.alive.sum() * a.shape[-1], 1)

        cyc_x = masked_l1(-d_back, d_xyz)
        cyc_r = masked_l1(-d_rot_back, d_rot)
        cyc_s = masked_l1(-d_scale_back, d_scale)
        if flags.use_normal:
            d_normal_back = chunked_apply(
                ctx.nets_def.deform_back_normal.apply, nets.deform_back_normal,
                jax.lax.stop_gradient(gp.xyz), M_t, ctx.mlp_chunk)
            cyc_n = masked_l1(-d_normal_back, d_normal)
            losses["cycle_loss"] = (cyc_x + cyc_r + cyc_s + cyc_n) / 4.0
        else:
            losses["cycle_loss"] = (cyc_x + cyc_r + cyc_s) / 3.0

    # --- mesh branch (train.py:248-285) ---
    if flags.mesh:
        mesh, mesh_diag = extract_mesh(ctx, gp, gs, d_xyz, d_normal,
                                       flags.freeze_pos, with_diag=True)
        aux.update(mesh_diag)
        vtx_color = _mesh_colors(ctx, nets, mesh.verts, mesh.vert_valid, batch.fid)
        # one shared verts[faces] gather for rasterizer + laplacian: their
        # per-corner cotangents sum before a single scatter-add in backward
        tri_w = mesh.verts[mesh.faces]
        if (ctx.device_mesh is not None
                and mesh.faces.shape[0] % ctx.device_mesh.devices.size == 0):
            from ..parallel.sharded_mr import render_mesh_sharded
            mout = render_mesh_sharded(
                ctx.device_mesh, mesh.verts, mesh.faces, mesh.face_valid,
                vtx_color, batch.mesh_pose, batch.mesh_proj, batch.bg,
                ctx.mr_cfg, want_soft=True, tri_w=tri_w,
                axis=ctx.cfg.tpu.mesh_axis)
        else:
            mout = MR.render_mesh(mesh.verts, mesh.faces, mesh.face_valid,
                                  vtx_color, batch.mesh_pose, batch.mesh_proj,
                                  batch.bg, ctx.mr_cfg, want_soft=True,
                                  tri_w=tri_w)
        # straight-through mask: hard-coverage VALUE (reference parity — a
        # correct silhouette has exactly zero loss), SoftRas GRADIENT.  The
        # raw soft silhouette saturates below 1.0 between ~1px triangles and
        # its x100 L1 exerted a permanent grow-pressure that ran
        # density_thres to its clamp in 100 iters (r4 divergence; see
        # ops/mesh_raster._add_st_mask).
        mask = mout["st_mask"]
        mesh_image = mout["rgb"].transpose(2, 0, 1)

        losses["mask_loss"] = (L.l1_loss(mask, batch.gt_mask)
                               * 100.0 * o.mask_loss_weight)
        mesh_img_loss = L.image_loss(mesh_image, batch.gt_image, o.lambda_dssim)
        losses["mesh_img_loss"] = mesh_img_loss * o.mesh_img_loss_weight
        t_iter = step_f / o.iterations
        losses["laplacian_loss"] = (
            laplacian_uniform_tri(tri_w, mesh.verts, mesh.faces,
                                  mesh.face_valid)
            * 1000.0 * cfg.model.laplacian_loss_weight * (1.0 - t_iter))
        aux["mesh_psnr"] = L.psnr(jax.lax.stop_gradient(mesh_image), batch.gt_image)
        aux["mesh_overflow"] = mesh.overflow
        aux["mesh_n_verts"] = mesh.n_verts
        aux["mesh_n_faces"] = mesh.n_faces
        aux["raster_overflow"] = mout["aux"]["tile_overflow"]

    # --- anchor loss (train.py:287-304) ---
    # The 1-1 term is differentiable through means3d (reference: knn_points on
    # get_xyz + deform.step(get_xyz.detach()), anchor :749-762 — gradient into
    # the deform net; the get_xyz gradient is discarded because anchor
    # iterations skip the gaussian optimizer step).
    # The n-1 term enters as a stop-gradient CONSTANT.  In the reference it is
    # nominally "on the graph" (average_and_prune masked-selects _xyz,
    # gaussian_model_dpsr_dynamic_anchor.py:603), but that path is dead for
    # every parameter the optimizer updates: both deform applications inside
    # average_and_prune run under torch.no_grad (:616-622, :631-637), and
    # prune_points replaces the _xyz Parameter object in the optimizer BEFORE
    # loss.backward() runs (anchor_mesh at train.py:295 precedes backward at
    # :321) — so the n-1 gradient accumulates only into the orphaned
    # pre-prune tensor that optimizer.step() never sees.  Pinned by
    # tests/test_anchor_gradient_parity.py with a torch repro of the
    # reference's prune-then-backward pattern.
    if flags.anchor and anchor_info is not None:
        cent = anchor_info["centroid_of_gaussian"]       # (M,3) sg
        w = anchor_info["gauss_1_1_mask"]                # (M,) sg
        d2 = jnp.sum((means3d - cent) ** 2, axis=-1)
        a11 = jnp.sum(jnp.where(w, d2, 0.0)) / jnp.maximum(w.sum(), 1)
        losses["anchor_loss"] = (a11 + anchor_info["loss_n_1"]) * 0.1

    # --- GS image loss (train.py:306-312) ---
    losses["img_loss"] = L.image_loss(image, batch.gt_image, o.lambda_dssim)
    aux["img_psnr"] = L.psnr(jax.lax.stop_gradient(image), batch.gt_image)

    total = jnp.asarray(0.0)
    for k, v in losses.items():
        total = total + v
    aux["losses"] = {k: jax.lax.stop_gradient(v) for k, v in losses.items()}
    if with_live_losses:
        aux["losses_live"] = losses
    return total, aux


def train_step(ctx: StepContext, state: TrainState, batch: Batch, key,
               flags: StepFlags, anchor_info=None):
    """One optimization step; returns (new_state, metrics)."""
    cfg = ctx.cfg
    step_f = state.step.astype(jnp.float32)
    M = state.gp.xyz.shape[0]
    screen0 = jnp.zeros((M, 2))

    grad_fn = jax.value_and_grad(
        lambda gp, nets, so: loss_and_aux(ctx, gp, nets, so, state.gs, batch,
                                          key, step_f, flags, anchor_info),
        argnums=(0, 1, 2), has_aux=True)
    (loss, aux), (g_gp, g_nets, g_screen) = grad_fn(state.gp, state.nets, screen0)

    # Gradient sanitizer (deviation; reference analogue --detect_anomaly,
    # train.py:936 — but self-healing instead of crashing).  The axon TPU
    # backend has twice miscompiled large fused programs into NaN-minting
    # executables (occupancy ≥192³, r3; the appearance-MLP forward/backward
    # at V≈285k, r4 — CPU bit-clean on the same state, DESIGN.md §3c).  A
    # single non-finite gradient leaf zeroes that leaf's update instead of
    # destroying the net; the count is surfaced as `nonfinite_grad_leaves`
    # and the loop tripwire still halts if loss itself goes non-finite.
    def _sanitize(tree):
        bad = jnp.int32(0)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        for leaf in leaves:
            ok = jnp.isfinite(leaf).all()
            bad = bad + (1 - ok.astype(jnp.int32))
            out.append(jnp.where(ok, leaf, jnp.zeros_like(leaf)))
        return jax.tree_util.tree_unflatten(treedef, out), bad

    g_gp, bad_gp = _sanitize(g_gp)
    g_nets, bad_nets = _sanitize(g_nets)
    nonfinite_grad_leaves = bad_gp + bad_nets

    # densification statistics (train.py:489-496)
    gs = state.gs
    if flags.densify_stats:
        vis = aux["visibility"] & gs.alive
        gs = gs._replace(
            max_radii2d=jnp.where(vis, jnp.maximum(gs.max_radii2d, aux["radii"]), gs.max_radii2d),
            xyz_grad_accum=gs.xyz_grad_accum + jnp.where(
                vis, jnp.linalg.norm(g_screen, axis=-1), 0.0),
            denom=gs.denom + vis.astype(jnp.float32),
        )

    # --- parameter updates ---
    lrs = gaussian_group_lrs(step_f, cfg)
    if flags.skip_gaussian_update:
        gp, g_mu, g_nu, g_count = state.gp, state.g_mu, state.g_nu, state.g_count
    else:
        gp, g_mu, g_nu, g_count = gaussian_adam_update(
            state.gp, g_gp, state.g_mu, state.g_nu, state.g_count, lrs, gs.alive)

    nlrs = net_lrs(step_f, cfg)
    active = dict(
        deform=not flags.warm,
        deform_normal=flags.use_normal,
        deform_back=not flags.warm,
        deform_back_normal=flags.use_normal,
        appearance=flags.mesh,
    )
    new_nets, new_opts = {}, {}
    for name in NetParams._fields:
        p, g = getattr(state.nets, name), getattr(g_nets, name)
        os_ = getattr(state.net_opt, name)
        if active[name]:
            p, os_ = net_adam_update(p, g, os_, getattr(nlrs, name))
        new_nets[name] = p
        new_opts[name] = os_

    new_state = TrainState(gp=gp, gs=gs, nets=NetParams(**new_nets),
                           g_mu=g_mu, g_nu=g_nu, g_count=g_count,
                           net_opt=NetParams(**new_opts), step=state.step + 1)
    metrics = dict(loss=loss, **aux["losses"], img_psnr=aux["img_psnr"],
                   n_alive=gs.alive.sum(),
                   nonfinite_grad_leaves=nonfinite_grad_leaves)
    for k in ("mesh_psnr", "mesh_overflow", "splat_overflow",
              "splat_dup_overflow", "raster_overflow",
              "mesh_n_verts", "mesh_n_faces", "psr_min", "psr_max",
              "psr_corner", "normal_norm", "density_thres"):
        if k in aux:
            metrics[k] = aux[k]
    return new_state, metrics

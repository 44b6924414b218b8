"""Sharded mesh rasterization: per-chip face binning + tile-sharded shading.

Completes DESIGN.md §5's scaling plan (item 3, after sharded splat / DPSR /
marching-tets): the mesh-render stage of the training step no longer runs
replicated per chip.  Same SPMD recipe as parallel/sharded_splat.py:

  1. each chip projects and bins ONLY its own F/n faces (the sharded
     marching-tets output is already block-laid-out on the face axis, so the
     P(axis) in-spec is a no-op re-shard);
  2. ONE `all_to_all` exchanges per-tile-block candidate lists carrying the
     full 24-lane shading attribute rows (screen triangle, 1/w, vertex
     colors, face id — the mesh_raster_pallas layout);
  3. each chip merges the n depth-sorted lists per tile on
     (merge_depth_rank, global face id) — bit-identical to the packed key
     bin_rects sorts by — truncates to K, and z-buffers + soft-silhouettes
     its own T/n tile block via the attrs-based shading twin
     (mesh_raster_pallas._shade_ref).

Exactness argument is the sharded-splat one verbatim (per-chip top-K ⊇ the
chip's contribution to the global top-K; merge key reproduces the unsharded
slot order), pinned by tests/test_sharded_mr.py including the K-truncation
case.  Vertex positions and colors enter replicated — V·3 f32 is ~4.7 MB at
the 393k-vert quality cap, three orders below the per-chip face math — and
their gradients psum across chips on the shard_map transpose.

The reference's rasterizer (nvdiffrast GL, utils/renderer.py:33-121) has no
distributed story; this module is a new capability (SURVEY §2.0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.binning import (bin_rects, depth_range, merge_depth_rank,
                           quantize_depth, rect_from_bbox)
from ..ops.mesh_raster import MeshRasterConfig, _face_screen, _untile
from ..ops.mesh_raster import _add_st_mask

_BIG = jnp.int32(1 << 30)   # sort-last sentinel for invalid candidate slots


def _local_face_bins(tri, inv_w, fvalid, cfg: MeshRasterConfig, n_chips: int,
                     axis: str):
    """Bin this chip's faces; depth keys quantized on the GLOBAL range."""
    sg = jax.lax.stop_gradient
    tri_s = sg(tri)
    if cfg.cull_backface:
        e1 = tri_s[:, 1] - tri_s[:, 0]
        e2 = tri_s[:, 2] - tri_s[:, 0]
        area2 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        fvalid = fvalid & (area2 < 0.0)
    pad = 1.0
    x0 = jnp.floor(tri_s[..., 0].min(axis=1) - pad)
    x1 = jnp.ceil(tri_s[..., 0].max(axis=1) + pad)
    y0 = jnp.floor(tri_s[..., 1].min(axis=1) - pad)
    y1 = jnp.ceil(tri_s[..., 1].max(axis=1) + pad)
    tx0, ty0, nx, ny = rect_from_bbox(x0, y0, x1, y1, tile_w=cfg.tile_w,
                                      tile_h=cfg.tile_h, tiles_x=cfg.tiles_x,
                                      tiles_y=cfg.tiles_y)
    depth = sg(1.0 / jnp.maximum(inv_w.mean(axis=1), 1e-6))
    dmin_l, dmax_l = depth_range(depth, fvalid)
    dmin = jax.lax.pmin(dmin_l, axis)
    dmax = jax.lax.pmax(dmax_l, axis)
    dkey = quantize_depth(depth, fvalid, dmin=dmin, dmax=dmax)
    # per-chip duplicate capacity with 2x skew headroom (sharded_splat note)
    bins = bin_rects(tx0, ty0, nx, ny, dkey, fvalid,
                     tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
                     max_dup=min(cfg.max_dup,
                                 max(2 * cfg.max_dup // n_chips, 1024)),
                     max_per_tile=cfg.max_per_tile)
    dq = merge_depth_rank(dkey, cfg.num_tiles)
    total_per_tile = jax.lax.psum(bins.tile_count, axis)
    tile_overflow = jnp.sum(jnp.maximum(total_per_tile - cfg.max_per_tile, 0))
    aux = dict(num_duplicates=bins.num_duplicates,
               dup_overflow=bins.dup_overflow,
               tile_overflow=tile_overflow)
    return bins.tile_idx, dq, aux


def _exchange_and_merge(tile_idx, dq_per_f, attrs24, cfg: MeshRasterConfig,
                        n_chips: int, rank, axis: str):
    """all_to_all the per-tile candidate attribute lists, merge, truncate.

    tile_idx: (T,K) local face slots; dq_per_f: (F_l,); attrs24: (F_l,24).
    Returns (ga (Tn,K,24), Tn) for this chip's tile block — lane 9 (valid)
    is re-stamped from the merged validity so shading sees exactly the
    surviving candidates.
    """
    K = cfg.max_per_tile
    T = cfg.num_tiles
    Tn = -(-T // n_chips)
    Tpad = Tn * n_chips
    if Tpad != T:
        tile_idx = jnp.pad(tile_idx, ((0, Tpad - T), (0, 0)),
                           constant_values=-1)

    fi = jnp.maximum(tile_idx, 0)
    ok = tile_idx >= 0
    n_local = attrs24.shape[0]
    ga = attrs24[fi]                                      # (Tpad,K,24)
    dq = jnp.where(ok, dq_per_f[fi], _BIG)                # (Tpad,K)
    gid = jnp.where(ok, tile_idx + rank * n_local, _BIG)  # global stable tiebreak

    def a2a(x):
        x = x.reshape((n_chips, Tn) + x.shape[1:])
        return jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=0)

    ga_r = a2a(ga)
    dq_r = a2a(dq)
    gid_r = a2a(gid)

    cand = jnp.moveaxis(ga_r, 0, 1).reshape(Tn, n_chips * K, 24)
    dq_c = jnp.moveaxis(dq_r, 0, 1).reshape(Tn, n_chips * K)
    gid_c = jnp.moveaxis(gid_r, 0, 1).reshape(Tn, n_chips * K)
    iota = jnp.broadcast_to(jnp.arange(n_chips * K, dtype=jnp.int32),
                            dq_c.shape)
    dq_s, _, perm = jax.lax.sort((dq_c, gid_c, iota), dimension=1, num_keys=2)
    perm_k = jax.lax.stop_gradient(perm[:, :K])
    ga_k = jnp.take_along_axis(cand, perm_k[..., None], axis=1)
    valid_k = (dq_s[:, :K] < _BIG).astype(jnp.float32)
    # re-stamp lane 9: merged validity gates shading (truncated slots carry
    # stale attribute rows from the gather above)
    ga_k = jnp.concatenate([ga_k[..., :9], valid_k[..., None] * ga_k[..., 9:10],
                            ga_k[..., 10:]], axis=-1)
    return ga_k, Tn


def render_mesh_sharded(mesh: Mesh, verts, faces, face_valid, vtx_color,
                        pose, proj, bg_color, cfg: MeshRasterConfig,
                        want_soft: bool = True, tri_w=None, axis: str = "gauss"):
    """Drop-in sharded twin of ops.mesh_raster.render_mesh (same returns).

    ``faces``/``face_valid`` (and ``tri_w`` if given) must be shardable on
    axis 0 over ``mesh``; verts and vtx_color are replicated (their grads
    psum on the transpose).  Gradients flow exactly like the single-device
    path: to vertex colors through the interpolation and to vertex positions
    through barycentrics + the soft silhouette.
    """
    from ..ops.mesh_raster_pallas import _shade_ref

    n = mesh.devices.size
    F = faces.shape[0]
    if F % n:
        raise ValueError(f"F={F} not divisible by mesh size {n}")
    bg = jnp.asarray(bg_color, jnp.float32)
    if tri_w is None:
        tri_w = verts[faces]

    def body(verts, faces_l, fvalid_l, tri_w_l, vtx_color, pose, proj, bg):
        rank = jax.lax.axis_index(axis)
        tri, inv_w, fvalid = _face_screen(verts, faces_l, fvalid_l, pose,
                                          proj, cfg, tri_w=tri_w_l)
        tile_idx, dq, aux = _local_face_bins(tri, inv_w, fvalid, cfg, n, axis)
        # 24-lane pallas-layout attribute rows for this chip's faces
        gfid = (rank * faces_l.shape[0]
                + jnp.arange(faces_l.shape[0], dtype=jnp.int32))
        attrs = jnp.concatenate([
            tri.reshape(-1, 6), inv_w,
            fvalid[:, None].astype(jnp.float32),
            vtx_color[faces_l].reshape(-1, 9),
            gfid[:, None].astype(jnp.float32),
            jnp.zeros((faces_l.shape[0], 4), jnp.float32),
        ], axis=-1)
        ga, Tn = _exchange_and_merge(tile_idx, dq, attrs, cfg, n, rank, axis)
        tids = rank * Tn + jnp.arange(Tn, dtype=jnp.int32)
        tids = jnp.minimum(tids, cfg.num_tiles - 1)
        origins = jnp.stack(
            [(tids % cfg.tiles_x).astype(jnp.float32) * cfg.tile_w,
             (tids // cfg.tiles_x).astype(jnp.float32) * cfg.tile_h], axis=-1)
        rgb, hard, soft, fid = _shade_ref(ga, origins, cfg.tile_h, cfg.tile_w,
                                          cfg.sigma,
                                          chunk=min(cfg.tile_chunk, Tn))
        rgb = rgb + (1.0 - hard)[..., None] * bg[None, None, :]
        fid = jnp.where(hard > 0.5, fid, -1.0)
        aux = {k: (v if k == "tile_overflow" else jax.lax.psum(v, axis))
               for k, v in aux.items()}
        return rgb, hard, soft, fid, aux

    row, repl = P(axis), P()
    in_specs = (repl, row, row, row, repl, repl, repl, repl)
    out_specs = (row, row, row, row, repl)
    rgb, hard, soft, fid, aux = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)(
        verts, faces, face_valid, tri_w, vtx_color, pose, proj, bg)

    out = dict(
        rgb=_untile(rgb.reshape(-1, cfg.tile_h * cfg.tile_w, 3), cfg, 3),
        mask=_untile(hard.reshape(-1, cfg.tile_h * cfg.tile_w), cfg),
        face_id=_untile(fid.reshape(-1, cfg.tile_h * cfg.tile_w), cfg)
            .astype(jnp.int32),
        aux=aux,
    )
    if want_soft:
        out["soft_mask"] = _untile(
            soft.reshape(-1, cfg.tile_h * cfg.tile_w), cfg)
    _add_st_mask(out)
    return out

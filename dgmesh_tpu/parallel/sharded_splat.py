"""Sharded Gaussian splatting: per-chip binning + tile-sharded compositing.

This implements the two top items of DESIGN.md §5's scaling plan — the stages
that do NOT scale under plain GSPMD annotations (the global binning sort and
the tile compositing) — as an explicit `jax.shard_map` SPMD program over a
1-D device mesh:

  1. each chip preprocesses and bins ONLY its own N/n Gaussians (local
     `lax.sort` over max_dup/n slots — sort time is 1/n of the global sort);
  2. ONE `all_to_all` exchanges per-tile-block contribution lists: chip d
     owns the contiguous tile block [d·T/n, (d+1)·T/n) and receives, for its
     tiles, every chip's depth-sorted top-K candidates *with their
     compositing attributes* (so no later gather into a global table);
  3. each chip merges the n sorted candidate lists per tile (one stable
     two-key `lax.sort` over n·K lanes), truncates to K, and composites its
     T/n tiles locally.

Exactness (pinned by tests/test_sharded_splat.py): the single-device
pipeline keeps, per tile, the first K slots in (depth-rank, gaussian-id)
order.  Each chip's local top-K contains every one of its Gaussians that can
make the global top-K, so merging per-chip top-K lists and re-truncating to K
reproduces the unsharded tile list *exactly* — same entries, same order —
because the merge key (merge_depth_rank, global id) is bit-identical to the
packed-key order bin_rects sorts by (ops/binning.py).  The composited image
is then the same arithmetic on the same operands.

Collective cost per step: one all_to_all of n·T·K·11 f32/i32 lanes (the tile
tables with attributes) + pmin/pmax scalars for the global depth range + a
psum of overflow counters.  Everything else is chip-local.  The all_to_all
payload rides ICI and replaces BOTH of GSPMD's all-gathers (duplication
arrays into the global sort, packed attribute table into compositing).

The reference has no distributed story at all (single-GPU CUDA,
diff-gaussian-rasterization); this module is a new capability (SURVEY §2.0).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.splat import (SplatConfig, CameraArrays, preprocess, _tile_rects,
                         _pack_attrs, _composite_chunk_attrs)
from ..ops.binning import (bin_rects, quantize_depth, merge_depth_rank,
                           depth_range)

_BIG = jnp.int32(1 << 30)   # sort-last sentinel for invalid candidate slots


def _local_bins(pre, cfg: SplatConfig, n_chips: int, axis: str):
    """Per-chip binning over the chip's local Gaussians.

    Returns (tile_idx (T,K) local ids, dq (N_l,) merge depth ranks, aux).
    Depth keys are quantized against the GLOBAL depth range (pmin/pmax) so
    ranks agree across chips.
    """
    mean2d = jax.lax.stop_gradient(pre["mean2d"])
    depth = jax.lax.stop_gradient(pre["depth"])
    radius = jax.lax.stop_gradient(pre["radius"])
    valid = pre["valid"]

    dmin_l, dmax_l = depth_range(depth, valid)
    dmin = jax.lax.pmin(dmin_l, axis)
    dmax = jax.lax.pmax(dmax_l, axis)
    dkey = quantize_depth(depth, valid, dmin=dmin, dmax=dmax)

    tx0, ty0, nx, ny, _ = _tile_rects(mean2d, radius, valid, cfg)
    # Per-chip duplicate capacity: Gaussians are index-sharded but tile load
    # is spatially skewed (especially after densify appends), so an even
    # max_dup/n split can overflow on a hot chip where the single-device path
    # (full max_dup) would not.  2x headroom keeps the exact-parity contract
    # under realistic skew; dup_overflow is psum'd into aux and surfaced as a
    # training metric (splat_dup_overflow) so any residual overflow is loud
    # (ADVICE r3 #1).
    bins = bin_rects(tx0, ty0, nx, ny, dkey, valid,
                     tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
                     max_dup=min(cfg.max_dup,
                                 max(2 * cfg.max_dup // n_chips, 1024)),
                     max_per_tile=cfg.max_per_tile)
    dq = merge_depth_rank(dkey, cfg.num_tiles)
    # exact global K-truncation count: psum per-tile PRE-truncation entry
    # counts across chips, then measure the global excess over K (matches the
    # single-device tile_overflow; the per-chip counters would undercount
    # because each chip's list is already capped at K)
    total_per_tile = jax.lax.psum(bins.tile_count, axis)
    tile_overflow = jnp.sum(jnp.maximum(total_per_tile - cfg.max_per_tile, 0))
    aux = dict(num_duplicates=bins.num_duplicates,
               dup_overflow=bins.dup_overflow,
               tile_overflow=tile_overflow)
    return bins.tile_idx, dq, aux


def _exchange_and_merge(tile_idx, dq_per_g, packed, cfg: SplatConfig,
                        n_chips: int, rank, axis: str):
    """all_to_all the per-tile candidate lists, merge, truncate to K.

    tile_idx: (T,K) local ids; dq_per_g: (N_l,); packed: (N_l,9).
    Returns (ga (Tn,K,9), gvalid (Tn,K), merge_overflow scalar) for this
    chip's tile block of Tn = Tpad/n tiles.
    """
    K = cfg.max_per_tile
    T = cfg.num_tiles
    Tn = -(-T // n_chips)
    Tpad = Tn * n_chips

    if Tpad != T:
        tile_idx = jnp.pad(tile_idx, ((0, Tpad - T), (0, 0)),
                           constant_values=-1)

    gi = jnp.maximum(tile_idx, 0)
    ok = tile_idx >= 0
    n_local = packed.shape[0]
    ga = packed[gi]                                       # (Tpad,K,9)
    dq = jnp.where(ok, dq_per_g[gi], _BIG)                # (Tpad,K) i32
    gid = jnp.where(ok, tile_idx + rank * n_local, _BIG)  # global stable tiebreak

    # one exchange: chip d's rows [dTn:(d+1)Tn] of each array go to chip d
    def a2a(x):
        x = x.reshape((n_chips, Tn) + x.shape[1:])
        return jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=0)

    ga_r = a2a(ga)                                        # (n,Tn,K,9)
    dq_r = a2a(dq)                                        # (n,Tn,K)
    gid_r = a2a(gid)

    # merge n depth-sorted lists per tile: stable 2-key sort over n·K lanes
    cand = jnp.moveaxis(ga_r, 0, 1).reshape(Tn, n_chips * K, 9)
    dq_c = jnp.moveaxis(dq_r, 0, 1).reshape(Tn, n_chips * K)
    gid_c = jnp.moveaxis(gid_r, 0, 1).reshape(Tn, n_chips * K)
    iota = jnp.broadcast_to(jnp.arange(n_chips * K, dtype=jnp.int32),
                            dq_c.shape)
    dq_s, _, perm = jax.lax.sort((dq_c, gid_c, iota), dimension=1, num_keys=2)
    perm_k = jax.lax.stop_gradient(perm[:, :K])           # (Tn,K)
    ga_k = jnp.take_along_axis(cand, perm_k[..., None], axis=1)
    valid_k = dq_s[:, :K] < _BIG
    n_valid = jnp.sum((dq_c < _BIG).astype(jnp.int32), axis=1)
    merge_overflow = jnp.sum(jnp.maximum(n_valid - K, 0))
    return ga_k, valid_k, merge_overflow


def _composite_block(ga, gvalid, bg, cfg: SplatConfig, rank):
    """Chunked remat compositing of this chip's Tn-tile block."""
    Tn = ga.shape[0]
    C = min(cfg.tile_chunk, Tn)
    n_chunks = -(-Tn // C)
    pad = n_chunks * C - Tn
    if pad:
        ga = jnp.pad(ga, ((0, pad), (0, 0), (0, 0)))
        gvalid = jnp.pad(gvalid, ((0, pad), (0, 0)))
    tids = rank * Tn + jnp.arange(n_chunks * C, dtype=jnp.int32)
    tids = jnp.minimum(tids, cfg.num_tiles - 1)           # padded tiles: any

    @jax.checkpoint
    def body(args):
        t, a, v = args
        return _composite_chunk_attrs(t, a, v, bg, cfg)

    colors, alphas = jax.lax.map(
        body, (tids.reshape(n_chunks, C),
               ga.reshape((n_chunks, C) + ga.shape[1:]),
               gvalid.reshape((n_chunks, C) + gvalid.shape[1:])))
    Pp = cfg.tile_h * cfg.tile_w
    return (colors.reshape(n_chunks * C, Pp, 3)[:Tn],
            alphas.reshape(n_chunks * C, Pp)[:Tn])


def _untile(colors, alphas, cfg: SplatConfig):
    """(Tpad,P,·) tile-major → (H,W,·) image (global view, outside shard_map)."""
    T = cfg.num_tiles
    img = colors[:T].reshape(cfg.tiles_y, cfg.tiles_x, cfg.tile_h, cfg.tile_w, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(cfg.tiles_y * cfg.tile_h,
                                               cfg.tiles_x * cfg.tile_w, 3)
    am = alphas[:T].reshape(cfg.tiles_y, cfg.tiles_x, cfg.tile_h, cfg.tile_w)
    am = am.transpose(0, 2, 1, 3).reshape(cfg.tiles_y * cfg.tile_h,
                                          cfg.tiles_x * cfg.tile_w)
    return img[:cfg.height, :cfg.width], am[:cfg.height, :cfg.width]


def render_sharded(mesh: Mesh, means3d, scales, quats, opacities, shs, alive,
                   cam: CameraArrays, bg_color, cfg: SplatConfig,
                   sh_degree: int,
                   screen_offset: Optional[jnp.ndarray] = None,
                   colors_precomp: Optional[jnp.ndarray] = None,
                   axis: str = "dev"):
    """Drop-in sharded twin of ops.splat.render (same returns, same numerics).

    Per-Gaussian inputs must be shardable on axis 0 over ``mesh`` (N divisible
    by n).  Differentiable end-to-end: the all_to_all transposes to an
    all_to_all, attribute gathers transpose to local segment scatter-adds.
    """
    n = mesh.devices.size
    N = means3d.shape[0]
    if N % n:
        raise ValueError(f"N={N} not divisible by mesh size {n}")
    bg = jnp.asarray(bg_color, jnp.float32)
    use_cp = colors_precomp is not None   # static: selects the preprocess path
    so = (screen_offset if screen_offset is not None
          else jnp.zeros((N, 2), jnp.float32))
    cp = colors_precomp if use_cp else jnp.zeros((N, 3), jnp.float32)

    def body(means3d, scales, quats, opacities, shs, alive, so, cp, cam, bg):
        rank = jax.lax.axis_index(axis)
        pre = preprocess(means3d, scales, quats, opacities, shs, alive, cam,
                         cfg, sh_degree,
                         colors_precomp=cp if use_cp else None)
        pre = dict(pre, mean2d=pre["mean2d"] + so)
        tile_idx, dq, aux = _local_bins(pre, cfg, n, axis)
        ga, gvalid, _ = _exchange_and_merge(
            tile_idx, dq, _pack_attrs(pre), cfg, n, rank, axis)
        colors, alphas = _composite_block(ga, gvalid, bg, cfg, rank)
        aux = {k: (v if k == "tile_overflow" else jax.lax.psum(v, axis))
               for k, v in aux.items()}   # tile_overflow is already global
        return colors, alphas, pre["radius"], pre["valid"], aux

    row, repl = P(axis), P()
    in_specs = (row, row, row, row, row, row, row, row, repl, repl)
    out_specs = (row, row, row, row, repl)
    colors, alphas, radii, vis, aux = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)(
        means3d, scales, quats, opacities, shs, alive, so, cp, cam, bg)
    img, alpha = _untile(colors, alphas, cfg)
    return dict(render=img.transpose(2, 0, 1), alpha=alpha,
                radii=radii, visibility=vis, aux=aux)

"""Generic tile binning: map N screen-space rectangles to per-tile item lists.

Shared by the Gaussian splatter (replaces duplicateWithKeys + radix sort,
rasterizer_impl.cu:70-138) and the mesh rasterizer (replaces nvdiffrast's
internal binning).  Fully gather-based:

  slot j ∈ [0, max_dup) finds its owning item with a binary search into the
  exclusive cumsum of per-item tile counts, decodes its (tile_y, tile_x) from
  the item's rect, then a two-key lax.sort on (tile, depth_key) groups slots
  by tile with near-to-far ordering inside each tile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    tile_idx: jnp.ndarray     # (num_tiles, K) int32 item ids, -1 padded
    num_duplicates: jnp.ndarray
    dup_overflow: jnp.ndarray
    tile_overflow: jnp.ndarray


def bin_rects(tx0, ty0, nx, ny, depth_key, valid, *, tiles_x: int,
              tiles_y: int, max_dup: int, max_per_tile: int) -> TileBins:
    """All inputs (N,) int32 / depth_key int32 / valid bool."""
    num_tiles = tiles_x * tiles_y
    count = jnp.where(valid, nx * ny, 0)
    offsets = jnp.cumsum(count)
    total = offsets[-1]
    start = offsets - count

    slots = jnp.arange(max_dup, dtype=jnp.int32)
    g = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32)
    g = jnp.minimum(g, count.shape[0] - 1)
    k = slots - start[g]
    nx_g = jnp.maximum(nx[g], 1)
    tile = (ty0[g] + k // nx_g) * tiles_x + (tx0[g] + k % nx_g)
    slot_valid = slots < total
    tile = jnp.where(slot_valid, tile, num_tiles).astype(jnp.int32)

    tile_s, _, g_s = jax.lax.sort((tile, depth_key[g], g), num_keys=2)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    t_start = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    t_end = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)

    karange = jnp.arange(max_per_tile, dtype=jnp.int32)
    pos = t_start[:, None] + karange[None, :]
    in_range = pos < t_end[:, None]
    pos = jnp.minimum(pos, max_dup - 1)
    tile_idx = jnp.where(in_range, g_s[pos], -1)

    overflow = jnp.maximum(t_end - t_start - max_per_tile, 0)
    return TileBins(tile_idx=tile_idx, num_duplicates=total,
                    dup_overflow=jnp.maximum(total - max_dup, 0),
                    tile_overflow=jnp.sum(overflow))


def rect_from_bbox(x0, y0, x1, y1, *, tile_w: int, tile_h: int,
                   tiles_x: int, tiles_y: int):
    """Pixel-space bbox → touched tile rect (clamped, like auxiliary.h getRect)."""
    tx0 = jnp.clip(x0 / tile_w, 0, tiles_x).astype(jnp.int32)
    ty0 = jnp.clip(y0 / tile_h, 0, tiles_y).astype(jnp.int32)
    tx1 = jnp.clip((x1 + tile_w - 1) // tile_w, 0, tiles_x).astype(jnp.int32)
    ty1 = jnp.clip((y1 + tile_h - 1) // tile_h, 0, tiles_y).astype(jnp.int32)
    nx = jnp.maximum(tx1 - tx0, 0)
    ny = jnp.maximum(ty1 - ty0, 0)
    return tx0, ty0, nx, ny


def quantize_depth(depth, valid, bits: int = 30):
    """Map float depth to monotone int32 keys for the two-key sort."""
    dmin = jnp.min(jnp.where(valid, depth, jnp.inf))
    dmax = jnp.max(jnp.where(valid, depth, -jnp.inf))
    drange = jnp.maximum(dmax - dmin, 1e-6)
    return ((depth - dmin) / drange * jnp.float32(1 << bits)).astype(jnp.int32)

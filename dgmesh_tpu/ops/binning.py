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

from .scan import cumsum1d, cummax1d, searchsorted1d


class TileBins(NamedTuple):
    tile_idx: jnp.ndarray     # (num_tiles, K) int32 item ids, -1 padded
    num_duplicates: jnp.ndarray
    dup_overflow: jnp.ndarray
    tile_overflow: jnp.ndarray
    tile_count: jnp.ndarray   # (num_tiles,) pre-truncation entries per tile


def _depth_bits(num_tiles: int) -> int:
    """Depth bits available in the packed (tile|depth) int32 sort key."""
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = min(31 - tile_bits, 14)   # f_dq carries 14 depth bits
    assert depth_bits >= 8, f"too many tiles ({num_tiles}) for packed keys"
    return depth_bits


def merge_depth_rank(depth_key, num_tiles: int):
    """Per-item depth rank at the EXACT resolution bin_rects sorts at.

    The sharded binning path (parallel/sharded_splat.py) merges per-chip
    sorted tile lists; using this rank (plus global item id as the stable
    tie-break, matching bin_rects' slot order) reproduces the single-device
    sort order bit-for-bit, so per-chip-top-K merge → global-top-K is exact.
    """
    depth_bits = _depth_bits(num_tiles)
    f_dq = jnp.clip(depth_key >> 16, 0, (1 << 14) - 1)
    return jnp.clip(f_dq >> (14 - depth_bits), 0, (1 << depth_bits) - 1)


def depth_range(depth, valid):
    """Masked (min, max) of depth — the normalization quantize_depth uses.
    Exposed so the sharded path can psum/pmin a GLOBAL range across chips."""
    dmin = jnp.min(jnp.where(valid, depth, jnp.inf))
    dmax = jnp.max(jnp.where(valid, depth, -jnp.inf))
    return dmin, dmax


def bin_rects(tx0, ty0, nx, ny, depth_key, valid, *, tiles_x: int,
              tiles_y: int, max_dup: int, max_per_tile: int) -> TileBins:
    """All inputs (N,) int32 / depth_key int32 / valid bool."""
    num_tiles = tiles_x * tiles_y
    count = jnp.where(valid, nx * ny, 0)
    offsets = cumsum1d(count)
    total = offsets[-1]
    start = (offsets - count).astype(jnp.int32)

    # Slot → owning item: every item with count>0 stamps its id at dup-slot
    # `start`; a cummax forward-fill propagates ids (ids and starts are both
    # increasing over writers, so max == last-stamp-at-or-before).  This
    # replaces a per-slot binary search (max_dup·log N random gathers — the
    # old hot spot) with one scatter + one linear max-scan + one row gather.
    writes = valid & (count > 0)
    dst = jnp.where(writes, start, max_dup)
    sent = jnp.int32(-1)
    stamp_g = jnp.full(max_dup, sent).at[dst].max(
        jnp.arange(count.shape[0], dtype=jnp.int32), mode="drop")
    g = cummax1d(stamp_g)
    g = jnp.maximum(g, 0)

    # one gather of the packed per-item record [tx0|ty0|nx, start, depth]
    assert tiles_x <= 512 and tiles_y <= 512
    rect_packed = tx0 | (ty0 << 9) | (jnp.maximum(nx, 1) << 18)
    rec = jnp.stack([rect_packed, start,
                     jnp.clip(depth_key >> 16, 0, (1 << 14) - 1)], axis=-1)
    rec_s = rec[g]                                        # (max_dup, 3)
    f_rect, f_start, f_dq = rec_s[:, 0], rec_s[:, 1], rec_s[:, 2]

    slots = jnp.arange(max_dup, dtype=jnp.int32)
    k = slots - f_start
    tx0_s = f_rect & 0x1FF
    ty0_s = (f_rect >> 9) & 0x1FF
    nx_s = jnp.maximum((f_rect >> 18) & 0x3FF, 1)
    tile = (ty0_s + k // nx_s) * tiles_x + (tx0_s + k % nx_s)
    # the first writer always stamps slot 0 (its start is 0), so g is correct
    # for every slot < total
    slot_valid = slots < total
    tile = jnp.where(slot_valid, tile, num_tiles).astype(jnp.int32)

    # pack (tile, depth) into ONE int32 key: a single-key sort_key_val is
    # several times cheaper on TPU than a 3-operand two-key comparator sort
    # (cub's 64-bit tile|depth key, rasterizer_impl.cu:70-111, same idea)
    depth_bits = _depth_bits(num_tiles)
    dq = jnp.clip(f_dq >> (14 - depth_bits), 0, (1 << depth_bits) - 1)
    key = (tile << depth_bits) | dq
    _key_s, g_s = jax.lax.sort_key_val(key, g)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    t_start = searchsorted1d(_key_s, tids << depth_bits, side="left")
    t_end = searchsorted1d(_key_s, (tids + 1) << depth_bits, side="left")

    karange = jnp.arange(max_per_tile, dtype=jnp.int32)
    pos = t_start[:, None] + karange[None, :]
    in_range = pos < t_end[:, None]
    pos = jnp.minimum(pos, max_dup - 1)
    tile_idx = jnp.where(in_range, g_s[pos], -1)

    overflow = jnp.maximum(t_end - t_start - max_per_tile, 0)
    return TileBins(tile_idx=tile_idx, num_duplicates=total,
                    dup_overflow=jnp.maximum(total - max_dup, 0),
                    tile_overflow=jnp.sum(overflow),
                    tile_count=t_end - t_start)


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


def quantize_depth(depth, valid, bits: int = 30, dmin=None, dmax=None):
    """Map float depth to monotone int32 keys for the two-key sort.

    ``dmin``/``dmax`` override the masked range — the sharded path passes the
    pmin/pmax-reduced GLOBAL range so per-chip keys agree across chips.
    """
    if dmin is None or dmax is None:
        dmin, dmax = depth_range(depth, valid)
    drange = jnp.maximum(dmax - dmin, 1e-6)
    return ((depth - dmin) / drange * jnp.float32(1 << bits)).astype(jnp.int32)

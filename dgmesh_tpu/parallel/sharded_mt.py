"""Sharded marching tetrahedra: x-slab decomposition over a 1-D device mesh
(DESIGN.md §5 plan item 2; pairs with parallel/sharded_dpsr.py so the whole
mesh branch scales).

Decomposition (single-device reference: ops/marching_tets.py):

  cubes     a cube is OWNED by the chip whose x-slab contains its anchor
            lattice point.  Corner signs of the last local slab need the ring
            neighbour's first phi plane — ONE (1, R, R) ppermute halo (the
            last chip edge-replicates its own plane, matching the reference's
            pad(mode="edge")).
  verts     each cube owns its 7 anchored edge classes, so vertex extraction
            is chip-local (interpolation endpoints live in the halo'd slab).
            Chip c compacts its verts into slot block [c·Vloc, (c+1)·Vloc) of
            the global padded array — cube gids are x-major, so the
            concatenation of per-chip ascending-gid blocks IS the
            single-device ascending-gid order (parity is positional, see
            tests/test_sharded_mt.py).
  faces     a face's corner edge-ids stay on-chip except when the owning
            cube sits on the slab's last x-plane and the edge anchor has
            dx=1: those resolve into the ring neighbour's FIRST-plane vertex
            table — exchanged as ONE fixed-size (halo_cap, 2) ppermute of
            (edge_gid, global_slot) pairs.  Global slot = block base + local
            rank, so emitted faces index the stitched vertex array directly.

Collective budget per call: two ppermutes (phi plane ~R²·4 B, halo table
halo_cap·8 B) + scalar psums.  Compaction/sort work per chip scales 1/n.

Output layout difference vs single-device: valid verts/faces are
BLOCK-prefix (one prefix per chip block), not a global prefix — all training
consumers (mesh raster, laplacian, _mesh_colors, overflow counters) are
mask-driven and layout-agnostic; prefix-slicing consumers (PLY export) run
on the replicated eval path.

Per-chip capacities are the global caps divided by n with 2× headroom
(bounded by the global cap): x-slab vertex load is balanced for real
surfaces but not exactly uniform; overflow counters are psum'd so any
truncation is loud (same contract as DESIGN.md §5b).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.compaction import compact_indices
from ..ops.lut import tiny_lut
from ..ops.marching_tets import (MTConfig, MeshResult, _CLASS_CORNER_BIT,
                                 _EDGE_ANCHOR_NP, _EDGE_CLASS_NP, _EDGE_DIRS,
                                 _TETS, _TRI_COUNT_NP, _TRI_TABLE_NP)
from ..ops.scan import rank_in_sorted, searchsorted1d


def _percap(total: int, n: int, floor: int = 256) -> int:
    return int(min(total, max(2 * (-(-total // n)), floor)))


def _mt_shard_body(cfg: MTConfig, axis: str, n_chips: int, halo_cap: int,
                   phi_l):
    res = cfg.res
    nloc = res // n_chips
    rank = lax.axis_index(axis)
    x0 = rank * nloc
    c_cap = _percap(cfg.max_cubes, n_chips)
    v_cap = _percap(cfg.max_verts, n_chips)
    f_cap = _percap(cfg.max_faces, n_chips)

    phi_l = phi_l.reshape(nloc, res, res)

    # ---- phi halo: ring-next first plane; last chip edge-replicates ----
    perm = [(i, (i - 1) % n_chips) for i in range(n_chips)]
    nxt = lax.ppermute(phi_l[:1], axis, perm)
    nxt = jnp.where(rank == n_chips - 1, phi_l[-1:], nxt)
    phi_h = jnp.concatenate([phi_l, nxt], axis=0)        # (nloc+1, R, R)

    # ---- packed corner signs for local cubes (anchors x ∈ [x0, x0+nloc)) --
    sign = phi_h > 0.0
    S = jnp.pad(sign, ((0, 0), (0, 1), (0, 1)), mode="edge")
    corners = []
    for i in range(8):
        dx, dy, dz = (i >> 2) & 1, (i >> 1) & 1, i & 1
        corners.append(S[dx:dx + nloc, dy:dy + res, dz:dz + res])
    packed = sum(c.astype(jnp.int32) << i for i, c in enumerate(corners))

    cube_active = (packed != 0) & (packed != 255)
    loc_ids, n_cubes = compact_indices(cube_active.reshape(-1), c_cap,
                                       nloc * res * res)
    case8 = packed.reshape(-1)[jnp.minimum(loc_ids, nloc * res * res - 1)]
    cube_ok = jnp.arange(c_cap) < jnp.minimum(n_cubes, c_cap)
    # global flat gid: local flat + x0·R² plane offset (x-major layout)
    cube_gids = jnp.where(cube_ok, loc_ids + x0 * res * res,
                          jnp.int32(res * res * res))

    lz = loc_ids % res
    ly = (loc_ids // res) % res
    lx = loc_ids // (res * res)                          # local x ∈ [0, nloc)
    cpos = jnp.stack([lx + x0, ly, lz], axis=-1)         # GLOBAL anchor (C,3)

    # ---- vertices: 7 anchored edge classes ----
    s_anchor = case8 & 1
    s_nb = (case8[:, None] >> jnp.asarray(_CLASS_CORNER_BIT)[None]) & 1
    in_grid = jnp.all(cpos[:, None, :] + jnp.asarray(_EDGE_DIRS)[None]
                      <= res - 1, axis=-1)
    edge_cross = (s_nb != s_anchor[:, None]) & in_grid & cube_ok[:, None]

    slots, n_verts = compact_indices(edge_cross.reshape(-1), v_cap,
                                     c_cap * 7 - 1)
    vert_valid = jnp.arange(v_cap) < jnp.minimum(n_verts, v_cap)
    vcube = slots // 7
    klass = slots % 7
    gid_pad = jnp.int32(res * res * res * 7)
    edge_gids = jnp.where(vert_valid, cube_gids[vcube] * 7 + klass, gid_pad)

    p0 = cpos[vcube]
    d = jnp.asarray(_EDGE_DIRS)[klass]
    p1 = jnp.clip(p0 + d, 0, res - 1)
    # gather phi from the halo'd local slab (x-local coords)
    ph_flat = phi_h.reshape(-1)

    def fetch(p):
        plx = jnp.clip(p[:, 0] - x0, 0, nloc)            # ≤ nloc = halo plane
        return ph_flat[(plx * res + p[:, 1]) * res + p[:, 2]]

    f0 = fetch(p0)
    f1 = fetch(p1)
    denom = f0 - f1
    t = f0 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)
    verts = (p0.astype(jnp.float32)
             + t[:, None] * d.astype(jnp.float32)) / (res - 1)
    verts = jnp.where(vert_valid[:, None], verts, 0.0)

    # ---- halo vertex table: this chip's FIRST-plane verts, for the ring
    # PREVIOUS chip's boundary faces ----
    first_plane = vert_valid & (p0[:, 0] == x0)
    hslots, n_halo = compact_indices(first_plane, halo_cap, v_cap - 1)
    h_ok = jnp.arange(halo_cap) < jnp.minimum(n_halo, halo_cap)
    h_gid = jnp.where(h_ok, edge_gids[hslots], gid_pad)
    h_slot = jnp.where(h_ok, rank * v_cap + hslots, 0)
    # chip i sends its first-plane table to chip i-1 (whose boundary faces
    # reference it); same ring direction as the phi halo above
    perm_b = [(i, (i - 1) % n_chips) for i in range(n_chips)]
    h_gid = lax.ppermute(h_gid, axis, perm_b)
    h_slot = lax.ppermute(h_slot, axis, perm_b)

    # ---- faces ----
    face_src_ok = cube_ok & jnp.all(cpos <= res - 2, axis=-1)
    tc = jnp.asarray(_TETS)
    corner_in = (~((case8[:, None, None] >> tc[None]) & 1).astype(bool))
    tet_case = sum(corner_in[..., v].astype(jnp.int32) << v for v in range(4))
    counts = tiny_lut(jnp.arange(6, dtype=jnp.int32)[None, :] * 16 + tet_case,
                      _TRI_COUNT_NP)
    tri_valid = (jnp.arange(2)[None, None, :] < counts[:, :, None]) \
        & face_src_ok[:, None, None]
    face_slots, n_faces = compact_indices(tri_valid.reshape(-1), f_cap, 0)
    fcube = face_slots // 12
    frem = face_slots % 12
    ftet = frem // 2
    fk = frem % 2
    fcase = tet_case[fcube, ftet]
    base = ((ftet * 16 + fcase) * 2 + fk) * 3
    ftris = tiny_lut(base[:, None] + jnp.arange(3, dtype=jnp.int32)[None],
                     _TRI_TABLE_NP + 1)
    ftris = jnp.maximum(ftris - 1, 0)
    a = _EDGE_ANCHOR_NP
    geid_delta_np = (((a[..., 0] * res + a[..., 1]) * res + a[..., 2]) * 7
                     + _EDGE_CLASS_NP)
    face_geid = (cube_gids[fcube][:, None] * 7
                 + tiny_lut(ftet[:, None] * 6 + ftris, geid_delta_np))
    flat_geid = face_geid.reshape(-1)

    # local vs ring-next ownership by edge anchor's x plane
    owner_local = flat_geid < (x0 + nloc) * res * res * 7
    if res * res * res * 7 < 2 ** 30:
        r_loc = rank_in_sorted(edge_gids, flat_geid, side="left")
        r_halo = rank_in_sorted(h_gid, flat_geid, side="left")
    else:
        r_loc = searchsorted1d(edge_gids, flat_geid, side="left")
        r_halo = searchsorted1d(h_gid, flat_geid, side="left")
    v_local = rank * v_cap + jnp.minimum(r_loc, v_cap - 1)
    v_remote = h_slot[jnp.minimum(r_halo, halo_cap - 1)]
    vidx = jnp.where(owner_local, v_local, v_remote).reshape(-1, 3)

    face_valid = jnp.arange(f_cap) < jnp.minimum(n_faces, f_cap)
    faces = jnp.where(face_valid[:, None], vidx, 0)

    overflow = (jnp.maximum(n_cubes - c_cap, 0)
                + jnp.maximum(n_verts - v_cap, 0)
                + jnp.maximum(n_faces - f_cap, 0)
                + jnp.maximum(n_halo - halo_cap, 0))
    n_verts_g = lax.psum(jnp.minimum(n_verts, v_cap), axis)
    n_faces_g = lax.psum(jnp.minimum(n_faces, f_cap), axis)
    overflow_g = lax.psum(overflow, axis)
    # out_specs P(axis) on the leading dim stitches the per-chip blocks
    return (verts, faces, vert_valid, face_valid,
            n_verts_g[None], n_faces_g[None], overflow_g[None])


def marching_tets_sharded(mesh: Mesh, phi, cfg: MTConfig,
                          axis: str = "gauss",
                          halo_cap: int = 0) -> MeshResult:
    """phi: full (R,R,R) field (any sharding; shard_map re-shards along x).

    Returns a MeshResult whose padded arrays are the concatenation of n
    per-chip blocks (block-prefix validity, see module docstring).  Total
    padded sizes are n·ceil-capacities — pass the result's OWN shapes
    downstream, not cfg.max_verts.
    """
    n = mesh.devices.size
    if cfg.res % n:
        raise ValueError(f"grid res={cfg.res} not divisible by the "
                         f"{n}-device mesh")
    if cfg.use_narrow_band:
        raise NotImplementedError("narrow-band compaction is a single-device "
                                  "fast path; the sharded MT always uses the "
                                  "exact flat compaction")
    halo_cap = halo_cap or int(min(cfg.max_verts, 8 * cfg.res * cfg.res))

    body = partial(_mt_shard_body, cfg, axis, n, halo_cap)
    fn = jax.shard_map(body, mesh=mesh, in_specs=P(axis),
                       out_specs=(P(axis), P(axis), P(axis), P(axis),
                                  P(axis), P(axis), P(axis)))
    verts, faces, vv, fv, nv, nf, ovf = fn(phi)
    return MeshResult(verts=verts, faces=faces, n_verts=nv[0], n_faces=nf[0],
                      vert_valid=vv, face_valid=fv, overflow=ovf[0])

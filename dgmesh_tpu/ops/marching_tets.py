"""Differentiable iso-surface extraction via marching tetrahedra.

Replaces the reference's external `diso.DiffMC` CUDA marching cubes
(gaussian_model_dpsr_dynamic_anchor.py:84, utils/renderer.py:171).  We use the
6-tetrahedra cube decomposition (every cube split around the main diagonal
v0–v6), which

  * needs only a 16-case table that is DERIVED PROGRAMMATICALLY at import
    time with geometric orientation checks (no hand-copied MC-256 tables to
    get wrong);
  * is consistent across cube faces (all face diagonals run low→high corner),
    so the mesh is watertight;
  * is fully jit-compatible: topology changes are handled with size-bounded
    gather-only stream compaction into MAX_CUBES/MAX_VERTS/MAX_FACES padded
    buffers with validity counts.

Differentiability: vertex positions depend on the field only through the
linear interpolation t = φ_a/(φ_a−φ_b) along sign-changing lattice edges —
plain XLA autodiff.  Topology (masks/indices) is discrete and receives no
gradient, same as DiffMC.

Vertex identity: every mesh vertex lies on one of 7 lattice-edge classes per
grid point (+x, +y, +z, the three face diagonals, the main diagonal); a
vertex's global id is (point_id*7 + class).  Active cubes are compacted FIRST
and vertices are enumerated cube-centrically (see marching_tets below), so no
res³·7-sized array is ever cumsum'd or searched; face indices are recovered
with a sort-merge rank join against the (sorted) compacted edge-id list.

Field convention: outside > 0 > inside (the DPSR output after the sign fix of
utils/renderer.py:164-167); triangle winding is right-handed around the
outward (positive-side) normal.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .compaction import compact_indices
from .lut import tiny_lut
from .scan import rank_in_sorted, searchsorted1d

# Cube corners, x-major bit layout: corner i = (i>>2 & 1, i>>1 & 1, i & 1).
_CORNERS = np.array([[(i >> 2) & 1, (i >> 1) & 1, i & 1] for i in range(8)],
                    np.int32)
# 6-tet decomposition around the main diagonal corner0(0,0,0) – corner7(1,1,1).
# (corner numbering here is bit-layout; (1,1,1) is index 7.)
_TETS = np.array([
    [0, 4, 6, 7],   # each tet = 4 cube-corner indices, shares edge 0-7
    [0, 6, 2, 7],
    [0, 2, 3, 7],
    [0, 3, 1, 7],
    [0, 1, 5, 7],
    [0, 5, 4, 7],
], np.int32)

_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)

# 7 lattice edge classes (direction from anchor point).
_EDGE_DIRS = np.array([
    [1, 0, 0], [0, 1, 0], [0, 0, 1],
    [1, 1, 0], [1, 0, 1], [0, 1, 1],
    [1, 1, 1],
], np.int32)
_DIR_TO_CLASS = {tuple(d): i for i, d in enumerate(_EDGE_DIRS)}


def _build_tables():
    """Derive the per-tet 16-case triangle table with verified orientation.

    For each tet (they have distinct geometry!) and each inside-mask case,
    emit up to 2 triangles as triples of tet-edge indices (0..5), wound so the
    right-hand normal points from the inside (<0) region toward the outside.
    Also build the (tet, tet_edge) → (anchor_offset, class) map.
    """
    # tet-edge → (anchor offset within cube, edge class)
    edge_anchor = np.zeros((6, 6, 3), np.int32)
    edge_class = np.zeros((6, 6), np.int32)
    for t in range(6):
        for e in range(6):
            a, b = _TET_EDGES[e]
            ca, cb = _CORNERS[_TETS[t, a]], _CORNERS[_TETS[t, b]]
            anchor = np.minimum(ca, cb)
            d = np.abs(cb - ca)
            edge_anchor[t, e] = anchor
            edge_class[t, e] = _DIR_TO_CLASS[tuple(d)]

    tri_table = np.full((6, 16, 2, 3), -1, np.int32)
    tri_count = np.zeros((6, 16), np.int32)

    for t in range(6):
        pos = _CORNERS[_TETS[t]].astype(np.float64)       # (4,3) corner coords
        emid = {e: 0.5 * (pos[_TET_EDGES[e, 0]] + pos[_TET_EDGES[e, 1]])
                for e in range(6)}

        def edge_of(a, b):
            for e in range(6):
                if set(_TET_EDGES[e]) == {a, b}:
                    return e
            raise KeyError

        for case in range(16):
            inside = [v for v in range(4) if (case >> v) & 1]
            outside = [v for v in range(4) if not ((case >> v) & 1)]
            tris = []
            if len(inside) == 1:
                a = inside[0]
                tris.append([edge_of(a, b) for b in outside])
            elif len(inside) == 3:
                b = outside[0]
                tris.append([edge_of(a, b) for a in inside])
            elif len(inside) == 2:
                a1, a2 = inside
                b1, b2 = outside
                e11, e12 = edge_of(a1, b1), edge_of(a1, b2)
                e22, e21 = edge_of(a2, b2), edge_of(a2, b1)
                tris.append([e11, e12, e22])
                tris.append([e11, e22, e21])
            # orient: normal should point inside→outside (outward)
            for k, tri in enumerate(tris):
                v0, v1, v2 = (emid[e] for e in tri)
                n = np.cross(v1 - v0, v2 - v0)
                want = (np.mean(pos[outside], axis=0)
                        - np.mean(pos[inside], axis=0)) if inside and outside else n
                if np.dot(n, want) < 0:
                    tri[1], tri[2] = tri[2], tri[1]
                tri_table[t, case, k] = tri
            tri_count[t, case] = len(tris)
    return edge_anchor, edge_class, tri_table, tri_count


_EDGE_ANCHOR_NP, _EDGE_CLASS_NP, _TRI_TABLE_NP, _TRI_COUNT_NP = _build_tables()
_TRI_TABLE = jnp.asarray(_TRI_TABLE_NP)
_TRI_COUNT = jnp.asarray(_TRI_COUNT_NP)


class MTConfig(NamedTuple):
    res: int
    max_verts: int
    max_faces: int
    max_cubes: int
    # narrow-band block compaction: capacity of 16-cube z-run blocks touching
    # the surface (0 → max_cubes // 2).  Only used when enabled AND res is
    # divisible by 16 — otherwise the flat res³ compaction path runs.
    # Overflow never truncates: a lax.cond falls back to the flat path.
    # Trade-off measured on v5e at 288³: clean surfaces ~50 ms faster; a
    # saturated/noisy field pays ~35 ms cond+reduce overhead — so enable it
    # for real training configs, not for worst-case benchmarking.
    max_blocks: int = 0
    use_narrow_band: bool = False


class MeshResult(NamedTuple):
    verts: jnp.ndarray        # (MAX_V, 3) in [0,1]³, padded
    faces: jnp.ndarray        # (MAX_F, 3) int32 vertex indices, padded
    n_verts: jnp.ndarray      # () int32
    n_faces: jnp.ndarray      # () int32
    vert_valid: jnp.ndarray   # (MAX_V,) bool
    face_valid: jnp.ndarray   # (MAX_F,) bool
    overflow: jnp.ndarray     # () int32: dropped cubes/verts/faces (any)


# Corner-bit index of each _EDGE_DIRS offset ((dx,dy,dz) → dx*4+dy*2+dz).
_CLASS_CORNER_BIT = np.array(
    [d[0] * 4 + d[1] * 2 + d[2] for d in _EDGE_DIRS], np.int32)


def marching_tets(phi, cfg: MTConfig) -> MeshResult:
    """Extract the φ=0 iso-surface of a res³ field (outside>0).

    Cube-centric: active cubes are compacted FIRST, and the vertex universe is
    (max_cubes, 7) anchored edge classes instead of (res³, 7) lattice edges —
    at 288³ that is a 91x reduction of the arrays the compaction cumsum /
    binary searches touch.  The cube lattice is res³ with edge-replicated sign
    padding: anchors p ≤ res-2 are real cubes (they emit faces); the boundary
    pseudo-cubes only OWN their 7 anchored lattice edges, so every face
    corner's edge id resolves to an in-grid owner cube.  Every crossing edge's
    owner cube is active (it contains both endpoints), so the emitted vertex
    set — and its (anchor_pid·7+class)-sorted order — is identical to
    enumerating all res³·7 lattice edges."""
    res = cfg.res
    phi = phi.reshape(res, res, res)
    sign = phi > 0.0                                     # True = outside

    # ---- active cubes over the res³ (edge-padded) cube lattice ----
    S = jnp.pad(sign, ((0, 1), (0, 1), (0, 1)), mode="edge")
    # pack the 8 corner signs of each cube: corner bit layout matches _CORNERS
    corners = []
    for i in range(8):
        dx, dy, dz = (i >> 2) & 1, (i >> 1) & 1, i & 1
        corners.append(S[dx:dx + res, dy:dy + res, dz:dz + res])
    packed = sum(cor.astype(jnp.int32) << i for i, cor in enumerate(corners))

    def flat_compact(_):
        cube_active = (packed != 0) & (packed != 255)
        cube_ids, n_cubes = compact_indices(cube_active.reshape(-1),
                                            cfg.max_cubes, res * res * res)
        return cube_ids, packed.reshape(-1)[cube_ids], n_cubes

    if cfg.use_narrow_band and res % 16 == 0:
        # Narrow-band fast path: blocks are z-runs of 16 cubes — a pure
        # reshape of `packed` (no relayout copy), and block-major order IS
        # ascending-gid order, so no re-sort either.  Compact surface blocks
        # (one cheap reduce + small scatter), row-gather ONLY those, and
        # scatter-compact their 16·max_blocks cubes — no binary search of
        # the res³ universe (74 ms → ~25 ms at 288³ on v5e).
        # A lax.cond falls back to the exact flat compaction whenever the
        # block capacity would truncate (noisy fields early in training) or
        # the cube capacity saturates (subset choice must match flat) — so
        # this path NEVER changes results, only speed.
        max_blocks = cfg.max_blocks or max(cfg.max_cubes // 2, 1024)
        pb = packed.reshape(-1, 16)                      # (NB,16) = gid order
        act_blk = (pb != 0) & (pb != 255)
        blk_any = jnp.any(act_blk, axis=1)
        # the cond predicate needs only COUNTS (cheap fused reduces); the
        # block compaction itself runs inside the taken branch so the
        # saturated fallback pays almost nothing for the fast path's existence
        n_act = jnp.sum(act_blk.astype(jnp.int32))
        n_blk = jnp.sum(blk_any.astype(jnp.int32))

        def blocked_compact(_):
            blk_ids, _ = compact_indices(blk_any, max_blocks, pb.shape[0] - 1)
            blk_ok = jnp.arange(max_blocks) < n_blk
            rows = pb[blk_ids]                           # (MB,16) row gather
            act2 = (rows != 0) & (rows != 255) & blk_ok[:, None]
            slots2, n_cubes = compact_indices(act2.reshape(-1),
                                              cfg.max_cubes, 0)
            ok = jnp.arange(cfg.max_cubes) < n_cubes
            case8 = rows.reshape(-1)[slots2]
            gid = blk_ids[slots2 // 16] * 16 + slots2 % 16
            cube_ids = jnp.where(ok, gid, res * res * res)
            return cube_ids, case8, n_cubes

        cube_ids, case8, n_cubes = jax.lax.cond(
            (n_blk <= max_blocks) & (n_act <= cfg.max_cubes),
            blocked_compact, flat_compact, None)
    else:
        cube_ids, case8, n_cubes = flat_compact(None)
    cube_ok = jnp.arange(cfg.max_cubes) < jnp.minimum(n_cubes, cfg.max_cubes)

    # in the res³ lattice, a cube's id IS its anchor lattice-point id
    cz = cube_ids % res
    cy = (cube_ids // res) % res
    cx = cube_ids // (res * res)
    cpos = jnp.stack([cx, cy, cz], axis=-1)              # (C,3)

    # ---- vertices: the 7 anchored edge classes of each active cube ----
    # crossing test straight from the packed corner-sign byte (no phi gathers)
    s_anchor = case8 & 1                                            # corner 0
    s_nb = (case8[:, None] >> jnp.asarray(_CLASS_CORNER_BIT)[None]) & 1
    in_grid = jnp.all(cpos[:, None, :] + jnp.asarray(_EDGE_DIRS)[None]
                      <= res - 1, axis=-1)                          # (C,7)
    edge_cross = (s_nb != s_anchor[:, None]) & in_grid & cube_ok[:, None]

    slots, n_verts = compact_indices(edge_cross.reshape(-1), cfg.max_verts,
                                     cfg.max_cubes * 7 - 1)
    vert_valid = jnp.arange(cfg.max_verts) < n_verts
    vcube = slots // 7
    klass = slots % 7
    # global edge ids (anchor_pid·7+class): ascending because cube_ids are
    # ascending and compaction preserves order; pad the tail with the gid
    # upper bound res³·7 (must stay < 2**30 for the rank_in_sorted key
    # packing — holds through res 512) so the array stays sorted.
    edge_gids = jnp.where(vert_valid, cube_ids[vcube] * 7 + klass,
                          jnp.int32(res * res * res * 7))

    p0 = cpos[vcube]                                     # (V,3) anchor point
    d = jnp.asarray(_EDGE_DIRS)[klass]                   # (V,3)
    p1 = jnp.clip(p0 + d, 0, res - 1)

    phi_flat = phi.reshape(-1)
    f0 = phi_flat[(p0[:, 0] * res + p0[:, 1]) * res + p0[:, 2]]
    f1 = phi_flat[(p1[:, 0] * res + p1[:, 1]) * res + p1[:, 2]]
    denom = f0 - f1
    t = f0 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)
    verts = (p0.astype(jnp.float32) + t[:, None] * d.astype(jnp.float32)) / (res - 1)
    verts = jnp.where(vert_valid[:, None], verts, 0.0)

    # ---- faces: only real cubes (anchor ≤ res-2 in every dim) emit ----
    face_src_ok = cube_ok & jnp.all(cpos <= res - 2, axis=-1)

    # ---- faces: per cube × 6 tets × ≤2 tris ----
    # tet case: 4 bits, bit v set when corner INSIDE (sign False → φ<0)
    tet_corner_bits = []  # (6,4) which cube-corner bit each tet corner reads
    tc = jnp.asarray(_TETS)                              # (6,4)
    corner_in = (~((case8[:, None, None] >> tc[None]) & 1).astype(bool))  # (C,6,4)
    tet_case = sum(corner_in[..., v].astype(jnp.int32) << v for v in range(4))  # (C,6)

    # gather-free lookup (tiny_lut): (C,6) indices into the 6x16 count table
    counts = tiny_lut(jnp.arange(6, dtype=jnp.int32)[None, :] * 16 + tet_case,
                      _TRI_COUNT_NP)                               # (C,6)

    tri_valid = (jnp.arange(2)[None, None, :] < counts[:, :, None]) \
        & face_src_ok[:, None, None]                               # (C,6,2)
    # compact face slots FIRST, then do ALL per-face gathers (table lookup,
    # anchor offsets, global edge ids, binary search) at MAX_F scale only —
    # never materializing (C,6,2,3)-sized edge-id tensors.
    face_slots, n_faces_total = compact_indices(tri_valid.reshape(-1),
                                                cfg.max_faces, 0)
    fcube = face_slots // 12
    frem = face_slots % 12
    ftet = frem // 2
    fk = frem % 2
    fcase = tet_case[fcube, ftet]                                  # (MAX_F,)
    # tri table stored +1 so entries are non-negative for tiny_lut; the -1
    # padding maps to 0 exactly as the old jnp.where(ftris >= 0, ftris, 0)
    base = ((ftet * 16 + fcase) * 2 + fk) * 3
    ftris = tiny_lut(base[:, None] + jnp.arange(3, dtype=jnp.int32)[None],
                     _TRI_TABLE_NP + 1)                            # (MAX_F,3)
    ftris = jnp.maximum(ftris - 1, 0)
    # anchor offset + class folded into ONE 6×6 table of global-edge-id
    # deltas: geid = (cube_gid + anchor_gid_delta)·7 + class
    #              = cube_gid·7 + (anchor_gid_delta·7 + class)
    a = _EDGE_ANCHOR_NP
    geid_delta_np = (((a[..., 0] * res + a[..., 1]) * res + a[..., 2]) * 7
                     + _EDGE_CLASS_NP)                             # (6,6) np
    face_geid = (cube_ids[fcube][:, None] * 7
                 + tiny_lut(ftet[:, None] * 6 + ftris, geid_delta_np))
    if res * res * res * 7 < 2 ** 30:   # static: gid*2+tag fits int32
        vidx = rank_in_sorted(edge_gids, face_geid.reshape(-1), side="left")
    else:                               # grid_res > 512: key packing would
        vidx = searchsorted1d(edge_gids, face_geid.reshape(-1), side="left")
    faces = jnp.minimum(vidx, cfg.max_verts - 1).reshape(-1, 3)
    face_valid = jnp.arange(cfg.max_faces) < jnp.minimum(n_faces_total, cfg.max_faces)
    faces = jnp.where(face_valid[:, None], faces, 0)

    overflow = (jnp.maximum(n_cubes - cfg.max_cubes, 0)
                + jnp.maximum(n_verts - cfg.max_verts, 0)
                + jnp.maximum(n_faces_total - cfg.max_faces, 0))
    return MeshResult(verts=verts, faces=faces,
                      n_verts=jnp.minimum(n_verts, cfg.max_verts),
                      n_faces=jnp.minimum(n_faces_total, cfg.max_faces),
                      vert_valid=vert_valid, face_valid=face_valid,
                      overflow=overflow)

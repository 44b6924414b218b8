"""Differentiable triangle mesh rasterization, TPU-native.

Replaces nvdiffrast (`dr.rasterize` / `dr.interpolate` / `dr.antialias`, used
by the reference in utils/renderer.py:33-121) with a tile-binned z-buffer
rasterizer built on the same binning machinery as the Gaussian splatter:

  render_mesh — hard z-buffered coverage with perspective-correct barycentric
      color interpolation.  Gradients flow to vertex colors everywhere and to
      vertex positions inside covered triangles (through the barycentrics).
  render_mask — SOFT silhouette: per-pixel  1 − Π_f (1 − σ(−d_f/τ))  where
      d_f is the screen-space signed distance to triangle f (negative
      inside).  This replaces nvdiffrast's antialias edge-gradient
      (which the reference relies on for its ×100-weighted mask loss,
      train.py:266-267) with a SoftRas/pytorch3d-style silhouette whose
      gradient moves vertices across the silhouette — smoother and better
      conditioned than nvdiffrast's single-pixel AA gradient, and fully
      vectorizable on the VPU.  τ→0 recovers the hard mask; a hard mask is
      also returned for eval parity.  Known SoftRas artifact: pixels exactly
      on interior (shared) edges dip to 1-(1-σ)²≈0.75 — a 1px-wide seam with
      negligible, direction-symmetric loss contribution.

Camera convention: verts are transformed by an OpenGL-style modelview `pose`
(w2c, camera looking down −z; see cameras.Camera.mesh_pose) and projection
(cameras.gl_projection_from_K); pixel y increases downward (the reference
flips the nvdiffrast output to this convention).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import bin_rects, quantize_depth, rect_from_bbox


class MeshRasterConfig(NamedTuple):
    width: int
    height: int
    tile_h: int = 16
    tile_w: int = 16
    max_per_tile: int = 256
    max_dup: int = 1 << 21
    tile_chunk: int = 64
    sigma: float = 1.0        # soft-silhouette bandwidth in *pixels*
    eps_w: float = 1e-4       # near-plane guard
    use_pallas: bool = False  # fused VMEM shading kernel (mesh_raster_pallas)
    # Drop back-facing triangles before binning.  Valid ONLY for closed
    # meshes with consistent outward winding (marching_tets guarantees this;
    # see its orientation test) — halves per-tile face load, and any faces
    # dropped beyond max_per_tile are then strictly occluded interior
    # geometry, so the z-buffer image is unaffected.  The soft silhouette
    # changes imperceptibly (each culled back face is screen-coincident with
    # a kept front face on a closed surface).
    cull_backface: bool = False

    @property
    def tiles_x(self):
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self):
        return -(-self.height // self.tile_h)

    @property
    def num_tiles(self):
        return self.tiles_x * self.tiles_y


def project_verts(verts, pose, proj, cfg: MeshRasterConfig):
    """world verts (V,3) → screen xy (V,2), clip w (V,), ok mask."""
    ones = jnp.ones((verts.shape[0], 1), verts.dtype)
    hom = jnp.concatenate([verts, ones], axis=-1)
    # HIGHEST everywhere a dot feeds geometry: TPU default matmul is
    # one-pass bf16 (see ops/splat.py preprocess note)
    cam = jnp.matmul(hom, pose.T, precision=jax.lax.Precision.HIGHEST)
    clip = jnp.matmul(cam, proj.T,
                      precision=jax.lax.Precision.HIGHEST)  # GL clip space
    w = clip[:, 3]
    ok = w > cfg.eps_w
    w_safe = jnp.where(ok, w, 1.0)
    ndc = clip[:, :3] / w_safe[:, None]
    px = (ndc[:, 0] * 0.5 + 0.5) * cfg.width
    py = (0.5 - ndc[:, 1] * 0.5) * cfg.height      # y down (image convention)
    return jnp.stack([px, py], -1), w, ok


def _face_screen(verts, faces, face_valid, pose, proj, cfg: MeshRasterConfig,
                 tri_w=None):
    """Per-face screen triangles; returns (F,3,2), inv_w (F,3), valid.

    Gathers WORLD verts per face corner and projects the corners directly
    (projection is linear, so this is bit-for-bit the per-vertex projection
    up to fp order).  Callers that also evaluate the Laplacian regularizer
    pass the SAME pre-gathered ``tri_w = verts[faces]`` tensor to both
    (train/step.py mesh branch), so the two modules share ONE 3F-row gather
    and their per-corner cotangents sum elementwise before a single
    scatter-add in the VJP — instead of a separate gather + scatter each.
    """
    if tri_w is None:
        tri_w = verts[faces]                       # (F,3,3) shared face gather
    ones = jnp.ones(tri_w.shape[:2] + (1,), verts.dtype)
    hom = jnp.concatenate([tri_w, ones], axis=-1)  # (F,3,4)
    clip = jnp.matmul(hom, jnp.matmul(proj, pose, precision=jax.lax.Precision.HIGHEST).T,
                      precision=jax.lax.Precision.HIGHEST)   # GL clip space
    w = clip[..., 3]                               # (F,3)
    ok = w > cfg.eps_w
    w_safe = jnp.where(ok, w, 1.0)
    ndc = clip[..., :3] / w_safe[..., None]
    px = (ndc[..., 0] * 0.5 + 0.5) * cfg.width
    py = (0.5 - ndc[..., 1] * 0.5) * cfg.height    # y down (image convention)
    tri = jnp.stack([px, py], -1)                  # (F,3,2)
    valid = face_valid & ok.all(axis=1)
    inv_w = 1.0 / w_safe
    return tri, inv_w, valid


def rasterize(verts, faces, face_valid, pose, proj, cfg: MeshRasterConfig,
              tri_w=None):
    """Bin faces and z-buffer each tile.

    Returns dict with per-pixel winner face id (H,W) int32 (-1 = background),
    perspective-correct barycentrics (H,W,3), plus the projection tensors
    needed by shading (kept for reuse, all differentiable).
    """
    tri, inv_w, fvalid = _face_screen(verts, faces, face_valid, pose, proj, cfg,
                                      tri_w=tri_w)

    sg = jax.lax.stop_gradient
    tri_s = sg(tri)
    if cfg.cull_backface:
        # screen-space signed area (y-down): outward-wound front faces of a
        # closed mesh have one sign; the cull decision is non-differentiable
        # by design (a discrete visibility choice, like nvdiffrast's culling)
        e1 = tri_s[:, 1] - tri_s[:, 0]
        e2 = tri_s[:, 2] - tri_s[:, 0]
        area2 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        fvalid = fvalid & (area2 < 0.0)
    pad = 1.0  # 1px guard so soft-silhouette support isn't clipped at bbox
    x0 = jnp.floor(tri_s[..., 0].min(axis=1) - pad)
    x1 = jnp.ceil(tri_s[..., 0].max(axis=1) + pad)
    y0 = jnp.floor(tri_s[..., 1].min(axis=1) - pad)
    y1 = jnp.ceil(tri_s[..., 1].max(axis=1) + pad)
    tx0, ty0, nx, ny = rect_from_bbox(x0, y0, x1, y1, tile_w=cfg.tile_w,
                                      tile_h=cfg.tile_h, tiles_x=cfg.tiles_x,
                                      tiles_y=cfg.tiles_y)
    depth = sg(1.0 / jnp.maximum(inv_w.mean(axis=1), 1e-6))
    bins = bin_rects(tx0, ty0, nx, ny, quantize_depth(depth, fvalid), fvalid,
                     tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
                     max_dup=cfg.max_dup, max_per_tile=cfg.max_per_tile)
    # packed per-face shading attributes: one row gather per tile slot
    # downstream (lanes 0..5 screen tri, 6..8 inv_w)
    pack = jnp.concatenate([tri.reshape(-1, 6), inv_w], axis=-1)
    return dict(bins=bins, tri=tri, inv_w=inv_w, pack=pack, fvalid=fvalid)


def _tile_pixels(tile_ids, cfg):
    ty = tile_ids // cfg.tiles_x
    tx = tile_ids % cfg.tiles_x
    P = cfg.tile_h * cfg.tile_w
    lx = jnp.arange(cfg.tile_w, dtype=jnp.float32) + 0.5
    ly = jnp.arange(cfg.tile_h, dtype=jnp.float32) + 0.5
    px = tx[:, None].astype(jnp.float32) * cfg.tile_w + lx[None, :]
    py = ty[:, None].astype(jnp.float32) * cfg.tile_h + ly[None, :]
    pxx = jnp.tile(px[:, None, :], (1, cfg.tile_h, 1)).reshape(-1, P)
    pyy = jnp.tile(py[:, :, None], (1, 1, cfg.tile_w)).reshape(-1, P)
    return pxx, pyy


# Minimum doubled screen area (px²) for a face to take part in hard shading.
# A face this small cannot meaningfully cover a pixel center, and dividing by
# a near-zero (or, worse, sign-flipped by a naive clamp) area makes |bary|
# explode to ~1e15: such slivers can spuriously win the z-buffer, their rgb
# overflows f32 through the pw-normalization cancellation, and the bary
# Jacobian (∝ e/area² ~ 1e24) mints 0·inf = NaN in EVERY backward that
# touches the tile — the root cause of the r3 quality-run collapse (the
# appearance net went NaN in one update at iter 5005; tools/grad_bisect.py).
# Degenerate faces keep their soft-silhouette contribution (edge distances
# are division-free) — only barycentric interpolation is gated.
AREA_MIN = 1e-4


def _bary_2d(tri, px, py):
    """Screen-space barycentrics of pixels vs triangles.

    tri: (C,K,3,2); px,py: (C,P).  Returns bary (C,K,P,3), the doubled
    signed area (C,K,1) — negative for back-facing (still rendered,
    nvdiffrast-style double-sided) — and the non-degenerate mask
    (|area| >= AREA_MIN, (C,K,1)); bary rows of degenerate faces are
    computed against a unit area (bounded, gradient-dead via the mask).
    """
    ax, ay = tri[..., 0, 0][..., None], tri[..., 0, 1][..., None]   # (C,K,1)
    bx, by = tri[..., 1, 0][..., None], tri[..., 1, 1][..., None]
    cx, cy = tri[..., 2, 0][..., None], tri[..., 2, 1][..., None]
    pxe = px[:, None, :]
    pye = py[:, None, :]
    # edge functions
    e0 = (cx - bx) * (pye - by) - (cy - by) * (pxe - bx)   # opposite vert a
    e1 = (ax - cx) * (pye - cy) - (ay - cy) * (pxe - cx)   # opposite vert b
    e2 = (bx - ax) * (pye - ay) - (by - ay) * (pxe - ax)   # opposite vert c
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)   # (C,K,1)
    live = jnp.abs(area) >= AREA_MIN
    area_safe = jnp.where(live, area, 1.0)
    bary = jnp.stack([e0, e1, e2], axis=-1) / area_safe[..., None]
    return bary, area, live


def _edge_distance(tri, px, py):
    """Unsigned distance from each pixel to the nearest triangle edge segment.

    tri: (C,K,3,2). Returns (C,K,P).
    """
    d2min = None
    for i in range(3):
        a = tri[..., i, :]                     # (C,K,2)
        b = tri[..., (i + 1) % 3, :]
        abx = (b - a)[..., 0][..., None]
        aby = (b - a)[..., 1][..., None]
        apx = px[:, None, :] - a[..., 0][..., None]
        apy = py[:, None, :] - a[..., 1][..., None]
        denom = abx * abx + aby * aby
        t = jnp.clip((apx * abx + apy * aby) / jnp.maximum(denom, 1e-12), 0.0, 1.0)
        dx = apx - t * abx
        dy = apy - t * aby
        d2 = dx * dx + dy * dy
        d2min = d2 if d2min is None else jnp.minimum(d2min, d2)
    return jnp.sqrt(d2min + 1e-12)


def _shade_chunk(tile_ids, tidx, rast, colors_v, faces, bg, cfg, want_soft):
    """Z-buffer + shade one chunk of tiles.

    Returns (rgb (C,P,3), hard (C,P), soft (C,P) or None, faceid (C,P)).
    """
    P = cfg.tile_h * cfg.tile_w
    gi = jnp.maximum(tidx, 0)                       # (C,K)
    gvalid = tidx >= 0
    g = rast["pack"][gi]                            # (C,K,9) one gather
    tri = g[..., 0:6].reshape(g.shape[:2] + (3, 2))
    inv_w = g[..., 6:9]                             # (C,K,3)
    px, py = _tile_pixels(tile_ids, cfg)            # (C,P)

    bary, area, alive = _bary_2d(tri, px, py)       # (C,K,P,3),(C,K,1)
    inside = (bary >= 0.0).all(axis=-1) & gvalid[:, :, None] & alive  # (C,K,P)
    zi = jnp.einsum("ckpj,ckj->ckp", bary, inv_w,
                    precision=jax.lax.Precision.HIGHEST)   # interpolated 1/w
    zkey = jnp.where(inside, zi, -jnp.inf)
    win = jnp.argmax(zkey, axis=1)                  # (C,P) nearest face slot
    covered = jnp.take_along_axis(inside, win[:, None, :], axis=1)[:, 0, :]

    # gather winner data
    bary_w = jnp.take_along_axis(
        bary, win[:, None, :, None].astype(jnp.int32), axis=1)[:, 0]  # (C,P,3)
    invw_w = jax.vmap(lambda iw, wn: iw[wn])(inv_w, win)              # (C,P,3)
    # perspective-correct weights
    pw = bary_w * invw_w
    pw = pw / jnp.maximum(pw.sum(-1, keepdims=True), 1e-12)

    fid = jnp.take_along_axis(gi, win, axis=1)      # (C,P) face index
    vidx = faces[fid]                               # (C,P,3)
    vcol = colors_v[vidx]                           # (C,P,3,3)
    rgb = jnp.einsum("cpj,cpjd->cpd", pw, vcol,
                     precision=jax.lax.Precision.HIGHEST)
    rgb = jnp.where(covered[..., None], rgb, bg[None, None, :])
    fid_out = jnp.where(covered, fid, -1)

    soft = None
    if want_soft:
        d = _edge_distance(tri, px, py)
        signed = jnp.where(inside, -d, d)           # negative inside
        s = jax.nn.sigmoid(-signed / cfg.sigma)
        s = jnp.where(gvalid[:, :, None], s, 0.0)
        log_keep = jnp.log1p(-jnp.clip(s, 0.0, 1.0 - 1e-6))
        soft = 1.0 - jnp.exp(jnp.sum(log_keep, axis=1))   # (C,P)
    return rgb, covered.astype(jnp.float32), soft, fid_out


def _untile(x, cfg, channels=None):
    T = cfg.num_tiles
    x = x[:T]  # drop lax.map chunk padding
    if channels:
        x = x.reshape(cfg.tiles_y, cfg.tiles_x, cfg.tile_h, cfg.tile_w, channels)
        x = x.transpose(0, 2, 1, 3, 4).reshape(cfg.tiles_y * cfg.tile_h,
                                               cfg.tiles_x * cfg.tile_w, channels)
    else:
        x = x.reshape(cfg.tiles_y, cfg.tiles_x, cfg.tile_h, cfg.tile_w)
        x = x.transpose(0, 2, 1, 3).reshape(cfg.tiles_y * cfg.tile_h,
                                            cfg.tiles_x * cfg.tile_w)
    return x[:cfg.height, :cfg.width]


def _render_mesh_pallas(rast, faces, vtx_color, bg, cfg: MeshRasterConfig,
                        want_soft: bool):
    """Fused-VMEM shading via the Pallas kernel (mesh_raster_pallas.py).

    Gathers per-tile face attributes into the kernel's (T,K,24) layout once
    (instead of per-chunk inside lax.map); backward runs through the jnp twin.
    """
    from .mesh_raster_pallas import make_shade_tiles

    bins = rast["bins"]
    tidx = bins.tile_idx                             # (T,K)
    T, K = tidx.shape
    gi = jnp.maximum(tidx, 0)
    gvalid = (tidx >= 0).astype(jnp.float32)
    attrs = jnp.concatenate([
        rast["pack"][gi],                            # 0..5 screen tri, 6..8 inv_w
        gvalid[..., None],                           # 9
        vtx_color[faces[gi]].reshape(T, K, 9),       # 10..18
        gi[..., None].astype(jnp.float32),           # 19 face index
        jnp.zeros((T, K, 4)),                        # pad → 24 lanes
    ], axis=-1)
    tids = jnp.arange(T, dtype=jnp.float32)
    origins = jnp.stack([(tids % cfg.tiles_x) * cfg.tile_w,
                         (tids // cfg.tiles_x) * cfg.tile_h], axis=-1)
    rgb, hard, soft, fid = make_shade_tiles(
        cfg.tiles_x, cfg.tile_h, cfg.tile_w, cfg.sigma)(attrs, origins)
    rgb = rgb + (1.0 - hard)[..., None] * bg[None, None, :]
    fid_out = jnp.where(hard > 0.5, fid.astype(jnp.int32), -1)

    out = dict(
        rgb=_untile(rgb, cfg, 3),
        mask=_untile(hard, cfg),
        face_id=_untile(fid_out, cfg),
        aux=dict(num_duplicates=bins.num_duplicates,
                 dup_overflow=bins.dup_overflow,
                 tile_overflow=bins.tile_overflow),
    )
    if want_soft:
        out["soft_mask"] = _untile(soft, cfg)
    _add_st_mask(out)
    return out


def phong_vertex_colors(verts, faces, face_valid, cam_center, light_dir=None,
                        ambient=0.5, diffuse=0.3, specular=0.2,
                        shininess=10.0):
    """Blinn-Phong vertex shading for the shape render.

    Mirrors the reference's pytorch3d SoftPhongShader setup
    (utils/renderer.py mesh_shape_renderer :236-319: white verts,
    DirectionalLights aimed from the camera position at the mesh center,
    Materials(specular 0.2, shininess 10), pytorch3d default ambient 0.5 /
    diffuse 0.3).  Shading is per-vertex (Gouraud) with area-weighted vertex
    normals — a documented simplification of pytorch3d's per-pixel Phong.
    """
    f = faces
    vn = vertex_normals(verts, faces, face_valid)

    if light_dir is None:
        v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
        corners = jnp.where(face_valid[:, None], v0 + v1 + v2, 0.0)
        wsum = jnp.maximum(jnp.sum(face_valid) * 3.0, 1.0)
        center = corners.sum(0) / wsum
        light_dir = center - jnp.asarray(cam_center)
    l = -jnp.asarray(light_dir, jnp.float32)
    l = l / (jnp.linalg.norm(l) + 1e-9)
    view = jnp.asarray(cam_center) - verts
    view = view / (jnp.linalg.norm(view, axis=-1, keepdims=True) + 1e-9)
    ndl = jnp.abs(jnp.sum(vn * l[None, :], -1, keepdims=True))
    h = l[None, :] + view
    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-9)
    ndh = jnp.abs(jnp.sum(vn * h, -1, keepdims=True))
    shade = ambient + diffuse * ndl + specular * ndh ** shininess
    return jnp.clip(shade, 0.0, 1.0) * jnp.ones((1, 3))


def vertex_normals(verts, faces, face_valid):
    """Area-weighted vertex normals (pytorch3d ``verts_normals`` convention)."""
    f = faces
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    fn = jnp.where(face_valid[:, None], fn, 0.0)
    vn = jnp.zeros_like(verts).at[f.reshape(-1)].add(jnp.repeat(fn, 3, axis=0))
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-9)


def render_mesh_shape(verts, faces, face_valid, pose, proj, cam_center,
                      cfg: MeshRasterConfig, bg_color=None, light_dir=None,
                      ambient=0.5, diffuse=0.3, specular=0.2, shininess=10.0):
    """Per-pixel Blinn-Phong shape render (white mesh on white background).

    Matches the reference's pytorch3d SoftPhongShader setup
    (utils/renderer.py mesh_shape_renderer :236-319: white verts,
    DirectionalLights aimed from the camera position at the mesh center,
    Materials(specular 0.2, shininess 10), pytorch3d defaults ambient 0.5 /
    diffuse 0.3).  Unlike ``phong_vertex_colors`` (Gouraud, kept for cheap
    in-training dumps), this interpolates vertex NORMALS per pixel and
    evaluates the lighting model per pixel — pytorch3d's HardPhongShader
    semantics — so specular highlights and shading on coarse meshes match
    the reference instead of being vertex-banded.

    Rasterizes once for visibility (winner ``face_id`` per pixel), then
    shades per pixel: perspective-correct barycentrics from the winning
    triangle's projected corners → interpolated normal + world position →
    Blinn-Phong.  Eval-only path (H·W gathers), not on the train step.
    """
    bg = jnp.ones(3, jnp.float32) if bg_color is None else jnp.asarray(
        bg_color, jnp.float32)
    white = jnp.ones((verts.shape[0], 3), jnp.float32)
    out = render_mesh(verts, faces, face_valid, white, pose, proj, bg, cfg,
                      want_soft=False)
    fid = out["face_id"]                                    # (H,W)
    covered = fid >= 0
    f = faces[jnp.maximum(fid, 0)]                          # (H,W,3)

    # project all verts once; per-pixel gather of the 3 winning corners
    scr, w, _ = project_verts(verts, pose, proj, cfg)       # (V,2),(V,)
    inv_w_v = 1.0 / jnp.maximum(w, cfg.eps_w)
    tri = scr[f]                                            # (H,W,3,2)
    inv_w = inv_w_v[f]                                      # (H,W,3)

    H, W = fid.shape
    px = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5    # pixel centers
    py = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    ax, ay = tri[..., 0, 0], tri[..., 0, 1]
    bx, by = tri[..., 1, 0], tri[..., 1, 1]
    cx, cy = tri[..., 2, 0], tri[..., 2, 1]
    e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
    e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
    e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    area = jnp.where(jnp.abs(area) < AREA_MIN, 1.0, area)  # see AREA_MIN note
    bary = jnp.stack([e0, e1, e2], axis=-1) / area[..., None]   # (H,W,3)
    pw = bary * inv_w                                       # perspective-correct
    pw = pw / jnp.maximum(pw.sum(-1, keepdims=True), 1e-12)

    vn = vertex_normals(verts, faces, face_valid)
    n = jnp.einsum("hwj,hwjd->hwd", pw, vn[f],
                   precision=jax.lax.Precision.HIGHEST)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    p = jnp.einsum("hwj,hwjd->hwd", pw, verts[f],
                   precision=jax.lax.Precision.HIGHEST)      # world position

    if light_dir is None:
        v0 = verts[faces[:, 0]]
        wsum = jnp.maximum(jnp.sum(face_valid), 1.0)
        center = jnp.sum(jnp.where(face_valid[:, None], v0, 0.0), 0) / wsum
        light_dir = center - jnp.asarray(cam_center)
    l = -jnp.asarray(light_dir, jnp.float32)
    l = l / (jnp.linalg.norm(l) + 1e-9)
    view = jnp.asarray(cam_center) - p
    view = view / (jnp.linalg.norm(view, axis=-1, keepdims=True) + 1e-9)
    ndl = jnp.abs(jnp.sum(n * l, -1, keepdims=True))
    hvec = l + view
    hvec = hvec / (jnp.linalg.norm(hvec, axis=-1, keepdims=True) + 1e-9)
    ndh = jnp.abs(jnp.sum(n * hvec, -1, keepdims=True))
    shade = jnp.clip(ambient + diffuse * ndl + specular * ndh ** shininess,
                     0.0, 1.0)
    rgb = jnp.where(covered[..., None], shade * jnp.ones((1, 1, 3)), bg)
    return dict(rgb=rgb, mask=covered.astype(jnp.float32), face_id=fid,
                normal=jnp.where(covered[..., None], n, 0.0),
                position=jnp.where(covered[..., None], p, 0.0))


def render_mesh(verts, faces, face_valid, vtx_color, pose, proj, bg_color,
                cfg: MeshRasterConfig, want_soft: bool = True, tri_w=None):
    """Full mesh render (reference: utils/renderer.py render_mask :33-66 +
    render_mesh :69-121 in one pass).

    Returns dict: rgb (H,W,3), mask (H,W) hard coverage, soft_mask (H,W)
    differentiable silhouette, face_id (H,W), aux (binning overflow counters).
    ``tri_w``: optional pre-gathered verts[faces] shared with the Laplacian.
    """
    rast = rasterize(verts, faces, face_valid, pose, proj, cfg, tri_w=tri_w)
    bins = rast["bins"]
    bg = jnp.asarray(bg_color, jnp.float32)
    if cfg.use_pallas:
        return _render_mesh_pallas(rast, faces, vtx_color, bg, cfg, want_soft)

    T, C = cfg.num_tiles, cfg.tile_chunk
    n_chunks = -(-T // C)
    padn = n_chunks * C - T
    all_tiles = jnp.arange(T + padn, dtype=jnp.int32) % T
    tidx = bins.tile_idx
    tidx_pad = (jnp.pad(tidx, ((0, padn), (0, 0)), constant_values=-1)
                if padn else tidx)

    # remat (see splat.composite): avoid storing per-chunk shading tensors
    # for backward — recompute instead.
    @jax.checkpoint
    def body(args):
        tids, tix = args
        return _shade_chunk(tids, tix, rast, vtx_color, faces, bg, cfg, want_soft)

    tids = all_tiles.reshape(n_chunks, C)
    tix = tidx_pad.reshape(n_chunks, C, cfg.max_per_tile)
    rgb, hard, soft, fid = jax.lax.map(body, (tids, tix))

    out = dict(
        rgb=_untile(rgb.reshape(-1, cfg.tile_h * cfg.tile_w, 3), cfg, 3),
        mask=_untile(hard.reshape(-1, cfg.tile_h * cfg.tile_w), cfg),
        face_id=_untile(fid.reshape(-1, cfg.tile_h * cfg.tile_w), cfg),
        aux=dict(num_duplicates=bins.num_duplicates,
                 dup_overflow=bins.dup_overflow,
                 tile_overflow=bins.tile_overflow),
    )
    if want_soft:
        out["soft_mask"] = _untile(soft.reshape(-1, cfg.tile_h * cfg.tile_w), cfg)
    _add_st_mask(out)
    return out


def _add_st_mask(out):
    """Straight-through trainable mask (the r5 mesh-divergence fix).

    VALUE is the hard z-buffer coverage — nvdiffrast parity: exactly 1.0
    inside the mesh and 0.0 outside, so a mesh matching the GT silhouette has
    EXACTLY zero mask loss, like the reference (train.py:266 takes the mask
    from dr.rasterize + dr.antialias, utils/renderer.py:33-66).  GRADIENT is
    the SoftRas soft silhouette's — dense bidirectional edge gradients.

    Why not the raw soft silhouette (the r1-r4 design): with marching-tets
    triangles ~1px² at 800², EVERY interior pixel is within ~0.5px of a
    shared edge, so the product silhouette saturates at ~0.75-0.95 instead of
    1.0.  Under the reference's x100 L1 mask loss that is a permanent
    "increase coverage" gradient summed over ~10^5 interior pixels — measured
    as the r4 quality-run divergence: density_thres ran 0->0.35 (its clamp)
    within 100 mesh iterations, the mesh saturated its caps, and mask_loss
    could never fall below ~4 even on a correct mesh (train_log.jsonl iters
    5000-9800).  With the straight-through value, interior pixels match GT
    exactly (L1 subgradient 0) and gradients act only in the silhouette
    mismatch band — the reference's antialias regime.
    """
    if "soft_mask" in out:
        soft = out["soft_mask"]
        # grouping matters: (soft - sg(soft)) is an exact IEEE zero, so the
        # value is bit-equal to the hard mask; (hard + soft) - soft is not
        out["st_mask"] = (jax.lax.stop_gradient(out["mask"])
                          + (soft - jax.lax.stop_gradient(soft)))

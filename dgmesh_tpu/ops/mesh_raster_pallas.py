"""Pallas fused tile-shading kernel for the mesh rasterizer.

Fuses ops/mesh_raster._shade_chunk — per-tile z-buffer, winner selection,
perspective-correct color interpolation, and the SoftRas soft silhouette —
into one VMEM-resident kernel (one grid step per tile), the same recipe as
ops/splat_pallas.py.  None of the (K,P) intermediates (barycentrics, edge
distances, z keys) ever touch HBM.  Backward defaults to the fused analytic
Pallas kernel (recompute-in-VMEM, `analytic_bwd=True`); the chunked jnp twin
remains as the autodiff fallback and test oracle.

Replaces the hot path of nvdiffrast (`dr.rasterize/interpolate/antialias`,
reference utils/renderer.py:33-121) at the reference problem size
(800x800, ~50k faces).

Layout: per-tile face attributes are pre-gathered (outside the kernel) into a
(T, K, 24) tensor:
  [0..5]  = screen triangle ax,ay,bx,by,cx,cy
  [6..8]  = clip-space 1/w per vertex
  [9]     = valid
  [10..18]= vertex colors (3 verts x rgb)
  [19]    = face index (float; F < 2^24 so exact)
  [20..23]= padding to 24 lanes

The kernel emits rgb (T,P,3), hard coverage (T,1,P), soft silhouette
(T,1,P), and winner face index (T,1,P) with P = tile_h*tile_w.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38


def _shade_kernel(attr_ref, rgb_ref, hard_ref, soft_ref, fid_ref, *,
                  tile_h: int, tile_w: int, tiles_x: int, sigma: float):
    """One tile: attrs (K,24) f32 in VMEM; tile origin from program_id."""
    K = attr_ref.shape[1]
    P = tile_h * tile_w

    a = attr_ref[0]                                         # (K,24)
    i = pl.program_id(0)
    ox = ((i % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((i // tiles_x) * tile_h).astype(jnp.float32)

    # pixel centers as a flat (1,P) row-major index (Mosaic cannot reshape
    # (tile_h,tile_w) → (1,P) in-kernel; derive x/y with mod/div instead)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pidx % tile_w).astype(jnp.float32) + ox + 0.5
    py = (pidx // tile_w).astype(jnp.float32) + oy + 0.5

    ax, ay = a[:, 0:1], a[:, 1:2]                           # (K,1)
    bx, by = a[:, 2:3], a[:, 3:4]
    cx, cy = a[:, 4:5], a[:, 5:6]
    iw0, iw1, iw2 = a[:, 6:7], a[:, 7:8], a[:, 8:9]
    valid = a[:, 9:10] > 0.5

    # screen-space edge functions → barycentrics (double-sided, like the
    # XLA path: dividing by the signed area makes back faces renderable too)
    e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)      # (K,P)
    e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
    e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)    # (K,1)
    # AREA_MIN gate (see ops/mesh_raster.py): sub-pixel slivers are excluded
    # from hard shading — a naive tiny-area clamp sign-flips back-wound
    # slivers into spuriously-"inside" z-buffer winners with ~1e15 barys,
    # whose overflow/Jacobians minted the r3 collapse NaNs
    area_live = jnp.abs(area) >= 1e-4
    area = jnp.where(area_live, area, 1.0)
    b0, b1, b2 = e0 / area, e1 / area, e2 / area

    inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) & valid & area_live
    zi = b0 * iw0 + b1 * iw1 + b2 * iw2                     # interpolated 1/w
    zkey = jnp.where(inside, zi, NEG)
    zmax = jnp.max(zkey, axis=0, keepdims=True)             # (1,P)
    ismax = ((zkey >= zmax) & inside).astype(jnp.float32)   # (K,P)

    # first-max tie break: inclusive prefix count via a lower-triangular
    # MXU matmul (cumsum primitive is not lowerable on TPU Pallas)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tril = (col <= row).astype(jnp.float32)
    cnt = jax.lax.dot_general(tril, ismax, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    win = ismax * (cnt < 1.5).astype(jnp.float32)           # one-hot per pixel

    covered = jnp.max(inside.astype(jnp.float32), axis=0, keepdims=True)

    # winner barycentrics / inv-w → perspective-correct weights
    bw0 = jnp.sum(win * b0, axis=0, keepdims=True)          # (1,P)
    bw1 = jnp.sum(win * b1, axis=0, keepdims=True)
    bw2 = jnp.sum(win * b2, axis=0, keepdims=True)
    ww0 = jnp.sum(win * iw0, axis=0, keepdims=True)
    ww1 = jnp.sum(win * iw1, axis=0, keepdims=True)
    ww2 = jnp.sum(win * iw2, axis=0, keepdims=True)
    pw0, pw1, pw2 = bw0 * ww0, bw1 * ww1, bw2 * ww2
    norm = jnp.maximum(pw0 + pw1 + pw2, 1e-12)
    pw0, pw1, pw2 = pw0 / norm, pw1 / norm, pw2 / norm

    rgb = None
    for j, pwj in enumerate((pw0, pw1, pw2)):
        colj = a[:, 10 + 3 * j:13 + 3 * j]                  # (K,3)
        contrib = jax.lax.dot_general(win * pwj, colj,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        rgb = contrib if rgb is None else rgb + contrib     # (P,3)
    rgb_ref[0] = rgb
    hard_ref[0] = covered
    fid_ref[0] = jnp.sum(win * a[:, 19:20], axis=0, keepdims=True)

    # soft silhouette: signed distance to nearest edge segment
    d2min = None
    for vx0, vy0, vx1, vy1 in ((ax, ay, bx, by), (bx, by, cx, cy),
                               (cx, cy, ax, ay)):
        ex, ey = vx1 - vx0, vy1 - vy0                       # (K,1)
        qx, qy = px - vx0, py - vy0                         # (K,P)
        t = jnp.clip((qx * ex + qy * ey) / jnp.maximum(ex * ex + ey * ey, 1e-12),
                     0.0, 1.0)
        dx, dy = qx - t * ex, qy - t * ey
        d2 = dx * dx + dy * dy
        d2min = d2 if d2min is None else jnp.minimum(d2min, d2)
    d = jnp.sqrt(d2min + 1e-12)
    signed = jnp.where(inside, -d, d)
    s = jax.nn.sigmoid(-signed / sigma)
    s = jnp.where(valid, s, 0.0)
    log_keep = jnp.log1p(-jnp.clip(s, 0.0, 1.0 - 1e-6))
    soft_ref[0] = 1.0 - jnp.exp(jnp.sum(log_keep, axis=0, keepdims=True))


def shade_tiles_pallas(attrs, tiles_x: int, tile_h: int, tile_w: int,
                       sigma: float, interpret: bool = False):
    """attrs (T,K,24) f32 → rgb (T,P,3), hard (T,P), soft (T,P), fid (T,P)."""
    T, K, _ = attrs.shape
    P = tile_h * tile_w
    if jax.default_backend() != "tpu":
        interpret = True
    kern = functools.partial(_shade_kernel, tile_h=tile_h, tile_w=tile_w,
                             tiles_x=tiles_x, sigma=sigma)
    row = lambda i: (i, 0, 0)
    rgb, hard, soft, fid = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((T, P, 3), jnp.float32),
                   jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
                   jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
                   jax.ShapeDtypeStruct((T, 1, P), jnp.float32)),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, K, 24), row, memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, P, 3), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, P), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, P), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, P), row, memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(attrs)
    return rgb, hard[:, 0], soft[:, 0], fid[:, 0]


def _shade_bwd_kernel(attr_ref, g_rgb_ref, g_soft_ref, d_attr_ref, *,
                      tile_h: int, tile_w: int, tiles_x: int, sigma: float):
    """Analytic per-tile backward: recompute the forward in VMEM, then

      colors:   d col_jk = Σ_p win·pw_j·g_rgb                  (matmuls)
      verts:    g_rgb → pw → (bary, 1/w) → edge functions → screen coords
      soft:     g_soft → σ′ → clamped point-segment distance → screen coords

    Gates replicate autodiff of the forward exactly: winner selection and
    `inside` carry no gradient; the area/len/clip guards zero their branches.
    """
    K = attr_ref.shape[1]
    P = tile_h * tile_w

    a = attr_ref[0]                                         # (K,24)
    i = pl.program_id(0)
    ox = ((i % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((i // tiles_x) * tile_h).astype(jnp.float32)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pidx % tile_w).astype(jnp.float32) + ox + 0.5
    py = (pidx // tile_w).astype(jnp.float32) + oy + 0.5

    ax, ay = a[:, 0:1], a[:, 1:2]
    bx, by = a[:, 2:3], a[:, 3:4]
    cx, cy = a[:, 4:5], a[:, 5:6]
    iw0, iw1, iw2 = a[:, 6:7], a[:, 7:8], a[:, 8:9]
    valid = a[:, 9:10] > 0.5
    g_rgb = g_rgb_ref[0]                                    # (P,3)
    g_soft = g_soft_ref[0]                                  # (1,P)

    # ---- recompute forward selection ----
    e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
    e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
    e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    area_raw = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    area_live = jnp.abs(area_raw) >= 1e-4   # AREA_MIN gate — must match fwd
    area = jnp.where(area_live, area_raw, 1.0)
    b0, b1, b2 = e0 / area, e1 / area, e2 / area
    inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) & valid & area_live
    zi = b0 * iw0 + b1 * iw1 + b2 * iw2
    zkey = jnp.where(inside, zi, NEG)
    zmax = jnp.max(zkey, axis=0, keepdims=True)
    ismax = ((zkey >= zmax) & inside).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tril = (col <= row).astype(jnp.float32)
    cnt = jax.lax.dot_general(tril, ismax, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    win = ismax * (cnt < 1.5).astype(jnp.float32)           # (K,P)

    bw0 = jnp.sum(win * b0, axis=0, keepdims=True)          # (1,P)
    bw1 = jnp.sum(win * b1, axis=0, keepdims=True)
    bw2 = jnp.sum(win * b2, axis=0, keepdims=True)
    ww0 = jnp.sum(win * iw0, axis=0, keepdims=True)
    ww1 = jnp.sum(win * iw1, axis=0, keepdims=True)
    ww2 = jnp.sum(win * iw2, axis=0, keepdims=True)
    q0, q1, q2 = bw0 * ww0, bw1 * ww1, bw2 * ww2
    S_raw = q0 + q1 + q2
    S_live = S_raw >= 1e-12                                 # max() gate
    S = jnp.maximum(S_raw, 1e-12)
    pw0, pw1, pw2 = q0 / S, q1 / S, q2 / S

    # ---- rgb path ----
    d_col = []
    u = []
    for j, pwj in enumerate((pw0, pw1, pw2)):
        colj = a[:, 10 + 3 * j:13 + 3 * j]                  # (K,3)
        d_col.append(jax.lax.dot_general(win * pwj, g_rgb,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST))
        gc = jax.lax.dot_general(colj, g_rgb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)  # (K,P)
        u.append(jnp.sum(win * gc, axis=0, keepdims=True))  # (1,P)
    u0, u1, u2 = u
    ubar = pw0 * u0 + pw1 * u1 + pw2 * u2
    live = S_live.astype(jnp.float32)
    dq0 = (u0 - ubar) / S * live
    dq1 = (u1 - ubar) / S * live
    dq2 = (u2 - ubar) / S * live
    # per-face 1/w grads
    d_iw0 = jnp.sum(win * (dq0 * bw0), axis=1, keepdims=True)
    d_iw1 = jnp.sum(win * (dq1 * bw1), axis=1, keepdims=True)
    d_iw2 = jnp.sum(win * (dq2 * bw2), axis=1, keepdims=True)
    # per-(k,p) barycentric grads (winner-gated)
    db0 = win * (dq0 * ww0)
    db1 = win * (dq1 * ww1)
    db2 = win * (dq2 * ww2)
    # b_j = e_j/area
    alive = area_live.astype(jnp.float32)
    de0 = db0 / area * alive
    de1 = db1 / area * alive
    de2 = db2 / area * alive
    d_area = -(de0 * b0 + de1 * b1 + de2 * b2)              # (K,P)

    # edge-function partials: e = (v1x-v0x)(py-v0y) - (v1y-v0y)(px-v0x)
    #   ∂e/∂v1x=(py-v0y)  ∂e/∂v1y=-(px-v0x)  ∂e/∂v0x=v1y-py  ∂e/∂v0y=px-v1x
    # e0: v0=b v1=c; e1: v0=c v1=a; e2: v0=a v1=b
    d_ax = de1 * (py - cy) + de2 * (by - py)
    d_ay = de1 * (cx - px) + de2 * (px - bx)
    d_bx = de2 * (py - ay) + de0 * (cy - py)
    d_by = de2 * (ax - px) + de0 * (px - cx)
    d_cx = de0 * (py - by) + de1 * (ay - py)
    d_cy = de0 * (bx - px) + de1 * (px - ax)
    # area partials (per-face constants)
    dA = jnp.sum(d_area, axis=1, keepdims=True)             # (K,1)
    d_ax_f = dA * (by - cy)
    d_ay_f = dA * (cx - bx)
    d_bx_f = dA * (cy - ay)
    d_by_f = dA * (ax - cx)
    d_cx_f = dA * (-(by - ay))
    d_cy_f = dA * (bx - ax)

    # ---- soft-silhouette path ----
    # recompute the 3 edge distances, find the argmin edge per (k,p) with the
    # same where-chain as jnp.minimum(minimum(d2_0,d2_1),d2_2)
    edges = ((ax, ay, bx, by), (bx, by, cx, cy), (cx, cy, ax, ay))
    d2s, ts, qxs, qys, exs, eys, hs, hlives, tgs = [], [], [], [], [], [], [], [], []
    for vx0, vy0, vx1, vy1 in edges:
        ex, ey = vx1 - vx0, vy1 - vy0
        qx, qy = px - vx0, py - vy0
        h_raw = ex * ex + ey * ey
        h = jnp.maximum(h_raw, 1e-12)
        uu = (qx * ex + qy * ey) / h
        t = jnp.clip(uu, 0.0, 1.0)
        dx, dy = qx - t * ex, qy - t * ey
        d2s.append(dx * dx + dy * dy)
        ts.append(t)
        qxs.append(qx); qys.append(qy); exs.append(ex); eys.append(ey)
        hs.append(h)
        hlives.append((h_raw >= 1e-12).astype(jnp.float32))
        # jnp.clip grads split 0.5 at exact boundaries (lax balanced_eq)
        tgs.append(jnp.where((uu > 0.0) & (uu < 1.0), 1.0,
                             jnp.where((uu == 0.0) | (uu == 1.0), 0.5, 0.0)))
    m01 = jnp.minimum(d2s[0], d2s[1])
    d2min = jnp.minimum(m01, d2s[2])
    # jnp.minimum splits gradients 0.5/0.5 at exact ties — and ties are NOT
    # measure-zero here (corner-closest pixels tie their two adjacent edges;
    # symmetric meshes tie opposite edges on medial axes), so replicate it
    w0a = jnp.where(d2s[0] < d2s[1], 1.0,
                    jnp.where(d2s[0] == d2s[1], 0.5, 0.0))
    w1a = 1.0 - w0a
    wm = jnp.where(m01 < d2s[2], 1.0, jnp.where(m01 == d2s[2], 0.5, 0.0))
    picks = [w0a * wm, w1a * wm, 1.0 - wm]

    dist = jnp.sqrt(d2min + 1e-12)
    signed = jnp.where(inside, -dist, dist)
    s = jax.nn.sigmoid(-signed / sigma)
    s = jnp.where(valid, s, 0.0)
    sc_live = (s <= 1.0 - 1e-6) & valid
    log_keep = jnp.log1p(-jnp.clip(s, 0.0, 1.0 - 1e-6))
    M = jnp.sum(log_keep, axis=0, keepdims=True)            # (1,P)
    # dL/dsigned = -g_soft·exp(M)·s/σ   (the (1-s) factors cancel)
    d_signed = (-g_soft * jnp.exp(M) / sigma) * s * sc_live.astype(jnp.float32)
    d_dist = jnp.where(inside, -d_signed, d_signed)
    d_d2min = d_dist / (2.0 * dist)

    for j in range(3):
        d_d2 = d_d2min * picks[j]
        t, qx, qy, ex, ey, h = ts[j], qxs[j], qys[j], exs[j], eys[j], hs[j]
        dx, dy = qx - t * ex, qy - t * ey
        g2x, g2y = d_d2 * 2.0 * dx, d_d2 * 2.0 * dy
        dt = -(g2x * ex + g2y * ey)
        tg = tgs[j]
        hl = hlives[j]
        uu = (qx * ex + qy * ey) / h
        d_qx = g2x + dt * tg * ex / h
        d_qy = g2y + dt * tg * ey / h
        d_ex = -t * g2x + dt * tg * (qx - 2.0 * ex * uu) * hl / h
        d_ey = -t * g2y + dt * tg * (qy - 2.0 * ey * uu) * hl / h
        # qx = px - v0x, ex = v1x - v0x
        dv0x, dv0y = -d_qx - d_ex, -d_qy - d_ey
        dv1x, dv1y = d_ex, d_ey
        if j == 0:    # edge a→b
            d_ax += dv0x; d_ay += dv0y; d_bx += dv1x; d_by += dv1y
        elif j == 1:  # edge b→c
            d_bx += dv0x; d_by += dv0y; d_cx += dv1x; d_cy += dv1y
        else:         # edge c→a
            d_cx += dv0x; d_cy += dv0y; d_ax += dv1x; d_ay += dv1y

    def rowsum(x):                                          # (K,P) → (K,1)
        return jnp.sum(x, axis=1, keepdims=True)

    zeros1 = jnp.zeros((K, 1), jnp.float32)
    d_attr_ref[0] = jnp.concatenate([
        rowsum(d_ax) + d_ax_f, rowsum(d_ay) + d_ay_f,
        rowsum(d_bx) + d_bx_f, rowsum(d_by) + d_by_f,
        rowsum(d_cx) + d_cx_f, rowsum(d_cy) + d_cy_f,
        d_iw0, d_iw1, d_iw2, zeros1,
        d_col[0], d_col[1], d_col[2],
        zeros1, jnp.zeros((K, 4), jnp.float32),
    ], axis=1)


def shade_bwd_pallas(attrs, g_rgb, g_soft, tiles_x: int, tile_h: int,
                     tile_w: int, sigma: float, interpret: bool = False):
    """attrs (T,K,24), g_rgb (T,P,3), g_soft (T,P) → d_attrs (T,K,24)."""
    T, K, L = attrs.shape
    P = tile_h * tile_w
    if jax.default_backend() != "tpu":
        interpret = True
    kern = functools.partial(_shade_bwd_kernel, tile_h=tile_h, tile_w=tile_w,
                             tiles_x=tiles_x, sigma=sigma)
    row = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K, L), jnp.float32),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, K, L), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, P, 3), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, P), row, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K, L), row, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(attrs, g_rgb, g_soft.reshape(T, 1, P))


# ---- jnp twin of the kernel math (used for the backward pass) --------------

def _shade_ref(attrs, origins, tile_h: int, tile_w: int, sigma: float,
               chunk: int = 64):
    """Same math as the kernel, in chunked jnp (differentiable in attrs)."""
    T, K, _ = attrs.shape
    P = tile_h * tile_w
    n = -(-T // chunk)
    pad = n * chunk - T
    at = jnp.pad(attrs, ((0, pad), (0, 0), (0, 0))) if pad else attrs
    og = jnp.pad(origins, ((0, pad), (0, 0))) if pad else origins

    @jax.checkpoint
    def body(args):
        a, org = args                                       # (C,K,24),(C,2)
        py = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)
        px = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
        px = px.reshape(1, 1, P) + org[:, None, 0:1] + 0.5  # (C,1,P)
        py = py.reshape(1, 1, P) + org[:, None, 1:2] + 0.5
        ax, ay = a[..., 0:1], a[..., 1:2]                   # (C,K,1)
        bx, by = a[..., 2:3], a[..., 3:4]
        cx, cy = a[..., 4:5], a[..., 5:6]
        iw = a[..., 6:9]                                    # (C,K,3)
        valid = a[..., 9:10] > 0.5
        e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)  # (C,K,P)
        e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        area_live = jnp.abs(area) >= 1e-4   # AREA_MIN gate — must match kernel
        area = jnp.where(area_live, area, 1.0)
        bary = jnp.stack([e0, e1, e2], -1) / area[..., None]  # (C,K,P,3)
        inside = (bary >= 0.0).all(-1) & valid & area_live  # (C,K,P)
        zi = jnp.einsum("ckpj,ckj->ckp", bary, iw)
        zkey = jnp.where(inside, zi, NEG)
        winslot = jnp.argmax(zkey, axis=1)                  # (C,P) first max
        covered = jnp.take_along_axis(inside, winslot[:, None, :], 1)[:, 0]
        bw = jnp.take_along_axis(bary, winslot[:, None, :, None], 1)[:, 0]
        iww = jax.vmap(lambda w, s: w[s])(iw, winslot)      # (C,P,3)
        pw = bw * iww
        pw = pw / jnp.maximum(pw.sum(-1, keepdims=True), 1e-12)
        cols = a[..., 10:19].reshape(a.shape[0], K, 3, 3)   # (C,K,3v,3c)
        colw = jax.vmap(lambda cv, s: cv[s])(cols, winslot)  # (C,P,3v,3c)
        rgb = jnp.einsum("cpj,cpjd->cpd", pw, colw)
        fid = jnp.take_along_axis(a[..., 19], winslot, axis=1)
        # kernel's one-hot `win` is all-zero for uncovered pixels → rgb/fid 0
        # there (also keeps slot-0 garbage out of the gradients)
        rgb = jnp.where(covered[..., None], rgb, 0.0)
        fid = jnp.where(covered, fid, 0.0)

        d2min = None
        for vx0, vy0, vx1, vy1 in ((ax, ay, bx, by), (bx, by, cx, cy),
                                   (cx, cy, ax, ay)):
            ex, ey = vx1 - vx0, vy1 - vy0
            qx, qy = px - vx0, py - vy0
            t = jnp.clip((qx * ex + qy * ey)
                         / jnp.maximum(ex * ex + ey * ey, 1e-12), 0.0, 1.0)
            dx, dy = qx - t * ex, qy - t * ey
            d2 = dx * dx + dy * dy
            d2min = d2 if d2min is None else jnp.minimum(d2min, d2)
        dist = jnp.sqrt(d2min + 1e-12)
        signed = jnp.where(inside, -dist, dist)
        s = jax.nn.sigmoid(-signed / sigma)
        s = jnp.where(valid, s, 0.0)
        log_keep = jnp.log1p(-jnp.clip(s, 0.0, 1.0 - 1e-6))
        soft = 1.0 - jnp.exp(jnp.sum(log_keep, axis=1))     # (C,P)
        return rgb, covered.astype(jnp.float32), soft, fid

    rgb, hard, soft, fid = jax.lax.map(
        body, (at.reshape(n, chunk, K, at.shape[-1]), og.reshape(n, chunk, 2)))
    return (rgb.reshape(-1, P, 3)[:T], hard.reshape(-1, P)[:T],
            soft.reshape(-1, P)[:T], fid.reshape(-1, P)[:T])


def make_shade_tiles(tiles_x: int, tile_h: int, tile_w: int, sigma: float,
                     analytic_bwd: bool = True):
    """custom_vjp closure over static tile geometry; grads flow to attrs
    through rgb and soft only (hard coverage and face id are step functions).

    analytic_bwd=True runs the fused Pallas backward kernel; False falls back
    to autodiff of the chunked jnp twin (kept as the test oracle)."""
    @jax.custom_vjp
    def f(attrs, origins):
        return shade_tiles_pallas(attrs, tiles_x, tile_h, tile_w, sigma)

    def fwd(attrs, origins):
        return f(attrs, origins), (attrs, origins)

    def bwd(res, g):
        attrs, origins = res
        g_rgb, _, g_soft, _ = g
        if analytic_bwd:
            d_attrs = shade_bwd_pallas(attrs, g_rgb, g_soft, tiles_x,
                                       tile_h, tile_w, sigma)
            return d_attrs, None

        def diff_part(a):
            rgb, _, soft, _ = _shade_ref(a, origins, tile_h, tile_w, sigma)
            return rgb, soft

        _, vjp = jax.vjp(diff_part, attrs)
        (d_attrs,) = vjp((g_rgb, g_soft))
        return d_attrs, None

    f.defvjp(fwd, bwd)
    return f

"""Tiny O(N·P) numpy implementations used as ground truth in tests.

These mirror the math of the reference CUDA kernels (forward.cu) naively —
no tiling, no sorting shortcuts — so the fast TPU paths can be checked
against them exactly.
"""

import numpy as np


def quat_to_rotmat_np(q):
    q = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(q.shape[:-1] + (3, 3))
    return R


def splat_reference(means3d, scales, quats, opacities, colors, world_view,
                    full_proj, W, H, tanfovx, tanfovy, bg,
                    tile_w=16, tile_h=16):
    """Brute-force per-pixel front-to-back compositing over ALL gaussians.

    Applies the same tile-rect footprint truncation as the tiled kernels so
    outputs are comparable to high precision.
    """
    N = means3d.shape[0]
    fx = W / (2 * tanfovx)
    fy = H / (2 * tanfovy)
    hom = np.concatenate([means3d, np.ones((N, 1))], axis=1)
    p_view = hom @ world_view.T
    depth = p_view[:, 2]
    p_hom = hom @ full_proj.T
    p_proj = p_hom[:, :3] / (p_hom[:, 3:4] + 1e-7)
    px = ((p_proj[:, 0] + 1) * W - 1) * 0.5
    py = ((p_proj[:, 1] + 1) * H - 1) * 0.5

    R = quat_to_rotmat_np(quats)
    M = R * scales[:, None, :]
    cov3d = M @ M.transpose(0, 2, 1)

    tz = depth
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tx = np.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = np.clip(p_view[:, 1] / tz, -limy, limy) * tz
    J = np.zeros((N, 2, 3))
    J[:, 0, 0] = fx / tz
    J[:, 0, 2] = -fx * tx / tz ** 2
    J[:, 1, 1] = fy / tz
    J[:, 1, 2] = -fy * ty / tz ** 2
    T = J @ world_view[:3, :3]
    cov2d = T @ cov3d @ T.transpose(0, 2, 1)
    cov2d[:, 0, 0] += 0.3
    cov2d[:, 1, 1] += 0.3
    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    conic = np.stack([cov2d[:, 1, 1], -cov2d[:, 0, 1], cov2d[:, 0, 0]],
                     axis=-1) / det[:, None]
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + np.sqrt(np.maximum(0.1, mid ** 2 - det))
    radius = np.ceil(3 * np.sqrt(np.maximum(lam1, 0)))

    valid = (depth > 0.2) & (det > 0) & (radius > 0)
    order = np.argsort(depth)

    img = np.zeros((H, W, 3))
    alpha_img = np.zeros((H, W))
    ys, xs = np.mgrid[0:H, 0:W]
    Tbuf = np.ones((H, W))
    ntx = -(-W // tile_w)
    nty = -(-H // tile_h)
    for i in order:
        if not valid[i]:
            continue
        dx = px[i] - xs
        dy = py[i] - ys
        power = (-0.5 * (conic[i, 0] * dx ** 2 + conic[i, 2] * dy ** 2)
                 - conic[i, 1] * dx * dy)
        a = np.minimum(0.99, opacities[i] * np.exp(power))
        a = np.where((power <= 0) & (a >= 1 / 255.0), a, 0.0)
        # tile-rect footprint truncation (auxiliary.h getRect)
        tx0 = int(np.clip((px[i] - radius[i]) // tile_w, 0, ntx))
        ty0 = int(np.clip((py[i] - radius[i]) // tile_h, 0, nty))
        tx1 = int(np.clip((px[i] + radius[i] + tile_w - 1) // tile_w, 0, ntx))
        ty1 = int(np.clip((py[i] + radius[i] + tile_h - 1) // tile_h, 0, nty))
        inrect = ((xs // tile_w >= tx0) & (xs // tile_w < tx1)
                  & (ys // tile_h >= ty0) & (ys // tile_h < ty1))
        a = np.where(inrect, a, 0.0)
        img += (a * Tbuf)[..., None] * colors[i]
        Tbuf = Tbuf * (1 - a)
    img += Tbuf[..., None] * bg
    return img, 1 - Tbuf

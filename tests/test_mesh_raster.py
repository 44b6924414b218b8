"""Mesh rasterizer tests: coverage, interpolation, z-order, soft-mask grads."""

import numpy as np
import jax
import jax.numpy as jnp

from dgmesh_tpu import cameras
from dgmesh_tpu.ops import mesh_raster as mr


def look_at_camera(W=64, H=64, dist=3.0, fovx=1.0):
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = dist
    cam = cameras.camera_from_c2w_blender(0, c2w, fovx, W, H, 0.0)
    pose = jnp.asarray(cam.mesh_pose())
    proj = jnp.asarray(cameras.gl_projection_from_K(cam.intrinsics, W, H))
    return pose, proj


CFG = mr.MeshRasterConfig(width=64, height=64, max_per_tile=32, max_dup=4096,
                          tile_chunk=4, sigma=0.7)


def quad(z=0.0, half=0.5):
    verts = jnp.asarray([[-half, -half, z], [half, -half, z],
                         [half, half, z], [-half, half, z]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return verts, faces


def test_quad_coverage_and_color():
    verts, faces = quad()
    pose, proj = look_at_camera()
    colors = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], jnp.float32)
    out = mr.render_mesh(verts, faces, jnp.ones(2, bool), colors, pose, proj,
                         jnp.zeros(3), CFG)
    mask = np.asarray(out["mask"])
    # centered square should cover a centered region, not the borders
    assert mask[32, 32] == 1.0
    assert mask[2, 2] == 0.0 and mask[-2, -2] == 0.0
    frac = mask.mean()
    # square of side 1 at dist 3 with fovx=1: covers (f*1/3)^2 px^2,
    # f = W/(2 tan .5)
    f = 64 / (2 * np.tan(0.5))
    expect = (f / 3) ** 2 / (64 * 64)
    np.testing.assert_allclose(frac, expect, rtol=0.1)
    # quad center sits on the v0–v2 diagonal: color ≈ (red+blue)/2
    rgb = np.asarray(out["rgb"])
    np.testing.assert_allclose(rgb[32, 32], [0.5, 0.0, 0.5], atol=0.1)
    # background stays bg color
    np.testing.assert_allclose(rgb[2, 2], 0.0, atol=1e-6)
    assert int(out["aux"]["tile_overflow"]) == 0


def test_zbuffer_order():
    # red quad in front of green quad
    v1, f1 = quad(z=0.5, half=0.3)
    v2, f2 = quad(z=-0.5, half=0.6)
    verts = jnp.concatenate([v1, v2])
    faces = jnp.concatenate([f1, f2 + 4])
    colors = jnp.asarray([[1, 0, 0]] * 4 + [[0, 1, 0]] * 4, jnp.float32)
    pose, proj = look_at_camera()
    out = mr.render_mesh(verts, faces, jnp.ones(4, bool), colors, pose, proj,
                         jnp.zeros(3), CFG)
    rgb = np.asarray(out["rgb"])
    # center: near (red, z=+0.5 closer to camera at z=3) wins
    np.testing.assert_allclose(rgb[32, 32], [1, 0, 0], atol=1e-5)
    # offset point inside big quad but outside small quad: green
    fid = np.asarray(out["face_id"])
    ys, xs = np.nonzero((rgb[..., 1] > 0.5))
    assert len(ys) > 0


def test_face_valid_mask():
    verts, faces = quad()
    pose, proj = look_at_camera()
    colors = jnp.ones((4, 3))
    out = mr.render_mesh(verts, faces, jnp.asarray([True, False]), colors,
                         pose, proj, jnp.zeros(3), CFG)
    # only one triangle rendered → half the quad
    out_full = mr.render_mesh(verts, faces, jnp.ones(2, bool), colors, pose,
                              proj, jnp.zeros(3), CFG)
    assert 0.4 < np.asarray(out["mask"]).sum() / np.asarray(out_full["mask"]).sum() < 0.6


def test_soft_mask_tracks_hard():
    verts, faces = quad()
    pose, proj = look_at_camera()
    colors = jnp.ones((4, 3))
    out = mr.render_mesh(verts, faces, jnp.ones(2, bool), colors, pose, proj,
                         jnp.zeros(3), CFG)
    hard = np.asarray(out["mask"])
    soft = np.asarray(out["soft_mask"])
    # deep interior ≈ 1 (off the interior seam: the shared diagonal edge has
    # the classic SoftRas dip to 1-(1-σ)² = 0.75), far exterior ≈ 0
    assert soft[32, 36] > 0.95
    assert soft[32, 32] > 0.7  # on-seam dip bounded
    assert soft[2, 2] < 0.05
    # consistency: correlation with hard mask is strong
    assert np.corrcoef(hard.ravel(), soft.ravel())[0, 1] > 0.9


def test_soft_mask_gradient_grows_with_target():
    """Gradient of (soft_mask - bigger_target)² should pull verts outward."""
    verts, faces = quad()
    pose, proj = look_at_camera()
    colors = jnp.ones((4, 3))

    out_big = mr.render_mesh(jnp.asarray(verts) * 1.4, faces, jnp.ones(2, bool),
                             colors, pose, proj, jnp.zeros(3), CFG)
    target = jax.lax.stop_gradient(out_big["soft_mask"])

    def loss(v):
        out = mr.render_mesh(v, faces, jnp.ones(2, bool), colors, pose, proj,
                             jnp.zeros(3), CFG)
        return ((out["soft_mask"] - target) ** 2).mean()

    g = jax.grad(loss)(verts)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    # gradient descent direction (-g) should point outward (increase |x|,|y|)
    step = verts - 1e3 * g  # arbitrary positive step to check direction
    grew = np.abs(np.asarray(step)[:, :2]).sum() > np.abs(np.asarray(verts)[:, :2]).sum()
    assert grew


def test_phong_vertex_colors():
    """Front-lit faces brighter than grazing ones; all values in [0,1]."""
    verts, faces = quad()
    cam_center = jnp.asarray([0.0, 0.0, 3.0])
    c = mr.phong_vertex_colors(verts, faces, jnp.ones(2, bool), cam_center)
    c = np.asarray(c)
    assert c.shape == (4, 3)
    assert (c >= 0).all() and (c <= 1).all()
    # light hits the quad head-on: ambient(0.5)+diffuse(0.3)+spec(0.2) ≈ 1
    np.testing.assert_allclose(c, 1.0, atol=0.05)
    # a side-on quad (normal ⊥ light) only gets ambient + grazing spec
    verts_side = jnp.asarray([[0, -.5, -.5], [0, -.5, .5],
                              [0, .5, .5], [0, .5, -.5]], jnp.float32)
    c2 = np.asarray(mr.phong_vertex_colors(verts_side, faces,
                                           jnp.ones(2, bool), cam_center))
    assert c2.mean() < c.mean() - 0.2


def test_color_gradients():
    verts, faces = quad()
    pose, proj = look_at_camera()

    def loss(c):
        out = mr.render_mesh(verts, faces, jnp.ones(2, bool), c, pose, proj,
                             jnp.zeros(3), CFG)
        return (out["rgb"] ** 2).sum()

    g = jax.grad(loss)(jnp.full((4, 3), 0.5))
    assert np.abs(np.asarray(g)).min() > 0  # every vertex color used


def test_backface_cull_exact_on_closed_mesh():
    """cull_backface must leave the z-buffer image bit-identical on a closed
    outward-wound mesh (marching-tets winding guarantee) — dropped faces are
    strictly occluded.  Soft silhouette may differ (back faces contribute
    coverage terms) but the hard mask may not."""
    from dgmesh_tpu.ops.marching_tets import MTConfig, marching_tets

    res = 32
    g = (np.arange(res) + 0.5) / res
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    phi = (np.sqrt((X - .5)**2 + (Y - .5)**2 + (Z - .5)**2) - 0.3)
    m = marching_tets(jnp.asarray(phi, jnp.float32),
                      MTConfig(res=res, max_verts=8192, max_faces=16384,
                               max_cubes=8192))
    nf = int(m.n_faces)
    fv = np.zeros(16384, bool)
    fv[:nf] = True
    verts = (m.verts - 0.5) * 1.2
    col = jnp.tile(jnp.asarray([[0.3, 0.6, 0.9]]), (verts.shape[0], 1))

    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    cam = cameras.camera_from_c2w_blender(0, c2w, 0.8, 96, 96, 0.0)
    pose = jnp.asarray(cam.mesh_pose())
    proj = jnp.asarray(cameras.gl_projection_from_K(cam.intrinsics, 96, 96))

    def render(cull):
        cfg = mr.MeshRasterConfig(width=96, height=96, max_per_tile=256,
                                  max_dup=1 << 18, tile_chunk=8,
                                  cull_backface=cull)
        return mr.render_mesh(verts, m.faces, jnp.asarray(fv), col, pose,
                              proj, jnp.zeros(3), cfg, want_soft=True)

    base, culled = render(False), render(True)
    np.testing.assert_array_equal(np.asarray(base["rgb"]),
                                  np.asarray(culled["rgb"]))
    np.testing.assert_array_equal(np.asarray(base["mask"]),
                                  np.asarray(culled["mask"]))
    assert float(base["mask"].sum()) > 100  # actually rendered something


def test_render_mesh_shape_per_pixel_phong():
    """Per-pixel Phong (render_mesh_shape) matches the analytic sphere.

    On a coarse icosphere the barycentric-interpolated per-pixel normal must
    track the true sphere normal (radial direction of the interpolated
    surface point), and the per-pixel shaded image must be strictly closer to
    the analytically-shaded image than the Gouraud path is — the property
    that distinguishes pytorch3d's per-pixel Phong (reference
    utils/renderer.py mesh_shape_renderer :236-319) from vertex shading.
    """
    from dgmesh_tpu.data.synthetic_mesh import icosphere

    verts_np, faces_np = icosphere(2)            # 162 verts / 320 faces
    verts = jnp.asarray(verts_np, jnp.float32)
    faces = jnp.asarray(faces_np, jnp.int32)
    fv = jnp.ones(faces.shape[0], bool)
    W = H = 96
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    cam = cameras.camera_from_c2w_blender(0, c2w, 0.8, W, H, 0.0)
    pose = jnp.asarray(cam.mesh_pose())
    proj = jnp.asarray(cameras.gl_projection_from_K(cam.intrinsics, W, H))
    cam_center = jnp.asarray(cam.camera_center)
    cfg = mr.MeshRasterConfig(width=W, height=H, max_per_tile=128,
                              max_dup=1 << 17, tile_chunk=8)

    out = mr.render_mesh_shape(verts, faces, fv, pose, proj, cam_center, cfg)
    covered = np.asarray(out["mask"]) > 0.5
    assert covered.sum() > 400

    # erode the silhouette band (grazing faces have genuinely odd normals)
    inner = covered.copy()
    for sh in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        inner &= np.roll(covered, sh, axis=(0, 1))
        inner &= np.roll(np.roll(covered, sh[0], 0), sh[1], 1)
    n = np.asarray(out["normal"])[inner]
    p = np.asarray(out["position"])[inner]
    radial = p / np.linalg.norm(p, axis=-1, keepdims=True)
    cosang = np.clip((n * radial).sum(-1), -1, 1)
    ang = np.degrees(np.arccos(cosang))
    assert np.mean(ang) < 2.0, f"mean normal error {np.mean(ang):.2f} deg"
    assert np.percentile(ang, 99) < 6.0

    # analytic reference image: same lighting formula with exact normals
    v0 = verts_np[faces_np[:, 0]]
    center = v0.mean(0)
    lvec = -(center - np.asarray(cam_center))
    lvec = lvec / np.linalg.norm(lvec)
    pos = np.asarray(out["position"])
    view = np.asarray(cam_center) - pos
    view = view / (np.linalg.norm(view, axis=-1, keepdims=True) + 1e-9)
    nref = pos / (np.linalg.norm(pos, axis=-1, keepdims=True) + 1e-9)
    ndl = np.abs((nref * lvec).sum(-1, keepdims=True))
    hv = lvec + view
    hv = hv / (np.linalg.norm(hv, axis=-1, keepdims=True) + 1e-9)
    ndh = np.abs((nref * hv).sum(-1, keepdims=True))
    shade_ref = np.clip(0.5 + 0.3 * ndl + 0.2 * ndh ** 10.0, 0, 1)
    ref_img = np.where(inner[..., None], shade_ref * np.ones(3), 0.0)

    per_pixel = np.where(inner[..., None], np.asarray(out["rgb"]), 0.0)
    grey = mr.phong_vertex_colors(verts, faces, fv, cam_center)
    gout = mr.render_mesh(verts, faces, fv, grey, pose, proj, jnp.ones(3),
                          cfg, want_soft=False)
    gouraud = np.where(inner[..., None], np.asarray(gout["rgb"]), 0.0)

    err_pp = np.abs(per_pixel - ref_img).mean()
    err_gr = np.abs(gouraud - ref_img).mean()
    assert err_pp < err_gr, (err_pp, err_gr)
    assert err_pp < 0.01, err_pp


def test_degenerate_sliver_faces_are_nan_safe():
    """r4 collapse regression (DESIGN.md 3c): a near-zero-area sliver must
    neither win z-buffer coverage (the old tiny-area clamp sign-flipped it
    "inside" with ~1e15 barys) nor mint NaN/inf through the backward — the
    exact mechanism that produced NaN geometry grads tile-wide at r3 quality
    state_5004."""
    pose, proj = look_at_camera()
    verts, faces = quad(z=0.0)
    # append a degenerate sliver IN FRONT of the quad: two coincident corners
    eps = 1e-6
    sl = jnp.asarray([[-0.4, -0.4, 0.5], [0.4, 0.4, 0.5],
                      [0.4 + eps, 0.4 + eps, 0.5]], jnp.float32)
    verts_all = jnp.concatenate([verts, sl], axis=0)
    faces_all = jnp.concatenate(
        [faces, jnp.asarray([[4, 5, 6]], jnp.int32)], axis=0)
    fvalid = jnp.ones(faces_all.shape[0], bool)
    colors = jnp.ones((verts_all.shape[0], 3)) * 0.5
    bg = jnp.zeros(3)
    cfg = CFG._replace(cull_backface=False)

    def render_losses(v, c):
        out = mr.render_mesh(v, faces_all, fvalid, c, pose, proj, bg, cfg,
                             want_soft=True)
        return out["rgb"].sum() + out["soft_mask"].sum(), out

    (val, out), (g_v, g_c) = jax.value_and_grad(
        render_losses, argnums=(0, 1), has_aux=True)(verts_all, colors)

    # the sliver never appears as a z-buffer winner
    assert not np.any(np.asarray(out["face_id"]) == 2)
    # forward image finite and bounded
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all() and np.abs(rgb).max() <= 1.0
    # every gradient finite (the old clamp made these NaN via 0*inf)
    for g in (g_v, g_c):
        assert np.isfinite(np.asarray(g)).all()


def test_st_mask_value_is_hard_coverage():
    """Straight-through mask VALUE must equal the hard z-buffer coverage
    exactly (reference parity: train.py:266's mask comes from dr.rasterize +
    antialias, 1.0 inside / 0.0 outside — a correct mesh has zero loss)."""
    verts, faces = quad()
    pose, proj = look_at_camera()
    colors = jnp.ones((4, 3))
    out = mr.render_mesh(verts, faces, jnp.ones(2, bool), colors, pose, proj,
                         jnp.zeros(3), CFG)
    np.testing.assert_array_equal(np.asarray(out["st_mask"]),
                                  np.asarray(out["mask"]))


def test_st_mask_l1_no_grow_pressure_on_perfect_mesh():
    """The r4 divergence repro: under the x100 L1 mask loss, a mesh whose
    hard silhouette MATCHES the GT must receive ~zero vertex gradient through
    the straight-through mask (the raw soft silhouette saturates below 1.0
    inside and exerted a permanent grow-pressure — density_thres ran to its
    clamp in 100 iters, train_log.jsonl 5000-5100)."""
    verts, faces = quad()
    pose, proj = look_at_camera()
    colors = jnp.ones((4, 3))
    out = mr.render_mesh(verts, faces, jnp.ones(2, bool), colors, pose, proj,
                         jnp.zeros(3), CFG)
    gt = jax.lax.stop_gradient(out["mask"])   # GT = own hard silhouette

    from dgmesh_tpu.ops.losses import l1_loss

    def mask_l1(v, key):
        o = mr.render_mesh(v, faces, jnp.ones(2, bool), colors, pose, proj,
                           jnp.zeros(3), CFG)
        # l1_loss, not jnp.abs: torch's subgradient-at-zero convention is
        # part of the fix (see losses.l1_loss docstring)
        return l1_loss(o[key], gt) * 100.0

    g_st = np.asarray(jax.grad(mask_l1)(verts, "st_mask"))
    assert np.isfinite(g_st).all()
    assert np.abs(g_st).max() < 1e-6, f"grow-pressure survived: {g_st}"
    # contrast: the raw soft silhouette DOES push on a perfect mesh
    g_soft = np.asarray(jax.grad(mask_l1)(verts, "soft_mask"))
    assert np.abs(g_soft).max() > 1e-3


def test_st_mask_l1_gradient_is_bidirectional():
    """Mismatch pixels still steer: GT bigger -> descent grows the quad;
    GT smaller -> descent shrinks it."""
    verts, faces = quad()
    pose, proj = look_at_camera()
    colors = jnp.ones((4, 3))

    def silhouette(scale):
        o = mr.render_mesh(verts * scale, faces, jnp.ones(2, bool), colors,
                           pose, proj, jnp.zeros(3), CFG)
        return jax.lax.stop_gradient(o["mask"])

    from dgmesh_tpu.ops.losses import l1_loss

    def mask_l1(v, gt):
        o = mr.render_mesh(v, faces, jnp.ones(2, bool), colors, pose, proj,
                           jnp.zeros(3), CFG)
        return l1_loss(o["st_mask"], gt) * 100.0

    for scale, should_grow in ((1.4, True), (0.7, False)):
        g = np.asarray(jax.grad(mask_l1)(verts, silhouette(scale)))
        assert np.isfinite(g).all() and np.abs(g).sum() > 0
        step = np.asarray(verts) - 1e-2 * g / np.abs(g).max()
        grew = np.abs(step[:, :2]).sum() > np.abs(np.asarray(verts)[:, :2]).sum()
        assert grew == should_grow, (scale, g)

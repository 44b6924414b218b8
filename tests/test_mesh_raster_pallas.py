"""Pallas mesh-shading kernel vs the XLA shading path: values + gradients.

On CPU the kernel runs in interpret mode (same lowered math); these tests pin
the Pallas path to the tested XLA rasterizer on a multi-tile scene with
occlusion, invalid faces, and background pixels.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dgmesh_tpu.ops import mesh_raster as mr

from test_mesh_raster import look_at_camera, quad

CFG_X = mr.MeshRasterConfig(width=64, height=64, max_per_tile=32, max_dup=4096,
                            tile_chunk=4, sigma=0.7)
CFG_P = CFG_X._replace(use_pallas=True)


def scene():
    v1, f1 = quad(z=0.5, half=0.3)
    v2, f2 = quad(z=-0.5, half=0.6)
    verts = jnp.concatenate([v1, v2])
    faces = jnp.concatenate([f1, f2 + 4])
    colors = jnp.asarray([[1, 0, 0]] * 4 + [[0, 1, 0]] * 4, jnp.float32)
    valid = jnp.asarray([True, True, True, False])
    pose, proj = look_at_camera()
    return verts, faces, valid, colors, pose, proj


def test_pallas_forward_matches_xla():
    verts, faces, valid, colors, pose, proj = scene()
    bg = jnp.asarray([0.2, 0.3, 0.4])
    a = mr.render_mesh(verts, faces, valid, colors, pose, proj, bg, CFG_X)
    b = mr.render_mesh(verts, faces, valid, colors, pose, proj, bg, CFG_P)
    np.testing.assert_allclose(np.asarray(a["mask"]), np.asarray(b["mask"]))
    np.testing.assert_array_equal(np.asarray(a["face_id"]),
                                  np.asarray(b["face_id"]))
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["soft_mask"]),
                               np.asarray(b["soft_mask"]), atol=1e-5)


def test_pallas_twin_matches_kernel():
    """The jnp twin used for backward must reproduce the kernel forward."""
    from dgmesh_tpu.ops.mesh_raster_pallas import _shade_ref, shade_tiles_pallas

    rng = np.random.default_rng(0)
    T, K = 6, 8
    cfgs = dict(tiles_x=3, tile_h=8, tile_w=8)
    attrs = np.zeros((T, K, 24), np.float32)
    attrs[..., 0:6] = rng.normal(0, 12, (T, K, 6)) + 12     # screen tris
    attrs[..., 6:9] = rng.uniform(0.2, 2.0, (T, K, 3))      # 1/w
    attrs[..., 9] = rng.random((T, K)) > 0.3
    attrs[..., 10:19] = rng.random((T, K, 9))
    attrs[..., 19] = rng.integers(0, 100, (T, K))
    attrs = jnp.asarray(attrs)
    tids = jnp.arange(T, dtype=jnp.float32)
    origins = jnp.stack([(tids % 3) * 8, (tids // 3) * 8], -1)

    k = shade_tiles_pallas(attrs, cfgs["tiles_x"], 8, 8, sigma=0.7)
    t = _shade_ref(attrs, origins, 8, 8, sigma=0.7, chunk=4)
    for a, b, name in zip(k, t, ["rgb", "hard", "soft", "fid"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=name)


def test_analytic_bwd_matches_twin_autodiff():
    """Fused backward kernel vs jax.grad of the jnp twin, on every lane."""
    from dgmesh_tpu.ops.mesh_raster_pallas import (_shade_ref,
                                                   shade_bwd_pallas)
    rng = np.random.default_rng(1)
    T, K, th, tw = 6, 8, 8, 8
    P = th * tw
    attrs = np.zeros((T, K, 24), np.float32)
    attrs[..., 0:6] = rng.normal(0, 12, (T, K, 6)) + 12
    attrs[..., 6:9] = rng.uniform(0.2, 2.0, (T, K, 3))
    attrs[..., 9] = rng.random((T, K)) > 0.3
    attrs[..., 10:19] = rng.random((T, K, 9))
    attrs[..., 19] = rng.integers(0, 100, (T, K))
    attrs = jnp.asarray(attrs)
    tids = jnp.arange(T, dtype=jnp.float32)
    origins = jnp.stack([(tids % 3) * tw, (tids // 3) * th], -1)
    g_rgb = jnp.asarray(rng.normal(size=(T, P, 3)), jnp.float32)
    g_soft = jnp.asarray(rng.normal(size=(T, P)), jnp.float32)

    def scalar_loss(a):
        rgb, _, soft, _ = _shade_ref(a, origins, th, tw, sigma=0.7, chunk=2)
        return (rgb * g_rgb).sum() + (soft * g_soft).sum()

    d_twin = np.asarray(jax.grad(scalar_loss)(attrs))
    d_kern = np.asarray(shade_bwd_pallas(attrs, g_rgb, g_soft, 3, th, tw,
                                         sigma=0.7, interpret=True))
    scale = np.abs(d_twin).max()
    np.testing.assert_allclose(d_kern[..., :9], d_twin[..., :9],
                               atol=2e-4 * max(scale, 1.0))
    np.testing.assert_allclose(d_kern[..., 10:19], d_twin[..., 10:19],
                               atol=1e-5)
    assert np.abs(d_kern[..., 9]).max() == 0.0
    assert np.abs(d_kern[..., 19:]).max() == 0.0


def test_pallas_gradients_match_xla():
    verts, faces, valid, colors, pose, proj = scene()
    bg = jnp.zeros(3)
    gt = jnp.linspace(0, 1, 64 * 64 * 3).reshape(64, 64, 3)

    def loss(cfg):
        def f(v, c):
            out = mr.render_mesh(v, faces, valid, c, pose, proj, bg, cfg)
            return (jnp.abs(out["rgb"] - gt).mean()
                    + (out["soft_mask"] ** 2).mean())
        return f

    gx = jax.grad(loss(CFG_X), argnums=(0, 1))(verts, colors)
    gp = jax.grad(loss(CFG_P), argnums=(0, 1))(verts, colors)
    for a, b, name in zip(gx, gp, ["verts", "colors"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=name)
        assert np.abs(np.asarray(b)).sum() > 0

"""Pallas fused compositing kernel vs the XLA composite path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_pallas_matches_xla_composite(rng):
    from dgmesh_tpu.ops.splat_pallas import composite_tiles_pallas

    T, K, th, tw = 4, 32, 16, 16
    P = th * tw
    attrs = np.zeros((T, K, 16), np.float32)
    attrs[..., 0] = rng.uniform(0, 32, (T, K))
    attrs[..., 1] = rng.uniform(0, 32, (T, K))
    attrs[..., 2] = rng.uniform(0.05, 0.3, (T, K))
    attrs[..., 4] = rng.uniform(0.05, 0.3, (T, K))
    attrs[..., 5] = rng.uniform(0.2, 0.9, (T, K))
    attrs[..., 6:9] = rng.uniform(0, 1, (T, K, 3))
    attrs[..., 9] = (rng.random((T, K)) > 0.2).astype(np.float32)
    origins = np.asarray([[0, 0], [16, 0], [0, 16], [16, 16]], np.float32)

    # tiles arranged 2x2: origin of tile i = ((i%2)*16, (i//2)*16)
    rgb, alpha = composite_tiles_pallas(jnp.asarray(attrs), 2, th, tw,
                                        interpret=True)

    # sequential front-to-back reference
    for t in range(T):
        px, py = np.meshgrid(np.arange(tw) + origins[t, 0],
                             np.arange(th) + origins[t, 1])
        px, py = px.reshape(-1), py.reshape(-1)
        Tr = np.ones(P)
        out = np.zeros((P, 3))
        for k in range(K):
            dx = attrs[t, k, 0] - px
            dy = attrs[t, k, 1] - py
            pw = (-0.5 * (attrs[t, k, 2] * dx ** 2 + attrs[t, k, 4] * dy ** 2)
                  - attrs[t, k, 3] * dx * dy)
            a = np.minimum(0.99, attrs[t, k, 5] * np.exp(pw))
            a = np.where((pw <= 0) & (a >= 1 / 255) & (attrs[t, k, 9] > 0.5), a, 0)
            out += (a * Tr)[:, None] * attrs[t, k, 6:9]
            Tr *= 1 - a
        np.testing.assert_allclose(np.asarray(rgb[t]), out, atol=1e-5)
        np.testing.assert_allclose(np.asarray(alpha[t]), 1 - Tr, atol=1e-5)


def test_analytic_bwd_matches_twin_autodiff(rng):
    """The fused backward kernel vs jax.grad of the jnp twin, on every lane."""
    from dgmesh_tpu.ops.splat_pallas import (_composite_ref,
                                             composite_bwd_pallas)

    T, K, th, tw = 4, 32, 16, 16
    P = th * tw
    attrs = np.zeros((T, K, 16), np.float32)
    attrs[..., 0] = rng.uniform(0, 32, (T, K))
    attrs[..., 1] = rng.uniform(0, 32, (T, K))
    attrs[..., 2] = rng.uniform(0.05, 0.3, (T, K))
    attrs[..., 3] = rng.uniform(-0.02, 0.02, (T, K))
    attrs[..., 4] = rng.uniform(0.05, 0.3, (T, K))
    attrs[..., 5] = rng.uniform(0.2, 0.9, (T, K))
    attrs[..., 6:9] = rng.uniform(0, 1, (T, K, 3))
    attrs[..., 9] = (rng.random((T, K)) > 0.2).astype(np.float32)
    attrs = jnp.asarray(attrs)
    origins = jnp.asarray([[0, 0], [16, 0], [0, 16], [16, 16]], jnp.float32)
    g_rgb = jnp.asarray(rng.normal(size=(T, P, 3)), jnp.float32)
    g_alpha = jnp.asarray(rng.normal(size=(T, P)), jnp.float32)

    def scalar_loss(a):
        rgb, alpha = _composite_ref(a, origins, th, tw, chunk=2)
        return (rgb * g_rgb).sum() + (alpha * g_alpha).sum()

    d_twin = jax.grad(scalar_loss)(attrs)
    d_kern = composite_bwd_pallas(attrs, g_rgb, g_alpha, 2, th, tw,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(d_kern)[..., :9],
                               np.asarray(d_twin)[..., :9], atol=2e-4)
    assert np.abs(np.asarray(d_kern)[..., 9:]).max() == 0.0


def test_render_pallas_matches_xla(rng):
    """splat.render(use_pallas=True) must match the XLA composite, incl. grads."""
    import jax
    import math
    from dgmesh_tpu.cameras import camera_from_c2w_blender
    from dgmesh_tpu.ops import splat
    from dgmesh_tpu.ops.sh import rgb_to_sh

    W = H = 32
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    cam = camera_from_c2w_blender(0, c2w, 1.0, W, H, 0.0)
    ca = splat.CameraArrays.from_camera(cam)
    n, M = 20, 32
    means = np.zeros((M, 3), np.float32)
    means[:n] = rng.uniform(-0.6, 0.6, (n, 3))
    scales = np.full((M, 3), 0.08, np.float32)
    quats = np.zeros((M, 4), np.float32); quats[:, 0] = 1
    opac = np.full(M, 0.7, np.float32)
    alive = np.zeros(M, bool); alive[:n] = True
    shs = np.asarray(rgb_to_sh(jnp.asarray(rng.random((M, 3)))))[:, None, :]

    base = dict(width=W, height=H, max_per_tile=16, max_dup=512, tile_chunk=4)
    cfg_x = splat.SplatConfig(**base, use_pallas=False)
    cfg_p = splat.SplatConfig(**base, use_pallas=True)

    def run(cfg, o):
        out = splat.render(jnp.asarray(means), jnp.asarray(scales),
                           jnp.asarray(quats), o, jnp.asarray(shs),
                           jnp.asarray(alive), ca, jnp.asarray([0.2, 0.1, 0.0]),
                           cfg, 0)
        return out["render"]

    ox = run(cfg_x, jnp.asarray(opac))
    op = run(cfg_p, jnp.asarray(opac))
    np.testing.assert_allclose(np.asarray(ox), np.asarray(op), atol=1e-5)

    gx = jax.grad(lambda o: (run(cfg_x, o) ** 2).sum())(jnp.asarray(opac))
    gp = jax.grad(lambda o: (run(cfg_p, o) ** 2).sum())(jnp.asarray(opac))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp), atol=1e-4)

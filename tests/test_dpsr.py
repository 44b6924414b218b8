"""DPSR tests: indicator field of an oriented sphere point set."""

import numpy as np
import jax
import jax.numpy as jnp

from dgmesh_tpu.ops.dpsr import DPSR, grid_interp, point_rasterize


def sphere_points(n=2000, radius=0.25, center=0.5, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = center + radius * d
    normals = d  # outward
    return pts.astype(np.float32), normals.astype(np.float32)


def test_point_rasterize_conserves_mass():
    pts = jnp.asarray([[0.3, 0.6, 0.9], [0.51, 0.52, 0.53]])
    vals = jnp.asarray([[1.0, 2.0], [3.0, -1.0]])
    grid = point_rasterize(pts, vals, (16, 16, 16))
    np.testing.assert_allclose(np.asarray(grid.sum(axis=(0, 1, 2))),
                               [4.0, 1.0], atol=1e-5)


def test_grid_interp_inverts_constant():
    grid = jnp.full((8, 8, 8), 2.5)
    pts = jnp.asarray([[0.1, 0.5, 0.9], [0.33, 0.66, 0.05]])
    out = grid_interp(grid, pts, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-5)


def test_dpsr_sphere_sign():
    pts, normals = sphere_points()
    dpsr = DPSR((64, 64, 64), sig=2.0)
    phi = np.asarray(dpsr(jnp.asarray(pts), jnp.asarray(normals)))
    # shape_as_points convention after scale: φ(0,0,0 corner) = ±0.5;
    # sign-fix like the reference renderer (renderer.py:164-167): make the
    # corner (far outside) positive.
    if phi[0, 0, 0] < 0:
        phi = -phi
    # DPSR grid node i sits at position i/res (periodic convention)
    g = np.arange(64) / 64.0
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    inside = r < 0.15
    outside = (r > 0.38) & (r < 0.49)
    assert (phi[inside] < 0).mean() > 0.99, "inside must be negative"
    assert (phi[outside] > 0).mean() > 0.99, "outside must be positive"
    # φ is an indicator (±0.5 plateaus), with the zero crossing at the
    # surface: check crossing location along the center row
    row = phi[:, 32, 32]
    crossings = np.nonzero(np.diff(np.sign(row)))[0]
    radii = np.abs(crossings / 64.0 + 0.5 / 64 - 0.5)
    np.testing.assert_allclose(radii, 0.25, atol=1.5 / 64)


def test_dpsr_padding_invariance():
    """Padded dead points (zero normals, valid-mask) must not change φ."""
    pts, normals = sphere_points(n=500)
    dpsr = DPSR((32, 32, 32), sig=2.0)
    phi_ref = dpsr(jnp.asarray(pts), jnp.asarray(normals))

    pad = 200
    pts_p = np.concatenate([pts, np.full((pad, 3), 0.123, np.float32)])
    normals_p = np.concatenate([normals, np.zeros((pad, 3), np.float32)])
    valid = np.concatenate([np.ones(500, bool), np.zeros(pad, bool)])
    phi_pad = dpsr(jnp.asarray(pts_p), jnp.asarray(normals_p), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(phi_pad), np.asarray(phi_ref),
                               atol=1e-4)


def test_dpsr_splat_mode_matches_spectral():
    """The 2-FFT divergence-splat path must agree with the spectral path.

    The two differ only in how the hat kernel's derivative is taken (analytic
    vs spectral); with the Gaussian low-pass the indicator fields should be
    nearly identical after the shift/scale normalization."""
    pts, normals = sphere_points(n=3000)
    res = (48, 48, 48)
    phi_s = np.asarray(DPSR(res, sig=2.0)(jnp.asarray(pts), jnp.asarray(normals)))
    phi_f = np.asarray(DPSR(res, sig=2.0, div_mode="splat")(
        jnp.asarray(pts), jnp.asarray(normals)))
    if phi_s[0, 0, 0] < 0:
        phi_s = -phi_s
    if phi_f[0, 0, 0] < 0:
        phi_f = -phi_f
    # same normalized scale (corner = +0.5), compare fields directly
    corr = np.corrcoef(phi_s.ravel(), phi_f.ravel())[0, 1]
    assert corr > 0.995, corr
    # zero-crossing radius along center row matches within half a voxel
    for phi in (phi_f,):
        row = phi[:, 24, 24]
        crossings = np.nonzero(np.diff(np.sign(row)))[0]
        radii = np.abs(crossings / 48.0 + 0.5 / 48 - 0.5)
        np.testing.assert_allclose(radii, 0.25, atol=1.5 / 48)


def test_dpsr_matmul_fft_matches_xla():
    """MXU matmul-DFT Poisson solve ≡ the XLA-FFT solve (same splat mode)."""
    pts, normals = sphere_points(n=1000)
    res = (32, 32, 32)
    phi_x = np.asarray(DPSR(res, sig=2.0, div_mode="splat")(
        jnp.asarray(pts), jnp.asarray(normals)))
    phi_m = np.asarray(DPSR(res, sig=2.0, div_mode="splat", fft_impl="matmul")(
        jnp.asarray(pts), jnp.asarray(normals)))
    np.testing.assert_allclose(phi_m, phi_x, atol=2e-3)

    def loss(p, n):
        return (DPSR(res, sig=2.0, div_mode="splat", fft_impl="matmul")(p, n) ** 2).mean()

    gp, gn = jax.grad(loss, argnums=(0, 1))(jnp.asarray(pts), jnp.asarray(normals))
    assert np.isfinite(np.asarray(gp)).all() and np.abs(np.asarray(gn)).sum() > 0


def test_dpsr_splat_mode_gradients():
    pts, normals = sphere_points(n=200)
    dpsr = DPSR((24, 24, 24), sig=2.0, div_mode="splat")

    def loss(p, n):
        return (dpsr(p, n) ** 2).mean()

    gp, gn = jax.grad(loss, argnums=(0, 1))(jnp.asarray(pts), jnp.asarray(normals))
    assert np.isfinite(np.asarray(gp)).all() and np.isfinite(np.asarray(gn)).all()
    assert np.abs(np.asarray(gp)).sum() > 0 and np.abs(np.asarray(gn)).sum() > 0


def test_dpsr_gradients():
    pts, normals = sphere_points(n=200)
    dpsr = DPSR((24, 24, 24), sig=2.0)

    def loss(p, n):
        return (dpsr(p, n) ** 2).mean()

    gp, gn = jax.grad(loss, argnums=(0, 1))(jnp.asarray(pts), jnp.asarray(normals))
    assert np.isfinite(np.asarray(gp)).all() and np.isfinite(np.asarray(gn)).all()
    assert np.abs(np.asarray(gp)).sum() > 0 and np.abs(np.asarray(gn)).sum() > 0


def test_dpsr_splat_mode_training_scale():
    """ADVICE r1: the div-splat fast path must match the spectral divergence
    at the TRAINING sigma (3.0) on a shape with high-frequency content —
    not just the easy res-48/sig-2 sphere.  Calibrated 2026-08: rel L2
    0.4%, inside/outside agreement 1-1e-6, surface-band RMS 0.007 (phi
    scale ±0.5) on a bumpy sphere at res 96-128."""
    rng = np.random.default_rng(0)
    n = 20000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = (0.30 + 0.03 * np.sin(36 * d[:, 0]) * np.cos(28 * d[:, 1])
         + 0.02 * np.sin(55 * d[:, 2]))
    pts = (0.5 + d * r[:, None]).astype(np.float32)
    normals = d.astype(np.float32)

    res = (96, 96, 96)
    phi_s = np.asarray(DPSR(res, sig=3.0)(jnp.asarray(pts), jnp.asarray(normals)))
    phi_f = np.asarray(DPSR(res, sig=3.0, div_mode="splat")(
        jnp.asarray(pts), jnp.asarray(normals)))
    if phi_s[0, 0, 0] < 0:
        phi_s = -phi_s
    if phi_f[0, 0, 0] < 0:
        phi_f = -phi_f
    rel_l2 = np.linalg.norm(phi_s - phi_f) / np.linalg.norm(phi_s)
    assert rel_l2 < 0.01, rel_l2
    m = np.abs(phi_s) > 0.02        # inside/outside, away from the iso level
    agree = (np.sign(phi_s[m]) == np.sign(phi_f[m])).mean()
    assert agree > 0.9999, agree
    band = np.abs(phi_s) < 0.1      # the band marching-tets actually reads
    band_rms = float(np.sqrt(((phi_s[band] - phi_f[band]) ** 2).mean()))
    assert band_rms < 0.02, band_rms

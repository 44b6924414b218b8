"""Unit tests: SH, losses, quaternions, schedules, kNN, cameras, config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgmesh_tpu import cameras, schedules
from dgmesh_tpu.config import Config, config_from_args
from dgmesh_tpu.ops import knn, losses, quaternion, sh


def test_sh_deg0_constant():
    coeffs = jnp.zeros((4, 3, 16)).at[:, :, 0].set(1.0)
    dirs = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh.eval_sh(3, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out), sh.C0, atol=1e-6)


def test_sh_roundtrip():
    rgb = jnp.asarray([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb),
                               atol=1e-6)


def test_sh_band1_integrates_to_zero():
    # band-1 SH must average to ~0 over the sphere
    rng = np.random.default_rng(1)
    d = rng.normal(size=(200_00, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    coeffs = jnp.zeros((1, 1, 4)).at[0, 0, 2].set(1.0)
    vals = sh.eval_sh(1, jnp.broadcast_to(coeffs, (d.shape[0], 1, 4)), jnp.asarray(d))
    assert abs(float(vals.mean())) < 2e-2  # MC integration, 20k samples


def test_quat_rotmat_orthonormal(rng):
    q = jnp.asarray(rng.normal(size=(10, 4)))
    R = quaternion.quat_to_rotmat(q)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_quat_multiply_identity(rng):
    q = quaternion.normalize(jnp.asarray(rng.normal(size=(5, 4))))
    ident = jnp.asarray([[1.0, 0, 0, 0]] * 5)
    np.testing.assert_allclose(np.asarray(quaternion.quat_multiply(ident, q)),
                               np.asarray(q), atol=1e-6)


def test_covariance_isotropic():
    s = jnp.asarray([[0.5, 0.5, 0.5]])
    q = jnp.asarray([[1.0, 0, 0, 0]])
    cov = quaternion.build_covariance(s, q)
    np.testing.assert_allclose(np.asarray(cov[0]), 0.25 * np.eye(3), atol=1e-6)


def test_ssim_identical_is_one(rng):
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    assert float(losses.ssim(img, img)) > 0.999


def test_ssim_decreases_with_noise(rng):
    img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    noisy = img + 0.3 * jnp.asarray(rng.normal(size=(3, 32, 32)).astype(np.float32))
    assert float(losses.ssim(img, noisy)) < float(losses.ssim(img, img))


def test_msssim_range(rng):
    img = jnp.asarray(rng.uniform(size=(3, 192, 192)).astype(np.float32))
    v = float(losses.ms_ssim(img, img))
    assert v > 0.99


def test_psnr_known_value():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, atol=1e-4)


def test_expon_lr_endpoints():
    lr0 = float(schedules.expon_lr(0, 1e-2, 1e-4, max_steps=100))
    lr_end = float(schedules.expon_lr(100, 1e-2, 1e-4, max_steps=100))
    np.testing.assert_allclose(lr0, 1e-2, rtol=1e-5)
    np.testing.assert_allclose(lr_end, 1e-4, rtol=1e-5)
    assert float(schedules.expon_lr(-1, 1e-2, 1e-4)) == 0.0


def test_knn_exact(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(50, 3)).astype(np.float32)
    d2, idx = knn.knn(jnp.asarray(q), jnp.asarray(pts), 4, q_block=16, r_block=64)
    # numpy brute force
    full = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(full, axis=1)[:, :4]
    ref_d = np.sort(full, axis=1)[:, :4]
    np.testing.assert_allclose(np.asarray(d2), ref_d, rtol=1e-3, atol=1e-5)
    assert (np.asarray(idx) == ref_idx).mean() > 0.98  # ties may permute


def test_knn_self_exclude(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    d2 = knn.mean_knn_dist2(jnp.asarray(pts), k=3)
    assert float(d2.min()) > 0.0


def test_knn_valid_mask(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[:10] = True
    d2, idx = knn.knn(jnp.asarray(pts[:5]), jnp.asarray(pts), 2,
                      ref_valid=jnp.asarray(valid), q_block=8, r_block=16)
    assert (np.asarray(idx) < 10).all()


def test_camera_roundtrip():
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, -0.2, 4.0]
    cam = cameras.camera_from_c2w_blender(0, c2w, 0.8, 64, 48, 0.0)
    # camera center must equal the c2w translation
    np.testing.assert_allclose(cam.camera_center, c2w[:3, 3], atol=1e-5)
    # a point in front of the camera projects near image center
    p = np.array([0.5, -0.2, 0.0, 1.0])
    ph = cam.full_proj @ p
    ndc = ph[:3] / ph[3]
    assert abs(ndc[0]) < 1e-5 and abs(ndc[1]) < 1e-5
    # depth positive in view space
    pv = cam.world_view @ p
    assert pv[2] > 0


def test_projection_from_K_matches_fov():
    W, H = 64, 48
    fovx = 0.9
    fx = cameras.fov2focal(fovx, W)
    fovy = cameras.focal2fov(fx, H)
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
    P1 = cameras.projection_matrix(0.01, 100.0, fovx, fovy)
    P2 = cameras.projection_matrix_from_K(0.01, 100.0, K, W, H)
    np.testing.assert_allclose(np.abs(P1), np.abs(P2), atol=1e-4)


def test_config_yaml_overrides_cli(tmp_path):
    import argparse
    from dgmesh_tpu.config import add_config_args
    p = argparse.ArgumentParser()
    add_config_args(p)
    args = p.parse_args(["--iterations", "1000", "--grid_res", "128"])
    yml = tmp_path / "c.yaml"
    yml.write_text("iterations: 25000\nwhite_background: true\n")
    cfg = config_from_args(args, str(yml))
    assert cfg.optimization.iterations == 25000      # YAML wins (reference semantics)
    assert cfg.model.grid_res == 128                 # CLI survives when YAML silent
    assert cfg.model.white_background is True


def test_config_save_load(tmp_path):
    cfg = Config()
    cfg.model.sh_degree = 2
    path = str(tmp_path / "out" / "cfg.json")
    cfg.save(path)
    cfg2 = Config.load(path)
    assert cfg2.model.sh_degree == 2


def test_chunked_apply_matches_unchunked(rng):
    import jax
    import jax.numpy as jnp
    from dgmesh_tpu.models.mlp import DeformNetwork, chunked_apply

    net = DeformNetwork(depth=3, width=32, multires=4, is_blender=False)
    x = jnp.asarray(rng.normal(size=(103, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(103, 1)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x[:8], t[:8])
    ref = net.apply(params, x, t)
    out = chunked_apply(net.apply, params, x, t, chunk=16)  # 103 → 7 chunks
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # gradients flow to params and inputs identically
    def loss_ref(p, xx):
        return sum(jnp.sum(o ** 2) for o in net.apply(p, xx, t))

    def loss_chk(p, xx):
        return sum(jnp.sum(o ** 2)
                   for o in chunked_apply(net.apply, p, xx, t, chunk=16))

    g1 = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g2 = jax.grad(loss_chk, argnums=(0, 1))(params, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5), g1, g2)

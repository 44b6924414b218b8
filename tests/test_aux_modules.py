"""Tests: pose utils, SE(3) exp maps, point-cloud metric suite, LPIPS gating."""

import math

import numpy as np
import jax.numpy as jnp


def test_pose_spherical_radius():
    from dgmesh_tpu.pose_utils import pose_spherical
    c2w = pose_spherical(30.0, -30.0, 4.0)
    assert np.isclose(np.linalg.norm(c2w[:3, 3]), 4.0, atol=1e-5)


def test_rodrigues_roundtrip():
    from dgmesh_tpu.pose_utils import rodrigues_mat_to_rot, rodrigues_rot_to_mat
    r = np.array([0.3, -0.2, 0.5])
    R = rodrigues_rot_to_mat(r)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-8)
    r2 = rodrigues_mat_to_rot(R)
    np.testing.assert_allclose(r, r2, atol=1e-6)


def test_exp_se3_identity():
    from dgmesh_tpu.ops.rigid import exp_se3
    S = jnp.asarray([[1.0, 0, 0, 0, 0, 0]])
    T = exp_se3(S, jnp.zeros((1, 1)))
    np.testing.assert_allclose(np.asarray(T[0]), np.eye(4), atol=1e-6)


def test_exp_se3_pure_rotation():
    from dgmesh_tpu.ops.rigid import exp_se3
    # rotate 90° about z
    S = jnp.asarray([[0.0, 0, 1, 0, 0, 0]])
    T = np.asarray(exp_se3(S, jnp.full((1, 1), math.pi / 2)))[0]
    np.testing.assert_allclose(T[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], 0, atol=1e-7)


def test_se3_transform_translation():
    from dgmesh_tpu.ops.rigid import se3_transform_points
    # zero rotation, unit v along x, theta=2 → translate by 2 x
    xyz = jnp.asarray([[1.0, 2.0, 3.0]])
    S = jnp.asarray([[0.0, 0, 0, 1.0, 0, 0]])
    out = se3_transform_points(xyz, S, jnp.full((1, 1), 2.0))
    np.testing.assert_allclose(np.asarray(out), [[3.0, 2.0, 3.0]], atol=1e-5)


def test_point_metrics_suite(rng):
    from dgmesh_tpu.eval.point_metrics import compute_all_metrics, emd_cd
    base = [rng.normal(size=(128, 3)).astype(np.float32) * 0.3 for _ in range(4)]
    near = [b + 0.01 * rng.normal(size=b.shape).astype(np.float32) for b in base]
    far = [rng.normal(size=(128, 3)).astype(np.float32) * 0.3 + 2.0 for _ in range(4)]

    res_near = compute_all_metrics(near, base)
    res_far = compute_all_metrics(far, base)
    assert res_near["CD_MMD"] < res_far["CD_MMD"]
    assert res_near["JSD"] < res_far["JSD"]
    assert res_near["CD_COV"] >= 0.75

    pair = emd_cd(np.stack(near), np.stack(base))
    assert pair["CD"] < 0.01 and pair["EMD"] < 0.2


def test_lpips_gated_nan():
    from dgmesh_tpu.eval.lpips_jax import lpips_available, rgb_lpips
    assert not lpips_available("alex") or True  # env-dependent; just exercise
    v = rgb_lpips(jnp.zeros((3, 32, 32)), jnp.ones((3, 32, 32)))
    # without weights this must be NaN, never a wrong number
    import math as m
    if not lpips_available("alex"):
        assert m.isnan(v)

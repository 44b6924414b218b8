"""Parity: sharded DPSR (x-pencil decomposition over an 8-device mesh) vs the
single-device operator — values and gradients (DESIGN.md §5 plan item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dgmesh_tpu.ops.dpsr import DPSR
from dgmesh_tpu.parallel.sharded_dpsr import dpsr_sharded

RES = 48
N = 1024


def _mesh8():
    devs = np.array(jax.devices()[:8])
    if devs.size < 8:
        pytest.skip("needs 8 virtual devices (conftest sets "
                    "xla_force_host_platform_device_count=8)")
    return Mesh(devs, ("gauss",))


def _sphere_cloud(seed=0, n=N, dead_frac=0.25):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = 0.5 + 0.28 * d + rng.normal(scale=0.003, size=(n, 3))
    normals = d + rng.normal(scale=0.05, size=(n, 3))
    valid = rng.random(n) > dead_frac
    pts[~valid] = 0.0
    normals[~valid] = 0.0
    return (jnp.asarray(pts, jnp.float32), jnp.asarray(normals, jnp.float32),
            jnp.asarray(valid))


@pytest.mark.parametrize("fft_impl", ["xla"])
def test_sharded_dpsr_forward_parity(fft_impl):
    op = DPSR((RES,) * 3, sig=2.0, div_mode="splat", fft_impl=fft_impl)
    pts, normals, valid = _sphere_cloud()
    ref = jax.jit(lambda p, n, v: op(p, n, v))(pts, normals, valid)

    mesh = _mesh8()
    got = jax.jit(lambda p, n, v: dpsr_sharded(mesh, op, p, n, v))(
        pts, normals, valid)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_sharded_dpsr_grad_parity():
    op = DPSR((RES,) * 3, sig=2.0, div_mode="splat", fft_impl="xla")
    pts, normals, valid = _sphere_cloud(seed=1)
    # a mesh-loss-shaped scalar: weighted sum of the indicator grid
    w = jnp.asarray(np.random.default_rng(2).normal(size=(RES,) * 3),
                    jnp.float32)

    def loss_ref(p, n):
        return jnp.sum(op(p, n, valid) * w)

    mesh = _mesh8()

    def loss_sh(p, n):
        return jnp.sum(dpsr_sharded(mesh, op, p, n, valid) * w)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(pts, normals)
    g_sh = jax.jit(jax.grad(loss_sh, argnums=(0, 1)))(pts, normals)
    for a, b, name in zip(g_sh, g_ref, ("points", "normals")):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=f"grad wrt {name}")


def test_sharded_dpsr_guards():
    op = DPSR((50,) * 3, sig=2.0, div_mode="splat")
    mesh = _mesh8()
    pts, normals, valid = _sphere_cloud()
    with pytest.raises(ValueError, match="not divisible"):
        dpsr_sharded(mesh, op, pts, normals, valid)
    op2 = DPSR((RES,) * 3, sig=2.0, div_mode="spectral")
    with pytest.raises(NotImplementedError):
        dpsr_sharded(mesh, op2, pts, normals, valid)

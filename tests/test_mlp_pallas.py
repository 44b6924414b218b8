"""Fused Pallas MLP trunk vs the plain XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from dgmesh_tpu.models.mlp import DeformNetwork, MLPTrunk


def _trunk_pair(rng, depth=8, width=256, din=93, n=64):
    plain = MLPTrunk(depth=depth, width=width, dtype=jnp.bfloat16, fuse=False)
    fused = MLPTrunk(depth=depth, width=width, dtype=jnp.bfloat16, fuse=True)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)
    return plain, fused, params, x


def test_fused_trunk_matches_plain(rng):
    plain, fused, params, x = _trunk_pair(rng)
    a = np.asarray(plain.apply(params, x))
    b = np.asarray(fused.apply(params, x))
    # same weights, same math, bf16 rounding differences only
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.999


def test_fused_trunk_grads_match(rng):
    plain, fused, params, x = _trunk_pair(rng, n=32)

    def loss(mod, p, xx):
        return jnp.sum(mod.apply(p, xx) ** 2)

    ga = jax.grad(lambda p, xx: loss(plain, p, xx), argnums=(0, 1))(params, x)
    gb = jax.grad(lambda p, xx: loss(fused, p, xx), argnums=(0, 1))(params, x)

    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b in zip(flat_a, flat_b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=0.08)


def test_fused_full_network(rng):
    """End-to-end through DeformNetwork with the blender timenet + heads."""
    net_p = DeformNetwork(is_blender=True, with_normal=True,
                          dtype=jnp.bfloat16, fuse=False)
    net_f = DeformNetwork(is_blender=True, with_normal=True,
                          dtype=jnp.bfloat16, fuse=True)
    x = jnp.asarray(rng.normal(size=(48, 3)).astype(np.float32))
    t = jnp.asarray(rng.random(size=(48, 1)).astype(np.float32))
    params = net_p.init(jax.random.PRNGKey(1), x, t)
    outs_p = net_p.apply(params, x, t)
    outs_f = net_f.apply(params, x, t)
    for a, b in zip(outs_p, outs_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.02)


def test_fused_trunk_nonmultiple_rows(rng):
    """Row counts that don't divide the preferred block still work."""
    plain, fused, params, _ = _trunk_pair(rng, n=8)
    x = jnp.asarray(rng.normal(size=(8, 93)).astype(np.float32))
    a = np.asarray(plain.apply(params, x))
    b = np.asarray(fused.apply(params, x))
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)

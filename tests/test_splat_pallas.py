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

    rgb, alpha = composite_tiles_pallas(jnp.asarray(attrs), jnp.asarray(origins),
                                        th, tw, interpret=True)

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

"""Fast prefix-scan tests (ops/scan.py) vs numpy references."""

import numpy as np
import jax
import jax.numpy as jnp

from dgmesh_tpu.ops.scan import (cumsum1d, cummax1d, cumsum_cols,
                                 rank_in_sorted, searchsorted1d)


def test_cumsum1d_exact_int32(rng):
    for n in (7, 1024, 1025, 40_000, 200_001):
        x = rng.integers(-(2 ** 20), 2 ** 20, n).astype(np.int32)
        out = np.asarray(jax.jit(cumsum1d)(jnp.asarray(x)))
        np.testing.assert_array_equal(out, np.cumsum(x, dtype=np.int64).astype(np.int32))


def test_cumsum1d_exact_large_values(rng):
    # values whose prefixes exceed 2^24 — the two-half f32 matmul must stay exact
    x = rng.integers(0, 2 ** 27, 50_000).astype(np.int32)
    out = np.asarray(cumsum1d(jnp.asarray(x)))
    ref = np.cumsum(x.astype(np.int64))
    np.testing.assert_array_equal(out, ref.astype(np.int32))  # int32 wraparound semantics


def test_cummax1d(rng):
    for n in (12, 5000, 70_000):
        x = rng.integers(-1000, 1000, n).astype(np.int32)
        out = np.asarray(jax.jit(cummax1d)(jnp.asarray(x)))
        np.testing.assert_array_equal(out, np.maximum.accumulate(x))


def test_cumsum_cols(rng):
    x = rng.normal(size=(30_000, 4)).astype(np.float32)
    out = np.asarray(jax.jit(cumsum_cols)(jnp.asarray(x)))
    ref = np.cumsum(x, axis=0, dtype=np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-2)


def test_searchsorted1d(rng):
    for n in (1, 5, 127, 128, 129, 4096, 10_001):
        a = np.sort(rng.integers(-100, 100, n).astype(np.int32))
        v = rng.integers(-120, 120, 500).astype(np.int32)
        for side in ("left", "right"):
            out = np.asarray(jax.jit(
                lambda a_, v_, s=side: searchsorted1d(a_, v_, side=s)
            )(jnp.asarray(a), jnp.asarray(v)))
            ref = np.searchsorted(a, v, side=side)
            np.testing.assert_array_equal(out, ref)


def test_rank_in_sorted_matches_searchsorted(rng):
    for n, m in ((1, 64), (1000, 1), (4096, 10_000)):
        a = np.sort(rng.integers(0, 2 ** 29, n).astype(np.int32))
        v = rng.integers(0, 2 ** 29, m).astype(np.int32)
        for side in ("left", "right"):
            out = np.asarray(jax.jit(
                lambda a_, v_, s=side: rank_in_sorted(a_, v_, side=s)
            )(jnp.asarray(a), jnp.asarray(v)))
            np.testing.assert_array_equal(out, np.searchsorted(a, v, side=side))


def test_rank_in_sorted_keeps_query_shape(rng):
    a = np.sort(rng.integers(0, 1000, 64).astype(np.int32))
    v = rng.integers(0, 1000, (17, 3)).astype(np.int32)
    out = np.asarray(rank_in_sorted(jnp.asarray(a), jnp.asarray(v)))
    assert out.shape == (17, 3)
    np.testing.assert_array_equal(out.reshape(-1),
                                  np.searchsorted(a, v.reshape(-1)))


def test_searchsorted1d_duplicates_and_bounds():
    a = jnp.asarray(np.array([2, 2, 2, 5, 5, 9], np.int32))
    v = jnp.asarray(np.array([1, 2, 3, 5, 9, 10], np.int32))
    np.testing.assert_array_equal(
        np.asarray(searchsorted1d(a, v, side="left")), [0, 0, 3, 3, 5, 6])
    np.testing.assert_array_equal(
        np.asarray(searchsorted1d(a, v, side="right")), [0, 3, 3, 5, 6, 6])

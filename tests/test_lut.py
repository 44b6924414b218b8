"""tiny_lut must be bit-exact with a plain gather for every packing regime."""

import jax.numpy as jnp
import numpy as np

from dgmesh_tpu.ops.lut import tiny_lut


def _check(table, n_idx=5000, seed=0):
    rng = np.random.default_rng(seed)
    flat = np.asarray(table).reshape(-1)
    idx = rng.integers(0, flat.size, size=n_idx).astype(np.int32)
    got = np.asarray(tiny_lut(jnp.asarray(idx), table))
    np.testing.assert_array_equal(got, flat[idx])


def test_small_values_packed_many_per_word():
    _check(np.array([[0, 1, 2, 1], [2, 0, 1, 2]], np.int32))  # 2-bit entries


def test_mid_values_packed_few_per_word():
    rng = np.random.default_rng(1)
    _check(rng.integers(0, 200, size=100).astype(np.int32))   # 8-bit entries


def test_large_values_one_per_word():
    rng = np.random.default_rng(2)
    _check(rng.integers(0, 1 << 30, size=36).astype(np.int64))


def test_single_entry_table():
    _check(np.array([7], np.int32), n_idx=16)


def test_multidim_index_shapes():
    rng = np.random.default_rng(3)
    table = rng.integers(0, 6, size=(6, 16)).astype(np.int32)
    idx = rng.integers(0, 96, size=(37, 6)).astype(np.int32)
    got = np.asarray(tiny_lut(jnp.asarray(idx), table))
    np.testing.assert_array_equal(got, table.reshape(-1)[idx])

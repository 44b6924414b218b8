"""Gather-only stream compaction for TPU.

`jnp.nonzero(size=K)` lowers to cumsum + **bincount scatter over the full
input length** — scatters of 10⁸ elements serialize badly on TPU.  This
formulation is scatter-free: output slot j binary-searches the inclusive
cumsum for the j-th set bit.  Cost: one linear scan (cumsum) + K·log N
gathers, both TPU-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .scan import cumsum1d, searchsorted1d


# TPU scatters cost ~1 element/cycle, linear in the *universe* size; the
# unrolled binary search costs log2(n)·size gathered elements.  Scatter wins
# until the universe dwarfs the output (24M-element cube masks keep the
# search path: 74 ms searched vs 156 ms scattered, measured on v5e).
_SCATTER_MAX_UNIVERSE = 8_000_000


def compact_indices(mask, size: int, fill_value: int):
    """Indices of the first `size` True entries of 1-D `mask`, padded with
    fill_value.  Equivalent to jnp.nonzero(mask, size=size,
    fill_value=fill_value)[0] without the full-universe bincount scatter that
    jnp.nonzero(size=) lowers to.  Also returns the true count."""
    n = mask.shape[0]
    c = cumsum1d(mask.astype(jnp.int32))
    total = c[-1]
    if n <= _SCATTER_MAX_UNIVERSE:
        # each active element knows its output slot (its rank); one .set
        # scatter with unique indices, overflow slots ≥ size dropped
        slot = jnp.where(mask, c - 1, size)
        idx = jnp.full(size, fill_value, jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        return idx, total
    j = jnp.arange(size, dtype=jnp.int32)
    idx = searchsorted1d(c, j + 1, side="left")
    idx = jnp.where(j < total, idx, fill_value)
    return idx, total

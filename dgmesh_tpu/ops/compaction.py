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


def compact_indices(mask, size: int, fill_value: int):
    """Indices of the first `size` True entries of 1-D `mask`, padded with
    fill_value.  Equivalent to jnp.nonzero(mask, size=size,
    fill_value=fill_value)[0] but gather-only.  Also returns the true count."""
    c = cumsum1d(mask.astype(jnp.int32))
    total = c[-1]
    j = jnp.arange(size, dtype=jnp.int32)
    idx = searchsorted1d(c, j + 1, side="left")
    idx = jnp.where(j < total, idx, fill_value)
    return idx, total

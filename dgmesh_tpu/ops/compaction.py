"""Stream compaction for TPU.

`jnp.nonzero(size=K)` lowers to cumsum + **bincount scatter over the full
input length** — scatters of 10⁸ elements serialize badly on TPU.  Two
TPU-friendly formulations instead:

- small universes: each active element knows its output slot (its rank from a
  cumsum); one `.set` scatter with unique indices.
- huge universes (the 288³·cube masks, ~24M): a 3-level 32×32×1024 hierarchy.
  The j-th set bit is located by one tiny scatter+cummax over rows (which row
  holds rank j), then two 32-wide *vectorized* rank comparisons against MXU
  prefix-sum rows — no log₂(n)·K binary-search gather chain.  Measured on
  v5e at n=24M, K=262144: 49.4 ms (unrolled searchsorted) → 7.4 ms.
"""

from __future__ import annotations

import jax.numpy as jnp

from .scan import cummax1d, cumsum1d


# TPU scatters cost ~1 element/cycle, linear in the *universe* size; beyond
# this the hierarchical rank-descent path wins (it touches the universe only
# through (K,32) packed-row gathers).
_SCATTER_MAX_UNIVERSE = 8_000_000

# Hierarchy shape: rows of 32 sub-blocks of 32 bits = 1024 elements/row.
# All matmul operands stay ≤ 256, exact in bf16 on the MXU at DEFAULT
# precision (accumulation is f32).
_SUB = 32
_ROW = _SUB * _SUB


def compact_indices(mask, size: int, fill_value: int):
    """Indices of the first `size` True entries of 1-D `mask`, padded with
    fill_value.  Equivalent to jnp.nonzero(mask, size=size,
    fill_value=fill_value)[0] without the full-universe bincount scatter that
    jnp.nonzero(size=) lowers to.  Also returns the true count."""
    n = mask.shape[0]
    if n <= _SCATTER_MAX_UNIVERSE:
        c = cumsum1d(mask.astype(jnp.int32))
        total = c[-1]
        # each active element knows its output slot (its rank); one .set
        # scatter with unique indices, overflow slots ≥ size dropped
        slot = jnp.where(mask, c - 1, size)
        idx = jnp.full(size, fill_value, jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        return idx, total
    return _compact_hierarchical(mask, size, fill_value)


def _compact_hierarchical(mask, size: int, fill_value: int):
    """3-level rank descent: row (1024) → sub-block (32) → bit (32).

    Level 0 — row counts + exclusive cumsum give each 1024-wide row its output
    range [row_start, row_start+row_cnt).  A K-slot scatter of row indices at
    their start slots + cummax assigns every output slot j its source row.
    Levels 1/2 — within the row, rank r = j − row_start descends via two
    32-lane comparisons against inclusive prefix sums (computed as (·,32) ×
    lower-triangular MXU matmuls): first over the row's 32 sub-block counts,
    then over the chosen sub-block's 32 mask bits.
    """
    n = mask.shape[0]
    rows = -(-n // _ROW)
    pad = rows * _ROW - n
    m = jnp.pad(mask, (0, pad)) if pad else mask
    mi = m.reshape(rows, _SUB, _SUB).astype(jnp.int32)
    sub_cnt = mi.sum(axis=2)                                # (rows, 32)
    row_cnt = sub_cnt.sum(axis=1)                           # (rows,)
    row_end = cumsum1d(row_cnt)
    row_start = row_end - row_cnt
    total = row_end[-1]

    # which row owns output slot j: scatter row index at its start, fill down
    slot = jnp.where((row_cnt > 0) & (row_start < size), row_start, size)
    out_row = jnp.zeros(size, jnp.int32).at[slot].max(
        jnp.arange(rows, dtype=jnp.int32), mode="drop")
    out_row = cummax1d(out_row)

    j = jnp.arange(size, dtype=jnp.int32)
    r = j - row_start[out_row]                              # rank within row
    tri = jnp.tril(jnp.ones((_SUB, _SUB), jnp.float32))     # inclusive cumsum
    sub_cum = jnp.matmul(sub_cnt.astype(jnp.float32), tri.T).astype(jnp.int32)
    row_vals = sub_cum[out_row]                             # (size,32) one packed gather
    le = row_vals <= r[:, None]
    s = le.astype(jnp.int32).sum(axis=1)                    # sub-block index
    prev = jnp.max(jnp.where(le, row_vals, 0), axis=1)      # ranks before it
    r2 = r - prev
    g = out_row * _SUB + s
    bits = m.reshape(rows * _SUB, _SUB)[
        jnp.minimum(g, rows * _SUB - 1)].astype(jnp.float32)
    bit_cum = jnp.matmul(bits, tri.T)
    k = (bit_cum <= r2[:, None].astype(jnp.float32)).astype(jnp.int32).sum(axis=1)
    idx = g * _SUB + k
    idx = jnp.where(j < jnp.minimum(total, size), idx, fill_value)
    return idx, total

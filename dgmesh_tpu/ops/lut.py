"""Gather-free lookups into tiny constant tables.

On TPU a gather costs ~10-15 ns per INDEX regardless of table size
(DESIGN.md cost model), so streaming millions of indices through a 36- or
96-entry table pays full gather price.  For tables this small a balanced
binary select tree over bit-packed int32 constants compiles to one fused
elementwise loop on the VPU — measured ~6x faster than the gather at the
marching-tets workload (1.57M indices into [6,6]/[6,16] tables).

Used by ops/marching_tets.py for the derived tet tables (the reference's
equivalent tables live in CUDA constant memory inside `diso.DiffMC`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _select_tree(idx, words, base):
    """words[idx - base] for a Python list of int32 constants, as a balanced
    where-tree (all elementwise; XLA fuses the whole tree into one loop)."""
    n = len(words)
    if n == 1:
        return jnp.full(idx.shape, jnp.int32(words[0]))
    mid = n // 2
    return jnp.where(idx < base + mid,
                     _select_tree(idx, words[:mid], base),
                     _select_tree(idx, words[mid:], base + mid))


def tiny_lut(idx, table):
    """table.reshape(-1)[idx] without a gather.

    idx: int32 array (any shape) of flat indices into `table`;
    table: numpy integer array with values in [0, 2**31).  Entries are
    bit-packed little-endian into int32 words (a power-of-two count per word
    so word/sub-index splits are shifts), the word is picked by a select
    tree, and the entry is extracted with shift+mask.
    """
    flat = np.asarray(table).reshape(-1).astype(np.int64)
    if flat.size == 0 or flat.min() < 0 or flat.max() >= (1 << 31):
        # not an assert: under python -O a bad table would silently mis-pack
        raise ValueError("tiny_lut requires non-negative int32 values")
    bits = max(int(flat.max()).bit_length(), 1)
    per = 32 // bits
    per = 1 << (per.bit_length() - 1) if per >= 1 else 1  # power of two
    nwords = -(-flat.size // per)
    words = []
    for w in range(nwords):
        acc = 0
        for j in range(per):
            k = w * per + j
            if k < flat.size:
                acc |= int(flat[k]) << (j * bits)
        if acc >= 1 << 31:                                # to signed int32
            acc -= 1 << 32
        words.append(acc)

    idx = idx.astype(jnp.int32)
    if per > 1:
        shift_per = per.bit_length() - 1
        word = _select_tree(idx >> shift_per, words, 0)
        sub = (idx & (per - 1)) * bits
        # logical shift: the packed word may have its sign bit set
        word = jnp.right_shift(word.view(jnp.uint32),
                               sub.astype(jnp.uint32)).view(jnp.int32)
        return word & ((1 << bits) - 1)
    out = _select_tree(idx, words, 0)
    if bits < 32:
        out = out & ((1 << bits) - 1)
    return out

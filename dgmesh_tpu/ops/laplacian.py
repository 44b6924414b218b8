"""Mesh regularizers on padded buffers.

reference: nvdiffrast_utils/regularizer.py — laplace_regularizer_const :40-59
(uniform umbrella Laplacian via scatter-add over edges), normal_consistency
:64-82, avg_edge_length :31-34.  All segment-sum based → deterministic on TPU.

All functions take (verts (V,3), faces (F,3), face_valid (F,)) padded arrays;
invalid faces contribute nothing and padded verts receive no gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _face_edges(faces):
    """Directed edge list (3F, 2) from faces — both directions accumulate in
    the umbrella operator like the reference's compute_edges path."""
    e = jnp.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]],
                        axis=0)
    return e


def _segment_accumulate(keys, vals, n_segments: int):
    """Σ vals per key, scatter-free: sort by key, prefix-sum, take segment
    differences at boundaries found by searchsorted.  TPU scatter-add over
    millions of colliding indices lowers terribly; sort+scan does not.

    keys (E,) int32 in [0, n_segments]; vals (E, C).  Returns (n_segments, C).
    """
    order_key, order = jax.lax.sort_key_val(
        keys, jnp.arange(keys.shape[0], dtype=jnp.int32))
    vs = vals[order]
    csum = jnp.cumsum(vs, axis=0)
    zero = jnp.zeros((1,) + vs.shape[1:], vs.dtype)
    csum = jnp.concatenate([zero, csum], axis=0)          # (E+1, C)
    seg = jnp.arange(n_segments, dtype=jnp.int32)
    lo = jnp.searchsorted(order_key, seg, side="left")
    hi = jnp.searchsorted(order_key, seg, side="right")
    return csum[hi] - csum[lo]


def laplacian_uniform(verts, faces, face_valid, n_verts=None):
    """Mean squared uniform-Laplacian magnitude.

    reference: laplace_regularizer_const :40-59 — for every vertex,
    L(v) = (Σ_neighbors n_j)/deg − v, loss = mean ‖L‖².  Each undirected edge
    appears in ≥1 face; the reference iterates edges per face which counts an
    interior edge twice (once per adjacent face) — we match that weighting by
    accumulating over per-face directed edges.  Accumulation is sort-based
    (no scatter-add; see _segment_accumulate).
    """
    V = verts.shape[0]
    e = _face_edges(faces)                        # (3F,2)
    w = jnp.repeat(face_valid.astype(verts.dtype), 3)
    # both directions: key = endpoint, val = [w·neighbor, w]
    keys = jnp.concatenate([e[:, 0], e[:, 1]])
    nbr = jnp.concatenate([verts[e[:, 1]], verts[e[:, 0]]], axis=0)
    ww = jnp.concatenate([w, w])
    keys = jnp.where(ww > 0, keys, V)             # dead edges → sentinel bin
    vals = jnp.concatenate([nbr * ww[:, None], ww[:, None]], axis=1)  # (2E,4)
    acc = _segment_accumulate(keys, vals, V)      # (V,4)
    nb, deg = acc[:, :3], acc[:, 3]
    has = deg > 0
    lap = nb / jnp.maximum(deg, 1.0)[:, None] - jnp.where(has[:, None], verts, 0.0)
    lap = jnp.where(has[:, None], lap, 0.0)
    nv = jnp.maximum(jnp.sum(has.astype(verts.dtype)), 1.0)
    return jnp.sum(lap * lap) / nv


def face_normals(verts, faces, face_valid, normalize: bool = True):
    tri = verts[faces]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    if normalize:
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    return jnp.where(face_valid[:, None], n, 0.0)


def face_centroids(verts, faces, face_valid):
    tri = verts[faces]
    c = tri.mean(axis=1)
    return jnp.where(face_valid[:, None], c, 0.0)


def face_areas(verts, faces, face_valid):
    tri = verts[faces]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return jnp.where(face_valid, 0.5 * jnp.linalg.norm(n, axis=-1), 0.0)


def avg_edge_length(verts, faces, face_valid):
    """reference: regularizer.py avg_edge_length :31-34."""
    e = _face_edges(faces)
    w = jnp.repeat(face_valid.astype(verts.dtype), 3)
    l = jnp.linalg.norm(verts[e[:, 0]] - verts[e[:, 1]], axis=-1)
    return jnp.sum(l * w) / jnp.maximum(jnp.sum(w), 1.0)


def normal_consistency(verts, faces, face_valid):
    """1 − mean cos between adjacent-in-fan vertex normals approximation.

    reference: regularizer.py normal_consistency :64-82 compares the two face
    normals across each interior edge; we compute per-vertex area-weighted
    normals and penalise face-vs-vertex disagreement — same fixed point
    (smooth normals), segment-sum friendly, no edge→face adjacency build.
    """
    fn = face_normals(verts, faces, face_valid, normalize=False)
    V = verts.shape[0]
    vn = jnp.zeros((V, 3), verts.dtype)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    vn = vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-12)
    fnu = fn / (jnp.linalg.norm(fn, axis=-1, keepdims=True) + 1e-12)
    cos = jnp.einsum("fd,fd->f", fnu, (vn[faces[:, 0]] + vn[faces[:, 1]]
                                       + vn[faces[:, 2]]) / 3.0)
    w = face_valid.astype(verts.dtype)
    return jnp.sum((1.0 - cos) * w) / jnp.maximum(jnp.sum(w), 1.0)

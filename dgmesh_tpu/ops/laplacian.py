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

from .scan import cumsum_cols, searchsorted1d


def _face_edges(faces):
    """Directed edge list (3F, 2) from faces — both directions accumulate in
    the umbrella operator like the reference's compute_edges path."""
    e = jnp.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]],
                        axis=0)
    return e


def _segment_bounds(order_key, n_segments: int):
    """[lo, hi) index ranges of each key-run in a sorted key array.

    One search over arange(n_segments+1): for integer keys,
    searchsorted(k+1, left) == searchsorted(k, right), so hi is just lo
    shifted — halves the binary-search cost vs a left+right pair.
    """
    bounds = searchsorted1d(order_key, jnp.arange(n_segments + 1,
                                                  dtype=jnp.int32), side="left")
    return bounds[:-1], bounds[1:]


def _segment_accumulate(keys, vals, n_segments: int):
    """Σ vals per key, scatter-free: sort by key, prefix-sum, take segment
    differences at run boundaries.  TPU scatter-add over millions of
    colliding indices lowers terribly; sort+scan does not.

    keys (E,) int32 in [0, n_segments]; vals (E, C).  Returns (n_segments, C).
    """
    order_key, order = jax.lax.sort_key_val(
        keys, jnp.arange(keys.shape[0], dtype=jnp.int32))
    vs = vals[order]
    csum = cumsum_cols(vs)
    zero = jnp.zeros((1,) + vs.shape[1:], vs.dtype)
    csum = jnp.concatenate([zero, csum], axis=0)          # (E+1, C)
    lo, hi = _segment_bounds(order_key, n_segments)
    return csum[hi] - csum[lo]


@jax.custom_vjp
def laplacian_uniform(verts, faces, face_valid):
    """Mean squared uniform-Laplacian magnitude.

    reference: laplace_regularizer_const :40-59 — for every vertex,
    L(v) = (Σ_neighbors n_j)/deg − v, loss = mean ‖L‖².  Each undirected edge
    appears in ≥1 face; the reference iterates edges per face which counts an
    interior edge twice (once per adjacent face) — we match that weighting by
    accumulating over per-face directed edges.

    Both passes are sort-based segment accumulations — NO scatter-adds in
    forward OR backward (autodiff of the neighbor gather would emit a
    colliding scatter-add; the analytic adjoint is just another neighbor sum:
    dL/dv = (2/Nv)·(Σ_{u∈N(v)} lap_u/deg_u − lap_v)).  The backward reuses
    the forward's sort order and segment bounds (same keys ⇒ same runs), so
    it is one gather + one blocked prefix-sum.
    """
    loss, _ = _laplacian_fwd_impl(verts, faces, face_valid)
    return loss


def _laplacian_fwd_impl(verts, faces, face_valid):
    V = verts.shape[0]
    # per-directed-edge stream (6F): a 3F per-face-corner variant with the
    # neighbour SUMS riding a 6-payload sort measured SLOWER on v5e (multi-
    # payload compare-exchange cost outweighs the halved stream); keep the
    # 2-array sort + one row gather.
    e = _face_edges(faces)                        # (3F,2)
    valid3 = jnp.repeat(face_valid, 3)
    # both directions: key = endpoint, other = neighbor
    keys = jnp.concatenate([e[:, 0], e[:, 1]])
    other = jnp.concatenate([e[:, 1], e[:, 0]])
    vv = jnp.concatenate([valid3, valid3])
    keys = jnp.where(vv, keys, V)                 # dead edges → sentinel bin

    # neighbor ids ride the sort as the payload — no iota+gather indirection
    order_key, other_s = jax.lax.sort_key_val(keys, other)
    vs = verts[other_s]                           # invalid rows land in bin V
    csum = jnp.concatenate([jnp.zeros((1, 3), verts.dtype), cumsum_cols(vs)])
    lo, hi = _segment_bounds(order_key, V)
    nb = csum[hi] - csum[lo]                      # (V,3) Σ neighbors
    deg = (hi - lo).astype(verts.dtype)           # bins < V hold only valid edges

    has = deg > 0
    lap = nb / jnp.maximum(deg, 1.0)[:, None] - jnp.where(has[:, None], verts, 0.0)
    lap = jnp.where(has[:, None], lap, 0.0)
    nv = jnp.maximum(jnp.sum(has.astype(verts.dtype)), 1.0)
    loss = jnp.sum(lap * lap) / nv
    return loss, (other_s, lo, hi, lap, deg, has, nv)


def _laplacian_fwd(verts, faces, face_valid):
    loss, res = _laplacian_fwd_impl(verts, faces, face_valid)
    return loss, res


def _laplacian_bwd(res, g):
    other_s, lo, hi, lap, deg, has, nv = res
    # dL/dv = (2/nv)·(Σ_{u∈N(v)} lap_u/deg_u − lap_v); neighbor sum over the
    # SAME sorted edge slots — no sort, no search, just gather + prefix-sum.
    lap_over_deg = lap / jnp.maximum(deg, 1.0)[:, None]
    contrib = lap_over_deg[other_s]
    csum = jnp.concatenate([jnp.zeros((1, 3), lap.dtype), cumsum_cols(contrib)])
    acc = csum[hi] - csum[lo]
    dv = (2.0 / nv) * (acc - lap)
    dv = jnp.where(has[:, None], dv, 0.0) * g
    return dv, None, None


laplacian_uniform.defvjp(_laplacian_fwd, _laplacian_bwd)


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

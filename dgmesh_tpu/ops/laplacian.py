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


def _corner_neighbor_sum(field, faces, keys_flat, lo=None, hi=None, V=None):
    """Σ over N(v) of a per-vertex field, via the per-face-corner identity.

    Within one face (a,b,c), corner a's two neighbours are b and c, so the
    per-corner contribution is (Σ_corners field) − field_corner — ONE row per
    face-corner (3F) instead of one per directed edge (6F), and the only
    random access is the (F,3) face gather ``field[faces]`` (which XLA CSEs
    with the renderer's identical per-face gathers when field is verts).
    Sort-based segment accumulation: no colliding scatter-adds.
    """
    gf = field[faces]                             # (F,3,C)
    contrib = gf.sum(axis=1, keepdims=True) - gf  # (F,3,C) Σ other corners
    c = contrib.reshape(-1, field.shape[-1])
    order_key, px, py, pz = jax.lax.sort(
        (keys_flat, c[:, 0], c[:, 1], c[:, 2]), num_keys=1)
    if lo is None:
        lo, hi = _segment_bounds(order_key, V)
    vs = jnp.stack([px, py, pz], axis=-1)
    csum = jnp.concatenate([jnp.zeros((1, 3), field.dtype), cumsum_cols(vs)])
    return csum[hi] - csum[lo], lo, hi


@jax.custom_vjp
def laplacian_uniform(verts, faces, face_valid):
    """Mean squared uniform-Laplacian magnitude.

    reference: laplace_regularizer_const :40-59 — for every vertex,
    L(v) = (Σ_neighbors n_j)/deg − v, loss = mean ‖L‖².  Each undirected edge
    appears in ≥1 face; the reference iterates edges per face which counts an
    interior edge twice (once per adjacent face) — we match that weighting by
    accumulating per face corner (each incident face contributes a vertex's
    two in-face neighbours once ⇒ deg = 2 × corner count).

    Both passes are sort-based segment accumulations — NO scatter-adds and no
    per-edge random gathers (the 6F ``verts[other]`` gather of the previous
    design was the single most expensive op in the train step; the per-corner
    identity needs only the (F,3) face gather, which CSEs with the mesh
    renderer's).  The analytic adjoint is another neighbour sum:
    dL/dv = (2/Nv)·(Σ_{u∈N(v)} lap_u/deg_u − lap_v) — same corner stream,
    same precomputed segment bounds, one re-sort.
    """
    loss, _ = _laplacian_fwd_impl(verts, faces, face_valid)
    return loss


def _laplacian_fwd_impl(verts, faces, face_valid):
    V = verts.shape[0]
    keys = jnp.where(face_valid[:, None], faces, V).reshape(-1)  # (3F,)
    nb, lo, hi = _corner_neighbor_sum(verts, faces, keys, V=V)   # (V,3)
    deg = 2.0 * (hi - lo).astype(verts.dtype)     # 2 neighbours per corner

    has = deg > 0
    lap = nb / jnp.maximum(deg, 1.0)[:, None] - jnp.where(has[:, None], verts, 0.0)
    lap = jnp.where(has[:, None], lap, 0.0)
    nv = jnp.maximum(jnp.sum(has.astype(verts.dtype)), 1.0)
    loss = jnp.sum(lap * lap) / nv
    return loss, (faces, keys, lo, hi, lap, deg, has, nv)


def _laplacian_fwd(verts, faces, face_valid):
    loss, res = _laplacian_fwd_impl(verts, faces, face_valid)
    return loss, res


def _laplacian_bwd(res, g):
    faces, keys, lo, hi, lap, deg, has, nv = res
    # dL/dv = (2/nv)·(Σ_{u∈N(v)} lap_u/deg_u − lap_v); same corner stream and
    # segment bounds as the forward — no search, one sort + prefix-sum.
    lap_over_deg = lap / jnp.maximum(deg, 1.0)[:, None]
    acc, _, _ = _corner_neighbor_sum(lap_over_deg, faces, keys, lo, hi)
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

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


def laplacian_uniform(verts, faces, face_valid):
    """Mean squared uniform-Laplacian magnitude.

    reference: laplace_regularizer_const :40-59 — for every vertex,
    L(v) = (Σ_neighbors n_j)/deg − v, loss = mean ‖L‖².  Each undirected edge
    appears in ≥1 face; the reference iterates edges per face which counts an
    interior edge twice (once per adjacent face) — we match that weighting by
    accumulating per face corner (each incident face contributes a vertex's
    two in-face neighbours once ⇒ deg = 2 × corner count).

    Both passes are single multi-column scatter-adds over the 3F per-corner
    stream, with no per-edge random gathers (the 6F ``verts[other]`` gather of
    the earlier design was the single most expensive op in the train step; the
    per-corner identity needs only the (F,3) face gather, which CSEs with the
    mesh renderer's).  The analytic adjoint is another neighbour sum:
    dL/dv = (2/Nv)·(Σ_{u∈N(v)} lap_u/deg_u − lap_v) — same corner stream,
    one more scatter-add.
    """
    return laplacian_uniform_tri(verts[faces], verts, faces, face_valid)


@jax.custom_vjp
def laplacian_uniform_tri(tri, verts, faces, face_valid):
    """laplacian_uniform over a PRE-GATHERED corner tensor tri = verts[faces].

    The caller shares one ``verts[faces]`` gather between this regularizer and
    the mesh rasterizer (mesh_raster._face_screen), so in the backward their
    per-corner cotangents sum elementwise and go through ONE 3F-row
    scatter-add into dverts — the adjoint here produces dtri directly via a
    (F,3) gather of lap/deg (no scatter of its own).
    """
    loss, _ = _laplacian_tri_fwd(tri, verts, faces, face_valid)
    return loss


def _laplacian_tri_fwd(tri, verts, faces, face_valid):
    V = verts.shape[0]
    keys = jnp.where(face_valid[:, None], faces, V).reshape(-1)  # (3F,)
    contrib = tri.sum(axis=1, keepdims=True) - tri    # (F,3,3) Σ other corners
    c = contrib.reshape(-1, 3)
    c = jnp.concatenate([c, jnp.ones((c.shape[0], 1), tri.dtype)], -1)
    acc = jnp.zeros((V + 1, 4), tri.dtype).at[keys].add(c)[:V]
    nb = acc[:, :3]                               # (V,3)
    deg = 2.0 * acc[:, 3]                         # 2 neighbours per corner

    has = deg > 0
    lap = nb / jnp.maximum(deg, 1.0)[:, None] - jnp.where(has[:, None], verts, 0.0)
    lap = jnp.where(has[:, None], lap, 0.0)
    nv = jnp.maximum(jnp.sum(has.astype(verts.dtype)), 1.0)
    loss = jnp.sum(lap * lap) / nv
    return loss, (faces, face_valid, lap, deg, nv)


def _laplacian_tri_bwd(res, g):
    faces, face_valid, lap, deg, nv = res
    # ∂loss/∂contrib[f,k] = (2/nv)·(lap/deg)[faces[f,k]]  (=: G[f,k]), and
    # contrib[f,k] = Σ_{j≠k} tri[f,j]  ⇒  dtri[f,j] = Σ_{k≠j} G[f,k].
    # The direct −verts term in lap gives dverts = −(2/nv)·lap.
    G = (lap / jnp.maximum(deg, 1.0)[:, None])[faces]     # (F,3,3)
    dtri = G.sum(axis=1, keepdims=True) - G
    dtri = jnp.where(face_valid[:, None, None], dtri, 0.0) * ((2.0 / nv) * g)
    dverts = lap * (-(2.0 / nv) * g)              # lap already 0 where no deg
    return dtri, dverts, None, None


laplacian_uniform_tri.defvjp(
    lambda tri, verts, faces, face_valid: _laplacian_tri_fwd(
        tri, verts, faces, face_valid),
    _laplacian_tri_bwd)


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

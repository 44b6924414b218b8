"""Marching tetrahedra tests: sphere geometry, watertightness, gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from dgmesh_tpu.ops.marching_tets import MTConfig, marching_tets


def sphere_field(res, center=0.5, radius=0.3):
    """outside>0 convention: φ = |x-c| - r."""
    g = np.linspace(0, 1, res)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return np.sqrt((x - center) ** 2 + (y - center) ** 2 + (z - center) ** 2) - radius


CFG = MTConfig(res=32, max_verts=8192, max_faces=16384, max_cubes=8192,
               use_narrow_band=True)


def test_sphere_verts_on_surface():
    phi = jnp.asarray(sphere_field(32), jnp.float32)
    m = marching_tets(phi, CFG)
    assert int(m.overflow) == 0
    nv, nf = int(m.n_verts), int(m.n_faces)
    assert nv > 200 and nf > 400
    v = np.asarray(m.verts)[:nv]
    r = np.linalg.norm(v - 0.5, axis=1)
    np.testing.assert_allclose(r, 0.3, atol=2e-2)


def test_sphere_watertight_and_oriented():
    phi = jnp.asarray(sphere_field(32), jnp.float32)
    m = marching_tets(phi, CFG)
    nv, nf = int(m.n_verts), int(m.n_faces)
    f = np.asarray(m.faces)[:nf]
    v = np.asarray(m.verts)[:nv]
    # no degenerate references
    assert f.max() < nv
    # watertight: every undirected edge appears exactly twice
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # consistently wound: every directed edge appears exactly once
    dedges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    _, dcounts = np.unique(dedges, axis=0, return_counts=True)
    assert (dcounts == 1).all()
    # outward normals: n · (centroid - center) > 0 for a sphere
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(axis=1) - 0.5
    dots = (n * c).sum(-1)
    assert (dots > 0).mean() > 0.999
    # Euler characteristic of a sphere: V - E + F = 2
    E = len(edges) // 2
    assert nv - E + nf == 2


def test_sphere_area_volume():
    phi = jnp.asarray(sphere_field(48, radius=0.35), jnp.float32)
    cfg = MTConfig(res=48, max_verts=32768, max_faces=65536, max_cubes=32768)
    m = marching_tets(phi, cfg)
    nf = int(m.n_faces)
    v = np.asarray(m.verts)
    f = np.asarray(m.faces)[:nf]
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(n, axis=1).sum()
    vol = np.abs((tri[:, 0] * np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0
                 - 0.0)  # divergence theorem about origin... use signed sum
    # signed volume about any point works for closed mesh
    vol = np.abs(np.einsum("ij,ij->", tri[:, 0], np.cross(tri[:, 1], tri[:, 2]))) / 6.0
    np.testing.assert_allclose(area, 4 * np.pi * 0.35 ** 2, rtol=2e-2)
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * 0.35 ** 3, rtol=3e-2)


def test_gradient_moves_surface():
    """d(vert radius)/d(iso offset) should be ≈ -1 (field is a distance fn)."""
    phi0 = jnp.asarray(sphere_field(32), jnp.float32)

    def mean_radius(offset):
        m = marching_tets(phi0 - offset, CFG)
        r = jnp.linalg.norm(m.verts - 0.5, axis=1)
        return jnp.sum(jnp.where(m.vert_valid, r, 0.0)) / jnp.sum(m.vert_valid)

    g = jax.grad(mean_radius)(jnp.asarray(0.0))
    # raising the offset grows the inside region: dr/doffset = +1 for SDF
    np.testing.assert_allclose(float(g), 1.0, atol=5e-2)


def test_empty_field():
    phi = jnp.ones((32, 32, 32))  # all outside, no surface
    m = marching_tets(phi, CFG)
    assert int(m.n_verts) == 0 and int(m.n_faces) == 0


def test_flat_vs_blocked_compaction_identical():
    """The narrow-band blocked compaction must emit exactly the same mesh
    (same vertex order) as the flat res³ path, and the flat path must stay
    correct at a res where blocking is unavailable (res % 16 != 0)."""
    phi = jnp.asarray(sphere_field(32), jnp.float32)
    flat = MTConfig(res=32, max_verts=8192, max_faces=16384, max_cubes=8192,
                    use_narrow_band=False)
    m_f = marching_tets(phi, flat)
    m_b = marching_tets(phi, CFG)          # CFG has use_narrow_band=True
    assert int(m_f.n_verts) == int(m_b.n_verts)
    assert int(m_f.n_faces) == int(m_b.n_faces)
    np.testing.assert_array_equal(np.asarray(m_f.faces), np.asarray(m_b.faces))
    np.testing.assert_allclose(np.asarray(m_f.verts), np.asarray(m_b.verts))

    # flat path at a non-divisible res still watertight on a sphere
    phi35 = jnp.asarray(sphere_field(35), jnp.float32)
    cfg35 = MTConfig(res=35, max_verts=8192, max_faces=16384, max_cubes=8192,
                     use_narrow_band=True)  # requested but res forces flat
    m35 = marching_tets(phi35, cfg35)
    assert int(m35.overflow) == 0
    nv = int(m35.n_verts)
    r = np.linalg.norm(np.asarray(m35.verts)[:nv] - 0.5, axis=1)
    np.testing.assert_allclose(r, 0.3, atol=2e-2)


def test_block_overflow_falls_back_to_exact_flat_path():
    """When the surface touches more blocks than max_blocks, the lax.cond
    fallback must produce EXACTLY the flat compaction's mesh — narrow-band
    is a speed path, never a truncation."""
    phi = jnp.asarray(sphere_field(32), jnp.float32)
    tiny = MTConfig(res=32, max_verts=8192, max_faces=16384, max_cubes=8192,
                    max_blocks=16, use_narrow_band=True)  # overflows → fallback
    big = MTConfig(res=32, max_verts=8192, max_faces=16384, max_cubes=8192,
                   max_blocks=4096, use_narrow_band=True)
    m_t = marching_tets(phi, tiny)
    m_b = marching_tets(phi, big)
    assert int(m_t.n_verts) == int(m_b.n_verts)
    assert int(m_t.n_faces) == int(m_b.n_faces)
    np.testing.assert_array_equal(np.asarray(m_t.faces), np.asarray(m_b.faces))
    np.testing.assert_allclose(np.asarray(m_t.verts), np.asarray(m_b.verts))

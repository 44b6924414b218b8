"""Parity: sharded marching tets (x-slab decomposition, 8-device CPU mesh)
vs the single-device extractor — identical vertex sequence and identical
triangle geometry (DESIGN.md §5 plan item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dgmesh_tpu.ops.marching_tets import MTConfig, marching_tets
from dgmesh_tpu.parallel.sharded_mt import marching_tets_sharded

RES = 48


def _mesh8():
    devs = np.array(jax.devices()[:8])
    if devs.size < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs, ("gauss",))


def _field(kind="sphere"):
    g = np.linspace(0.0, 1.0, RES, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    if kind == "sphere":
        phi = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) - 0.31
    else:  # torus-ish: tests cross-slab topology
        q = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.28
        phi = np.sqrt(q ** 2 + (z - 0.5) ** 2) - 0.12
    return jnp.asarray(phi)


def _cfg():
    return MTConfig(res=RES, max_verts=16384, max_faces=32768,
                    max_cubes=16384)


@pytest.mark.parametrize("kind", ["sphere", "torus"])
def test_sharded_mt_parity(kind):
    phi = _field(kind)
    cfg = _cfg()
    ref = jax.jit(lambda p: marching_tets(p, cfg))(phi)
    mesh = _mesh8()
    got = jax.jit(lambda p: marching_tets_sharded(mesh, p, cfg))(phi)

    nv, nf = int(ref.n_verts), int(ref.n_faces)
    assert int(got.n_verts) == nv
    assert int(got.n_faces) == nf
    assert int(got.overflow) == 0 and int(ref.overflow) == 0

    # vertex parity: per-chip blocks are ascending-gid and chips ascend in x,
    # so the masked concatenation equals the single-device prefix EXACTLY
    vs = np.asarray(got.verts)[np.asarray(got.vert_valid)]
    vr = np.asarray(ref.verts)[:nv]
    np.testing.assert_array_equal(vs, vr)

    # face parity: indices differ (block vs prefix layout) but the triangle
    # GEOMETRY must match as a set — compare sorted corner-coordinate rows
    def tris(m, n):
        v = np.asarray(m.verts)
        f = np.asarray(m.faces)[np.asarray(m.face_valid)]
        t = v[f].reshape(-1, 9)
        # canonicalize corner order within each tri before row-sorting
        t3 = t.reshape(-1, 3, 3)
        order = np.lexsort((t3[..., 2], t3[..., 1], t3[..., 0]), axis=-1)
        t3 = np.take_along_axis(t3, order[..., None], axis=1)
        t = t3.reshape(-1, 9)
        return t[np.lexsort(t.T[::-1])]

    np.testing.assert_allclose(tris(got, nf), tris(ref, nf), atol=0.0)


def test_sharded_mt_guards():
    mesh = _mesh8()
    cfg = MTConfig(res=50, max_verts=128, max_faces=128, max_cubes=128)
    with pytest.raises(ValueError, match="not divisible"):
        marching_tets_sharded(mesh, jnp.zeros((50, 50, 50)), cfg)
    cfg2 = MTConfig(res=RES, max_verts=128, max_faces=128, max_cubes=128,
                    use_narrow_band=True)
    with pytest.raises(NotImplementedError):
        marching_tets_sharded(mesh, jnp.zeros((RES,) * 3), cfg2)

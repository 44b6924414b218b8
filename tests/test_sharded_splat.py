"""Sharded splat (per-chip binning + all_to_all tile exchange) vs the
single-device renderer — exact-parity and gradient-parity pins.

The merge argument (parallel/sharded_splat.py docstring): per-chip top-K
lists merged on (merge_depth_rank, global id) reproduce the unsharded tile
lists exactly, so images should agree to float-accumulation tolerance even
when tiles overflow K.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgmesh_tpu.cameras import camera_from_c2w_blender
from dgmesh_tpu.ops import splat
from dgmesh_tpu.ops.sh import rgb_to_sh
from dgmesh_tpu.parallel.sharding import make_mesh
from dgmesh_tpu.parallel.sharded_splat import render_sharded

N_DEV = 8


def _setup(rng, n=600, pad_to=1024, W=128, H=96, max_per_tile=64,
           max_dup=1 << 14, deg=1):
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    cam = camera_from_c2w_blender(0, c2w, fovx=1.0, width=W, height=H, fid=0.0)
    means = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.02, 0.15, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    n_sh = (deg + 1) ** 2
    shs = rng.normal(size=(n, n_sh, 3)).astype(np.float32) * 0.3
    alive = np.zeros(pad_to, bool)
    alive[:n] = True

    def pad(x):
        out = np.zeros((pad_to,) + x.shape[1:], x.dtype)
        out[:n] = x
        return out

    cfg = splat.SplatConfig(width=W, height=H, tile_h=16, tile_w=16,
                            max_per_tile=max_per_tile, max_dup=max_dup,
                            tile_chunk=8)
    args = (jnp.asarray(pad(means)), jnp.asarray(pad(scales)),
            jnp.asarray(pad(quats)), jnp.asarray(pad(opac)),
            jnp.asarray(pad(shs)), jnp.asarray(alive))
    ca = splat.CameraArrays.from_camera(cam)
    return args, ca, cfg, deg


@pytest.mark.parametrize("max_per_tile", [64, 8])
def test_sharded_matches_single_device(rng, max_per_tile):
    """Exact tile-list parity → image parity, incl. when K truncates (K=8)."""
    args, ca, cfg, deg = _setup(rng, max_per_tile=max_per_tile)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    ref = splat.render(*args, ca, bg, cfg, sh_degree=deg)
    mesh = make_mesh(N_DEV, devices=jax.devices("cpu"))
    out = render_sharded(mesh, *args, ca, bg, cfg, sh_degree=deg)

    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["radii"]),
                                  np.asarray(ref["radii"]))
    # counters agree: the merge-truncation count equals the global count
    assert int(out["aux"]["tile_overflow"]) == int(ref["aux"]["tile_overflow"])


def test_sharded_under_jit_with_gspmd(rng):
    """render_sharded composes with an outer jit over sharded inputs."""
    args, ca, cfg, deg = _setup(rng, n=300, pad_to=512)
    bg = jnp.zeros(3)
    mesh = make_mesh(N_DEV, devices=jax.devices("cpu"))

    f = jax.jit(lambda *a: render_sharded(mesh, *a, ca, bg, cfg,
                                          sh_degree=deg)["render"])
    out = f(*args)
    ref = splat.render(*args, ca, bg, cfg, sh_degree=deg)["render"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_gradients_match(rng):
    """Gradient parity wrt means/opacities/shs + the screen_offset
    (viewspace-points) statistic used by densification."""
    args, ca, cfg, deg = _setup(rng, n=200, pad_to=256, W=64, H=64,
                                max_per_tile=32)
    bg = jnp.zeros(3)
    mesh = make_mesh(N_DEV, devices=jax.devices("cpu"))
    target = jnp.asarray(np.random.default_rng(1).random((3, 64, 64)),
                         jnp.float32)

    def loss_single(means, opac, shs, so):
        out = splat.render(means, args[1], args[2], opac, shs, args[5], ca,
                           bg, cfg, sh_degree=deg, screen_offset=so)
        return jnp.sum((out["render"] - target) ** 2)

    def loss_sharded(means, opac, shs, so):
        out = render_sharded(mesh, means, args[1], args[2], opac, shs,
                             args[5], ca, bg, cfg, sh_degree=deg,
                             screen_offset=so)
        return jnp.sum((out["render"] - target) ** 2)

    so0 = jnp.zeros((args[0].shape[0], 2), jnp.float32)
    wrt = (args[0], args[3], args[4], so0)
    g_ref = jax.grad(loss_single, argnums=(0, 1, 2, 3))(*wrt)
    g_sh = jax.grad(loss_sharded, argnums=(0, 1, 2, 3))(*wrt)
    for a, b, nm in zip(g_sh, g_ref, ["means", "opac", "shs", "screen"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4, err_msg=nm)

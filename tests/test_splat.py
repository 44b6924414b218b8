"""Gaussian splatting rasterizer tests vs brute-force numpy reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgmesh_tpu.cameras import Camera, camera_from_c2w_blender
from dgmesh_tpu.ops import splat
from dgmesh_tpu.ops.sh import rgb_to_sh
from tests.reference_impls import splat_reference

import math


def make_camera(W=64, H=48):
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0  # camera at z=+3 looking down -z (blender convention)
    return camera_from_c2w_blender(0, c2w, fovx=1.0, width=W, height=H, fid=0.0)


def make_scene(rng, n=60, pad_to=128):
    means = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    alive = np.zeros(pad_to, bool)
    alive[:n] = True

    def pad(x):
        out = np.zeros((pad_to,) + x.shape[1:], x.dtype)
        out[:n] = x
        return out

    return dict(means=pad(means), scales=pad(scales), quats=pad(quats),
                opac=pad(opac), colors=pad(colors), alive=alive, n=n)


def run_tpu_render(scene, cam, cfg, bg=(0.0, 0.0, 0.0)):
    shs = rgb_to_sh(jnp.asarray(scene["colors"]))[:, None, :]  # (N,1,3): deg0, storage layout
    ca = splat.CameraArrays.from_camera(cam)
    out = splat.render(
        jnp.asarray(scene["means"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["quats"]), jnp.asarray(scene["opac"]),
        shs, jnp.asarray(scene["alive"]), ca,
        jnp.asarray(bg, jnp.float32), cfg, sh_degree=0)
    return out


def test_matches_numpy_reference(rng):
    W, H = 64, 48
    cam = make_camera(W, H)
    scene = make_scene(rng)
    cfg = splat.SplatConfig(width=W, height=H, tile_h=16, tile_w=16,
                            max_per_tile=128, max_dup=4096, tile_chunk=4)
    out = run_tpu_render(scene, cam, cfg)
    img = np.asarray(out["render"]).transpose(1, 2, 0)

    ref_img, ref_alpha = splat_reference(
        scene["means"][:scene["n"]].astype(np.float64),
        scene["scales"][:scene["n"]], scene["quats"][:scene["n"]],
        scene["opac"][:scene["n"]], scene["colors"][:scene["n"]],
        cam.world_view.astype(np.float64), cam.full_proj.astype(np.float64),
        W, H, math.tan(cam.fovx / 2), math.tan(cam.fovy / 2),
        np.zeros(3))

    assert out["aux"]["tile_overflow"] == 0
    np.testing.assert_allclose(img, ref_img, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref_alpha, atol=2e-3)


def test_white_background(rng):
    W, H = 32, 32
    cam = make_camera(W, H)
    scene = make_scene(rng, n=5, pad_to=8)
    cfg = splat.SplatConfig(width=W, height=H, max_per_tile=16, max_dup=512,
                            tile_chunk=4)
    out = run_tpu_render(scene, cam, cfg, bg=(1.0, 1.0, 1.0))
    img = np.asarray(out["render"])
    # pixels with no splat coverage must be exactly background
    alpha = np.asarray(out["alpha"])
    empty = alpha < 1e-6
    assert empty.any()
    assert np.allclose(img.transpose(1, 2, 0)[empty], 1.0)


def test_gradients_flow(rng):
    W, H = 32, 32
    cam = make_camera(W, H)
    scene = make_scene(rng, n=10, pad_to=16)
    cfg = splat.SplatConfig(width=W, height=H, max_per_tile=32, max_dup=1024,
                            tile_chunk=4)
    ca = splat.CameraArrays.from_camera(cam)
    shs = rgb_to_sh(jnp.asarray(scene["colors"]))[:, None, :]
    target = jnp.zeros((3, H, W))

    def loss_fn(means, scales, opac, shs, screen_offset):
        out = splat.render(means, jnp.asarray(scene["scales"]) * 0 + scales,
                           jnp.asarray(scene["quats"]), opac, shs,
                           jnp.asarray(scene["alive"]), ca,
                           jnp.zeros(3), cfg, sh_degree=0,
                           screen_offset=screen_offset)
        return jnp.abs(out["render"] - target).mean()

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(scene["means"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["opac"]), shs,
        jnp.zeros((scene["alive"].shape[0], 2)))
    names = ["means", "scales", "opac", "shs", "screen"]
    for name, g in zip(names, grads):
        g = np.asarray(g)
        assert np.isfinite(g).all(), name
        assert np.abs(g[: scene["n"]]).sum() > 0, f"no gradient signal for {name}"
        # dead padding slots must receive zero gradient
        assert np.abs(g[scene["n"]:]).sum() == 0, f"padding leaked grads for {name}"


def test_finite_difference_opacity(rng):
    """Central finite difference on a single Gaussian's opacity."""
    W, H = 32, 32
    cam = make_camera(W, H)
    scene = make_scene(rng, n=3, pad_to=4)
    cfg = splat.SplatConfig(width=W, height=H, max_per_tile=8, max_dup=256,
                            tile_chunk=4)
    ca = splat.CameraArrays.from_camera(cam)
    shs = rgb_to_sh(jnp.asarray(scene["colors"]))[:, None, :]

    def loss_fn(opac):
        out = splat.render(jnp.asarray(scene["means"]), jnp.asarray(scene["scales"]),
                           jnp.asarray(scene["quats"]), opac, shs,
                           jnp.asarray(scene["alive"]), ca,
                           jnp.zeros(3), cfg, sh_degree=0)
        return (out["render"] ** 2).sum()

    opac = jnp.asarray(scene["opac"])
    g = jax.grad(loss_fn)(opac)
    eps = 1e-3
    for i in range(scene["n"]):
        e = jnp.zeros_like(opac).at[i].set(eps)
        fd = (loss_fn(opac + e) - loss_fn(opac - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(fd), rtol=2e-2,
                                   atol=1e-4)

"""Per-component f+b timings at the bench problem size (800px, 288³, 100k).

Times each hot op in isolation (forward + backward where differentiable) so
full-step regressions can be attributed.  Usage:
    python tools/micro_bench.py [splat mesh dpsr mt binning mlp]
"""

import functools
import os
import sys
import time

import numpy as np

REPS = 8


def timed(name, fn, *args):
    import jax
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / REPS)
    print(f"{name:42s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    which = set(sys.argv[1:]) or {"splat", "mesh", "dpsr", "mt", "binning", "mlp"}
    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from dgmesh_tpu.config import Config
    from dgmesh_tpu.cameras import camera_from_c2w_blender
    from dgmesh_tpu.ops import splat as SP
    from dgmesh_tpu.ops import mesh_raster as MR
    from dgmesh_tpu.ops.dpsr import DPSR
    from dgmesh_tpu.ops.marching_tets import MTConfig, marching_tets

    W = H = 800
    GRID = 288
    N = 131_072
    rng = np.random.default_rng(0)

    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    cam = camera_from_c2w_blender(0, c2w, 0.8, W, H, 0.5,
                                  image=np.zeros((H, W, 3), np.float32))
    ca = SP.CameraArrays.from_camera(cam)

    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = jnp.asarray((d * (0.45 + 0.05 * rng.random((N, 1)))), jnp.float32)
    alive = jnp.ones(N, bool)

    if "splat" in which:
        scfg = SP.SplatConfig(width=W, height=H, max_per_tile=384,
                              max_dup=1 << 20, tile_chunk=500, use_pallas=True)
        scales = jnp.full((N, 3), np.log(0.01))
        quats = jnp.tile(jnp.asarray([1., 0, 0, 0]), (N, 1))
        opac = jnp.zeros((N, 1))
        shs = jnp.asarray(rng.random((N, 16, 3)), jnp.float32) * 0.1

        def splat_fb(p, s, q, o, sh):
            out = SP.render(p, s, q, o, sh, alive, ca, jnp.zeros(3), scfg, 3)
            return (out["render"] ** 2).mean()

        timed("splat f (pallas)",
              lambda *a: SP.render(*a, alive, ca, jnp.zeros(3), scfg, 3)["render"].sum(),
              pts, scales, quats, opac, shs)
        timed("splat f+b (pallas)", jax.grad(splat_fb, argnums=(0, 1, 2, 3, 4)),
              pts, scales, quats, opac, shs)

    if "mesh" in which or "binning" in which:
        # plausible mesh: icosphere-ish random surface triangulation at bench
        # scale: ~50k verts / ~100k faces visible
        V, F = 262_144, 524_288
        nv, nf = 60_000, 120_000
        vd = rng.normal(size=(nv, 3))
        vd /= np.linalg.norm(vd, axis=1, keepdims=True)
        verts = np.zeros((V, 3), np.float32)
        verts[:nv] = vd * 0.5
        faces = np.zeros((F, 3), np.int32)
        faces[:nf] = rng.integers(0, nv, (nf, 3))
        face_valid = np.zeros(F, bool)
        face_valid[:nf] = True
        verts = jnp.asarray(verts)
        faces = jnp.asarray(faces)
        face_valid = jnp.asarray(face_valid)
        colors = jnp.asarray(rng.random((V, 3)), jnp.float32)
        pose = jnp.asarray(cam.mesh_pose())
        from dgmesh_tpu.cameras import gl_projection_from_K
        proj = jnp.asarray(gl_projection_from_K(cam.intrinsics, W, H))

        def run_mesh(tag, use_pallas):
            mcfg = MR.MeshRasterConfig(width=W, height=H, max_per_tile=96,
                                       max_dup=1 << 20, tile_chunk=500,
                                       use_pallas=use_pallas)

            def mesh_f(v, c):
                out = MR.render_mesh(v, faces, face_valid, c, pose, proj,
                                     jnp.zeros(3), mcfg)
                return out["rgb"].sum() + out["soft_mask"].sum()

            def mesh_fb(v, c):
                out = MR.render_mesh(v, faces, face_valid, c, pose, proj,
                                     jnp.zeros(3), mcfg)
                return (out["rgb"] ** 2).mean() + (out["soft_mask"] ** 2).mean()

            timed(f"mesh raster f ({tag})", mesh_f, verts, colors)
            timed(f"mesh raster f+b ({tag})",
                  jax.grad(mesh_fb, argnums=(0, 1)), verts, colors)

        if "mesh" in which:
            run_mesh("xla", False)
            run_mesh("pallas", True)

        if "binning" in which:
            from dgmesh_tpu.ops.binning import bin_rects, quantize_depth
            tx0 = jnp.asarray(rng.integers(0, 40, F), jnp.int32)
            ty0 = jnp.asarray(rng.integers(0, 40, F), jnp.int32)
            nx = jnp.asarray(rng.integers(1, 3, F), jnp.int32)
            ny = jnp.asarray(rng.integers(1, 3, F), jnp.int32)
            depth = jnp.asarray(rng.random(F), jnp.float32)

            def bin_only(d):
                b = bin_rects(tx0, ty0, nx, ny, quantize_depth(d, face_valid),
                              face_valid, tiles_x=50, tiles_y=50,
                              max_dup=1 << 20, max_per_tile=96)
                return b.tile_idx.sum()

            timed("bin_rects f (1M dup, 524k items)", bin_only, depth)

    if "dpsr" in which:
        dpsr = DPSR((GRID,) * 3, sig=3.0)
        pn = jnp.asarray(rng.random((N, 3)), jnp.float32) * 0.8 + 0.1
        nn = jnp.asarray(d, jnp.float32)

        timed("dpsr f", lambda p, n: dpsr(p, n).sum(), pn, nn)
        if "dpsr_xla_bwd" in which:  # XLA-FFT backward: ~30 min compile
            timed("dpsr f+b",
                  jax.grad(lambda p, n: (dpsr(p, n) ** 2).mean(), argnums=(0, 1)),
                  pn, nn)
        dpsr_s = DPSR((GRID,) * 3, sig=3.0, div_mode="splat")
        timed("dpsr f (div-splat)", lambda p, n: dpsr_s(p, n).sum(), pn, nn)
        timed("dpsr f+b (div-splat)",
              jax.grad(lambda p, n: (dpsr_s(p, n) ** 2).mean(), argnums=(0, 1)),
              pn, nn)
        dpsr_m = DPSR((GRID,) * 3, sig=3.0, div_mode="splat", fft_impl="matmul")
        timed("dpsr f (div-splat+matmulfft)",
              lambda p, n: dpsr_m(p, n).sum(), pn, nn)
        timed("dpsr f+b (div-splat+matmulfft)",
              jax.grad(lambda p, n: (dpsr_m(p, n) ** 2).mean(), argnums=(0, 1)),
              pn, nn)

    if "mt" in which:
        mtc = MTConfig(res=GRID, max_verts=262_144, max_faces=524_288,
                       max_cubes=262_144)
        x = jnp.linspace(-1, 1, GRID)
        gx, gy, gz = jnp.meshgrid(x, x, x, indexing="ij")
        sdf = jnp.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - 0.6

        def mt_f(g):
            m = marching_tets(g, mtc)
            return m.verts.sum()

        def mt_fb(g):
            m = marching_tets(g, mtc)
            return (m.verts ** 2).sum()

        timed("marching tets f", mt_f, sdf)
        timed("marching tets f+b", jax.grad(mt_fb), sdf)

    if "dpsr_parts" in which:
        from dgmesh_tpu.ops.dpsr import point_rasterize, grid_interp
        pn = jnp.asarray(rng.random((N, 3)), jnp.float32) * 0.8 + 0.1
        nn = jnp.asarray(d, jnp.float32)
        grid3 = jnp.asarray(rng.normal(size=(GRID, GRID, GRID, 3)), jnp.float32)
        grid1 = grid3[..., 0]

        timed("point_rasterize f (131k → 288³x3)",
              lambda p, v: point_rasterize(p, v, (GRID,) * 3).sum(), pn, nn)
        timed("point_rasterize f+b",
              jax.grad(lambda p, v: (point_rasterize(p, v, (GRID,) * 3) ** 2
                                     ).sum(), argnums=(0, 1)), pn, nn)
        timed("grid_interp f+b",
              jax.grad(lambda g, p: (grid_interp(g, p, (GRID,) * 3) ** 2).sum(),
                       argnums=(0, 1)), grid1, pn)
        timed("rfftn 3ch channels-last",
              lambda g: jnp.abs(jnp.fft.rfftn(g, axes=(0, 1, 2))).sum(), grid3)
        timed("rfftn 3ch channels-first",
              lambda g: jnp.abs(jnp.fft.rfftn(
                  g.transpose(3, 0, 1, 2), axes=(1, 2, 3))).sum(), grid3)
        timed("rfftn 1ch + irfftn",
              lambda g: jnp.fft.irfftn(
                  jnp.fft.rfftn(g, axes=(0, 1, 2)),
                  s=(GRID,) * 3, axes=(0, 1, 2)).sum(), grid1)

    if "mlp" in which:
        from dgmesh_tpu.models.mlp import DeformNetwork
        net = DeformNetwork(is_blender=True)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)),
                          jnp.zeros((1, 1)))
        t = jnp.zeros((N, 1))

        def mlp_fb(par, p):
            o = net.apply(par, p, t)
            return sum((x ** 2).sum() for x in o if x is not None)

        timed("deform mlp f+b (131k pts)",
              jax.grad(mlp_fb, argnums=(0, 1)), params, pts)

        net16 = DeformNetwork(is_blender=True, dtype=jnp.bfloat16)

        def mlp16_fb(par, p):
            o = net16.apply(par, p, t)
            return sum((x ** 2).sum() for x in o if x is not None)

        timed("deform mlp f+b bf16 (131k pts)",
              jax.grad(mlp16_fb, argnums=(0, 1)), params, pts)


if __name__ == "__main__":
    main()

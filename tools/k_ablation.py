"""Per-tile K-truncation error measurement (VERDICT r2 #4).

The TPU renderers keep the nearest K primitives per tile (static shapes):
``max_gaussians_per_tile`` for the splat path, ``max_faces_per_tile`` for the
mesh path.  ops/splat.py argues overflow beyond K only causes a
slightly-early background blend; this tool MEASURES that claim at the bench
workload (800², 288³-grid mesh, 100k gaussians): render the same frozen
scene at several K and report PSNR of each render against the largest-K
reference render, plus the overflow counters.

Render-only (no training step), so each K variant is a small compile.

Usage:  python tools/k_ablation.py [--gauss 96,192,384,768] [--faces 64,128,256,512]
Writes a markdown table to stdout; paste into DESIGN.md.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gauss", default="96,192,384,768")
    ap.add_argument("--faces", default="64,128,256,512")
    args = ap.parse_args()
    k_gauss = [int(x) for x in args.gauss.split(",")]
    k_faces = [int(x) for x in args.faces.split(",")]

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp
    from dgmesh_tpu.ops import mesh_raster as MR
    from dgmesh_tpu.ops import splat
    from dgmesh_tpu.models import gaussians as G
    from dgmesh_tpu.train.step import StepContext, extract_mesh
    import bench

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
        return 99.0 if mse < 1e-12 else -10 * np.log10(mse)

    # frozen bench state (same construction as bench.py)
    step, state, batch = bench.build(jax, jnp)
    del step
    gp, gs = state.gp, state.gs

    cfg0 = None  # splat config template from a throwaway context
    from dgmesh_tpu.config import Config
    base_cfg = Config()

    # --- splat K sweep ---
    print("## splat K_gauss sweep (PSNR vs K=%d render)" % max(k_gauss))
    print("| K_gauss | PSNR vs max | splat_overflow |")
    print("|---|---|---|")
    renders = {}
    for k in sorted(k_gauss):
        scfg = splat.SplatConfig(
            width=bench.W, height=bench.H, tile_h=base_cfg.tpu.tile_h,
            tile_w=base_cfg.tpu.tile_w, max_per_tile=k, max_dup=1 << 20,
            tile_chunk=500, use_pallas=True)
        fn = jax.jit(lambda gp, gs: splat.render(
            gp.xyz, G.get_scaling(gp), G.get_rotation(gp), G.get_opacity(gp),
            G.get_features(gp), gs.alive, batch.cam, batch.bg, scfg,
            sh_degree=3))
        t0 = time.time()
        out = fn(gp, gs)
        img = np.asarray(out["render"])
        ovf = int(np.asarray(out["aux"]["tile_overflow"]))
        renders[k] = (img, ovf)
        print(f"# K_gauss={k}: {time.time()-t0:.1f}s compile+run",
              file=sys.stderr, flush=True)
    ref = renders[max(k_gauss)][0]
    for k in sorted(k_gauss):
        img, ovf = renders[k]
        print(f"| {k} | {psnr(img, ref):.2f} dB | {ovf} |")

    # --- mesh K sweep ---
    print("\n## mesh K_faces sweep (PSNR of hard-z image vs K=%d)" % max(k_faces))
    print("| K_faces | PSNR vs max | raster_overflow |")
    print("|---|---|---|")
    # one mesh extraction (largest caps), shared across K variants
    ctx = StepContext(base_cfg, bench.W, bench.H)
    ctx.cfg.model.grid_res = bench.GRID
    ctx.cfg.tpu.max_verts = 786_432
    ctx.cfg.tpu.max_faces = 1_572_864
    from dgmesh_tpu.ops.marching_tets import MTConfig
    from dgmesh_tpu.ops.dpsr import DPSR
    ctx.mt_cfg = MTConfig(res=bench.GRID, max_verts=786_432, max_faces=1_572_864,
                          max_cubes=786_432, use_narrow_band=True)
    ctx.dpsr = DPSR((bench.GRID,) * 3, sig=3.0, div_mode="splat",
                    fft_impl="matmul")
    mesh = jax.jit(lambda gp, gs: extract_mesh(
        ctx, gp, gs, jnp.zeros_like(gp.xyz), jnp.zeros_like(gp.xyz), False)
    )(gp, gs)
    print(f"# mesh: V={int(mesh.n_verts)} F={int(mesh.n_faces)} "
          f"ovf={int(mesh.overflow)}", file=sys.stderr, flush=True)
    vtx_color = jnp.abs(mesh.verts) / (
        jnp.max(jnp.abs(mesh.verts)) + 1e-9)  # deterministic colors
    mrenders = {}
    for k in sorted(k_faces):
        mcfg = MR.MeshRasterConfig(
            width=bench.W, height=bench.H, tile_h=base_cfg.tpu.tile_h,
            tile_w=base_cfg.tpu.tile_w, max_per_tile=k, max_dup=1 << 21,
            tile_chunk=500, use_pallas=True, cull_backface=True)
        fn = jax.jit(lambda v, f, fv, c: MR.render_mesh(
            v, f, fv, c, batch.mesh_pose, batch.mesh_proj, batch.bg, mcfg,
            want_soft=False))
        t0 = time.time()
        out = fn(mesh.verts, mesh.faces, mesh.face_valid, vtx_color)
        img = np.asarray(out["rgb"])
        ovf = int(np.asarray(out["aux"]["tile_overflow"]))
        mrenders[k] = (img, ovf)
        print(f"# K_faces={k}: {time.time()-t0:.1f}s compile+run",
              file=sys.stderr, flush=True)
    ref = mrenders[max(k_faces)][0]
    for k in sorted(k_faces):
        img, ovf = mrenders[k]
        print(f"| {k} | {psnr(img, ref):.2f} dB | {ovf} |")


if __name__ == "__main__":
    main()

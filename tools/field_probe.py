"""Examine the actual DPSR field the mesh phase trains on (CPU, no tunnel).

The r5 quality run's field spans [-2.0, 1.7] and fragments catastrophically
when the iso-level rises (thr 0.5 -> extraction wants 1.3M verts), which is
what turns the mask loss's shrink pressure into a runaway.  A clean Poisson
indicator of a sphere-ish object should be a smooth blob.  This tool loads a
real checkpoint, replays the one-shot normal initialization, builds the DPSR
input exactly like the training step, and then:

  * histograms the field per backend (spectral FFT vs div-splat matmul-DFT —
    the quality config runs the latter; parity was pinned at small grids);
  * reports max|diff| between backends at the REAL grid and state;
  * sweeps the iso-level and reports marching-tets V/F at each (fragmentation
    signature: V growing as the iso moves toward the interior).

Usage:  python tools/field_probe.py --run output/quality_run_r5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic-quality-full.yaml")
    ap.add_argument("--run", default="output/quality_run_r5")
    ap.add_argument("--source", default="output/quality_ds")
    ap.add_argument("--ckpt_iter", type=int, default=-1)
    ap.add_argument("--fid", type=float, default=0.0)
    ap.add_argument("--thrs", type=float, nargs="+",
                    default=[0.0, 0.1, 0.2, 0.35, 0.5, 0.7])
    args = ap.parse_args()

    from dgmesh_tpu.config import add_config_args, config_from_args
    p2 = argparse.ArgumentParser()
    p2.add_argument("--config", default=None)
    add_config_args(p2)
    cfg = config_from_args(
        p2.parse_args(["--config", args.config, "-s", args.source,
                       "-m", args.run]), args.config)

    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.train.loop import Trainer
    from dgmesh_tpu.train.checkpoint import load_checkpoint
    from dgmesh_tpu.train.step import StepContext, _deform_all
    from dgmesh_tpu.ops.dpsr import DPSR
    from dgmesh_tpu.ops import marching_tets as MT

    scene = Scene(cfg, shuffle=True, seed=6666)
    trainer = Trainer(cfg, scene, seed=6666)
    trainer.state = load_checkpoint(trainer.state, args.run, args.ckpt_iter)
    state = trainer.state
    print(f"state at step {int(state.step)}", flush=True)

    # one-shot normal init (the trainer does this at dpsr_iter)
    k = jax.random.PRNGKey(1234)
    gp, _ = trainer.normal_init_fn(state.gp, state.gs, state.nets,
                                   jnp.asarray(args.fid, jnp.float32), k)
    state = state._replace(gp=gp)

    ctx = trainer.ctx.f32()
    flags = trainer.flags_for(cfg.optimization.dpsr_iter + 1)
    d_xyz, _, _, d_normal = _deform_all(ctx, state.nets, state.gp.xyz,
                                        jnp.asarray(args.fid, jnp.float32),
                                        0.0, flags)

    # build DPSR inputs exactly like extract_mesh does
    from dgmesh_tpu.train import step as S
    mesh_ref = S.extract_mesh(ctx, state.gp, state.gs, d_xyz, d_normal,
                              freeze_pos=True)
    print(f"extract_mesh (shipped backend): V={int(mesh_ref.n_verts)} "
          f"F={int(mesh_ref.n_faces)}", flush=True)

    gs = state.gs
    xyz = state.gp.xyz + d_xyz
    p01 = (xyz - gs.gaussian_center) / gs.gaussian_scale / 2.0 + 0.5
    p01 = jnp.clip(p01, 1e-4, 1.0 - 1e-4)
    normals = state.gp.normal + d_normal

    res = (cfg.model.grid_res,) * 3
    sig = cfg.optimization.dpsr_sig
    backends = {
        "spectral_xla": DPSR(res, sig=sig, div_mode="spectral",
                             fft_impl="xla"),
        "splat_matmul": DPSR(res, sig=sig, div_mode="splat",
                             fft_impl="matmul"),
        "splat_xla": DPSR(res, sig=sig, div_mode="splat", fft_impl="xla"),
    }
    alive = state.gs.alive
    fields = {}
    for name, d in backends.items():
        f = jax.jit(lambda p, n, a, d=d: d(p, n, a))
        psr = np.asarray(f(p01, normals, alive))
        # the training step flips so the corner (outside) is POSITIVE
        # (step.py: psr * sign(corner)); inside is then negative and raising
        # density_thres GROWS the mesh ({psr < thr} is the inside region)
        psr = psr * np.sign(psr[0, 0, 0])
        fields[name] = psr
        q = np.percentile(psr, [0.1, 1, 25, 50, 75, 99, 99.9])
        print(f"{name:14s} min={psr.min():+.4f} max={psr.max():+.4f} "
              f"corner={psr[0,0,0]:+.4f} pct[.1,1,25,50,75,99,99.9]="
              f"{np.round(q, 3)}", flush=True)

    ref = fields["spectral_xla"]
    for name, psr in fields.items():
        if name == "spectral_xla":
            continue
        d = np.abs(psr - ref)
        print(f"|{name} - spectral| max={d.max():.4f} mean={d.mean():.6f} "
              f"p99={np.percentile(d, 99):.4f}", flush=True)

    # iso sweep on each backend (marching tets V/F via the shipped MT)
    mt_cfg = trainer.ctx.mt_cfg
    mt = jax.jit(lambda f, t: MT.marching_tets(f - t, mt_cfg),
                 static_argnums=())
    for name, psr in fields.items():
        row = []
        for t in args.thrs:
            m = mt(jnp.asarray(psr), jnp.asarray(t, jnp.float32))
            row.append(f"thr={t:.2f}: V={int(m.n_verts):7d} "
                       f"F={int(m.n_faces):7d}")
        print(f"[{name}]\n  " + "\n  ".join(row), flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: mesh-phase training throughput at the reference problem size.

Workload (matches the reference's headline configuration — SURVEY.md §6):
  100k-capacity Gaussian set, 800x800 render, 288³ DPSR grid, full training
  step (deform MLPs + GS splat + cycle loss + DPSR + marching-tets + mesh
  render + laplacian + backward + 6-optimizer update) — the steady-state
  mesh-phase iteration of train.py:129-530.

Methodology (round-3 rework per VERDICT r2 "what's weak #1"):
  * the state is FROZEN — every timed iteration steps from the same
    pre-built plausible mesh-phase state (no donation, output state
    discarded), so the measured workload cannot drift or collapse the way a
    train-on-noise loop does;
  * capacities are the shipped quality-config ones
    (configs/synthetic-quality-full.yaml) and the workload is sized to FIT:
    the benchmark asserts mesh_overflow == 0 and prints all overflow
    counters; a truncated-geometry number is reported as a failure, not a
    headline;
  * the reported value is the MEDIAN of 5 windows (25 iters each), with
    per-window prints so tunnel variance is visible in the log;
  * each window is ONE dispatch of a 25-iteration lax.scan — the deployed
    dispatch mode (train/loop.py run_chunk, tpu.scan_steps): the axon remote
    tunnel costs ~1 s of round-trip per jitted call, which the training loop
    amortizes over scan_steps iterations, so per-call timing would measure
    the tunnel, not the step.  BENCH_SCAN=0 forces single-step dispatch for
    an A/B of exactly that overhead.

Baseline: the reference publishes no numbers (BASELINE.md).  The driver's
target is "1 TPU v5e chip ≈ 1x A100 running the CUDA reference".  The
reference's mesh-phase step on A100 is estimated at ~3 it/s (deformable-3DGS
alone runs ~25-30 it/s; adding a 288³ DPSR FFT fwd+bwd, DiffMC, nvdiffrast
and two extra MLP passes costs ~6-10x) — vs_baseline is reported against
that 3 it/s estimate until a measured reference number exists.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# Workload geometry: a 100k-point noisy spherical shell whose grid-288
# marching-tets surface fits the shipped grid-288 capacities with headroom
# (CPU-measured: V=480,052 / F=960,100 at radius 0.45 vs caps 655360/1310720
# — the same caps configs/synthetic-quality-288.yaml ships).
N_GAUSS = 100_000
SHELL_RADIUS = 0.45
W = H = 800
GRID = 288
N_WINDOWS = 5
ITERS_PER_WINDOW = 25  # = the shipped tpu.scan_steps (one dispatch/window)


def build(jax, jnp):
    from dgmesh_tpu.config import Config
    from dgmesh_tpu.cameras import camera_from_c2w_blender
    from dgmesh_tpu.train.loop import make_batch
    from dgmesh_tpu.train.state import init_state
    from dgmesh_tpu.train.step import StepContext, StepFlags, train_step

    cfg = Config()
    cfg.model.is_blender = True
    cfg.model.grid_res = GRID
    cfg.model.sh_degree = 3
    cfg.optimization.dpsr_sig = 3.0  # shipped configs (SURVEY §2.4)
    t = cfg.tpu
    # capacities = configs/synthetic-quality-288.yaml (the shipped grid-288
    # recipe), so the benchmark measures the deployed shapes and the mesh
    # fits (no truncation)
    t.max_gaussians = 131_072
    t.max_verts = 655_360
    t.max_faces = 1_310_720
    t.max_gaussians_per_tile = 384
    t.max_dup = 1 << 20
    t.max_faces_per_tile = 256
    t.max_face_dup = 1 << 22
    t.tile_chunk = 500
    t.use_pallas = True
    t.mr_cull_backface = True
    t.mt_narrow_band = True
    t.dpsr_div_splat = True
    t.dpsr_fft_matmul = True
    t.mlp_bf16 = True
    t.mlp_fused = False
    # quick-experiment env overrides (the env defaults equal the shipped
    # values set above, so a bare `python bench.py` measures the shipped
    # config; see tools/profile_step.py for the same knobs)
    t.max_faces_per_tile = int(os.environ.get("BENCH_K_FACES",
                                              t.max_faces_per_tile))
    t.max_gaussians_per_tile = int(os.environ.get("BENCH_K_GAUSS",
                                                  t.max_gaussians_per_tile))
    t.mlp_bf16 = os.environ.get(
        "BENCH_MLP_BF16", "1" if t.mlp_bf16 else "0") == "1"
    t.mr_cull_backface = os.environ.get(
        "BENCH_CULL", "1" if t.mr_cull_backface else "0") == "1"

    rng = np.random.default_rng(0)
    d = rng.normal(size=(N_GAUSS, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = SHELL_RADIUS + 0.05 * rng.random((N_GAUSS, 1))
    pts = (d * r).astype(np.float32)
    cols = rng.random((N_GAUSS, 3)).astype(np.float32)

    state = init_state(cfg, pts, cols)
    # plausible mesh-phase state: oriented normals, tight scales
    d_pad = np.zeros((t.max_gaussians, 3), np.float32)
    d_pad[:N_GAUSS] = d
    state = state._replace(gp=state.gp._replace(
        normal=jnp.asarray(d_pad) * state.gs.alive[:, None],
        scaling=jnp.where(state.gs.alive[:, None],
                          jnp.log(jnp.asarray(0.01)), state.gp.scaling)))

    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.5
    img = rng.random((H, W, 3)).astype(np.float32)
    cam = camera_from_c2w_blender(0, c2w, 0.8, W, H, 0.5, image=img,
                                  alpha_mask=np.ones((H, W, 1), np.float32))
    batch = make_batch(cam, 0.01, np.zeros(3, np.float32))

    ctx = StepContext(cfg, W, H)
    flags = StepFlags(warm=False, mesh=True, freeze_pos=False, use_normal=True,
                      anchor=False, densify_stats=False, sh_degree=3)
    # NO donation: the frozen input state must stay valid across windows
    step = jax.jit(lambda st, b, k: train_step(ctx, st, b, k, flags, None))

    def scan_window(st, b, keys):
        # the deployed dispatch mode: train/loop.py run_chunk scans
        # tpu.scan_steps iterations per jitted call.  The frozen-state
        # methodology is preserved: every scan iteration steps from the SAME
        # input state (carry is only a loss accumulator), so the workload
        # cannot drift over the window; per-iteration keys differ, so XLA
        # cannot collapse the iterations into one.
        def body(acc, k):
            _, m = train_step(ctx, st, b, k, flags, None)
            return acc + m["loss"], ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return acc

    scan_step = jax.jit(scan_window)
    return step, scan_step, state, batch


def main():
    import jax
    # persistent compile cache: the 288³ mesh-phase graph takes many minutes
    # to compile through the remote-compile tunnel; cache it on disk.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    step, scan_step, state, batch = build(jax, jnp)
    key = jax.random.PRNGKey(0)
    single = os.environ.get("BENCH_SCAN", "1") != "1"

    t0 = time.time()
    _, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.time() - t0
    mesh_ovf = int(metrics.get("mesh_overflow", 0))
    print(f"# compile+first-step: {compile_s:.1f}s, "
          f"loss={float(metrics['loss']):.4f}, "
          f"mesh V={int(metrics.get('mesh_n_verts', 0))} "
          f"F={int(metrics.get('mesh_n_faces', 0))} "
          f"ovf s/m/r={int(metrics.get('splat_overflow', 0))}/"
          f"{mesh_ovf}/{int(metrics.get('raster_overflow', 0))}",
          file=sys.stderr, flush=True)
    if mesh_ovf > 0:
        print("# ERROR: mesh_overflow > 0 — the benchmark geometry is being "
              "truncated; the number below measures a clipped workload",
          file=sys.stderr, flush=True)

    if not single:
        # compile the scan program too before timing
        t0 = time.time()
        keys = jax.random.split(jax.random.PRNGKey(1), ITERS_PER_WINDOW)
        jax.block_until_ready(scan_step(state, batch, keys))
        print(f"# scan-window compile+first: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)

    wins = []
    for w in range(N_WINDOWS):
        t0 = time.time()
        if single:
            for i in range(ITERS_PER_WINDOW):
                key, k = jax.random.split(key)
                _, metrics = step(state, batch, k)
            jax.block_until_ready(metrics["loss"])
        else:
            key, k = jax.random.split(key)
            keys = jax.random.split(k, ITERS_PER_WINDOW)
            jax.block_until_ready(scan_step(state, batch, keys))
        ips = ITERS_PER_WINDOW / (time.time() - t0)
        wins.append(ips)
        print(f"# window {w}: {ips:.3f} it/s", file=sys.stderr, flush=True)
    ips = float(np.median(wins))
    spread = (max(wins) - min(wins)) / max(ips, 1e-9)
    print(f"# median {ips:.3f} it/s over {N_WINDOWS} windows "
          f"(min {min(wins):.3f}, max {max(wins):.3f}, spread {spread:.0%})",
          file=sys.stderr, flush=True)

    baseline_est = 3.0  # estimated reference mesh-phase it/s on A100 (docstring)
    print(json.dumps({
        "metric": "train_iters_per_sec_mesh_phase_800px_288grid_100k",
        "value": round(ips, 3),
        "unit": "iters/sec",
        "vs_baseline": round(ips / baseline_est, 3),
    }), flush=True)


if __name__ == "__main__":
    main()

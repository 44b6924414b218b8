"""Host-side training driver.

reference: train.py training() :50-556 — the Python hot loop.  Here the whole
iteration body is compiled (train/step.py); the host only: picks the random
camera (reference :146-151), selects the static phase flags, and invokes the
sparse structural kernels (densify / opacity reset / normal init / anchor) at
the reference's cadence (:243-246, :287-304, :489-515).
"""

from __future__ import annotations

import os
import random
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera, gl_projection_from_K
from ..config import Config
from ..models import gaussians as G
from ..ops import splat
from .densify import (anchor_step, densify_and_prune, normal_initialization,
                      reset_opacity)
from .state import TrainState, init_state
from .step import Batch, StepContext, StepFlags, extract_mesh, train_step


class TrainingHalted(RuntimeError):
    """Raised by the trainer tripwires (non-finite loss / empty mesh)."""


def make_batch(cam: Camera, time_interval: float, bg: np.ndarray) -> Batch:
    gt = np.transpose(cam.image, (2, 0, 1)).astype(np.float32)
    mask = (cam.alpha_mask[..., 0] if cam.alpha_mask is not None
            else np.ones(cam.image.shape[:2], np.float32))
    return Batch(
        cam=splat.CameraArrays.from_camera(cam),
        mesh_pose=jnp.asarray(cam.mesh_pose()),
        mesh_proj=jnp.asarray(gl_projection_from_K(cam.intrinsics, cam.width,
                                                   cam.height)),
        gt_image=jnp.asarray(gt),
        gt_mask=jnp.asarray(mask),
        fid=jnp.asarray(cam.fid, jnp.float32),
        time_interval=jnp.asarray(time_interval, jnp.float32),
        bg=jnp.asarray(bg, jnp.float32),
    )


class Trainer:
    def __init__(self, cfg: Config, scene, state: Optional[TrainState] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.scene = scene
        cam0 = scene.train_cameras[0]
        self.ctx = StepContext(cfg, cam0.width, cam0.height)
        if state is None:
            pc = scene.point_cloud
            pts, cols = pc.points, pc.colors
            cap = cfg.tpu.max_gaussians
            if len(pts) > cap:
                # leave headroom for densification; deterministic subsample
                keep = np.random.default_rng(seed).choice(
                    len(pts), size=cap // 2, replace=False)
                print(f"init cloud {len(pts)} > capacity {cap}: subsampling "
                      f"to {cap // 2}", flush=True)
                pts, cols = pts[keep], cols[keep]
            state = init_state(cfg, pts, cols, seed=seed)
        self.state = state
        self.bg = np.array([1, 1, 1] if cfg.model.white_background else [0, 0, 0],
                           np.float32)
        # Per-iteration streams are derived by fold_in(base, it) — NOT by
        # splitting a carried key — so a resume/replay from any checkpointed
        # step sees the exact RNG and camera sequence of the original run
        # (ADVICE r3: nan_hunt replays used to diverge from the run they were
        # debugging).
        self.seed = seed
        self.base_key = jax.random.PRNGKey(seed)
        self._step_cache: Dict = {}
        self._batch_cache: Dict = {}
        self._no_scan = set()  # flag-sets whose scan program failed to
                               # compile: fall back to single-step dispatch
        self.metrics_history = []
        # Tripwires (VERDICT r3 weak #2): a non-finite loss or an empty mesh
        # during the mesh phase halts the run instead of burning TPU-hours on
        # a dead model.  Checked every `tripwire_every` iterations (forces a
        # device sync — negligible at training step times).
        self.tripwire_every = 25
        self._last_good_state: Optional[TrainState] = None
        # Not-learning tripwires (VERDICT r4 #4): the r4 quality run burned
        # 2,500+ iterations visibly dead — density_thres pinned at its
        # projection bound and mesh_psnr flat at 14-18 — states the
        # NaN/empty tripwires cannot see.  Both counters advance once per
        # tripwire check (every tripwire_every iters):
        #   thr pinned  : |thr| within thr_pin_eps of DENSITY_THRES_BOUND for
        #                 thr_pin_checks consecutive checks (default 1000 it)
        #   psnr flat   : after mesh_grace iters of mesh phase, mesh_psnr has
        #                 stayed below mesh_psnr_floor for psnr_flat_checks
        #                 consecutive checks (default 2000 it) — a healthy
        #                 mesh phase passes 18 dB within a few hundred iters
        #                 (the r4 run never did in 4,800).
        self.thr_pin_eps = 0.005
        self.thr_pin_checks = 40
        self.psnr_flat_checks = 80
        self.mesh_psnr_floor = 18.0
        self.mesh_grace_iters = 1500
        self._thr_pinned_streak = 0
        self._psnr_low_streak = 0
        self._mesh_first_iter: Optional[int] = None

        ctx = self.ctx

        def _anchor_fn(state: TrainState, batch: Batch, key):
            # anchor geometry is precision-critical (search radius ~1.5e-3):
            # always deform + apply in f32 regardless of mlp_bf16 (step.py
            # StepContext.f32)
            cf = ctx.f32()
            k1, k2 = jax.random.split(key)
            M = state.gp.xyz.shape[0]
            t_in = jnp.full((M, 1), batch.fid)
            d_xyz, d_rot, d_scale, _ = cf.nets_def.deform.apply(
                state.nets.deform, state.gp.xyz, t_in)
            d_normal = cf.nets_def.deform_normal.apply(
                state.nets.deform_normal, state.gp.xyz, t_in)
            mesh = extract_mesh(cf, state.gp, state.gs, d_xyz, d_normal,
                                freeze_pos=True)
            return anchor_step(cfg, cf.nets_def, state.gp, state.gs,
                               state.g_mu, state.g_nu, state.nets, batch.fid,
                               mesh.verts, mesh.faces, mesh.face_valid, k2)

        self.anchor_fn = jax.jit(_anchor_fn)
        self.densify_fn = jax.jit(
            lambda gp, gs, mu, nu, extent, key, use_size: densify_and_prune(
                cfg, gp, gs, mu, nu, extent, key, use_size),
            static_argnames=("use_size",))
        self.reset_opacity_fn = jax.jit(reset_opacity)
        eff_occ = min(cfg.model.grid_res, cfg.tpu.occ_res)
        if eff_occ < 256:
            # reference runs the one-shot init occupancy at 256³
            # (gaussian_model_dpsr_dynamic_anchor.py:695-704); tpu.occ_res
            # defaults lower to dodge an axon backend fault at >=192
            # (ops/occupancy.py) — warn so a silent downgrade of the normal
            # seed is visible in every run log (ADVICE r3 #2)
            print(f"[normal-init] occupancy grid at {eff_occ}^3 "
                  f"(reference: 256^3; raise tpu.occ_res when the backend "
                  f"fault is fixed)", flush=True)
        self.normal_init_fn = jax.jit(
            lambda gp, gs, nets, fid, key: normal_initialization(
                cfg, ctx.f32().nets_def, gp, gs, nets, fid, key,
                occ_res=eff_occ))

    # ---- flag schedule (reference train.py gates) ----
    def flags_for(self, it: int) -> StepFlags:
        o = self.cfg.optimization
        mesh = it >= o.dpsr_iter
        anchor = (mesh and it > o.anchor_iter and it % o.anchor_interval == 0
                  and self.cfg.model.use_anchor > 0)
        densify_now = (it < o.densify_until_iter and it > o.densify_from_iter
                       and it % o.densification_interval == 0)
        return StepFlags(
            warm=it < o.warm_up,
            mesh=mesh,
            freeze_pos=it < o.dpsr_iter + o.normal_warm_up,
            use_normal=it >= o.dpsr_iter + o.normal_net_warmup,
            anchor=anchor,
            skip_gaussian_update=anchor or densify_now,
            densify_stats=it < o.densify_until_iter,
            sh_degree=min(it // 1000, self.cfg.model.sh_degree),
        )

    def _jit_kwargs(self) -> dict:
        """TPU compiler options for the big step programs (tpu.scoped_vmem_kib
        raises the scoped-VMEM budget the Pallas mesh-raster backward needs at
        max_faces_per_tile > 256; see utils_jit.py)."""
        from ..utils_jit import jit_options
        return jit_options(self.cfg)

    def _step_fn(self, flags: StepFlags):
        if flags not in self._step_cache:
            ctx = self.ctx

            def fn(state, batch, key, anchor_info):
                return train_step(ctx, state, batch, key, flags, anchor_info)

            donate = (0,) if self.cfg.tpu.donate else ()
            self._step_cache[flags] = jax.jit(fn, donate_argnums=donate,
                                              **self._jit_kwargs())
        return self._step_cache[flags]

    def next_camera_idx(self, it: int) -> int:
        """Random-without-replacement camera schedule (reference
        train.py:146-151's stack-pop), derived purely from (seed, iteration)
        so any resume point reproduces the original stream: iterations are
        grouped into epochs of len(cameras); each epoch's order is an
        independent seeded permutation."""
        n = len(self.scene.train_cameras)
        epoch, pos = divmod(it - 1, n)
        perm = random.Random((self.seed << 32) ^ epoch).sample(range(n), n)
        return perm[pos]

    def next_camera(self, it: int) -> Camera:
        return self.scene.train_cameras[self.next_camera_idx(it)]

    def get_batch(self, cam: Camera) -> Batch:
        """Device-resident batch cache: images are uploaded once per camera
        unless load2gpu_on_the_fly requests streaming (reference
        ModelParams.load2gpu_on_the_fly)."""
        if self.cfg.model.load2gpu_on_the_fly:
            return make_batch(cam, self.scene.time_interval, self.bg)
        b = self._batch_cache.get(cam.uid)
        if b is None:
            b = jax.tree.map(jnp.asarray,
                             make_batch(cam, self.scene.time_interval, self.bg))
            self._batch_cache[cam.uid] = b
        return b

    # ---- multi-step scan dispatch (TPU perf: amortize tunnel RTT) ----
    # The axon remote tunnel adds ~1 s of dispatch round-trip per jitted call
    # (measured: DESIGN.md r4 device step ~620 ms vs ~1700 ms bench wall).
    # Chunks of tpu.scan_steps non-structural iterations run as ONE jitted
    # lax.scan over a device-resident stack of all training batches — one
    # dispatch, one host sync per chunk.  Per-iteration camera ids come from
    # the same (seed, iteration) schedule and per-iteration RNG keys are
    # derived IN-GRAPH by the same fold_in(base, it) → split as
    # run_iteration, so scan and single-step paths run the same stream —
    # equal up to XLA float reassociation between the scan-body and
    # straight-line compilations (pinned by
    # tests/test_train_e2e.py::test_scan_matches_single).

    def _stacked_batches(self):
        if getattr(self, "_stacked", None) is None:
            bs = [self.get_batch(c) for c in self.scene.train_cameras]
            self._stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *bs)
        return self._stacked

    def _scan_fn(self, flags: StepFlags, k: int):
        cache = self._step_cache
        ck = (flags, k)
        if ck not in cache:
            ctx = self.ctx
            base_key = self.base_key

            def fn(state, stacked, cam_ids, its):
                def body(st, xs):
                    ci, it_j = xs
                    batch = jax.tree.map(lambda x: x[ci], stacked)
                    _, k2, _ = jax.random.split(
                        jax.random.fold_in(base_key, it_j), 3)
                    st2, m = train_step(ctx, st, batch, k2, flags, None)
                    return st2, m

                return jax.lax.scan(body, state, (cam_ids, its))

            donate = (0,) if self.cfg.tpu.donate else ()
            cache[ck] = jax.jit(fn, donate_argnums=donate,
                                **self._jit_kwargs())
        return cache[ck]

    def _is_structural(self, it: int) -> bool:
        """Iterations with host-side work besides the jitted step (one-shot
        normal init, densify/prune, opacity reset, anchor) — these must run
        through run_iteration."""
        o = self.cfg.optimization
        if it == o.dpsr_iter:
            return True
        f = self.flags_for(it)
        if f.anchor:
            return True
        if f.densify_stats and not f.anchor:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                return True
            if it % o.opacity_reset_interval == 0 or (
                    self.cfg.model.white_background
                    and it == o.densify_from_iter):
                return True
        return False

    def _chunk_len(self, it: int, iterations: int, save_at, log_every: int,
                   image_log_every: int) -> int:
        """Longest scan chunk starting at `it`: constant flags, no structural
        iteration inside, and chunk ends ON any save/log boundary so the
        host-side actions keep their exact iteration."""
        kmax = min(int(self.cfg.tpu.scan_steps), iterations - it + 1)
        if kmax <= 1 or self.cfg.model.load2gpu_on_the_fly:
            return 1
        f0 = self.flags_for(it)
        if f0 in self._no_scan:
            return 1
        k = 0
        for j in range(it, it + kmax):
            if self._is_structural(j) or self.flags_for(j) != f0:
                break
            k += 1
            # boundaries where the host must act AT j: end the chunk there
            if (j in save_at or j % self.tripwire_every == 0
                    or j % log_every == 0
                    or (image_log_every and j % image_log_every == 0)
                    or j == iterations):
                break
        return max(k, 1)

    def run_chunk(self, it: int, k: int):
        """Run iterations [it, it+k) as one scanned dispatch; returns the
        per-iteration metrics row of the LAST iteration (host floats)."""
        flags = self.flags_for(it)
        cam_ids = jnp.asarray([self.next_camera_idx(j)
                               for j in range(it, it + k)], jnp.int32)
        its = jnp.asarray(range(it, it + k), jnp.int32)
        fn = self._scan_fn(flags, k)
        self.state, mstack = fn(self.state, self._stacked_batches(),
                                cam_ids, its)
        return {kk: vv[-1] for kk, vv in mstack.items()}

    def run_iteration(self, it: int):
        o = self.cfg.optimization
        cam = self.next_camera(it)
        batch = self.get_batch(cam)
        k1, k2, k3 = jax.random.split(jax.random.fold_in(self.base_key, it), 3)
        flags = self.flags_for(it)

        # one-shot normal initialization (train.py:243-246)
        if it == o.dpsr_iter:
            gp, _ = self.normal_init_fn(self.state.gp, self.state.gs,
                                        self.state.nets, batch.fid, k3)
            self.state = self.state._replace(gp=gp)

        anchor_info = None
        anchor_result = None
        if flags.anchor:
            gp_a, gs_a, mu_a, nu_a, info = self.anchor_fn(self.state, batch, k1)
            anchor_result = (gp_a, gs_a, mu_a, nu_a)
            anchor_info = info._asdict()

        step_fn = self._step_fn(flags)
        new_state, metrics = step_fn(self.state, batch, k2, anchor_info)

        if anchor_result is not None:
            gp_a, gs_a, mu_a, nu_a = anchor_result
            new_state = new_state._replace(gp=gp_a, gs=gs_a, g_mu=mu_a, g_nu=nu_a)
            # at-scale evidence for the paper's core mechanism (VERDICT r3 #9):
            # partition sizes + surgery counts land in train_log.jsonl
            for k, v in anchor_info["stats"].items():
                metrics[f"anchor_{k}"] = v

        # densify / prune window (train.py:489-515)
        if flags.densify_stats and not flags.anchor:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                use_size = it > o.opacity_reset_interval
                gp, gs, mu, nu = self.densify_fn(
                    new_state.gp, new_state.gs, new_state.g_mu, new_state.g_nu,
                    jnp.asarray(self.scene.cameras_extent, jnp.float32), k3,
                    use_size=use_size)
                new_state = new_state._replace(gp=gp, gs=gs, g_mu=mu, g_nu=nu)
            if it % o.opacity_reset_interval == 0 or (
                    self.cfg.model.white_background and it == o.densify_from_iter):
                gp, mu, nu = self.reset_opacity_fn(new_state.gp, new_state.g_mu,
                                                   new_state.g_nu)
                new_state = new_state._replace(gp=gp, g_mu=mu, g_nu=nu)

        self.state = new_state
        return metrics

    def save_debug_images(self, it: int, out_root: str):
        """Periodic image/mesh dumps (reference: train.py:323-386 →
        logs/ + logs_geo/).  The render MUST be jitted: called bare,
        render_frame executes the full 800² mesh pipeline op-by-op through
        the remote tunnel — measured >45 min for ONE dump at quality scale
        (each eager op is a separate remote compile + dispatch)."""
        from ..eval.testing import render_frame
        from ..utils_io import save_image, write_mesh_ply
        cam = self.scene.train_cameras[0]
        batch = self.get_batch(cam)
        mesh_on = int(self.state.step) >= self.cfg.optimization.dpsr_iter
        sh = min(int(self.state.step) // 1000, self.cfg.model.sh_degree)
        rk = ("render_frame", mesh_on, sh)
        if rk not in self._step_cache:
            ctx = self.ctx
            self._step_cache[rk] = jax.jit(
                lambda st, b: render_frame(ctx, st, b, sh, with_mesh=mesh_on),
                **self._jit_kwargs())
        out = self._step_cache[rk](self.state, batch)
        logs = os.path.join(out_root, "logs")
        save_image(os.path.join(logs, f"render_{it:06d}.png"),
                   np.asarray(jnp.clip(out["render"], 0, 1)).transpose(1, 2, 0))
        if mesh_on:
            save_image(os.path.join(logs, f"mesh_{it:06d}.png"),
                       np.asarray(jnp.clip(out["mesh_image"], 0, 1)).transpose(1, 2, 0))
            save_image(os.path.join(logs, f"mask_{it:06d}.png"),
                       np.asarray(jnp.clip(out["mask"], 0, 1)))
            nv, nf = int(out["n_verts"]), int(out["n_faces"])
            write_mesh_ply(os.path.join(out_root, "logs_geo",
                                        f"mesh_{it:06d}.ply"),
                           np.asarray(out["verts"])[:nv],
                           np.asarray(out["faces"])[:nf])

    def _check_tripwires(self, it: int, metrics, save_dir: Optional[str]):
        """Halt on the two failure modes the r3 quality run died of without
        warning: non-finite loss, and an empty mesh during the mesh phase
        (reference analogue: --detect_anomaly, train.py:936).  Saves the
        last-known-good state (and the tripped state) for tools/nan_hunt.py."""
        from .state import DENSITY_THRES_BOUND
        loss = float(metrics["loss"])
        nv = metrics.get("mesh_n_verts")
        mesh_on = nv is not None
        bad = None
        if not np.isfinite(loss):
            bad = f"non-finite loss ({loss})"
        elif mesh_on and int(nv) == 0:
            bad = "empty mesh (mesh_n_verts == 0) during the mesh phase"
        if mesh_on and bad is None:
            if self._mesh_first_iter is None:
                self._mesh_first_iter = it
            thr = float(metrics.get("density_thres", 0.0))
            if abs(thr) >= DENSITY_THRES_BOUND - self.thr_pin_eps:
                self._thr_pinned_streak += 1
            else:
                self._thr_pinned_streak = 0
            mp = metrics.get("mesh_psnr")
            in_grace = it - self._mesh_first_iter < self.mesh_grace_iters
            if mp is not None and not in_grace:
                if float(mp) < self.mesh_psnr_floor:
                    self._psnr_low_streak += 1
                else:
                    self._psnr_low_streak = 0
            if self._thr_pinned_streak >= self.thr_pin_checks:
                bad = (f"density_thres pinned at its +-{DENSITY_THRES_BOUND} "
                       f"projection bound for {self._thr_pinned_streak} "
                       f"consecutive checks (~"
                       f"{self._thr_pinned_streak * self.tripwire_every} iters)"
                       " — the optimizer persistently wants an out-of-range "
                       "iso-level; the mesh phase is not learning")
            elif self._psnr_low_streak >= self.psnr_flat_checks:
                bad = (f"mesh_psnr below {self.mesh_psnr_floor} dB for "
                       f"{self._psnr_low_streak} consecutive checks (~"
                       f"{self._psnr_low_streak * self.tripwire_every} iters) "
                       f"after the {self.mesh_grace_iters}-iter grace window "
                       "— the mesh phase is not learning")
        if bad is None:
            # the jitted step DONATES the state buffers, so a bare reference
            # is deleted by the next iteration — keep an explicit device copy
            # (one ~130 MB copy per tripwire_every iters, negligible)
            self._last_good_state = jax.tree.map(jnp.copy, self.state)
            return
        from .checkpoint import save_checkpoint
        out = save_dir or (self.cfg.model.model_path or ".")
        if self._last_good_state is not None:
            save_checkpoint(self._last_good_state, out,
                            int(self._last_good_state.step))
        save_checkpoint(self.state, out, it)
        diag = {k: float(v) for k, v in metrics.items()
                if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
        raise TrainingHalted(
            f"TRIPWIRE at iter {it}: {bad}.\n  metrics: {diag}\n"
            f"  last-good + tripped state checkpointed under {out}; replay "
            f"with: python tools/nan_hunt.py --checkpoint {out} --iter {it}")

    def train(self, iterations: Optional[int] = None, log_every: int = 100,
              first_iter: int = 1, on_log=None, image_log_every: int = 0,
              image_log_dir: Optional[str] = None, save_at=(),
              save_dir: Optional[str] = None):
        o = self.cfg.optimization
        iterations = iterations or o.iterations
        save_at = set(save_at or ())
        t0 = time.time()
        window = t0
        it = first_iter
        while it <= iterations:
            k = self._chunk_len(it, iterations, save_at, log_every,
                                image_log_every)
            if k > 1:
                try:
                    metrics = self.run_chunk(it, k)
                    it += k - 1   # per-iteration actions below fire at the
                                  # chunk's LAST iteration (boundary-aligned)
                except jax.errors.JaxRuntimeError as e:
                    # a failed scan compile (e.g. the remote-compile helper
                    # OOM-killed on the bigger scan program) must not kill a
                    # multi-hour run: fall back to single-step dispatch for
                    # this flag-set.  Compile failures happen BEFORE
                    # execution, so self.state was not donated and is intact.
                    flags = self.flags_for(it)
                    self._no_scan.add(flags)
                    self._step_cache.pop((flags, k), None)
                    print(f"[{it}] scan dispatch failed "
                          f"({type(e).__name__}); falling back to "
                          f"single-step for flags={flags}", flush=True)
                    metrics = self.run_iteration(it)
            else:
                metrics = self.run_iteration(it)
            if it % self.tripwire_every == 0:
                self._check_tripwires(it, metrics, save_dir)
            if it % log_every == 0 or it == iterations:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - window
                window = time.time()
                m["iters_per_sec"] = log_every / dt if dt > 0 else 0.0
                m["iter"] = it
                self.metrics_history.append(m)
                line = (f"[{it}] loss={m.get('loss', 0):.4f} "
                        f"psnr={m.get('img_psnr', 0):.2f} "
                        + (f"mesh_psnr={m.get('mesh_psnr', 0):.2f} " if "mesh_psnr" in m else "")
                        + f"alive={int(m.get('n_alive', 0))} "
                        f"it/s={m['iters_per_sec']:.2f}")
                if "psr_min" in m:
                    line += (f" [V={int(m.get('mesh_n_verts', 0))} "
                             f"psr {m['psr_min']:.3f}..{m['psr_max']:.3f} "
                             f"thr={m.get('density_thres', 0):.4f} "
                             f"|n|={m.get('normal_norm', 0):.3f}]")
                # capacity truncation is a quality bug, not a curiosity —
                # surface it on the console line (VERDICT r2 weak #2)
                if m.get("mesh_overflow", 0) > 0:
                    line += (f"  !! MESH OVERFLOW {int(m['mesh_overflow'])} "
                             f"(V={int(m.get('mesh_n_verts', 0))}/"
                             f"F={int(m.get('mesh_n_faces', 0))} at caps — "
                             f"raise max_verts/max_faces)")
                if m.get("nonfinite_grad_leaves", 0) > 0:
                    line += (f"  !! NONFINITE GRADS zeroed "
                             f"({int(m['nonfinite_grad_leaves'])} leaves)")
                if (m.get("splat_overflow", 0) > 0
                        or m.get("raster_overflow", 0) > 0
                        or m.get("splat_dup_overflow", 0) > 0):
                    line += (f"  [tile-K ovf s={int(m.get('splat_overflow', 0))} "
                             f"r={int(m.get('raster_overflow', 0))}"
                             + (f" dup={int(m['splat_dup_overflow'])}"
                                if m.get("splat_dup_overflow", 0) > 0 else "")
                             + "]")
                print(line, flush=True)
                if on_log:
                    on_log(m)
            if image_log_every and image_log_dir and it % image_log_every == 0:
                self.save_debug_images(it, image_log_dir)
            # mid-run checkpoints (reference train.py:536-538 save cadence)
            if it in save_at and save_dir:
                from .checkpoint import save_checkpoint
                save_checkpoint(self.state, save_dir, it)
                print(f"[{it}] checkpoint saved", flush=True)
            it += 1
        return self.metrics_history

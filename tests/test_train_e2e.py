"""End-to-end miniature training fit (SURVEY.md §4 recommendation (3)).

Generates a tiny synthetic D-NeRF dataset with the splat renderer, then runs
the full Trainer through every phase: warm-up → deform → mesh branch
(freeze_pos) → normals → densify → anchor.  Asserts the image loss improves
and that all phases execute without shape errors.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    from dgmesh_tpu.config import Config
    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.data.synthetic import generate_dataset
    from dgmesh_tpu.train.loop import Trainer

    out = str(tmp_path_factory.mktemp("synth"))
    generate_dataset(out, n_frames=6, width=64, height=64, n_gaussians=300,
                     n_test=2)

    cfg = Config()
    cfg.model.source_path = out
    cfg.model.is_blender = True
    cfg.model.white_background = False
    cfg.model.grid_res = 32
    cfg.model.sh_degree = 1
    cfg.model.gaussian_ratio = 1.5
    o = cfg.optimization
    o.iterations = 120
    o.warm_up = 20
    o.dpsr_iter = 40
    o.normal_warm_up = 10
    o.anchor_iter = 60
    o.anchor_interval = 30
    o.anchor_n_1_bs = 16
    o.anchor_0_1_bs = 32
    o.densify_from_iter = 10
    o.densify_until_iter = 35
    o.densification_interval = 10
    o.opacity_reset_interval = 10_000
    o.dpsr_sig = 2.0
    t = cfg.tpu
    t.max_gaussians = 2048
    t.max_verts = 16384
    t.max_faces = 32768
    t.max_gaussians_per_tile = 256
    t.max_dup = 1 << 15
    t.max_faces_per_tile = 64
    t.max_face_dup = 1 << 15
    t.tile_chunk = 8

    # NORMAL_WARMUP hardcoded 2000 in reference; shrink for the test via
    # monkeypatching the flag schedule
    from dgmesh_tpu.train import loop as L

    scene = Scene(cfg, shuffle=True)
    # init from a noisy version of the GT point cloud (like SfM points)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.7, 0.7, (400, 3)).astype(np.float32)
    cols = rng.random((400, 3)).astype(np.float32)
    scene.info.point_cloud.points = pts
    scene.info.point_cloud.colors = cols

    trainer = Trainer(cfg, scene)
    orig_flags = trainer.flags_for

    def flags_for(it):
        f = orig_flags(it)
        return f._replace(use_normal=it >= o.dpsr_iter + 10)
    trainer.flags_for = flags_for

    history = trainer.train(iterations=120, log_every=20)
    return trainer, history


def test_loss_decreases(tiny_run):
    trainer, history = tiny_run
    first = history[0]["img_loss"]
    last = history[-1]["img_loss"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, f"img_loss did not improve: {first} -> {last}"


def test_all_phases_ran(tiny_run):
    trainer, history = tiny_run
    # mesh metrics present in late logs
    assert any("mesh_psnr" in m for m in history)
    # densify changed the alive count at some point
    alive = [m["n_alive"] for m in history]
    assert len(set(int(a) for a in alive)) > 1 or alive[0] != 400


def test_no_overflow(tiny_run):
    trainer, history = tiny_run
    # mesh vert/face capacity overflow is a hard correctness error; splat
    # tile overflow is graceful (nearest-K truncation) but should vanish once
    # training tightens the gaussians — check the final window only.
    for m in history:
        assert m.get("mesh_overflow", 0) == 0
    assert history[-1].get("splat_overflow", 0) == 0


def test_state_finite(tiny_run):
    trainer, _ = tiny_run
    leaves = jax.tree.leaves(trainer.state.gp)
    for l in leaves:
        assert np.isfinite(np.asarray(l)).all()


def test_tripwires_halt(tiny_run, tmp_path):
    """The trainer must halt (not keep burning TPU time) on the two failure
    modes the r3 quality run actually died of: non-finite loss and an empty
    mesh during the mesh phase (VERDICT r3 weak #2; reference analogue
    --detect_anomaly, train.py:936).  Both paths checkpoint last-good +
    tripped state for tools/nan_hunt.py."""
    from dgmesh_tpu.train.loop import TrainingHalted

    trainer, _ = tiny_run
    save_dir = str(tmp_path / "trip")

    # healthy metrics: records last-good as an explicit device COPY — a bare
    # reference is useless because the jitted step donates the state buffers
    # (the r4 smoke run's tripwire crashed on exactly that: "Array has been
    # deleted")
    trainer._check_tripwires(100, {"loss": 1.0, "mesh_n_verts": 42}, save_dir)
    lg = trainer._last_good_state
    assert lg is not trainer.state
    assert int(lg.step) == int(trainer.state.step)
    assert lg.gp.xyz.unsafe_buffer_pointer() != \
        trainer.state.gp.xyz.unsafe_buffer_pointer()

    with pytest.raises(TrainingHalted, match="non-finite loss"):
        trainer._check_tripwires(101, {"loss": float("nan"),
                                       "mesh_n_verts": 42}, save_dir)
    with pytest.raises(TrainingHalted, match="empty mesh"):
        trainer._check_tripwires(102, {"loss": 1.0, "mesh_n_verts": 0},
                                 save_dir)
    # both states were checkpointed for replay (save_checkpoint nests
    # a checkpoint/ dir under the given root)
    import os
    assert any(f.startswith("state_")
               for f in os.listdir(os.path.join(save_dir, "checkpoint")))


def test_not_learning_tripwires(tiny_run, tmp_path):
    """VERDICT r4 #4: halt when the mesh phase is visibly dead — the r4
    quality run burned 2,500+ iterations with density_thres pinned at its
    projection bound and mesh_psnr flat at 14-18, invisible to the
    NaN/empty tripwires."""
    from dgmesh_tpu.train.loop import TrainingHalted
    from dgmesh_tpu.train.state import DENSITY_THRES_BOUND

    trainer, _ = tiny_run
    save_dir = str(tmp_path / "nl")

    # density_thres pinned at the bound for thr_pin_checks consecutive checks
    trainer._thr_pinned_streak = 0
    trainer._mesh_first_iter = None
    pinned = {"loss": 1.0, "mesh_n_verts": 42, "mesh_psnr": 25.0,
              "density_thres": DENSITY_THRES_BOUND}
    for i in range(trainer.thr_pin_checks - 1):
        trainer._check_tripwires(100 + i, pinned, save_dir)
    with pytest.raises(TrainingHalted, match="pinned"):
        trainer._check_tripwires(999, pinned, save_dir)

    # a single un-pinned check resets the streak
    trainer._thr_pinned_streak = trainer.thr_pin_checks - 1
    trainer._check_tripwires(1000, {**pinned, "density_thres": 0.1}, save_dir)
    assert trainer._thr_pinned_streak == 0

    # mesh_psnr flat below the floor after the grace window
    trainer._psnr_low_streak = 0
    trainer._mesh_first_iter = None
    flat = {"loss": 1.0, "mesh_n_verts": 42, "mesh_psnr": 15.0,
            "density_thres": 0.0}
    trainer._check_tripwires(5000, flat, save_dir)   # sets _mesh_first_iter
    assert trainer._psnr_low_streak == 0             # grace window active
    it = 5000 + trainer.mesh_grace_iters
    for i in range(trainer.psnr_flat_checks - 1):
        trainer._check_tripwires(it + i, flat, save_dir)
    with pytest.raises(TrainingHalted, match="not learning"):
        trainer._check_tripwires(it + 999, flat, save_dir)

    # recovery resets: one healthy mesh_psnr clears the streak
    trainer._psnr_low_streak = trainer.psnr_flat_checks - 1
    trainer._check_tripwires(it + 1000, {**flat, "mesh_psnr": 25.0}, save_dir)
    assert trainer._psnr_low_streak == 0


def test_scan_matches_single(tmp_path_factory):
    """The multi-step scan dispatch (loop.py run_chunk, tpu.scan_steps>1)
    must run the SAME stream as the single-step path — same
    (seed, iteration)-derived cameras, same fold_in RNG keys, same step math —
    differing only in dispatch granularity.  XLA compiles the scan body and
    the straight-line step into different fusions, so floats reassociate:
    parity is tight over one chunk (any wiring bug — wrong camera id, wrong
    fold_in iteration — would produce O(1) differences, not 1e-6) and loose
    over a 24-iter run that crosses chunk/log/epoch boundaries."""
    from dgmesh_tpu.config import Config
    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.data.synthetic import generate_dataset
    from dgmesh_tpu.train.loop import Trainer

    out = str(tmp_path_factory.mktemp("scan_synth"))
    generate_dataset(out, n_frames=4, width=48, height=48, n_gaussians=120,
                     n_test=1)

    def make_cfg(scan_steps):
        cfg = Config()
        cfg.model.source_path = out
        cfg.model.is_blender = True
        cfg.model.grid_res = 16
        cfg.model.sh_degree = 0
        o = cfg.optimization
        o.iterations = 24
        o.warm_up = 1            # constant flags from it=1
        o.dpsr_iter = 10_000     # GS-only
        o.densify_from_iter = 10_000
        o.densify_until_iter = 0
        o.opacity_reset_interval = 100_000
        t = cfg.tpu
        t.max_gaussians = 256
        t.max_verts = 1024
        t.max_faces = 2048
        t.max_gaussians_per_tile = 64
        t.max_dup = 1 << 12
        t.max_faces_per_tile = 16
        t.max_face_dup = 1 << 12
        t.tile_chunk = 4
        t.scan_steps = scan_steps
        return cfg

    def make(scan_steps):
        cfg = make_cfg(scan_steps)
        scene = Scene(cfg, shuffle=True)
        return Trainer(cfg, scene, seed=3)

    # tight: one 8-iter chunk vs the same 8 single-step iterations from the
    # identical initial state.  Adam's sqrt(nu)+eps normalization amplifies
    # the per-step reassociation noise (measured: ~4e-3 rel on near-zero MLP
    # params after 8 steps) — the tolerance sits well above that and orders
    # of magnitude below any wiring bug (a wrong camera/key gives O(1) diffs)
    tr1, trk = make(1), make(8)
    for it in range(1, 9):
        tr1.run_iteration(it)
    mk = trk.run_chunk(1, 8)
    assert any(isinstance(k, tuple) and k[1] == 8
               for k in trk._step_cache), "scan program was never compiled"
    for a, b in zip(jax.tree.leaves(tr1.state), jax.tree.leaves(trk.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4)
    assert np.isfinite(float(mk["loss"]))

    # loose: full 24-iter training loops (chunk boundaries at log_every=8,
    # camera-epoch length 4) stay on the same trajectory
    tr1, trk = make(1), make(8)
    h1 = tr1.train(iterations=24, log_every=8)
    hk = trk.train(iterations=24, log_every=8)
    for m1, mkk in zip(h1, hk):
        assert m1["iter"] == mkk["iter"]
        np.testing.assert_allclose(m1["loss"], mkk["loss"], rtol=2e-2)
    # after 24 chaotic Adam steps the reassociation noise has grown to ~3e-2
    # abs on near-zero elements (measured) — the state check only guards
    # against gross divergence (wrong stream => O(1) diffs on most elements)
    for a, b in zip(jax.tree.leaves(tr1.state.gp),
                    jax.tree.leaves(trk.state.gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=0.05)


def test_anchor_iteration_semantics(tiny_run):
    """Pin the combined anchor-iteration order of operations (VERDICT r1 #8).

    Reference (train.py:287-304 + gaussian_model_dpsr_dynamic_anchor.py
    :736-828) mutates Gaussian tensors + Adam moments mid-iteration, then
    backprops only the surviving terms; the tensor swap makes optimizer.step()
    skip every Gaussian group that iteration, while the net optimizers DO
    step.  Our equivalent: anchor_step runs first, the jitted train step
    consumes stop-gradiented anchor_info with skip_gaussian_update=True, and
    the anchored params/moments overwrite the step's outputs.

    Asserts, on a real post-training mesh-phase state:
      * final gp / gs / Adam moments are EXACTLY anchor_step's outputs
        (no Adam update leaked into any Gaussian group);
      * g_count (Adam step counter for Gaussians) did not advance;
      * net params DID receive their Adam update;
      * the anchor loss entered the step's total loss.

    NOTE: mutates trainer.state — keep this test last in the file.
    """
    trainer, _ = tiny_run
    o = trainer.cfg.optimization
    it = 150  # > anchor_iter=60, % anchor_interval=30 == 0, mesh phase
    f = trainer.flags_for(it)
    assert f.anchor and f.skip_gaussian_update and f.mesh

    cam = trainer.scene.train_cameras[0]
    trainer.next_camera = lambda it: cam
    trainer.base_key = jax.random.PRNGKey(777)
    # deep-copy: the jitted step donates the state buffers, which would
    # invalidate `pre` for the replay below
    import jax.numpy as jnp
    pre = jax.tree.map(lambda x: jnp.array(x, copy=True), trainer.state)

    metrics = trainer.run_iteration(it)
    post = trainer.state

    # replay the anchor step with the loop's exact key/batch wiring
    # (per-iteration fold_in stream, loop.py run_iteration)
    k1, _, _ = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(777), it), 3)
    batch = trainer.get_batch(cam)
    gp_a, gs_a, mu_a, nu_a, info = trainer.anchor_fn(pre, batch, k1)

    for got, want in zip(jax.tree.leaves((post.gp, post.g_mu, post.g_nu)),
                         jax.tree.leaves((gp_a, mu_a, nu_a))):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(post.gs.alive),
                                  np.asarray(gs_a.alive))
    np.testing.assert_array_equal(np.asarray(post.g_count),
                                  np.asarray(pre.g_count))
    assert int(post.step) == int(pre.step) + 1

    # nets saw their Adam update (deform is active in mesh phase)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(pre.nets.deform),
                        jax.tree.leaves(post.nets.deform)))
    assert changed, "deform net params did not update on an anchor iteration"

    assert "anchor_loss" in metrics and np.isfinite(float(metrics["anchor_loss"]))

"""Replay training from a checkpoint until the first non-finite loss, then
re-run the failing step from the last-finite state and report which gradient
/ loss / param tensors are non-finite.  One-off debugging driver for the r3
quality-run NaN (mesh-phase, post-freeze_pos).

Usage: python tools/nan_hunt.py -m output/quality_run -s output/quality_ds \
          [--to 5700] [--snap_from 5480]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def finite_report(tree, prefix=""):
    import jax
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if a.dtype.kind == "f":
            n = int((~np.isfinite(a)).sum())
            if n:
                bad.append((prefix + jax.tree_util.keystr(path), n, a.size))
    return bad


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("--to", type=int, default=5800)
    ap.add_argument("--snap_from", type=int, default=5480)
    args = ap.parse_args()

    from dgmesh_tpu.config import Config
    cfg = Config.load(os.path.join(args.model_path, "cfg_args.json"))
    cfg.model.model_path = args.model_path
    cfg.model.source_path = args.source_path
    cfg.tpu.donate = False  # keep states inspectable

    from dgmesh_tpu.data.scene import Scene
    from dgmesh_tpu.train.loop import Trainer
    from dgmesh_tpu.train.checkpoint import load_checkpoint

    scene = Scene(cfg, shuffle=True, seed=0)
    trainer = Trainer(cfg, scene, seed=0)
    trainer.state = load_checkpoint(trainer.state, args.model_path)
    start = int(trainer.state.step)
    print(f"replaying from {start}", flush=True)

    snap = None          # host copy of (state, it) before the failing step
    snap_meta = None
    for it in range(start + 1, args.to + 1):
        if it >= args.snap_from:
            snap = jax.device_get(trainer.state)
            # rng/batch wiring is pure fold_in(base, it) — the iteration
            # alone pins the exact stream run_iteration will use
            snap_meta = it
        m = trainer.run_iteration(it)
        loss = float(m["loss"])
        if it % 100 == 0:
            print(f"[{it}] loss={loss:.4f}", flush=True)
        if not np.isfinite(loss):
            print(f"FIRST NON-FINITE LOSS at iter {it}: {loss}", flush=True)
            for k, v in m.items():
                if isinstance(v, (int, float)) or getattr(v, "ndim", 1) == 0:
                    print(f"   metric {k} = {float(v):.6g}")
            break
    else:
        print("no NaN found in range", flush=True)
        return

    if snap is None:
        print("no snapshot (NaN before snap_from)")
        return

    # which params were already NaN before the step?
    bad_pre = finite_report(snap, "pre.")
    print("non-finite PRE-step tensors:", bad_pre or "none", flush=True)

    # re-run the failing step from the snapshot and inspect gradients
    from dgmesh_tpu.train.step import loss_and_aux
    import jax.numpy as jnp
    it = snap_meta
    trainer.state = jax.device_put(snap)
    flags_used = trainer.flags_for(it)
    print(f"failing-step flags: {flags_used}", flush=True)

    # Generic approach: monkeypatch train_step to capture inputs
    captured = {}
    import dgmesh_tpu.train.loop as L

    orig = trainer._step_fn

    def capture_step_fn(flags):
        fn = orig(flags)

        def wrapped(state, batch, key, anchor_info):
            captured["args"] = (state, batch, key, anchor_info, flags)
            return fn(state, batch, key, anchor_info)
        return wrapped

    trainer._step_fn = capture_step_fn
    m = trainer.run_iteration(it)
    print(f"replayed failing iter {it}: loss={float(m['loss']):.6g}", flush=True)
    state_c, batch_c, key_c, anchor_c, flags_c = captured["args"]

    ctx = trainer.ctx
    M = state_c.gp.xyz.shape[0]
    step_f = state_c.step.astype(jnp.float32)

    def lf(gp, nets, so):
        return loss_and_aux(ctx, gp, nets, so, state_c.gs, batch_c, key_c,
                            step_f, flags_c, anchor_c)

    (loss, aux), grads = jax.value_and_grad(lf, argnums=(0, 1, 2),
                                            has_aux=True)(
        state_c.gp, state_c.nets, jnp.zeros((M, 2)))
    print("loss re-eval:", float(loss), flush=True)
    for k, v in aux.get("losses", {}).items():
        print(f"   loss[{k}] = {float(v):.6g}", flush=True)
    g_gp, g_nets, g_so = jax.device_get(grads)
    print("non-finite grads (gp):", finite_report(g_gp, "g_gp."), flush=True)
    print("non-finite grads (nets):", finite_report(g_nets, "g_nets.")[:20],
          flush=True)
    print("non-finite grads (screen):", finite_report(g_so, "g_so."),
          flush=True)


if __name__ == "__main__":
    main()

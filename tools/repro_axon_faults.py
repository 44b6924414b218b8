"""Minimal on-device repros for the two axon backend faults (VERDICT r4 #8).

Run on the REAL TPU (the faults are backend miscompiles; CPU is bit-clean on
the same programs):

    python tools/repro_axon_faults.py mlp   # DESIGN.md §3c: unchunked
                                            # appearance apply at V=285k
                                            # fwd+bwd -> NaN grads
    python tools/repro_axon_faults.py occ   # ops/occupancy.py: res>=192
                                            # occupancy grid kills the worker
                                            # (run LAST; needs tunnel restart)

Each prints PASS/FAULT so a backend update can be re-qualified in minutes;
the pytest-side precondition guards live in tests/test_axon_workarounds.py.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def repro_mlp(v: int = 285_000, chunk: int = 0):
    """The r4 fault shape: appearance MLP fwd+bwd over V rows, unchunked.

    chunk=0 reproduces the fault configuration; chunk=32768 is the shipped
    mitigation and must stay finite."""
    from dgmesh_tpu.config import Config
    from dgmesh_tpu.models import mlp as M
    from dgmesh_tpu.models.mlp import chunked_apply
    from dgmesh_tpu.train.state import NetParams, build_nets

    cfg = Config()
    nets_def = build_nets(cfg)
    key = jax.random.PRNGKey(0)
    params = NetParams(*[M.init_deform_params(k, m) for k, m in zip(
        jax.random.split(key, 5), nets_def)])
    verts = jax.random.normal(jax.random.fold_in(key, 1), (v, 3))
    t = jnp.zeros((v, 1))

    def loss(p):
        if chunk:
            col = chunked_apply(nets_def.appearance.apply, p, verts, t, chunk)
        else:
            col = nets_def.appearance.apply(p, verts, t)
        return jnp.sum(col ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params.appearance)
    leaves = jax.tree_util.tree_leaves(grads)
    finite = all(bool(jnp.isfinite(l).all()) for l in leaves) and bool(
        jnp.isfinite(val))
    tag = "unchunked" if not chunk else f"chunk={chunk}"
    print(f"[mlp {tag} V={v}] loss={float(val):.4e} "
          f"{'PASS (all grads finite)' if finite else 'FAULT (NaN grads)'}")
    return finite


def repro_occ(res: int = 192, m: int = 131_072):
    """The r3 fault shape: occupancy grid at res^3 over M Gaussians.

    WARNING: on a faulty backend this KILLS the TPU worker — the tunnel
    needs its ~60-90 s cooldown afterwards.  Run this repro last."""
    from dgmesh_tpu.ops.occupancy import gaussian_occupancy_grid

    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (m, 3), minval=-1, maxval=1)
    scaling = jnp.full((m, 3), 0.02)
    rotation = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (m, 1))
    opacity = jnp.full((m,), 0.5)
    alive = jnp.ones((m,), bool)
    grid = jax.jit(gaussian_occupancy_grid, static_argnames=("res",))(
        xyz, scaling, rotation, opacity, alive,
        jnp.zeros(3), jnp.float32(1.2), res=res)
    ok = bool(jnp.isfinite(grid).all())
    print(f"[occ res={res} M={m}] grid mean={float(grid.mean()):.4e} "
          f"{'PASS' if ok else 'FAULT (non-finite)'}")
    return ok


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mlp"
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    if which == "mlp":
        ok_mit = repro_mlp(chunk=32768)
        ok_raw = repro_mlp(chunk=0)
        sys.exit(0 if (ok_mit and ok_raw) else 1)
    elif which == "occ":
        ok128 = repro_occ(res=128)
        ok192 = repro_occ(res=192)   # may not return on a faulty backend
        sys.exit(0 if (ok128 and ok192) else 1)
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()

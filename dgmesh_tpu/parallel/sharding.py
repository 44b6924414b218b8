"""Multi-chip sharding layer (new capability; the reference is single-GPU —
SURVEY.md §2.0).

Parallel axes of this workload (SURVEY.md §2.0): the Gaussian/point axis M
(deform MLP, preprocess, DPSR splat), the tile axis (splat & mesh
compositing), and the DPSR FFT grid.  Strategy: data arrays are sharded on
their leading per-Gaussian axis over a 1-D device mesh; MLP/optimizer state is
replicated; XLA GSPMD inserts the collectives (all-gathers around the global
sort, psum for the scalar losses) — the scaling-book recipe: pick a mesh,
annotate shardings, let XLA do the rest.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussians import GaussianParams, GaussianStats
from ..train.state import TrainState


def make_mesh(n_devices: Optional[int] = None, axis: str = "dev",
              devices=None) -> Mesh:
    """1-D device mesh. ``devices`` pins an explicit device list (e.g.
    ``jax.devices("cpu")`` for a host-platform dry run); default is the
    backend's device order."""
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def state_shardings(mesh: Mesh, state: TrainState, axis: str = "dev"):
    """NamedSharding pytree for TrainState: per-Gaussian arrays sharded on
    axis 0, everything else replicated."""
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))

    def shard_gp(gp: GaussianParams):
        return GaussianParams(*[
            row if getattr(gp, n).ndim >= 1 and n != "density_thres" else repl
            for n in GaussianParams._fields])

    def shard_gs(gs: GaussianStats):
        return GaussianStats(
            alive=row, max_radii2d=row, xyz_grad_accum=row, denom=row,
            gaussian_center=repl, gaussian_scale=repl)

    return TrainState(
        gp=shard_gp(state.gp),
        gs=shard_gs(state.gs),
        nets=jax.tree.map(lambda _: repl, state.nets),
        g_mu=shard_gp(state.g_mu),
        g_nu=shard_gp(state.g_nu),
        g_count=repl,
        net_opt=jax.tree.map(lambda _: repl, state.net_opt),
        step=repl,
    )


def shard_state(state: TrainState, mesh: Mesh, axis: str = "dev") -> TrainState:
    sh = state_shardings(mesh, state, axis)
    return jax.tree.map(jax.device_put, state, sh)

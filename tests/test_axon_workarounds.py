"""Guards for the two axon-backend fault workarounds (VERDICT r4 #8).

Two load-bearing config knobs mitigate TPU-backend miscompiles that CPU can
never reproduce (both bit-clean on CPU at the same state):

  1. ``tpu.mlp_chunk``: the UNCHUNKED appearance-MLP forward/backward at
     V≈285k miscompiled into NaN on axon (DESIGN.md §3c; r4).  Every
     quality-scale config must pin a chunk well below the quality vertex
     scale so the apply runs through lax.map row chunks.
  2. ``tpu.occ_res``: the one-shot normal-init occupancy program kills the
     TPU worker at res ≥ 192 with M=131072 (ops/occupancy.py module
     docstring; r3).  The default must stay ≤ 128 until the backend is
     fixed, and the trainer must clamp the effective resolution.

These tests assert the PRECONDITIONS of the workarounds so a future config
or refactor cannot silently re-expose the faults.  The on-device repros
live in tools/repro_axon_faults.py (TPU-only, run when the tunnel is free).
"""

import glob
import os

import jax.numpy as jnp
import pytest
import yaml

from dgmesh_tpu.config import Config, TpuParams

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the fault threshold measured in r4: V≈285k unchunked appearance apply NaNs;
# chunks ≤ 64k are known-good (32768 is the shipped mitigation)
MLP_CHUNK_SAFE = 65536
# occupancy worker fault threshold measured in r3: res ≥ 192 faults, 128 ok
OCC_RES_SAFE = 128


def _quality_configs():
    paths = sorted(glob.glob(os.path.join(REPO, "configs", "*quality*.yaml")))
    assert paths, "quality configs missing"
    return paths


@pytest.mark.parametrize("path", _quality_configs())
def test_quality_configs_pin_mlp_chunk(path):
    """DESIGN.md §3c mitigation: quality-scale runs must chunk the big MLP
    applies — the unchunked V≈285k appearance apply miscompiles to NaN on
    axon.  A config whose max_verts exceeds the safe unchunked size MUST set
    mlp_chunk in (0, MLP_CHUNK_SAFE]."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    max_verts = int(raw.get("max_verts", 0))
    if max_verts <= MLP_CHUNK_SAFE:
        pytest.skip("config below the fault scale")
    chunk = int(raw.get("mlp_chunk", 0))
    assert 0 < chunk <= MLP_CHUNK_SAFE, (
        f"{os.path.basename(path)}: max_verts={max_verts} requires "
        f"mlp_chunk in (0,{MLP_CHUNK_SAFE}] (axon NaN miscompile of the "
        f"unchunked appearance apply, DESIGN.md §3c); got {chunk}")


def test_default_occ_res_is_safe():
    """ops/occupancy.py KNOWN BACKEND FAULT: res >= 192 kills the axon
    worker.  The shipped default must stay at the measured-safe 128."""
    assert TpuParams().occ_res <= OCC_RES_SAFE


def test_trainer_clamps_effective_occ_res(tmp_path):
    """The trainer must bound the normal-init grid by tpu.occ_res even when
    grid_res is larger — a config raising grid_res alone must not re-expose
    the worker fault."""
    cfg = Config()
    cfg.model.grid_res = 256
    eff = min(cfg.model.grid_res, cfg.tpu.occ_res)
    assert eff <= OCC_RES_SAFE
    # and the clamp expression in Trainer.__init__ is the same min()
    import inspect
    from dgmesh_tpu.train.loop import Trainer
    src = inspect.getsource(Trainer.__init__)
    assert "min(cfg.model.grid_res, cfg.tpu.occ_res)" in src


def test_step_context_honors_mlp_chunk():
    """StepContext must carry tpu.mlp_chunk into the chunked applies —
    the mitigation is dead code if the context drops it."""
    from dgmesh_tpu.train.step import StepContext
    cfg = Config()
    cfg.tpu.mlp_chunk = 12345
    cfg.model.grid_res = 32
    cfg.tpu.max_verts = 1024
    cfg.tpu.max_faces = 2048
    ctx = StepContext(cfg, width=32, height=32)
    assert ctx.mlp_chunk == 12345


def test_chunked_apply_matches_unchunked():
    """lax.map row chunking is numerically the identity transform on the
    apply (the mitigation must not change results where both paths work)."""
    import jax
    from dgmesh_tpu.models.mlp import chunked_apply

    def apply(params, x, t):
        return jnp.tanh(x @ params["w"]) + t

    k = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(k, (3, 3))}
    x = jax.random.normal(jax.random.fold_in(k, 1), (1000, 3))
    t = jnp.ones((1000, 1))
    full = apply(params, x, t)
    chunked = chunked_apply(apply, params, x, t, 128)
    assert jnp.allclose(full, chunked, atol=1e-6)

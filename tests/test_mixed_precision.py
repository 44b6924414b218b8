"""Per-phase mixed-precision policy (VERDICT r1 weak #6).

mlp_bf16 turns the 8x256 trunk matmuls bf16 ONLY in gradient train steps;
anchor geometry, normal init, eval rendering, and mesh export always apply
the nets in f32 via StepContext.f32() — bf16 trunk noise (~3e-3 rel) is on
the order of anchor_search_radius and corrupted anchor partitions in the r1
A/B (STATUS.md)."""

import jax.numpy as jnp
import numpy as np

from dgmesh_tpu.config import Config
from dgmesh_tpu.train.step import StepContext


def _ctx(bf16: bool) -> StepContext:
    cfg = Config()
    cfg.model.is_blender = True
    cfg.model.grid_res = 16
    cfg.tpu.max_gaussians = 128
    cfg.tpu.max_verts = 256
    cfg.tpu.max_faces = 512
    cfg.tpu.mlp_bf16 = bf16
    return StepContext(cfg, 32, 32)


def test_f32_view_identity_and_caching():
    ctx = _ctx(False)
    assert ctx.f32() is ctx                      # no-op when bf16 is off

    ctx = _ctx(True)
    v = ctx.f32()
    assert v is not ctx
    assert v is ctx.f32()                        # cached
    assert v.f32() is v                          # idempotent
    assert ctx.nets_def.deform.dtype == jnp.bfloat16
    assert v.nets_def.deform.dtype is None       # f32 compute
    assert v.nets_def.deform_back_normal.dtype is None
    # everything non-net is shared, not rebuilt
    assert v.dpsr is ctx.dpsr and v.mr_cfg is ctx.mr_cfg


def test_f32_view_matches_pure_f32_bitwise():
    ctx_b = _ctx(True)
    ctx_f = _ctx(False)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    t_in = jnp.full((64, 1), 0.3, jnp.float32)

    import jax
    params = ctx_f.nets_def.deform.init(jax.random.PRNGKey(0), xyz, t_in)

    out_f = ctx_f.nets_def.deform.apply(params, xyz, t_in)
    out_v = ctx_b.f32().nets_def.deform.apply(params, xyz, t_in)
    for a, b in zip(out_f, out_v):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the bf16 defs actually change the compute (flag is not a no-op) —
    # checked on the trunk: the deform heads are zero-init so full-net
    # outputs are zero in either precision at init
    from dgmesh_tpu.models.mlp import MLPTrunk
    import jax
    x = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    tp = MLPTrunk(depth=4, width=256).init(jax.random.PRNGKey(1), x)
    h_f = MLPTrunk(depth=4, width=256).apply(tp, x)
    h_b = MLPTrunk(depth=4, width=256, dtype=jnp.bfloat16).apply(tp, x)
    assert float(jnp.abs(h_f - h_b).max()) > 0.0

"""Config-tree parity tests: all 20 reference YAML mirrors load, carry the
reference's per-dataset overrides (SURVEY.md §2.4), and trace a step."""

import argparse
import glob
import os

import jax
import pytest
import yaml

from dgmesh_tpu.config import Config, add_config_args, config_from_args

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "configs")
DATASET_YAMLS = sorted(
    p for p in glob.glob(os.path.join(ROOT, "*", "*.yaml")))

# family/scene count mirrors reference dgmesh/configs/** exactly
EXPECT = {"d-nerf": 8, "dg-mesh": 6, "nerfies": 2, "neural-actor": 2,
          "iphone": 2}


def _load(path):
    parser = argparse.ArgumentParser()
    add_config_args(parser)
    args = parser.parse_args([])
    return config_from_args(args, yaml_path=path)


def test_config_tree_counts():
    got = {}
    for p in DATASET_YAMLS:
        fam = os.path.basename(os.path.dirname(p))
        got[fam] = got.get(fam, 0) + 1
    assert got == EXPECT, got


@pytest.mark.parametrize("path", DATASET_YAMLS,
                         ids=[os.path.relpath(p, ROOT) for p in DATASET_YAMLS])
def test_config_loads_and_traces(path):
    cfg = _load(path)
    raw = yaml.safe_load(open(path))
    # every YAML key must land in some config group (no silent no-ops)
    for k, v in raw.items():
        found = [getattr(getattr(cfg, g), k)
                 for g in ("model", "pipeline", "optimization", "tpu")
                 if hasattr(getattr(cfg, g), k)]
        assert found, f"YAML key {k} mapped to no config field"
        assert any(fv == v or fv == pytest.approx(v) for fv in found), \
            f"{k}: yaml={v} cfg={found}"

    # spot-check the per-dataset override surface
    assert cfg.optimization.iterations == 25_000
    assert cfg.model.grid_res == 288
    if "horse" in path:
        assert cfg.optimization.mask_loss_weight == 2.5
        assert cfg.optimization.dpsr_iter == 12_000
    if "lego" in path or "trex" in path:
        assert cfg.optimization.dpsr_sig == 0.5
    if "iphone" in path or "nerfies" in path:
        assert cfg.model.gaussian_center == [-0.25, -0.25, -0.25]
    if "D2_vlad" in path:
        assert cfg.optimization.normal_warm_up == 2_000
        assert cfg.model.gaussian_ratio == 2.5

    # trace one tiny step variant under this config's semantic flags
    # (capacities shrunk so the abstract trace is cheap)
    import sys
    sys.path.insert(0, os.path.dirname(ROOT))
    import __graft_entry__ as ge
    tiny, img = ge._tiny_cfg()
    tiny.model.is_blender = cfg.model.is_blender
    tiny.model.white_background = cfg.model.white_background
    tiny.optimization.dpsr_sig = cfg.optimization.dpsr_sig
    tiny.optimization.mask_loss_weight = cfg.optimization.mask_loss_weight
    tiny.optimization.anchor_topn = cfg.optimization.anchor_topn
    ctx, state, batch = ge._make_state_and_batch(tiny, img)
    from dgmesh_tpu.train.step import StepFlags, train_step
    flags = StepFlags(warm=False, mesh=True, freeze_pos=False, use_normal=True,
                      anchor=False, sh_degree=1)
    jax.eval_shape(lambda st, b, k: train_step(ctx, st, b, k, flags, None),
                   state, batch, jax.random.PRNGKey(0))

"""Training state: one pytree holding everything the compiled step touches.

Replaces the reference's 6 Adam optimizers / 8 Gaussian param groups
(gaussian_model_dpsr_dynamic_anchor.py training_setup :186-220; deform_model.py
train_setting; appearance_model.py) with:
  - a hand-rolled masked Adam for the padded Gaussian arrays (moments live in
    arrays shaped like the params, so the reference's optimizer-state
    "surgery" on densify/prune/anchor is just zeroing moments under a mask);
  - optax.scale_by_adam chains for the five MLPs.

LR schedules replicate the reference exactly — including its swapped
rotation/normal schedulers (update_learning_rate :222-236 assigns the
rotation group the rotation_lr*100→*10 schedule and the normal group the
rotation_lr→*0.1 schedule; we preserve that observed behavior).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import mlp
from ..models.gaussians import (GaussianParams, GaussianStats, create_from_pcd,
                                update_scale_center)
from ..schedules import expon_lr

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-15  # reference: Adam(eps=1e-15)

# density_thres projection bound (see gaussian_adam_update).  The reference
# trains this iso-level completely unbounded (lr 0.01, gaussian_model_dpsr_
# dynamic_anchor.py:201); the r4-era ±0.35 clamp was sized for a field whose
# |psr| stayed ≈0.5, but the r5 quality run's field spans [-2.0, 1.7] and the
# optimizer pinned at 0.35 within 100 mesh iterations while every health
# metric stayed clean (mesh PSNR rising, |normal|=1.0, GS intact) — the
# clamp was blocking a LEGITIMATE shrink of the inflated first extraction,
# not a runaway.  ±1.0 keeps a safety margin inside the observed field range;
# the empty-mesh and pinned-at-bound tripwires (loop.py) are the real guards
# against the r3 thr-out-of-range collapse.
DENSITY_THRES_BOUND = 1.0


class NetParams(NamedTuple):
    deform: Any
    deform_normal: Any
    deform_back: Any
    deform_back_normal: Any
    appearance: Any


class TrainState(NamedTuple):
    gp: GaussianParams
    gs: GaussianStats
    nets: NetParams
    g_mu: GaussianParams       # Adam first moments, same shapes as gp
    g_nu: GaussianParams       # Adam second moments
    g_count: jnp.ndarray       # shared Adam step count for the gaussian groups
    net_opt: NetParams         # optax ScaleByAdamState per net
    step: jnp.ndarray          # global iteration (int32)


def build_nets(cfg: Config):
    is_b = cfg.model.is_blender
    is_6 = cfg.model.is_6dof
    dt = jnp.bfloat16 if cfg.tpu.mlp_bf16 else None
    fu = bool(cfg.tpu.mlp_fused and cfg.tpu.mlp_bf16)
    return NetParams(
        deform=mlp.DeformNetwork(is_blender=is_b, with_normal=True, is_6dof=is_6,
                                 dtype=dt, fuse=fu),
        deform_normal=mlp.DeformNetworkNormalSep(is_blender=is_b, dtype=dt,
                                                 fuse=fu),
        deform_back=mlp.DeformNetwork(is_blender=is_b, with_normal=True, is_6dof=is_6,
                                      dtype=dt, fuse=fu),
        deform_back_normal=mlp.DeformNetworkNormalSep(is_blender=is_b, dtype=dt,
                                                      fuse=fu),
        appearance=mlp.AppearanceNetwork(is_blender=is_b, dtype=dt, fuse=fu),
    )


def _net_tx():
    return optax.scale_by_adam(b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS)


def init_state(cfg: Config, points: np.ndarray, colors: np.ndarray,
               seed: int = 0) -> TrainState:
    gp, gs = create_from_pcd(points, colors, capacity=cfg.tpu.max_gaussians,
                             sh_degree=cfg.model.sh_degree,
                             init_density_threshold=cfg.optimization.init_density_threshold)
    fixed = cfg.model.gaussian_center if cfg.model.data_type in ("iPhone", "NeuralActor") else None
    gs = update_scale_center(gp, gs, cfg.model.gaussian_ratio, fixed_center=fixed)

    nets_def = build_nets(cfg)
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    nets = NetParams(*[mlp.init_deform_params(k, m)
                       for k, m in zip(keys, nets_def)])

    tx = _net_tx()
    net_opt = NetParams(*[tx.init(p) for p in nets])
    return TrainState(gp=gp, gs=gs, nets=nets,
                      g_mu=jax.tree.map(jnp.zeros_like, gp),
                      g_nu=jax.tree.map(jnp.zeros_like, gp),
                      g_count=jnp.zeros((), jnp.int32),
                      net_opt=net_opt, step=jnp.zeros((), jnp.int32))


# --- learning-rate schedules ------------------------------------------------

def gaussian_group_lrs(step, cfg: Config):
    """Per-group LR at `step` (reference: training_setup + update_learning_rate)."""
    o = cfg.optimization
    s = 5.0  # spatial_lr_scale (gaussian model, :192)
    return GaussianParams(
        xyz=expon_lr(step, o.position_lr_init * s, o.position_lr_final * s,
                     max_steps=o.position_lr_max_steps),
        f_dc=jnp.asarray(o.feature_lr),
        f_rest=jnp.asarray(o.feature_lr / 20.0),
        scaling=jnp.asarray(o.scaling_lr * s),
        # reference quirk (see module docstring): rotation gets the ×100 sched
        rotation=expon_lr(step, o.rotation_lr * 100.0, o.rotation_lr * 10.0,
                          max_steps=o.position_lr_max_steps),
        opacity=jnp.asarray(o.opacity_lr),
        normal=expon_lr(step, o.rotation_lr, o.rotation_lr * 0.1,
                        max_steps=o.position_lr_max_steps),
        density_thres=expon_lr(step, 0.01, 1e-4, max_steps=o.position_lr_max_steps),
    )


def net_lrs(step, cfg: Config) -> NetParams:
    o = cfg.optimization
    return NetParams(
        deform=expon_lr(step, o.position_lr_init * 5, o.position_lr_final,
                        max_steps=o.deform_lr_max_steps),
        deform_normal=expon_lr(step, o.position_lr_init * 10, o.position_lr_final * 10,
                               max_steps=o.deform_lr_max_steps),
        deform_back=expon_lr(step, o.position_lr_init * 5, o.position_lr_final,
                             max_steps=o.deform_lr_max_steps),
        deform_back_normal=expon_lr(step, o.position_lr_init * 10, o.position_lr_final * 10,
                                    max_steps=o.deform_lr_max_steps),
        appearance=expon_lr(step, o.apperance_lr_init, o.apperance_lr_final,
                            lr_delay_mult=o.apperance_lr_delay_mult,
                            max_steps=o.apperance_lr_max_steps),
    )


# --- masked Adam for the gaussian arrays ------------------------------------

def gaussian_adam_update(gp: GaussianParams, grads: GaussianParams,
                         mu: GaussianParams, nu: GaussianParams,
                         count, lrs: GaussianParams, alive):
    """One Adam step over every gaussian group, masked to live slots.

    Dead slots keep zero moments and unchanged params.  density_thres is a
    scalar (always "alive").
    """
    count = count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1 ** c
    bc2 = 1.0 - ADAM_B2 ** c

    def upd(p, g, m, v, lr, masked):
        m2 = ADAM_B1 * m + (1 - ADAM_B1) * g
        v2 = ADAM_B2 * v + (1 - ADAM_B2) * g * g
        step = lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + ADAM_EPS)
        if masked:
            mask = alive.reshape((-1,) + (1,) * (p.ndim - 1))
            m2 = jnp.where(mask, m2, 0.0)
            v2 = jnp.where(mask, v2, 0.0)
            p2 = jnp.where(mask, p - step, p)
        else:
            p2 = p - step
        return p2, m2, v2

    new_p, new_m, new_v = [], [], []
    for name in GaussianParams._fields:
        p, g = getattr(gp, name), getattr(grads, name)
        m, v = getattr(mu, name), getattr(nu, name)
        lr = getattr(lrs, name)
        p2, m2, v2 = upd(p, g, m, v, lr, masked=(name != "density_thres"))
        if name == "density_thres":
            # Projection guard (deviation; the reference leaves the iso-level
            # unconstrained).  The DPSR field is normalized to corner = +0.5,
            # interior negative, so any |thr| >= 0.5 guarantees an EMPTY mesh
            # with zero gradient everywhere — a one-way death the r3 quality
            # run hit when a truncated-raster mask gradient ran the iso-level
            # out of the field's range (V=0 at iter 5100, VERDICT r3 #1).
            # |thr| <= 0.35 keeps every reference-reachable value (their runs
            # sit near 0) while making the runaway physically impossible.
            p2 = jnp.clip(p2, -DENSITY_THRES_BOUND, DENSITY_THRES_BOUND)
        new_p.append(p2)
        new_m.append(m2)
        new_v.append(v2)
    return GaussianParams(*new_p), GaussianParams(*new_m), GaussianParams(*new_v), count


def net_adam_update(params, grads, opt_state, lr):
    tx = _net_tx()
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, jax.tree.map(lambda u: -lr * u, updates))
    return params, opt_state

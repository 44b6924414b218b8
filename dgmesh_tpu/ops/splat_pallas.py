"""Pallas fused tile-compositing kernel for Gaussian splatting.

Fuses the whole per-tile pipeline of ops/splat._composite_chunk — gather'd
attribute blocks → alpha evaluation → front-to-back transmittance → weighted
color reduction — into one VMEM-resident kernel (one grid step per tile), so
none of the (K,P) intermediates ever touch HBM.  Equivalent math to the XLA
path (same cumprod-in-log-space formulation); used for the forward pass with
a custom_vjp whose backward defaults to the fused analytic Pallas kernel
(recompute-in-VMEM, `analytic_bwd=True`); the chunked jnp twin remains as
the autodiff fallback and test oracle.

Layout: per-tile gaussian attributes are pre-gathered (outside the kernel)
into a (T, K, 16) tensor:
  [0]=mean_x [1]=mean_y [2]=conic_a [3]=conic_b [4]=conic_c [5]=opacity
  [6..8]=rgb [9]=valid  (rest padding to 16 lanes for clean tiling)

The kernel emits (T, P, 3) colors and (T, P) alpha with P = tile_h*tile_w.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _composite_kernel(attr_ref, out_rgb_ref, out_alpha_ref, *,
                      tile_h: int, tile_w: int, tiles_x: int):
    """One tile: attr (K,16) f32 in VMEM; tile origin from program_id."""
    K = attr_ref.shape[1]
    P = tile_h * tile_w

    attrs = attr_ref[0]                                    # (K,16)
    i = pl.program_id(0)
    ox = ((i % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((i // tiles_x) * tile_h).astype(jnp.float32)

    # pixel centers as a flat (1,P) row-major index (Mosaic cannot reshape
    # (tile_h,tile_w) → (1,P) in-kernel; derive x/y with mod/div instead)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pidx % tile_w).astype(jnp.float32) + ox
    py = (pidx // tile_w).astype(jnp.float32) + oy

    mean_x = attrs[:, 0:1]
    mean_y = attrs[:, 1:2]
    ca = attrs[:, 2:3]
    cb = attrs[:, 3:4]
    cc = attrs[:, 4:5]
    op = attrs[:, 5:6]
    valid = attrs[:, 9:10]

    dx = mean_x - px                                       # (K,P)
    dy = mean_y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    ok = (valid > 0.5) & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)

    # exclusive cumprod along K in log space.  cumsum is not lowerable in
    # Pallas TPU kernels; an inclusive prefix sum along K is one MXU matmul
    # with a lower-triangular ones matrix (K≤512 ⇒ tiny).
    log1m = jnp.log1p(-alpha)                              # (K,P), α≤0.99 safe
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tril = (col <= row).astype(jnp.float32)
    csum = jax.lax.dot_general(tril, log1m, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(csum - log1m)                          # T_i = Π_{j<i}(1-α_j)
    w = alpha * trans                                      # (K,P)

    rgb = attrs[:, 6:9]                                    # (K,3)
    out = jax.lax.dot_general(w, rgb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)  # (P,3)
    out_rgb_ref[0] = out
    out_alpha_ref[0] = 1.0 - jnp.exp(csum[K - 1:K, :])   # (1,P) row


def composite_tiles_pallas(attrs, tiles_x: int, tile_h: int, tile_w: int,
                           interpret: bool = False):
    """attrs (T,K,16) f32 → rgb (T,P,3), alpha (T,P); origins from tile id."""
    T, K, _ = attrs.shape
    P = tile_h * tile_w
    if jax.default_backend() != "tpu":
        interpret = True  # Pallas TPU kernels interpret on CPU test backends
    kern = functools.partial(_composite_kernel, tile_h=tile_h, tile_w=tile_w,
                             tiles_x=tiles_x)
    rgb, alpha = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((T, P, 3), jnp.float32),
                   jax.ShapeDtypeStruct((T, 1, P), jnp.float32)),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, P, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(attrs)
    return rgb, alpha[:, 0, :]


def _composite_bwd_kernel(attr_ref, g_rgb_ref, g_alpha_ref, d_attr_ref, *,
                          tile_h: int, tile_w: int, tiles_x: int):
    """Analytic per-tile backward: recompute the forward in VMEM, then

      dL/dc_i      = Σ_p w_i g_rgb                       (matmul)
      dL/dα_i      = u_i T_i − (suffix_i − g_A·T_fin)/(1−α_i)
                     with u_i = c_i·g_rgb, suffix via the same tril matmul
      dα/d{mean, conic, opacity} elementwise through α = o·exp(power).

    Same math as reverse-walk backward.cu:399-557, but with prefix-sum
    matmuls instead of a sequential back-to-front walk, and deterministic
    (no atomics).  Gradients are gated exactly like autodiff of the forward:
    live = ok & (o·e^p < ALPHA_MAX)  (min() kills grads at the clamp).
    """
    K = attr_ref.shape[1]
    P = tile_h * tile_w

    attrs = attr_ref[0]                                    # (K,16)
    i = pl.program_id(0)
    ox = ((i % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((i // tiles_x) * tile_h).astype(jnp.float32)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pidx % tile_w).astype(jnp.float32) + ox
    py = (pidx // tile_w).astype(jnp.float32) + oy

    mean_x, mean_y = attrs[:, 0:1], attrs[:, 1:2]
    ca, cb, cc = attrs[:, 2:3], attrs[:, 3:4], attrs[:, 4:5]
    op = attrs[:, 5:6]
    rgb = attrs[:, 6:9]
    valid = attrs[:, 9:10]

    dx = mean_x - px                                       # (K,P)
    dy = mean_y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(power)
    raw = op * expp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    ok = (valid > 0.5) & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)
    live = ok & (raw < ALPHA_MAX)

    log1m = jnp.log1p(-alpha)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tril = (col <= row).astype(jnp.float32)
    csum = jax.lax.dot_general(tril, log1m, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(csum - log1m)                          # T_i (K,P)
    w = alpha * trans
    t_fin = jnp.exp(csum[K - 1:K, :])                      # (1,P)

    g_rgb = g_rgb_ref[0]                                   # (P,3)
    g_a = g_alpha_ref[0]                                   # (1,P)

    d_rgb = jax.lax.dot_general(w, g_rgb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)  # (K,3)
    u = jax.lax.dot_general(rgb, g_rgb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)      # (K,P)
    uw = u * w
    incl = jax.lax.dot_general(tril, uw, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    suffix = incl[K - 1:K, :] - incl                       # Σ_{k>i} u_k w_k
    d_alpha = u * trans - (suffix - g_a * t_fin) / (1.0 - alpha)
    d_alpha = jnp.where(live, d_alpha, 0.0)

    ones = jnp.ones((P, 1), jnp.float32)

    def rowsum(x):                                         # (K,P) → (K,1)
        return jax.lax.dot_general(x, ones, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

    d_op = rowsum(d_alpha * expp)
    d_pow = d_alpha * alpha
    d_ca = rowsum(d_pow * (-0.5 * dx * dx))
    d_cb = rowsum(d_pow * (-dx * dy))
    d_cc = rowsum(d_pow * (-0.5 * dy * dy))
    d_mx = rowsum(d_pow * (-(ca * dx + cb * dy)))
    d_my = rowsum(d_pow * (-(cc * dy + cb * dx)))

    zeros = jnp.zeros((K, 7), jnp.float32)
    d_attr_ref[0] = jnp.concatenate(
        [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_rgb, zeros], axis=1)


def composite_bwd_pallas(attrs, g_rgb, g_alpha, tiles_x: int, tile_h: int,
                         tile_w: int, interpret: bool = False):
    """attrs (T,K,16), g_rgb (T,P,3), g_alpha (T,P) → d_attrs (T,K,16)."""
    T, K, L = attrs.shape
    P = tile_h * tile_w
    if jax.default_backend() != "tpu":
        interpret = True
    kern = functools.partial(_composite_bwd_kernel, tile_h=tile_h,
                             tile_w=tile_w, tiles_x=tiles_x)
    row = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K, L), jnp.float32),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, K, L), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, P, 3), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, P), row, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K, L), row, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(attrs, g_rgb, g_alpha.reshape(T, 1, P))


# ---- jnp twin of the kernel math (used for the backward pass) --------------

def _composite_ref(attrs, origins, tile_h: int, tile_w: int, chunk: int = 64):
    """Same math as the kernel, in chunked jnp (differentiable)."""
    T, K, _ = attrs.shape
    P = tile_h * tile_w
    n = -(-T // chunk)
    pad = n * chunk - T
    a = jnp.pad(attrs, ((0, pad), (0, 0), (0, 0))) if pad else attrs
    o = jnp.pad(origins, ((0, pad), (0, 0))) if pad else origins

    @jax.checkpoint
    def body(args):
        at, org = args                                      # (C,K,16),(C,2)
        py = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)
        px = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
        px = px.reshape(1, 1, P) + org[:, None, 0:1]
        py = py.reshape(1, 1, P) + org[:, None, 1:2]
        dx = at[..., 0:1] - px
        dy = at[..., 1:2] - py
        power = (-0.5 * (at[..., 2:3] * dx * dx + at[..., 4:5] * dy * dy)
                 - at[..., 3:4] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, at[..., 5:6] * jnp.exp(power))
        ok = (at[..., 9:10] > 0.5) & (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(ok, alpha, 0.0)                   # (C,K,P)
        log1m = jnp.log1p(-alpha)
        csum = jnp.cumsum(log1m, axis=1)
        trans = jnp.exp(csum - log1m)
        w = alpha * trans
        rgb = jnp.einsum("ckp,ckd->cpd", w, at[..., 6:9])
        return rgb, 1.0 - jnp.exp(csum[:, -1, :])

    rgb, alpha = jax.lax.map(body, (a.reshape(n, chunk, K, 16),
                                    o.reshape(n, chunk, 2)))
    return (rgb.reshape(-1, P, 3)[:T], alpha.reshape(-1, P)[:T])


def make_composite_tiles(tiles_x: int, tile_h: int, tile_w: int,
                         analytic_bwd: bool = True):
    """custom_vjp closure over the static tile geometry (nondiff int args are
    awkward with custom_vjp; closing over them is cleaner).

    analytic_bwd=True runs the fused Pallas backward kernel; False falls back
    to autodiff of the chunked jnp twin (kept as the test oracle)."""
    @jax.custom_vjp
    def f(attrs, origins):
        return composite_tiles_pallas(attrs, tiles_x, tile_h, tile_w)

    def fwd(attrs, origins):
        return composite_tiles_pallas(attrs, tiles_x, tile_h, tile_w), (attrs, origins)

    def bwd(res, g):
        attrs, origins = res
        if analytic_bwd:
            d_attrs = composite_bwd_pallas(attrs, g[0], g[1], tiles_x,
                                           tile_h, tile_w)
            return d_attrs, None
        _, vjp = jax.vjp(lambda a: _composite_ref(a, origins, tile_h, tile_w),
                         attrs)
        (d_attrs,) = vjp(g)
        return d_attrs, None

    f.defvjp(fwd, bwd)
    return f

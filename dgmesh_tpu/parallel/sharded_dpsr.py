"""Sharded DPSR: x-pencil decomposition of the Poisson solve over a 1-D
device mesh (DESIGN.md §5 plan item 1).

The single-device DPSR (ops/dpsr.py, div_mode="splat") is
    div_rasterize → rfftn → ×(G/Δ̂) → irfftn → shift (point-mean) → scale.
The grid-sized stages shard cleanly along grid-x:

  rasterize   each chip runs the slab-matmul scan over ITS R/n x-slabs only
              (points replicated via one tiny all_gather: N·3 f32 ≈ 1.6 MB at
              131k — the slab sort/start tables cover the full point set, so
              cross-boundary contributions land on the owning chip exactly).
              Scan length AND FLOPs scale 1/n; no grid-sized collective.
  y/z DFT     local per x-pencil, as layout-preserving MXU matmuls
              (ops/spectral.py matrices).  jnp.fft inside shard_map breaks
              under reverse AD (the FFT primitive's transpose types its
              cotangent against an unvarying primal aval — a vma mismatch);
              plain matmuls differentiate cleanly AND are the faster TPU
              path anyway.
  x-DFT       the standard pencil transpose, as ONE reduce-scatter: each chip
              multiplies its x-shard by the full DFT matrix columns
              (4 real MXU matmuls for the complex product) producing a
              full-k partial, then `psum_scatter` tiles k across chips.
  kernel      local multiply by the chip's k-rows of G/Δ̂.
  x-IDFT      mirror: partial over the k-shard, psum_scatter back to x-shards.
  y/z IDFT    local inverse matmul-DFT.

shift/scale (iso-level at the points, corner to ±0.5) run OUTSIDE the
shard_map on the stitched grid, byte-identical to DPSR.__call__: they are
O(grid) elementwise + one N-point trilinear gather, and ops/dpsr already
gives that gather an exact custom VJP (the splat-transpose).  Keeping them
outside makes the sharded program's autodiff purely standard transposes
(all_gather ↔ psum_scatter, matmul, slicing) — no hand-written collective
VJPs to get wrong.

Collective budget per call: one all_gather (points+normals, ~3 MB) and two
psum_scatters of the half-spectrum (R·R1·Rh·2 f32 / n per chip) — all
ICI-friendly; nothing scales with n.

Output is returned with x-shard layout (GSPMD stitches lazily) because
marching tets still consumes the full grid (plan item 2).

reference: the CUDA DG-Mesh is single-GPU; this module is new capability.
Numerics: pinned against the single-device DPSR by
tests/test_sharded_dpsr.py (values + gradients, 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.dpsr import DPSR, div_rasterize, grid_interp
from ..ops.spectral import _fwd_mats, _inv_half_mats, _inv_mats


def _dft_mats(r):
    """Real/imag parts of the length-r DFT matrix W[k,x]=exp(-2πi kx/r) and
    its inverse Wi[x,k]=exp(+2πi kx/r)/r."""
    kx = np.outer(np.arange(r), np.arange(r)) * (2 * np.pi / r)
    return (jnp.asarray(np.cos(kx), jnp.float32),
            jnp.asarray(-np.sin(kx), jnp.float32),
            jnp.asarray(np.cos(kx) / r, jnp.float32),
            jnp.asarray(np.sin(kx) / r, jnp.float32))


def _cmatmul(ar, ai, br, bi):
    """(ar+i·ai) @ (br+i·bi) with f32 MXU matmuls."""
    hp = lax.Precision.HIGHEST
    return (jnp.matmul(ar, br, precision=hp) - jnp.matmul(ai, bi, precision=hp),
            jnp.matmul(ar, bi, precision=hp) + jnp.matmul(ai, br, precision=hp))


def _dpsr_shard_body(op: DPSR, axis: str, n_chips: int,
                     points, normals, valid):
    """Runs on each chip: points/normals/valid are the chip's index-shard.
    Returns the chip's x-shard of the UNSHIFTED indicator grid."""
    res = op.res
    r0, r1, r2 = res
    rh = r2 // 2 + 1
    nloc = r0 // n_chips
    kloc = r0 // n_chips
    rank = lax.axis_index(axis)
    x0 = rank * nloc

    # replicate the (small) point set
    points = lax.all_gather(points, axis, tiled=True)
    normals = lax.all_gather(normals, axis, tiled=True)
    valid = lax.all_gather(valid, axis, tiled=True)
    normals = jnp.where(valid[:, None], normals, 0.0)

    # 1. local slab-range divergence rasterize: (nloc, R1, R2)
    slab_ids = x0 + jnp.arange(nloc, dtype=jnp.int32)
    div_l = div_rasterize(points, normals, res, slab_ids=slab_ids)
    # 2. local y/z real DFT on the x-pencil (matmul; see module docstring)
    hp = lax.Precision.HIGHEST
    C2, S2 = (jnp.asarray(m) for m in _fwd_mats(r2, half=True))
    C1, S1 = (jnp.asarray(m) for m in _fwd_mats(r1, half=False))
    zr = jnp.einsum("xyz,zh->xyh", div_l, C2, precision=hp)
    zi = jnp.einsum("xyz,zh->xyh", div_l, S2, precision=hp)
    sr = (jnp.einsum("xyh,yk->xkh", zr, C1, precision=hp)
          - jnp.einsum("xyh,yk->xkh", zi, S1, precision=hp))
    si = (jnp.einsum("xyh,yk->xkh", zr, S1, precision=hp)
          + jnp.einsum("xyh,yk->xkh", zi, C1, precision=hp))

    # 3. x-DFT: full-k partial from this x-shard, reduce-scatter k
    Wr, Wi, Wir, Wii = _dft_mats(r0)
    Wr_c = lax.dynamic_slice_in_dim(Wr, x0, nloc, axis=1)   # (r0, nloc)
    Wi_c = lax.dynamic_slice_in_dim(Wi, x0, nloc, axis=1)
    fr = sr.reshape(nloc, r1 * rh)
    fi = si.reshape(nloc, r1 * rh)
    pr, pi = _cmatmul(Wr_c, Wi_c, fr, fi)               # (r0, R1*rh) partials
    pr = lax.psum_scatter(pr, axis, scatter_dimension=0, tiled=True)
    pi = lax.psum_scatter(pi, axis, scatter_dimension=0, tiled=True)

    # 4. spectral kernel on this chip's k-rows
    k0 = rank * kloc
    kern_l = lax.dynamic_slice_in_dim(op.kern, k0, kloc, axis=0)
    kern_l = kern_l.reshape(kloc, r1 * rh)
    pr = pr * kern_l
    pi = pi * kern_l

    # 5. inverse x-DFT: full-x partial from the k-shard, reduce-scatter x
    Wir_c = lax.dynamic_slice_in_dim(Wir, k0, kloc, axis=1)
    Wii_c = lax.dynamic_slice_in_dim(Wii, k0, kloc, axis=1)
    qr, qi = _cmatmul(Wir_c, Wii_c, pr, pi)
    qr = lax.psum_scatter(qr, axis, scatter_dimension=0, tiled=True)
    qi = lax.psum_scatter(qi, axis, scatter_dimension=0, tiled=True)

    # 6. local y/z inverse DFT (matmul, layout-preserving; see step 2)
    qr = qr.reshape(nloc, r1, rh)
    qi = qi.reshape(nloc, r1, rh)
    Ci1, Si1 = (jnp.asarray(m) for m in _inv_mats(r1))
    Cr2, Sr2 = (jnp.asarray(m) for m in _inv_half_mats(r2))
    ur = (jnp.einsum("xkh,ky->xyh", qr, Ci1, precision=hp)
          - jnp.einsum("xkh,ky->xyh", qi, Si1, precision=hp))
    ui = (jnp.einsum("xkh,ky->xyh", qr, Si1, precision=hp)
          + jnp.einsum("xkh,ky->xyh", qi, Ci1, precision=hp))
    phi = (jnp.einsum("xyh,hz->xyz", ur, Cr2, precision=hp)
           + jnp.einsum("xyh,hz->xyz", ui, Sr2, precision=hp))

    # out_specs=P(axis) stitches the x-shards into the full grid; the (still
    # unsharded) marching-tets consumer gathers lazily under GSPMD
    return phi


def dpsr_sharded(mesh: Mesh, op: DPSR, points, normals, valid,
                 axis: str = "gauss"):
    """points/normals/valid index-sharded over ``mesh`` (or replicated —
    shard_map re-shards); returns the full indicator grid.

    Requires op.div_mode == "splat" (the shipped fast path) and
    grid_res % n_devices == 0.
    """
    if op.div_mode != "splat":
        raise NotImplementedError("sharded DPSR implements the splat "
                                  "(divergence-rasterize) path only")
    n = mesh.devices.size
    if op.res[0] % n:
        raise ValueError(f"grid_res={op.res[0]} not divisible by the "
                         f"{n}-device mesh")

    body = partial(_dpsr_shard_body, op, axis, n)
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis)),
                       out_specs=P(axis))
    phi = fn(points, normals, valid)

    # shift + scale on the stitched grid, exactly DPSR.__call__:467-489
    # (grid_interp carries ops/dpsr's exact splat-transpose VJP)
    if op.shift or op.scale:
        fv = grid_interp(phi, points, op.res)
        if op.shift:
            denom = jnp.maximum(jnp.sum(valid), 1)
            offset = jnp.sum(jnp.where(valid, fv, 0.0)) / denom
            phi = phi - offset
        if op.scale:
            fv0 = phi[0, 0, 0]
            denom = jnp.maximum(jnp.abs(fv0),
                                1e-3 * jnp.max(jnp.abs(phi)) + 1e-20)
            phi = -phi / denom * 0.5
    return phi

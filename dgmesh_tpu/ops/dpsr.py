"""Differentiable Poisson Surface Reconstruction (DPSR) on the 3D FFT.

reference: nvdiffrast_utils/dpsr.py:9-70 and dpsr_utils.py (point_rasterize
:140-197, fftfreqs :25-47, spec_gaussian_filter :66-72, grid_interp :74-116) —
itself from shape_as_points.  The math: trilinearly splat oriented point
normals onto a res³ grid, solve the screened Poisson equation in the Fourier
domain (Φ̂ = div(N̂)/Δ̂ with a spectral Gaussian low-pass), invert, then shift
so the indicator is 0 at the input points and scale so the (0,0,0) corner is
-0.5 (inside-negative convention... sign fixed downstream like
utils/renderer.py:164-167).

TPU notes: rfftn over a 288³ grid is XLA-native; the trilinear scatter is a
single `.at[].add` with 8·N updates (deterministic segment-sum lowering, no
atomics); everything is f32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def fftfreqs3(res: Tuple[int, int, int]):
    """Frequency grids for rfftn layout: full for dims 0,1; half for dim 2.

    Mirrors dpsr_utils.fftfreqs :25-47 (which keeps res//2 positive bins for
    the last axis).  Returns (r0, r1, r2//2+1, 3) float32 — NOTE the reference
    truncates the last axis to res//2 bins then the arrays broadcast against
    rfft outputs of res//2+1; we use res//2+1 everywhere for exactness.
    """
    freqs = []
    for i, r in enumerate(res):
        if i < 2:
            f = np.fft.fftfreq(r) * r  # integer frequencies -r/2..r/2
        else:
            f = np.arange(r // 2 + 1, dtype=np.float64)
        freqs.append(f)
    g = np.stack(np.meshgrid(*freqs, indexing="ij"), axis=-1)
    return jnp.asarray(g, jnp.float32)


def spec_gaussian_filter(res, sig: float):
    """exp(-2 (σ π |ω|/res)²) spectral low-pass (dpsr_utils :66-72)."""
    omega = np.asarray(fftfreqs3(res))
    dis = np.sqrt((omega ** 2).sum(-1))
    filt = np.exp(-0.5 * ((sig * 2 * dis / res[0]) ** 2))
    return jnp.asarray(filt, jnp.float32)


def _base_and_hats(points, res):
    """Wrapped base cell index (N,3) in [0,res) and per-axis hat weights.

    Returns (i0, H) with H: (N,3,2), H[:,k,b] = hat weight of axis k at
    corner bit b (b=0: 1-frac, b=1: frac).  The 2x2x2 corner window of i0
    stays inside a grid wrap-padded by one voxel per axis.
    """
    r = jnp.asarray(res, jnp.float32)
    scaled = points * r
    i0f = jnp.floor(scaled)
    frac = scaled - i0f
    i0 = jnp.mod(i0f.astype(jnp.int32), jnp.asarray(res, jnp.int32))
    return i0, jnp.stack([1.0 - frac, frac], axis=-1)


def _corner_weights(H):
    """(N,3,2) per-axis hats → (N,2,2,2) trilinear corner weights (pure
    broadcasting; no dot, so f32 exact on the VPU)."""
    return (H[:, 0, :, None, None] * H[:, 1, None, :, None]
            * H[:, 2, None, None, :])


def _wrap_pad(grid):
    """Pad a periodic grid by one voxel on the high side of each spatial axis
    (channels, if any, untouched) so a 2x2x2 window at any in-range base index
    is a contiguous in-bounds slice.  jnp.pad(mode='wrap') is differentiable —
    its VJP folds the padded faces' cotangents back, preserving periodicity."""
    pad = [(0, 1)] * 3 + [(0, 0)] * (grid.ndim - 3)
    return jnp.pad(grid, pad, mode="wrap")


def _fold_wrap(grid_p):
    """Inverse of _wrap_pad for scatters: add the high faces back onto the low
    faces axis by axis (edges/corners compose correctly)."""
    for ax in range(3):
        r = grid_p.shape[ax] - 1
        lo = lax.slice_in_dim(grid_p, 0, r, axis=ax)
        hi = lax.slice_in_dim(grid_p, r, r + 1, axis=ax)
        upd = lax.slice_in_dim(lo, 0, 1, axis=ax) + hi
        grid_p = lax.dynamic_update_slice_in_dim(lo, upd, 0, axis=ax)
    return grid_p


def _window_scatter_add(val, i0, res, channels=None):
    """ONE scatter-add of (N,2,2,2[,C]) corner windows into a periodic res³
    grid.  Cost on TPU is per-INDEX (DESIGN.md cost model), so one window
    scatter replaces 8 per-corner scatters at 1/8 the index traffic."""
    shape = tuple(s + 1 for s in res) + (() if channels is None else (channels,))
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3) + (() if channels is None else (4,)),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2))
    g = lax.scatter_add(jnp.zeros(shape, val.dtype), i0, val, dn,
                        indices_are_sorted=False, unique_indices=False,
                        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return _fold_wrap(g)


def point_rasterize(points, values, res):
    """Trilinear scatter of per-point vectors into a periodic grid.

    points: (N,3) in [0,1); values: (N,C).  Returns (res0,res1,res2,C).
    reference: dpsr_utils.point_rasterize :140-197 (periodic wrap via fmod).
    """
    i0, H = _base_and_hats(points, res)
    w = _corner_weights(H)                               # (N,2,2,2)
    val = w[..., None] * values[:, None, None, None, :]
    return _window_scatter_add(val, i0, tuple(res), channels=values.shape[-1])


def div_rasterize(points, normals, res):
    """Directly splat the (negated) divergence of the oriented point set.

    For each point the trilinear hat kernel's analytic spatial derivative is
    scattered instead of the kernel itself:
      D(g) = -Σ_i Σ_d n_d(i) · res_d · ∂_{g_d} Π_k hat(g_k - p_k·res_k)
    This equals the reference's spectral divergence Σ_d -iω_d N̂_d up to the
    hat kernel's derivative being taken analytically rather than spectrally —
    the two agree on all frequencies the σ=3 Gaussian low-pass keeps (DESIGN.md
    "DPSR fast path").  One scalar grid instead of three → the Poisson solve
    needs 2 FFTs instead of 4 (and 2 instead of 4 in the VJP).

    points: (N,3) in [0,1); normals: (N,3).  Returns (res0,res1,res2).
    """
    i0, H = _base_and_hats(points, res)
    # ∂_{g_d}: the hat factor on axis d is replaced by its derivative
    # (-1 at bit 0, +1 at bit 1); d/dx = res_d · d/dg.  Leading minus
    # matches the reference's -iω, so coeff(d, bit) = bit ? +res_d : -res_d.
    D = jnp.stack([-jnp.asarray(res, jnp.float32),
                   jnp.asarray(res, jnp.float32)], axis=-1)  # (3,2)
    n0, n1, n2 = normals[:, 0], normals[:, 1], normals[:, 2]
    H0, H1, H2 = H[:, 0], H[:, 1], H[:, 2]                   # (N,2) each
    val = (n0[:, None, None, None] * D[0][:, None, None]
           * H1[:, None, :, None] * H2[:, None, None, :]
           + n1[:, None, None, None] * D[1][None, :, None]
           * H0[:, :, None, None] * H2[:, None, None, :]
           + n2[:, None, None, None] * D[2][None, None, :]
           * H0[:, :, None, None] * H1[:, None, :, None])
    return _window_scatter_add(val, i0, tuple(res))


def grid_interp(grid, points, res):
    """Trilinear gather from a periodic grid; inverse of point_rasterize.

    grid: (r0,r1,r2) or (r0,r1,r2,C); points: (N,3) in [0,1).
    reference: dpsr_utils.grid_interp :74-116.
    """
    squeeze = grid.ndim == 3
    if squeeze:
        grid = grid[..., None]
    C = grid.shape[-1]
    i0, H = _base_and_hats(points, res)
    # ONE gather of contiguous 2x2x2xC windows from the wrap-padded grid
    # (per-index cost model: 8x less index traffic than 8 corner gathers;
    # the VJP is likewise ONE window scatter-add).
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3, 4),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0, 1, 2))
    vals = lax.gather(_wrap_pad(grid), i0, dn,
                      slice_sizes=(2, 2, 2, C),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    # broadcast-multiply + sum (not einsum/dot: stays f32 on the VPU —
    # TPU dot at default precision would round the weights to bf16)
    w = _corner_weights(H)
    out = jnp.sum(w[..., None] * vals, axis=(1, 2, 3))
    return out[..., 0] if squeeze else out


class DPSR:
    """Stateless DPSR operator; precomputes spectral constants once.

    reference: nvdiffrast_utils/dpsr.py DPSR :9-70 (sig, shift, scale flags).
    """

    def __init__(self, res: Tuple[int, int, int], sig: float = 10.0,
                 scale: bool = True, shift: bool = True,
                 div_mode: str = "spectral", fft_impl: str = "xla"):
        assert div_mode in ("spectral", "splat")
        assert fft_impl in ("xla", "matmul")
        self.res = tuple(res)
        self.sig = sig
        self.scale = scale
        self.shift = shift
        self.div_mode = div_mode
        self.fft_impl = fft_impl
        self.G = spec_gaussian_filter(self.res, sig)            # (r0,r1,rh)
        omega = fftfreqs3(self.res) * (2 * np.pi)               # (r0,r1,rh,3)
        self.omega = omega
        self.lap = -jnp.sum(omega ** 2, axis=-1)                # (r0,r1,rh)
        # fused real kernel for the scalar (splat) path: G/Δ̂ with DC zeroed
        kern = np.asarray(self.G) / (np.asarray(self.lap) + 1e-6)
        kern.flat[0] = 0.0
        self.kern = jnp.asarray(kern, jnp.float32)
        if fft_impl == "matmul":
            from .spectral import half_kernel_t
            self.kern_t = half_kernel_t(kern)

    def __call__(self, points, normals, point_valid=None):
        """points (N,3) in [0,1], normals (N,3) → indicator grid (r0,r1,r2).

        Dead padded points must carry zero normals (their splat contributes
        nothing); ``point_valid`` additionally masks them out of the
        mean-shift so padding cannot bias the iso-level.
        """
        if point_valid is not None:
            normals = jnp.where(point_valid[:, None], normals, 0.0)
        if self.div_mode == "splat":
            # fast path: scalar divergence grid → 1 r2c + 1 c2r transform
            div_g = div_rasterize(points, normals, self.res)    # (r0,r1,r2)
            if self.fft_impl == "matmul":
                from .spectral import poisson_filter_matmul
                phi = poisson_filter_matmul(div_g, self.kern_t)
            else:
                phi_hat = jnp.fft.rfftn(div_g, axes=(0, 1, 2)) * self.kern
                phi = jnp.fft.irfftn(phi_hat, s=self.res, axes=(0, 1, 2))
        else:
            ras = point_rasterize(points, normals, self.res)    # (r0,r1,r2,3)
            spec = jnp.fft.rfftn(ras, axes=(0, 1, 2))           # (r0,r1,rh,3) complex
            spec = spec * self.G[..., None]
            # DivN = Σ_d -i · N̂_d · ω_d  (dpsr.py:47-49: real part -(-Im), etc.)
            div = jnp.sum(-1j * spec * self.omega, axis=-1)     # (r0,r1,rh)
            phi_hat = div / (self.lap + 1e-6)
            phi_hat = phi_hat.at[0, 0, 0].set(0.0)
            phi = jnp.fft.irfftn(phi_hat, s=self.res, axes=(0, 1, 2))

        if self.shift or self.scale:
            fv = grid_interp(phi, points, self.res)             # (N,)
            if self.shift:
                if point_valid is not None:
                    denom = jnp.maximum(jnp.sum(point_valid), 1)
                    offset = jnp.sum(jnp.where(point_valid, fv, 0.0)) / denom
                else:
                    offset = fv.mean()
                phi = phi - offset
            if self.scale:
                fv0 = phi[0, 0, 0]
                phi = -phi / jnp.abs(fv0) * 0.5
        return phi

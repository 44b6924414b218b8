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

import jax.numpy as jnp
import numpy as np


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


def point_rasterize(points, values, res):
    """Trilinear scatter of per-point vectors into a periodic grid.

    points: (N,3) in [0,1); values: (N,C).  Returns (res0,res1,res2,C).
    reference: dpsr_utils.point_rasterize :140-197 (periodic wrap via fmod).
    """
    r = jnp.asarray(res, jnp.float32)
    scaled = points * r                                  # grid coords
    i0 = jnp.floor(scaled).astype(jnp.int32)
    frac = scaled - i0.astype(jnp.float32)
    grid = jnp.zeros(tuple(res) + (values.shape[-1],), values.dtype)
    for corner in range(8):
        cx, cy, cz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        off = jnp.asarray([cx, cy, cz], jnp.int32)
        idx = (i0 + off) % jnp.asarray(res, jnp.int32)   # periodic wrap
        w = jnp.prod(jnp.where(off == 1, frac, 1.0 - frac), axis=-1)
        grid = grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(w[:, None] * values)
    return grid


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
    r = jnp.asarray(res, jnp.float32)
    scaled = points * r
    i0 = jnp.floor(scaled).astype(jnp.int32)
    frac = scaled - i0.astype(jnp.float32)
    grid = jnp.zeros(tuple(res), points.dtype)
    w_lo = 1.0 - frac                                    # hat at corner bit 0
    for corner in range(8):
        off = np.asarray([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1])
        offj = jnp.asarray(off, jnp.int32)
        idx = (i0 + offj) % jnp.asarray(res, jnp.int32)
        hat = jnp.where(offj == 1, frac, w_lo)           # (N,3)
        # ∂_{g_d}: hat factor on axis d replaced by +1 (bit 0) / -1 (bit 1);
        # d/dx = res_d · d/dg.  Leading minus matches the reference's -iω.
        val = 0.0
        for dax in range(3):
            others = [k for k in range(3) if k != dax]
            dsign = -float(res[dax]) if off[dax] else float(res[dax])
            val = val + (-dsign) * normals[:, dax] * hat[:, others[0]] * hat[:, others[1]]
        grid = grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(val)
    return grid


def grid_interp(grid, points, res):
    """Trilinear gather from a periodic grid; inverse of point_rasterize.

    grid: (r0,r1,r2) or (r0,r1,r2,C); points: (N,3) in [0,1).
    reference: dpsr_utils.grid_interp :74-116.
    """
    squeeze = grid.ndim == 3
    if squeeze:
        grid = grid[..., None]
    r = jnp.asarray(res, jnp.float32)
    scaled = points * r
    i0 = jnp.floor(scaled).astype(jnp.int32)
    frac = scaled - i0.astype(jnp.float32)
    out = 0.0
    for corner in range(8):
        cx, cy, cz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        off = jnp.asarray([cx, cy, cz], jnp.int32)
        idx = (i0 + off) % jnp.asarray(res, jnp.int32)
        w = jnp.prod(jnp.where(off == 1, frac, 1.0 - frac), axis=-1)
        out = out + w[:, None] * grid[idx[:, 0], idx[:, 1], idx[:, 2]]
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

"""3-D real FFT as MXU matmuls — the TPU-native spectral Poisson backend.

XLA's TPU FFT lowering is memory-bound and slow (measured ~168 ms for the
DPSR forward at 288³ on v5e, dominated by rfftn/irfftn).  A dense DFT along
each axis is only O(res) FLOPs/point instead of O(log res), but those FLOPs
are 288×288 matmuls — exactly what the MXU does at full rate.  At 288³ the
full forward+inverse solve is ~150 GFLOP ≈ a few ms of MXU time, an order of
magnitude faster than the FFT lowering.

Used by ops/dpsr.py (reference: nvdiffrast_utils/dpsr.py:28-55 does
rfftn → spectral filter → irfftn with torch.fft); numerically equivalent to
jnp.fft.rfftn/irfftn to ~1e-5 relative (f32 accumulation over 288 terms).

Layout note: each axis transform is a tensordot contracting that axis, which
moves the transformed axis to the END.  After the three forward transforms
the spectrum is laid out (k2, k1, k0) — `half_kernel_t` produces spectral
multipliers in that transposed layout.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _fwd_mats(n: int, half: bool):
    """Forward DFT matrices: C[j,k]=cos(2πjk/n), S[j,k]=-sin(2πjk/n).

    X_k = Σ_j x_j e^{-2πi jk/n} → Xr = x·C, Xi = x·S.  `half` keeps only the
    n//2+1 non-negative-frequency columns (r2c).
    """
    k = np.arange(n // 2 + 1 if half else n)
    j = np.arange(n)
    ang = 2.0 * np.pi * np.outer(j, k) / n
    # NOTE: cache numpy (not jnp) — a jnp constant materialized inside a jit
    # trace is a tracer; caching it across traces is a leak.
    return (np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32))


@lru_cache(maxsize=8)
def _inv_mats(n: int):
    """Inverse c2c DFT matrices with 1/n folded in: x_j = Σ_k X_k e^{+2πijk/n}/n."""
    k = np.arange(n)
    j = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, j) / n
    return ((np.cos(ang) / n).astype(np.float32),
            (np.sin(ang) / n).astype(np.float32))


@lru_cache(maxsize=8)
def _inv_half_mats(n: int):
    """Hermitian inverse (c2r) matrices for the half spectrum of a real signal.

    x_j = (1/n)·Re[Σ_{k=0}^{n/2} w_k X_k e^{+2πijk/n}],  w = 1 for the DC and
    (even n) Nyquist bins, 2 elsewhere:  x = Xr·Cr + Xi·Si.
    """
    h = n // 2 + 1
    k = np.arange(h)
    j = np.arange(n)
    w = np.full(h, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(k, j) / n
    return (((w[:, None] * np.cos(ang)) / n).astype(np.float32),
            ((-w[:, None] * np.sin(ang)) / n).astype(np.float32))


def rfft3_matmul(x):
    """Real 3-D DFT of (n0,n1,n2) → (Re, Im) each (h2,k1,k0), h2=n2//2+1.

    Equivalent to jnp.fft.rfftn(x, axes=(0,1,2)).transpose(2,1,0) split into
    real/imag parts.
    """
    n0, n1, n2 = x.shape
    C2, S2 = _fwd_mats(n2, half=True)
    C1, S1 = _fwd_mats(n1, half=False)
    C0, S0 = _fwd_mats(n0, half=False)
    # axis 2 (r2c): (n0,n1,n2)·(n2,h2) → (n0,n1,h2)
    zr = jnp.tensordot(x, C2, axes=[[2], [0]])
    zi = jnp.tensordot(x, S2, axes=[[2], [0]])
    # axis 1 (c2c): (n0,n1,h2) → (n0,h2,k1)
    yr = (jnp.tensordot(zr, C1, axes=[[1], [0]])
          - jnp.tensordot(zi, S1, axes=[[1], [0]]))
    yi = (jnp.tensordot(zr, S1, axes=[[1], [0]])
          + jnp.tensordot(zi, C1, axes=[[1], [0]]))
    # axis 0 (c2c): (n0,h2,k1) → (h2,k1,k0)
    xr = (jnp.tensordot(yr, C0, axes=[[0], [0]])
          - jnp.tensordot(yi, S0, axes=[[0], [0]]))
    xi = (jnp.tensordot(yr, S0, axes=[[0], [0]])
          + jnp.tensordot(yi, C0, axes=[[0], [0]]))
    return xr, xi


def irfft3_matmul(xr, xi, shape: Tuple[int, int, int]):
    """Inverse of rfft3_matmul: (Re,Im) in (h2,k1,k0) layout → real (n0,n1,n2)."""
    n0, n1, n2 = shape
    Ci0, Si0 = _inv_mats(n0)
    Ci1, Si1 = _inv_mats(n1)
    Cr2, Sr2 = _inv_half_mats(n2)
    # axis k0 (c2c inverse): (h2,k1,k0) → (h2,k1,n0), contracted axis → end
    yr = (jnp.tensordot(xr, Ci0, axes=[[2], [0]])
          - jnp.tensordot(xi, Si0, axes=[[2], [0]]))
    yi = (jnp.tensordot(xr, Si0, axes=[[2], [0]])
          + jnp.tensordot(xi, Ci0, axes=[[2], [0]]))
    # now (h2,k1,n0); axis k1 → (h2,n0,n1)
    zr = (jnp.tensordot(yr, Ci1, axes=[[1], [0]])
          - jnp.tensordot(yi, Si1, axes=[[1], [0]]))
    zi = (jnp.tensordot(yr, Si1, axes=[[1], [0]])
          + jnp.tensordot(yi, Ci1, axes=[[1], [0]]))
    # axis h2 (c2r): (h2,n0,n1) → (n0,n1,n2)
    out = (jnp.tensordot(zr, Cr2, axes=[[0], [0]])
           + jnp.tensordot(zi, Sr2, axes=[[0], [0]]))
    return out


def half_kernel_t(kern):
    """Transpose an rfftn-layout (r0,r1,h2) spectral multiplier to the
    (h2,k1,k0) layout produced by rfft3_matmul."""
    return jnp.transpose(jnp.asarray(kern, jnp.float32), (2, 1, 0))


def poisson_filter_matmul(grid, kern_t):
    """irfftn(rfftn(grid) · kern) with all transforms as MXU matmuls.

    grid: (n0,n1,n2) real; kern_t: (h2,k1,k0) real multiplier (see
    half_kernel_t).  Equivalent to the XLA-FFT path of ops/dpsr.py.
    """
    xr, xi = rfft3_matmul(grid)
    return irfft3_matmul(xr * kern_t, xi * kern_t, grid.shape)

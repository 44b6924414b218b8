"""Differentiable Poisson Surface Reconstruction (DPSR) on the 3D FFT.

reference: nvdiffrast_utils/dpsr.py:9-70 and dpsr_utils.py (point_rasterize
:140-197, fftfreqs :25-47, spec_gaussian_filter :66-72, grid_interp :74-116) —
itself from shape_as_points.  The math: trilinearly splat oriented point
normals onto a res³ grid, solve the screened Poisson equation in the Fourier
domain (Φ̂ = div(N̂)/Δ̂ with a spectral Gaussian low-pass), invert, then shift
so the indicator is 0 at the input points and scale so the (0,0,0) corner is
-0.5 (inside-negative convention... sign fixed downstream like
utils/renderer.py:164-167).

TPU notes: rfftn over a 288³ grid is XLA-native; the trilinear splat is the
SLAB-MATMUL rasterizer below (XLA lowers grid scatter-add as a serial while
loop on TPU — measured ~950 ms/step at the bench workload before the r3
rewrite; the slab formulation is zero-scatter and runs on the MXU);
everything is f32, deterministic (no atomics anywhere).
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


def _window_point_rasterize(points, values, res):
    """Scatter-based trilinear splat (reference semantics; serial on TPU)."""
    i0, H = _base_and_hats(points, res)
    w = _corner_weights(H)                               # (N,2,2,2)
    val = w[..., None] * values[:, None, None, None, :]
    return _window_scatter_add(val, i0, tuple(res), channels=values.shape[-1])


# ---------------------------------------------------------------------------
# Slab-matmul rasterization — the TPU fast path.
#
# XLA lowers scatter-add into a 289³ grid as a SERIAL while loop of
# dynamic-update-slices (~6µs per index: measured ~950 ms/step at the bench
# workload, the single largest cost in the r3 profile).  The trilinear splat
# is separable, so we reformulate it with zero scatters:
#
#   grid[i,j,k] = Σ_p hx[p,i]·hy[p,j]·hz[p,k]·v_p
#
#   1. duplicate each point into its 2 x-slabs (weight = x-hat / x-deriv),
#   2. sort the 2N contributions by slab id (1M-element sorts are ~1.5 ms
#      on TPU — cheap, unlike scatters),
#   3. per slab i, slice its contributions (static cap P) and compute the
#      (R,R) plane as ONE MXU matmul  plane = Hyᵀ @ (a ⊙ Hz)
#      where Hy/Hz are dense per-axis hat matrices built by broadcasting
#      relu(1 − |j − y·R|) against an iota (periodic via circular distance).
#   4. stack the R planes — the grid materializes with no scatter at all.
#
# Cost: R · 2·R·P·R·C FLOPs ≈ 0.2 TFLOP at R=288, P=8192 → ~few ms on MXU.
# Autodiff: sort (permutation), dynamic_slice (DUS-add VJP over contiguous
# slices), relu-hats (elementwise), matmul — every VJP stage is TPU-friendly;
# the slab body is jax.checkpoint'ed so the backward rematerializes Hy/Hz
# instead of saving R of them.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _permute(x, perm):
    """Gather x[perm] whose VJP is ALSO a gather (by the inverse permutation)
    — the default transpose of a gather is a scatter-add, which XLA lowers
    serially on TPU."""
    return x[perm]


def _permute_fwd(x, perm):
    return x[perm], perm


def _permute_bwd(perm, ct):
    inv = jnp.argsort(perm)
    return ct[inv], None


_permute.defvjp(_permute_fwd, _permute_bwd)


def _slab_p_cap(n, r):
    """Static per-slab contribution capacity: cover an 8x concentration over
    the uniform average (2N contributions over R slabs), floor 2048, and
    never more than all contributions."""
    avg = (2 * n + r - 1) // r
    cap = max(2048, 8 * avg)
    cap = -(-cap // 512) * 512
    return min(cap, 2 * n)


def _axis_hat(coord, r):
    """Dense periodic hat matrix: (P,) grid-scaled coords → (P, R) weights
    relu(1 − |circ(j − coord)|).  Piecewise-linear in coord (exact trilinear
    weights, differentiable a.e. like the reference's autograd)."""
    j = jnp.arange(r, dtype=jnp.float32)[None, :]
    d = j - coord[:, None]
    d = d - r * jnp.round(d / r)                  # circular distance
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _axis_dhat(coord, r):
    """Dense periodic derivative-hat matrix: −R on the floor cell
    (d ∈ (−1, 0]), +R on the ceil cell (d ∈ (0, 1)) — the analytic spatial
    derivative of the hat, matching coeff(d,bit) = bit ? +R : −R."""
    j = jnp.arange(r, dtype=jnp.float32)[None, :]
    d = j - coord[:, None]
    d = d - r * jnp.round(d / r)
    rf = jnp.float32(r)
    return jnp.where((d > -1.0) & (d <= 0.0), -rf,
                     jnp.where((d > 0.0) & (d < 1.0), rf, 0.0))


def _slab_sort(points, res, live=None):
    """Common prep: duplicate to 2 x-slabs, sort by slab id.

    Returns (order, slab_sorted, start) where ``order`` permutes the doubled
    contribution arrays (contribution c = point c//2, x-bit c%2) and
    ``start[i]`` is the first sorted position of slab i; callers gather their
    payloads with ``order``.

    ``live`` (2N,) bool: contributions that can deposit a nonzero value.
    Dead ones (zero-normal padding gaussians — which all collapse onto the
    grid-center slab because padded xyz rows are zeros) are keyed to a
    virtual slab R beyond every slice window, so they can NEVER crowd real
    contributions out of a full slab."""
    r0 = res[0]
    scaled = points[:, 0] * r0
    i0f = jnp.floor(scaled)
    i0 = jnp.mod(i0f.astype(jnp.int32), r0)
    slab = jnp.stack([i0, jnp.mod(i0 + 1, r0)], -1).reshape(-1)   # (2N,)
    if live is not None:
        slab = jnp.where(live, slab, r0)
    order = jnp.argsort(slab)
    slab_sorted = slab[order]
    start = jnp.searchsorted(slab_sorted, jnp.arange(r0, dtype=slab.dtype))
    return order, slab_sorted, start


def _slab_planes(slab_sorted, start, payload_sorted, res, p_cap, body,
                 slab_ids=None):
    """lax.scan over slabs: slice ≤p_cap contributions, mask, run ``body``
    (payload slice → (R1,R2[,C]) plane), stack planes into the grid.

    ``slab_ids`` (optional int32 vector, possibly traced): which slabs to
    emit, default all of 0..res0-1.  A sharded caller passes its local x-range
    (parallel/sharded_dpsr.py) — the sort/start arrays always cover the full
    point set, so cross-boundary contributions land on whichever chip owns
    their slab."""
    r0 = res[0]
    if slab_ids is None:
        slab_ids = jnp.arange(r0, dtype=jnp.int32)

    def scan_body(_, i):
        s = start[i]
        sl_slab = lax.dynamic_slice_in_dim(slab_sorted, s, p_cap)
        mask = (sl_slab == i)
        sl_pay = [lax.dynamic_slice_in_dim(p, s, p_cap) for p in payload_sorted]
        return None, body(i, mask, sl_pay)

    _, planes = lax.scan(jax.checkpoint(scan_body), None, slab_ids)
    return planes


def point_rasterize(points, values, res, p_cap=None, slab_ids=None):
    """Trilinear splat of per-point vectors into a periodic grid — slab-matmul
    formulation (see block comment above; zero scatters on TPU).

    points: (N,3) in [0,1); values: (N,C).  Returns (res0,res1,res2,C) — or
    (len(slab_ids),res1,res2,C) when a slab subset is requested (sharded path).
    reference: dpsr_utils.point_rasterize :140-197 (periodic wrap via fmod).
    """
    r0, r1, r2 = res
    n = points.shape[0]
    c = values.shape[-1]
    p_cap = p_cap or _slab_p_cap(n, r0)

    scaled = points[:, 0] * r0
    frac = scaled - jnp.floor(scaled)
    hx = jnp.stack([1.0 - frac, frac], -1).reshape(-1)            # (2N,)
    y = jnp.repeat(points[:, 1] * r1, 2)
    z = jnp.repeat(points[:, 2] * r2, 2)
    vals2 = jnp.repeat(values, 2, axis=0)                         # (2N,C)

    live = jnp.repeat(jnp.any(values != 0.0, axis=-1), 2)
    order, slab_sorted, start = _slab_sort(points, res, live)
    payload = [_permute(a, order) for a in (hx, y, z, vals2)]

    def body(i, mask, sl):
        hx_s, y_s, z_s, v_s = sl
        w = jnp.where(mask, hx_s, 0.0)[:, None] * v_s             # (P,C)
        hy = _axis_hat(y_s, r1)                                   # (P,R1)
        hz = _axis_hat(z_s, r2)                                   # (P,R2)
        # plane[j,k,c] = Σ_p hy[p,j]·hz[p,k]·w[p,c]
        rhs = hz[:, :, None] * w[:, None, :]                      # (P,R2,C)
        return jax.lax.dot_general(
            hy, rhs.reshape(p_cap, r2 * c), (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST).reshape(r1, r2, c)

    return _slab_planes(slab_sorted, start, payload, res, p_cap, body,
                        slab_ids=slab_ids)


def div_rasterize(points, normals, res, p_cap=None, slab_ids=None):
    """Directly splat the (negated) divergence of the oriented point set.

    For each point the trilinear hat kernel's analytic spatial derivative is
    deposited instead of the kernel itself:
      D(g) = -Σ_i Σ_d n_d(i) · res_d · ∂_{g_d} Π_k hat(g_k - p_k·res_k)
    This equals the reference's spectral divergence Σ_d -iω_d N̂_d up to the
    hat kernel's derivative being taken analytically rather than spectrally —
    the two agree on all frequencies the σ=3 Gaussian low-pass keeps (DESIGN.md
    "DPSR fast path").  One scalar grid instead of three → the Poisson solve
    needs 2 FFTs instead of 4 (and 2 instead of 4 in the VJP).

    Slab-matmul formulation: the three divergence terms share the slab
    decomposition and fold into TWO matmuls per slab,
      plane = Hyᵀ @ (a₁·Hz + a₃·Dz) + Dyᵀ @ (a₂·Hz)
    with a₁ = n₀·Dx (x-derivative term), a₂ = n₁·hx, a₃ = n₂·hx.

    points: (N,3) in [0,1); normals: (N,3).  Returns (res0,res1,res2).
    """
    r0, r1, r2 = res
    n = points.shape[0]
    p_cap = p_cap or _slab_p_cap(n, r0)

    scaled = points[:, 0] * r0
    frac = scaled - jnp.floor(scaled)
    hx = jnp.stack([1.0 - frac, frac], -1).reshape(-1)            # (2N,)
    rf = jnp.float32(r0)
    dx = jnp.stack([jnp.full_like(frac, -rf), jnp.full_like(frac, rf)],
                   -1).reshape(-1)                                # (2N,)
    n2x = jnp.repeat(normals, 2, axis=0)                          # (2N,3)
    a1 = n2x[:, 0] * dx
    a2 = n2x[:, 1] * hx
    a3 = n2x[:, 2] * hx
    y = jnp.repeat(points[:, 1] * r1, 2)
    z = jnp.repeat(points[:, 2] * r2, 2)

    live = jnp.repeat(jnp.any(normals != 0.0, axis=-1), 2)
    order, slab_sorted, start = _slab_sort(points, res, live)
    payload = [_permute(a, order) for a in (a1, a2, a3, y, z)]

    def body(i, mask, sl):
        a1_s, a2_s, a3_s, y_s, z_s = sl
        a1_m = jnp.where(mask, a1_s, 0.0)[:, None]
        a2_m = jnp.where(mask, a2_s, 0.0)[:, None]
        a3_m = jnp.where(mask, a3_s, 0.0)[:, None]
        hy = _axis_hat(y_s, r1)
        hz = _axis_hat(z_s, r2)
        dy = _axis_dhat(y_s, r1)
        dz = _axis_dhat(z_s, r2)
        rhs1 = a1_m * hz + a3_m * dz                              # (P,R2)
        p1 = jax.lax.dot_general(hy, rhs1, (((0,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST)
        p2 = jax.lax.dot_general(dy, a2_m * hz, (((0,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST)
        return p1 + p2

    return _slab_planes(slab_sorted, start, payload, res, p_cap, body,
                        slab_ids=slab_ids)


def _grid_interp_impl(grid, points, res):
    """Trilinear gather from a periodic grid (4-D grid, (N,C) out)."""
    C = grid.shape[-1]
    i0, H = _base_and_hats(points, res)
    # ONE gather of contiguous 2x2x2xC windows from the wrap-padded grid
    # (per-index cost model: 8x less index traffic than 8 corner gathers).
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3, 4),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0, 1, 2))
    vals = lax.gather(_wrap_pad(grid), i0, dn,
                      slice_sizes=(2, 2, 2, C),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    # broadcast-multiply + sum (not einsum/dot: stays f32 on the VPU —
    # TPU dot at default precision would round the weights to bf16)
    w = _corner_weights(H)
    return jnp.sum(w[..., None] * vals, axis=(1, 2, 3))


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _grid_interp4(grid, points, res):
    return _grid_interp_impl(grid, points, res)


def _grid_interp4_fwd(grid, points, res):
    return _grid_interp_impl(grid, points, res), (grid, points)


def _grid_interp4_bwd(res, resids, ct):
    """Grid cotangent = trilinear SPLAT of the per-point cotangents — routed
    through the slab-matmul rasterizer instead of the gather's transpose
    (XLA lowers that scatter-add as a serial while loop on TPU, ~170 ms/call
    at the bench workload).  Point cotangent via autodiff of the gather-only
    path (gathers are fast; only their transpose is not)."""
    grid, points = resids
    _, vjp_p = jax.vjp(lambda p: _grid_interp_impl(grid, p, res), points)
    g_points, = vjp_p(ct)
    g_grid = point_rasterize(points, ct, res)
    return g_grid, g_points


_grid_interp4.defvjp(_grid_interp4_fwd, _grid_interp4_bwd)


def grid_interp(grid, points, res):
    """Trilinear gather from a periodic grid; inverse of point_rasterize.

    grid: (r0,r1,r2) or (r0,r1,r2,C); points: (N,3) in [0,1).
    reference: dpsr_utils.grid_interp :74-116.
    """
    squeeze = grid.ndim == 3
    if squeeze:
        grid = grid[..., None]
    out = _grid_interp4(grid, points, tuple(res))
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
                # Guarded division (deviation from the reference's bare
                # `-phi/|fv0|*0.5`, dpsr.py:69): if the oriented point set
                # degenerates (normals driven toward zero by a bad gradient
                # phase), phi flattens, |fv0| → 0 and the bare division emits
                # Inf/NaN forward and unbounded cotangents backward — the
                # r3 quality run died exactly this way (NaN at iter 5600,
                # VERDICT r3 "missing #1").  The guard is scale-invariant
                # (relative to the field's own max) and inactive on any
                # healthy field, where |fv0| ≈ max|phi| by construction.
                denom = jnp.maximum(jnp.abs(fv0),
                                    1e-3 * jnp.max(jnp.abs(phi)) + 1e-20)
                phi = -phi / denom * 0.5
        return phi

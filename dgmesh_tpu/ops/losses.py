"""Training losses and image metrics.

reference: utils/loss_utils.py (l1/l2/windowed SSIM), utils/image_utils.py:19-27
(PSNR), plus an MS-SSIM implementation replacing pytorch_msssim (train.py:19).

SSIM uses the same 11-tap σ=1.5 separable Gaussian window and constants
C1=0.01², C2=0.03² as the reference, so values are comparable bit-for-bit up
to conv padding semantics (reference uses SAME padding; so do we).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(x, y):
    """Mean absolute error with TORCH's subgradient convention at 0.

    jnp.abs defines d|x|/dx at x=0 as +1; torch.abs (the reference's l1_loss,
    utils/loss_utils.py) defines it as 0.  The difference is load-bearing for
    the x100 mask loss: with the straight-through mask every correctly-
    covered pixel has diff EXACTLY 0, and jnp.abs's +1 subgradient turns the
    whole matched region into a spurious grow-pressure on the soft-silhouette
    pathway (the r4 divergence, second mechanism).  d*sign(d) has value |d|
    and VJP sign(d), which is 0 at 0 — torch parity.
    """
    d = x - y
    return (d * jnp.sign(d)).mean()


def l2_loss(x, y):
    return ((x - y) ** 2).mean()


def psnr(img, gt):
    mse = jnp.mean((img - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _gaussian_window(size: int, sigma: float):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter2d_separable(img, win):
    """Depthwise separable 2D filter with SAME padding. img: (C,H,W)."""
    c = img.shape[0]
    k = win.shape[0]
    kern_h = jnp.tile(win.reshape(1, 1, k, 1), (c, 1, 1, 1))
    kern_w = jnp.tile(win.reshape(1, 1, 1, k), (c, 1, 1, 1))
    x = img[None]  # NCHW
    # HIGHEST is load-bearing: with the TPU bf16 conv default, the
    # f(x^2)-mu^2 variance cancellation loses all significance, the
    # SSIM denominator can cross zero, and the loss explodes (observed:
    # ssim>2 at 800px, then NaN gradients — r3 quality-run failure).
    x = jax.lax.conv_general_dilated(x, kern_h, (1, 1), "SAME",
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kern_w, (1, 1), "SAME",
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x[0]


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5,
         full: bool = False):
    """Windowed SSIM over (C,H,W) images in [0,1] (reference: loss_utils.py:45-76)."""
    win = _gaussian_window(window_size, sigma)
    f = functools.partial(_filter2d_separable, win=win)
    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = f(img1 * img1) - mu1_sq
    sigma2_sq = f(img2 * img2) - mu2_sq
    sigma12 = f(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if full:
        cs = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
        return ssim_map.mean(), cs.mean()
    return ssim_map.mean()


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Multi-scale SSIM over (C,H,W) images (replaces pytorch_msssim, train.py:653-672)."""
    levels = len(_MSSSIM_WEIGHTS)
    mcs = []
    x, y = img1, img2
    val = None
    for i in range(levels):
        s, cs = ssim(x, y, window_size, sigma, full=True)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2),
                                      "VALID") / 4.0
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2),
                                      "VALID") / 4.0
        else:
            val = jnp.maximum(s, 0.0)
    out = val ** _MSSSIM_WEIGHTS[-1]
    for w, cs in zip(_MSSSIM_WEIGHTS[:-1], mcs):
        out = out * cs ** w
    return out


def image_loss(img, gt, lambda_dssim: float):
    """(1-λ)·L1 + λ·(1-SSIM) as used for both GS and mesh images
    (reference: train.py:270-276, 306-312)."""
    return (1.0 - lambda_dssim) * l1_loss(img, gt) + lambda_dssim * (1.0 - ssim(img, gt))

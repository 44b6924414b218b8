"""LPIPS perceptual metric (reference: utils/metric_utils.py rgb_lpips :18-23,
train.py:646-697 uses lpips alex+vgg).

LPIPS needs pretrained AlexNet/VGG features + calibrated linear heads.  This
environment has no network egress and ships no torchvision weights, so LPIPS
cannot be computed out of the box; the reference would face the same
constraint (its `lpips` package downloads weights on first use).

Behavior:
  * `lpips_available()` — True only if a converted weights file exists.
  * `rgb_lpips(img, gt, net)` — computes LPIPS with the JAX feature extractor
    below when weights are present, else returns NaN (and testing() reports
    the metric as absent, like a skipped column).

Weights format: an .npz produced by `convert_torch_lpips` from a
torch-downloaded checkpoint — run it on any machine with egress and drop the
file at $DGMESH_LPIPS_WEIGHTS or ~/.cache/dgmesh_tpu/lpips_<net>.npz.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = {}


def _weights_path(net: str) -> Optional[str]:
    cand = [os.environ.get("DGMESH_LPIPS_WEIGHTS", ""),
            os.path.expanduser(f"~/.cache/dgmesh_tpu/lpips_{net}.npz")]
    for c in cand:
        if c and os.path.exists(c):
            return c
    return None


def lpips_available(net: str = "alex") -> bool:
    return _weights_path(net) is not None


def _conv(x, w, b=None, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


def _alex_features(x, p):
    """AlexNet trunk (5 conv stages) returning per-stage activations."""
    acts = []
    y = _conv(x, p["conv1_w"], p["conv1_b"], stride=4, pad=2)
    y = jax.nn.relu(y)
    acts.append(y)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                              (1, 1, 2, 2), "VALID")
    y = jax.nn.relu(_conv(y, p["conv2_w"], p["conv2_b"], pad=2))
    acts.append(y)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                              (1, 1, 2, 2), "VALID")
    y = jax.nn.relu(_conv(y, p["conv3_w"], p["conv3_b"], pad=1))
    acts.append(y)
    y = jax.nn.relu(_conv(y, p["conv4_w"], p["conv4_b"], pad=1))
    acts.append(y)
    y = jax.nn.relu(_conv(y, p["conv5_w"], p["conv5_b"], pad=1))
    acts.append(y)
    return acts


_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


def rgb_lpips(img, gt, net: str = "alex"):
    """img, gt: (3,H,W) in [0,1].  Returns LPIPS or NaN if no weights."""
    path = _weights_path(net)
    if path is None:
        return float("nan")
    if path not in _CACHE:
        _CACHE[path] = {k: jnp.asarray(v) for k, v in np.load(path).items()}
    p = _CACHE[path]

    def norm_input(x):
        x = x * 2.0 - 1.0
        return ((x - jnp.asarray(_SHIFT)[:, None, None])
                / jnp.asarray(_SCALE)[:, None, None])[None]

    fa = _alex_features(norm_input(img), p)
    fb = _alex_features(norm_input(gt), p)
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = p[f"lin{i}_w"]                      # (1,C,1,1)
        total = total + (d * lin).sum(axis=1).mean()
    return float(total)


def convert_torch_lpips(out_path: str, net: str = "alex"):
    """Convert torch `lpips` package weights → npz (run with egress)."""
    import lpips as torch_lpips  # type: ignore
    m = torch_lpips.LPIPS(net=net)
    sd = {}
    trunk = m.net
    convs = [trunk.slice1[0], trunk.slice2[1], trunk.slice3[1],
             trunk.slice4[1], trunk.slice5[1]] if net == "alex" else None
    for i, c in enumerate(convs, 1):
        sd[f"conv{i}_w"] = c.weight.detach().numpy()
        sd[f"conv{i}_b"] = c.bias.detach().numpy()
    for i, lin in enumerate(m.lins):
        sd[f"lin{i}_w"] = lin.model[1].weight.detach().numpy()
    np.savez(out_path, **sd)

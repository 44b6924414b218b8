"""LPIPS perceptual metric (reference: utils/metric_utils.py rgb_lpips :18-23;
train.py:646-697 reports LPIPS(alex,vgg) for both the GS and mesh renders).

LPIPS needs pretrained AlexNet/VGG16 features + calibrated linear heads.  This
environment has no network egress and ships no torchvision weights, so LPIPS
cannot be computed out of the box; the reference would face the same
constraint (its `lpips` package downloads weights on first use).

Behavior:
  * `lpips_available(net)` — True only if a converted weights file exists.
  * `rgb_lpips(img, gt, net)` — computes LPIPS with the JAX feature extractor
    below when weights are present, else returns NaN (and testing() reports
    the metric as absent, like a skipped column).

Offline weight conversion (run on any machine with egress + torch `lpips`):

    python -c "from dgmesh_tpu.eval.lpips_jax import convert_torch_lpips; \
               convert_torch_lpips('lpips_alex.npz', 'alex'); \
               convert_torch_lpips('lpips_vgg.npz', 'vgg')"

then drop the files in $DGMESH_LPIPS_DIR (or ~/.cache/dgmesh_tpu/), named
``lpips_<net>.npz``; a single file can also be pinned with
$DGMESH_LPIPS_WEIGHTS_<NET> (e.g. ..._ALEX).

Validation status (r3): tests/test_lpips_torch_agreement.py rebuilds this
exact graph in raw torch with identical random weights and pins agreement to
~1e-4 for both nets — so with weights supplied, correctness reduces to
convert_torch_lpips's mechanical key-for-key state_dict dump.  What remains
unverifiable without egress is only the pretrained values themselves.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = {}
_JIT_CACHE = {}


def _weights_path(net: str) -> Optional[str]:
    cand = [os.environ.get(f"DGMESH_LPIPS_WEIGHTS_{net.upper()}", ""),
            os.environ.get("DGMESH_LPIPS_WEIGHTS", ""),
            os.path.join(os.environ.get("DGMESH_LPIPS_DIR", ""),
                         f"lpips_{net}.npz")
            if os.environ.get("DGMESH_LPIPS_DIR") else "",
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


def _maxpool(y, k, s):
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 1, k, k),
                                 (1, 1, s, s), "VALID")


def _alex_features(x, p):
    """AlexNet trunk (5 conv stages) returning per-stage activations."""
    acts = []
    y = jax.nn.relu(_conv(x, p["conv1_w"], p["conv1_b"], stride=4, pad=2))
    acts.append(y)
    y = _maxpool(y, 3, 2)
    y = jax.nn.relu(_conv(y, p["conv2_w"], p["conv2_b"], pad=2))
    acts.append(y)
    y = _maxpool(y, 3, 2)
    y = jax.nn.relu(_conv(y, p["conv3_w"], p["conv3_b"], pad=1))
    acts.append(y)
    y = jax.nn.relu(_conv(y, p["conv4_w"], p["conv4_b"], pad=1))
    acts.append(y)
    y = jax.nn.relu(_conv(y, p["conv5_w"], p["conv5_b"], pad=1))
    acts.append(y)
    return acts


# VGG16 conv counts per stage; LPIPS taps relu{1_2,2_2,3_3,4_3,5_3}
_VGG_STAGES = (2, 2, 3, 3, 3)


def _vgg_features(x, p):
    acts = []
    y = x
    for s, n_conv in enumerate(_VGG_STAGES, 1):
        if s > 1:
            y = _maxpool(y, 2, 2)
        for c in range(1, n_conv + 1):
            y = jax.nn.relu(_conv(y, p[f"c{s}_{c}_w"], p[f"c{s}_{c}_b"], pad=1))
        acts.append(y)
    return acts


_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


def _lpips_fn(img, gt, p, net):
    def norm_input(x):
        x = x * 2.0 - 1.0
        return ((x - jnp.asarray(_SHIFT)[:, None, None])
                / jnp.asarray(_SCALE)[:, None, None])[None]

    feat = _alex_features if net == "alex" else _vgg_features
    fa = feat(norm_input(img), p)
    fb = feat(norm_input(gt), p)
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = p[f"lin{i}_w"]                      # (1,C,1,1)
        total = total + (d * lin).sum(axis=1).mean()
    return total


def rgb_lpips(img, gt, net: str = "alex"):
    """img, gt: (3,H,W) in [0,1].  Returns LPIPS or NaN if no weights."""
    path = _weights_path(net)
    if path is None:
        return float("nan")
    if path not in _CACHE:
        _CACHE[path] = {k: jnp.asarray(v) for k, v in np.load(path).items()}
    p = _CACHE[path]
    if net not in _JIT_CACHE:
        _JIT_CACHE[net] = jax.jit(_lpips_fn, static_argnames=("net",))
    return float(_JIT_CACHE[net](jnp.asarray(img), jnp.asarray(gt), p, net))


def convert_torch_lpips(out_path: str, net: str = "alex"):
    """Convert torch `lpips` package weights → npz (run offline with egress)."""
    import lpips as torch_lpips  # type: ignore
    m = torch_lpips.LPIPS(net=net)
    sd = {}
    trunk = m.net
    if net == "alex":
        convs = [trunk.slice1[0], trunk.slice2[1], trunk.slice3[1],
                 trunk.slice4[1], trunk.slice5[1]]
        for i, c in enumerate(convs, 1):
            sd[f"conv{i}_w"] = c.weight.detach().numpy()
            sd[f"conv{i}_b"] = c.bias.detach().numpy()
    elif net == "vgg":
        # torch lpips vgg trunk: slices over torchvision vgg16.features
        import torch.nn as nn
        slices = [trunk.slice1, trunk.slice2, trunk.slice3, trunk.slice4,
                  trunk.slice5]
        for s, sl in enumerate(slices, 1):
            convs = [mod for mod in sl if isinstance(mod, nn.Conv2d)]
            assert len(convs) == _VGG_STAGES[s - 1], (s, len(convs))
            for c, conv in enumerate(convs, 1):
                sd[f"c{s}_{c}_w"] = conv.weight.detach().numpy()
                sd[f"c{s}_{c}_b"] = conv.bias.detach().numpy()
    else:
        raise ValueError(f"unsupported net {net!r}")
    for i, lin in enumerate(m.lins):
        sd[f"lin{i}_w"] = lin.model[1].weight.detach().numpy()
    np.savez(out_path, **sd)


def random_weights(out_path: str, net: str = "alex", seed: int = 0):
    """Schema-correct random weights — for plumbing tests only."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.normal(size=shape) * 0.05).astype(np.float32)

    sd = {}
    if net == "alex":
        chans = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                 (256, 384, 3, 3), (256, 256, 3, 3)]
        for i, shp in enumerate(chans, 1):
            sd[f"conv{i}_w"] = w(*shp)
            sd[f"conv{i}_b"] = w(shp[0])
        lin_c = [64, 192, 384, 256, 256]
    elif net == "vgg":
        cin = 3
        widths = [64, 128, 256, 512, 512]
        for s, (n_conv, cout) in enumerate(zip(_VGG_STAGES, widths), 1):
            for c in range(1, n_conv + 1):
                sd[f"c{s}_{c}_w"] = w(cout, cin, 3, 3)
                sd[f"c{s}_{c}_b"] = w(cout)
                cin = cout
        lin_c = widths
    else:
        raise ValueError(net)
    for i, c in enumerate(lin_c):
        sd[f"lin{i}_w"] = np.abs(w(1, c, 1, 1))
    np.savez(out_path, **sd)

"""Deformation / appearance MLPs in flax.linen.

reference: utils/time_utils.py — positional ``Embedder`` :7-55, ``DeformNetwork``
:58-129 (8×256 ReLU MLP, skip concat at layer D/2, optional 256→30 timenet for
blender data), ``DeformNetworkNormal`` :132-204 (adds a d_normal head),
``DeformNetworkNormalSep`` :207-266 (normal-only net, zero-init head), and
``AppearanceNetwork`` :269-323 (xyz,t → sigmoid RGB).

All forward passes are (N, features) batched matmuls — they run on the MXU in
bf16-friendly shapes (W=256).  The time axis is a scalar fid broadcast per
point, exactly like the reference.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def positional_encoding(x, num_freqs: int, include_input: bool = True):
    """NeRF positional encoding with log-spaced frequencies 2^0..2^(L-1).

    reference: utils/time_utils.py Embedder :7-55 (include_input=True,
    log_sampling=True, periodic_fns=[sin, cos]).  Output dim = d*(2L[+1]).
    """
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]            # (..., L, d)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


class MLPTrunk(nn.Module):
    """The shared depth×width ReLU trunk with input-skip concat at depth//2.

    Parameters are explicit (w0..w{depth-1}, b0..) so the SAME weights drive
    either the layer-by-layer XLA path or the Pallas fused kernel
    (ops/mlp_pallas.py) — the fused path keeps the whole trunk VMEM-resident
    per row block instead of round-tripping every (N,256) activation through
    HBM.  Fusing activates only for width=256 + bf16 (the TPU configuration);
    results agree to bf16 rounding.
    """

    depth: int = 8
    width: int = 256
    dtype: object = None
    fuse: bool = False

    @nn.compact
    def __call__(self, inp):
        depth, width = self.depth, self.width
        skip = depth // 2
        din = inp.shape[-1]
        kinit = nn.initializers.lecun_normal()
        ws, bs = [], []
        for i in range(depth):
            d_in = din if i == 0 else width
            if i == skip + 1:
                d_in += din            # rows [0:din]=input part, [din:]=h part
            ws.append(self.param(f"w{i}", kinit, (d_in, width)))
            bs.append(self.param(f"b{i}", nn.initializers.zeros, (width,)))

        if (self.fuse and width == 256 and din <= width
                and self.dtype == jnp.bfloat16):
            from ..ops.mlp_pallas import fused_trunk
            pad = width - din
            xp = jnp.pad(inp, ((0, 0), (0, pad)))
            mats = []
            for i in range(depth):
                k = ws[i]
                if i == 0:
                    k = jnp.pad(k, ((0, pad), (0, 0)))
                elif i == skip + 1:
                    k = k[din:]
                mats.append(k)
            wx = jnp.pad(ws[skip + 1][:din], ((0, pad), (0, 0)))
            wpack = jnp.stack(mats + [wx])
            bpack = jnp.stack(bs)
            return fused_trunk(xp.astype(jnp.float32), wpack, bpack,
                               depth, skip)

        dt = self.dtype

        def dense(x_in, k, b):
            if dt is not None:
                x_in, k, b = x_in.astype(dt), k.astype(dt), b.astype(dt)
            # HIGHEST so the f32 path really is f32 on the TPU MXU (the
            # backend default is one-pass bf16 for f32 operands — it silently
            # turned the "f32-faithful" quality configs into bf16 nets); when
            # dt=bf16 the operands are already bf16 and HIGHEST is a no-op.
            return jnp.matmul(x_in, k,
                              precision=jax.lax.Precision.HIGHEST) + b

        h = inp
        for i in range(depth):
            x_in = h if i != skip + 1 else jnp.concatenate(
                [inp.astype(h.dtype), h], axis=-1)
            h = nn.relu(dense(x_in, ws[i], bs[i]))
        return h.astype(jnp.float32)


class DeformNetwork(nn.Module):
    """Canonical↔deformed offset field (reference: time_utils.py:58-129).

    Heads: d_xyz (3), d_rotation (4), d_scaling (3) and optionally d_normal (3)
    when ``with_normal`` (DeformNetworkNormal :132-204).
    """

    depth: int = 8
    width: int = 256
    multires: int = 10
    is_blender: bool = False
    with_normal: bool = False
    is_6dof: bool = False
    # Compute dtype for the 8x256 trunk matmuls (params stay float32); set
    # jnp.bfloat16 to run them on the MXU at 2x rate — heads and outputs are
    # always float32.
    dtype: object = None
    # Run the trunk through the Pallas fused kernel (requires bf16 dtype).
    fuse: bool = False
    # Zero-init the offset heads so deformation starts at identity.  The
    # reference uses default Linear init (a visible PSNR shock when the warm-up
    # gate opens, train.py:154-175, recovered over thousands of iters); the
    # identity start removes the shock without changing the fixed point.
    zero_init_heads: bool = True

    def _head(self, dim):
        if self.zero_init_heads:
            return nn.Dense(dim, kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros)
        return nn.Dense(dim)

    @nn.compact
    def __call__(self, xyz, t):
        t_multires = 6 if self.is_blender else 10
        t_emb = positional_encoding(t, t_multires)
        if self.is_blender:
            h = nn.Dense(256, dtype=self.dtype)(t_emb)
            h = nn.relu(h)
            t_emb = nn.Dense(30, dtype=self.dtype)(h)
        x_emb = positional_encoding(xyz, self.multires)
        inp = jnp.concatenate([x_emb, t_emb.astype(x_emb.dtype)], axis=-1)
        h = MLPTrunk(depth=self.depth, width=self.width, dtype=self.dtype,
                     fuse=self.fuse)(inp)
        if self.is_6dof:
            # screw-motion head (reference time_utils.py:100-124): the caller
            # treats d_xyz as the SE(3)-transformed position delta is NOT
            # additive in the reference — it returns the transformed point;
            # we return the delta so downstream stays uniform.
            from ..ops.rigid import se3_transform_points
            w = nn.Dense(3)(h)
            v = nn.Dense(3)(h)
            theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
            w_unit = w / (theta + 1e-5)
            v_unit = v / (theta + 1e-5)
            screw = jnp.concatenate([w_unit, v_unit], -1)
            d_xyz = se3_transform_points(xyz, screw, theta) - xyz
        else:
            d_xyz = self._head(3)(h)
        d_rot = self._head(4)(h)
        d_scale = self._head(3)(h)
        if self.with_normal:
            d_normal = self._head(3)(h)
            return d_xyz, d_rot, d_scale, d_normal
        return d_xyz, d_rot, d_scale


class DeformNetworkNormalSep(nn.Module):
    """Normal-offset-only network with zero-initialized head.

    reference: time_utils.py:207-266 (the `deform_normal` / `deform_back_normal`
    instances in train.py:78-86); head weight/bias zero-init per :247-249 so
    d_normal starts at exactly 0.
    """

    depth: int = 8
    width: int = 256
    multires: int = 10
    is_blender: bool = False
    dtype: object = None
    fuse: bool = False

    @nn.compact
    def __call__(self, xyz, t):
        t_multires = 6 if self.is_blender else 10
        t_emb = positional_encoding(t, t_multires)
        if self.is_blender:
            h = nn.Dense(256, dtype=self.dtype)(t_emb)
            h = nn.relu(h)
            t_emb = nn.Dense(30, dtype=self.dtype)(h)
        x_emb = positional_encoding(xyz, self.multires)
        inp = jnp.concatenate([x_emb, t_emb.astype(x_emb.dtype)], axis=-1)
        h = MLPTrunk(depth=self.depth, width=self.width, dtype=self.dtype,
                     fuse=self.fuse)(inp)
        d_normal = nn.Dense(3, kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros)(h)
        return d_normal


class AppearanceNetwork(nn.Module):
    """Vertex color field (canonical xyz, t) → RGB in [0,1].

    reference: time_utils.py AppearanceNetwork :269-323 (sigmoid output head).
    """

    depth: int = 8
    width: int = 256
    multires: int = 10
    is_blender: bool = False
    dtype: object = None
    fuse: bool = False

    @nn.compact
    def __call__(self, xyz, t):
        t_multires = 6 if self.is_blender else 10
        t_emb = positional_encoding(t, t_multires)
        if self.is_blender:
            h = nn.Dense(256, dtype=self.dtype)(t_emb)
            h = nn.relu(h)
            t_emb = nn.Dense(30, dtype=self.dtype)(h)
        x_emb = positional_encoding(xyz, self.multires)
        inp = jnp.concatenate([x_emb, t_emb.astype(x_emb.dtype)], axis=-1)
        h = MLPTrunk(depth=self.depth, width=self.width, dtype=self.dtype,
                     fuse=self.fuse)(inp)
        rgb = nn.Dense(3)(h)
        return jax.nn.sigmoid(rgb)


def chunked_apply(apply_fn, params, x, t, chunk: int = 0):
    """Apply a row-wise network in VMEM-sized row chunks under lax.map.

    A (262144, 256) trunk activation is ~134 MB — every Dense layer of an
    unchunked apply round-trips it through HBM, making the 8×256 MLPs
    memory-bound (~10x off MXU speed-of-light).  Mapping over row chunks
    keeps the whole trunk resident in VMEM (weights are ~1 MB), so HBM
    traffic shrinks to the network's input and output.  Each chunk is
    checkpointed: the backward recomputes chunk-by-chunk with the same
    locality.  Identical math to jax.checkpoint(apply_fn) — row-wise
    networks have no cross-row interaction.
    """
    if chunk == -1:
        # fused-trunk mode: the trunk's custom_vjp already recomputes in its
        # own backward kernel with tiny residuals, so wrapping the apply in
        # jax.checkpoint would only run the forward kernels twice.
        return apply_fn(params, x, t)
    if not chunk or x.shape[0] <= chunk:
        return jax.checkpoint(apply_fn)(params, x, t)
    n = x.shape[0]
    nc = -(-n // chunk)
    pad = nc * chunk - n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        t = jnp.pad(t, ((0, pad), (0, 0)))
    body = jax.checkpoint(lambda a: apply_fn(params, a[0], a[1]))
    out = jax.lax.map(body, (x.reshape(nc, chunk, -1),
                             t.reshape(nc, chunk, -1)))
    return jax.tree.map(lambda o: o.reshape(nc * chunk, *o.shape[2:])[:n], out)


def init_deform_params(key, module: nn.Module, n_points: int = 8):
    xyz = jnp.zeros((n_points, 3))
    t = jnp.zeros((n_points, 1))
    return module.init(key, xyz, t)


def expand_time(fid, n: int):
    """Broadcast scalar fid to (N,1) like reference train.py:147."""
    return jnp.full((n, 1), fid, dtype=jnp.float32)

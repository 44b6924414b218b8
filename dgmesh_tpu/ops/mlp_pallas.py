"""Pallas fused MLP trunk for the deformation / appearance networks.

The reference's networks (utils/time_utils.py:58-323) are 8×256 ReLU MLPs
with a skip concat at depth/2, evaluated over 100k-260k rows.  Run layer by
layer in XLA, every layer round-trips a (N,256) activation through HBM
(~134 MB each way), which makes the MLPs bandwidth-bound ~5x off MXU
speed-of-light.  This kernel runs the WHOLE trunk for a block of rows in
VMEM: weights (~1.2 MB bf16) and the block's activations stay resident, so
HBM traffic is just the trunk's input and output.

Layout: all trunk layers are expressed as (256,256) matmuls by zero-padding
the input embedding to 256 lanes; the skip concat at layer `skip` becomes
two matmuls (h@W_h + x@W_x ≡ Dense over concat([x, h])).  Weights are packed
as (depth+1, 256, 256) — index `skip+1` holds the skip's x-part — and biases
as (depth, 256).

The backward kernel recomputes the block's forward in VMEM, then walks the
chain in reverse producing dx and per-layer weight/bias gradients that
accumulate across row blocks in a VMEM-resident accumulator (constant
output index_map → Mosaic keeps the block and accumulates over the
sequential grid).  Deterministic; no atomics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 256  # trunk width; kernels assume it (width != 256 uses the XLA path)


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, *, depth: int, skip: int):
    x = x_ref[...]                                     # (B,256) bf16
    w = w_ref[...]                                     # (depth+1,256,256) bf16
    b = b_ref[...]                                     # (depth,256) f32

    def lin(h, wi, bi):
        y = jax.lax.dot_general(h, wi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        return jnp.maximum(y + bi[None, :], 0.0).astype(jnp.bfloat16)

    h = lin(x, w[0], b[0])
    for i in range(1, depth):
        if i == skip + 1:
            y = jax.lax.dot_general(h, w[i], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            y = y + jax.lax.dot_general(x, w[depth], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            h = jnp.maximum(y + b[i][None, :], 0.0).astype(jnp.bfloat16)
        else:
            h = lin(h, w[i], b[i])
    out_ref[...] = h.astype(jnp.float32)


def _bwd_kernel(x_ref, w_ref, b_ref, g_ref, dx_ref, dw_ref, db_ref, *,
                depth: int, skip: int):
    i_blk = pl.program_id(0)

    @pl.when(i_blk == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...]                                     # (B,256) bf16
    w = w_ref[...]
    b = b_ref[...]

    # recompute forward, keeping every layer's post-relu bf16 activation;
    # the relu mask is re-derived from it via an f32 cast (Mosaic can't
    # compare bf16 on this target, and storing masks blows scoped VMEM)
    acts = []
    h = x
    for i in range(depth):
        y = jax.lax.dot_general(h, w[i], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        if i == skip + 1:
            y = y + jax.lax.dot_general(x, w[depth], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        h = jnp.maximum(y + b[i][None, :], 0.0).astype(jnp.bfloat16)
        acts.append(h)

    def matT(a, g):                                    # aᵀ@g → (256,256) f32
        return jax.lax.dot_general(a, g, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

    g = g_ref[...]                                     # (B,256) f32
    dws = [None] * (depth + 1)
    dbs = [None] * depth
    dx = jnp.zeros(x.shape, jnp.float32)
    for i in range(depth - 1, -1, -1):
        gm = jnp.where(acts[i].astype(jnp.float32) > 0.0, g, 0.0)
        gmb = gm.astype(jnp.bfloat16)
        h_in = x if i == 0 else acts[i - 1]
        dws[i] = matT(h_in, gmb)
        dbs[i] = jnp.sum(gm, axis=0)
        if i == skip + 1:
            dws[depth] = matT(x, gmb)
            dx = dx + jax.lax.dot_general(
                gmb, w[depth], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        g = jax.lax.dot_general(gmb, w[i], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    dx = dx + g

    dx_ref[...] = dx
    dw_ref[...] += jnp.stack(dws, axis=0)
    db_ref[...] += jnp.stack(dbs, axis=0)


def _pick_block(n, cap):
    """Rows per grid step; rows are padded up to a multiple of this.

    Bigger blocks amortize per-step DMA; the backward kernel's cap keeps its
    block activations ×depth + weight-grad accumulators + weights inside the
    16 MB scoped-VMEM limit.
    """
    return cap if n >= cap else max(8, -(-n // 8) * 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_trunk(x, wpack, bpack, depth: int = 8, skip: int = 4):
    """x (N,256) padded embedding → (N,256) trunk output (f32).

    wpack (depth+1,256,256) bf16-castable; bpack (depth,256) f32.
    ``skip`` is the layer index AFTER which the reference concatenates the
    input (Dense stack index i==skip in mlp.py ⇒ the concat feeds layer
    skip+1, whose x-part weight lives at wpack[depth]).
    """
    return _trunk_fwd_impl(x, wpack, bpack, depth, skip)


def _trunk_fwd_impl(x, wpack, bpack, depth, skip):
    n = x.shape[0]
    B = _pick_block(n, 2048)
    np_ = -(-n // B) * B
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_fwd_kernel, depth=depth, skip=skip)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((np_, W), jnp.float32),
        grid=(np_ // B,),
        in_specs=[
            pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((depth + 1, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wpack.astype(jnp.bfloat16),
      bpack.astype(jnp.float32))
    return out[:n]


def _trunk_fwd(x, wpack, bpack, depth, skip):
    return _trunk_fwd_impl(x, wpack, bpack, depth, skip), (x, wpack, bpack)


def _trunk_bwd(depth, skip, res, g):
    x, wpack, bpack = res
    n = x.shape[0]
    B = _pick_block(n, 2048)
    np_ = -(-n // B) * B
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
        g = jnp.pad(g, ((0, np_ - n), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_bwd_kernel, depth=depth, skip=skip)
    dx, dw, db = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((np_, W), jnp.float32),
                   jax.ShapeDtypeStruct((depth + 1, W, W), jnp.float32),
                   jax.ShapeDtypeStruct((depth, W), jnp.float32)),
        grid=(np_ // B,),
        in_specs=[
            pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((depth + 1, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((depth + 1, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wpack.astype(jnp.bfloat16),
      bpack.astype(jnp.float32), g.astype(jnp.float32))
    return (dx[:n].astype(x.dtype), dw.astype(wpack.dtype),
            db.astype(bpack.dtype))


fused_trunk.defvjp(_trunk_fwd, _trunk_bwd)

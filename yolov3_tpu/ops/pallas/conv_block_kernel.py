"""Pallas TPU kernel: fused 1x1 conv + bias + LeakyReLU + inference BatchNorm.

The reference's conv block is Conv -> LeakyReLU(0.2) -> BN
(reference/model.py:28-39). At inference BN is an affine transform, so the
whole block is one matmul with a fused epilogue:

    y = mul * leaky_relu(x @ W + b) + add
    mul = gamma / sqrt(var + eps),  add = beta - mean * mul

This kernel runs that as a single MXU pass over row tiles of the flattened
[N*H*W, Ci] activation with the weight resident in VMEM — one kernel
instead of conv + elementwise HLOs. 3x3 convolutions intentionally stay on
XLA's native conv emitters (they beat hand-written Mosaic for spatial
windows); roughly half the network's conv blocks are 1x1.

Used behind `ModelConfig.use_pallas_pointwise` (inference path only; BN
needs batch statistics when training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 1024


def _kernel(x_ref, w_ref, b_ref, mul_ref, add_ref, out_ref, *, alpha: float):
    y = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    y = y + b_ref[...]
    y = jnp.where(y >= 0.0, y, alpha * y)
    y = y * mul_ref[...] + add_ref[...]
    out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "eps", "interpret", "out_dtype"))
def fused_pointwise_conv_block(x: jnp.ndarray, kernel: jnp.ndarray,
                               bias: jnp.ndarray, scale: jnp.ndarray,
                               offset: jnp.ndarray, mean: jnp.ndarray,
                               var: jnp.ndarray, alpha: float = 0.2,
                               eps: float = 1e-3,
                               out_dtype=jnp.bfloat16,
                               interpret: bool = False) -> jnp.ndarray:
    """x [N,H,W,Ci] -> [N,H,W,Co] through the fused block.

    kernel may be [1,1,Ci,Co] or [Ci,Co]; bias/scale/offset/mean/var [Co].
    """
    n, h, w, ci = x.shape
    kern = kernel.reshape(kernel.shape[-2], kernel.shape[-1]).astype(jnp.float32)
    co = kern.shape[-1]

    mul = (scale / jnp.sqrt(var + eps)).astype(jnp.float32)
    add = (offset - mean * mul).astype(jnp.float32)

    m = n * h * w
    xm = x.reshape(m, ci)
    pad_rows = (-m) % ROW_TILE
    if pad_rows:
        xm = jnp.concatenate(
            [xm, jnp.zeros((pad_rows, ci), xm.dtype)], axis=0)
    rows = xm.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, alpha=alpha),
        grid=(rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, ci), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, co), out_dtype),
        interpret=interpret,
    )(xm.astype(jnp.bfloat16), kern.astype(jnp.bfloat16),
      bias.reshape(1, co).astype(jnp.float32), mul.reshape(1, co),
      add.reshape(1, co))

    return out[:m].reshape(n, h, w, co)

"""Pallas TPU kernel: the space-to-depth EXIT ConvBlock in one pass.

The S2D region leaves the blocked domain through a [2,2,4Ci,Co] stride-1
window conv (`models/yolo.py::_s2d_kernel_stride2_exit`, the lifted form
of the reference's 3x3 stride-2 conv into the 128-channel stage,
reference/model.py:30-35). The round-3 HLO attribution (DESIGN.md) showed
XLA's conv emitter running this single op at ~22% of the int8 MXU rate —
3.23 ms of the 28.6 ms b64 step against a 0.70 ms compute / 0.49 ms
bandwidth floor; 2x2-window s8 convs are simply a shape its emitter
handles badly.

Here the window conv is four tap-matmuls on the MXU:

    out[i, j] = sum_{U,V in {0,1}}  x[i+U, j+V] @ W[U, V]

with the blocked-domain padding (0, 1) supplied as zeros. The epilogue
replicates `models/quantized.py::_epilogue`'s folded arithmetic (dq
commuted through LeakyReLU, the compute-dtype cast, then the NEXT conv's
input quantize), so the kernel emits the s8 tensor FeatureBlock_1
consumes directly.

Layout contract (the lesson of the round-2b/3 negative results: a Pallas
island pays relayout copies wherever its fixed default layout disagrees
with the neighbouring convs): the wrapper logically transposes
[B,H,W,C] -> [H,W,B,C]. On the s8 tensor the upstream fused
epilogue-quantize produced (layout {3,0,2,1}: bytes ordered h, w, n, c)
that transpose is a BITCAST, and the kernel's default-layout result,
transposed back, is again byte-compatible with the downstream conv's
preferred operand layout — same bridge as
`ops/pallas/pointwise_kernel.py`.

Grid is (batch-tiles, row-bands); the U=1 tap's cross-band row comes
from a second VIEW of the same input (one-row block, index map clamped
at the bottom image edge, masked to the zero pad row there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MM = (((1,), (0,)), ((), ()))
_VMEM_BUDGET = 10 * 1024 * 1024


def _estimate(rows: int, w: int, bt: int, c: int, co: int) -> int:
    m = rows * w * bt
    return (2 * (rows + 1) * w * bt * c         # x + halo blocks (dblbuf)
            + 2 * m * co                        # s8 out (dblbuf)
            + 3 * m * c                         # v concat + shifted taps
            + 2 * m * co * 4                    # s32 acc + f32 epilogue
            + 4 * c * co)


def _plan(h: int, w: int, b: int, c: int, co: int):
    """(rows, btile): largest divisors whose buffers fit the budget."""
    bt = b
    while bt > 16 and b % (bt // 2) == 0:
        bt //= 2
    for rows in range(min(h, 8), 0, -1):
        if h % rows == 0 and _estimate(rows, w, bt, c, co) <= _VMEM_BUDGET:
            return rows, bt
    return 1, bt


def vmem_fits(h: int, w: int, b: int, c: int, co: int) -> bool:
    rows, bt = _plan(h, w, b, c, co)
    return _estimate(rows, w, bt, c, co) <= _VMEM_BUDGET


def _kernel(x_ref, halo_ref, w_ref, epi_ref, out_ref, *, rows: int, w: int,
            bt: int, c: int, co: int, nhb: int, alpha: float,
            cast_bf16: bool):
    jh = pl.program_id(1)
    # bottom halo row: the next band's first row; at the image edge the
    # blocked-domain (0, 1) pad row is zero
    halo = jnp.where(jh == nhb - 1,
                     jnp.zeros((1, w, bt, c), x_ref.dtype),
                     halo_ref[...])
    v = jnp.concatenate([x_ref[...], halo], axis=0)  # [rows+1, w, bt, c]
    acc = None
    for t in range(4):
        u, vv = divmod(t, 2)
        sub = v[u:u + rows]
        if vv == 1:
            # right halo column: shift left one pixel, zero-fill (the
            # shift moves whole bt*c panels — sublane-aligned)
            sub = jnp.concatenate(
                [sub[:, 1:], jnp.zeros((rows, 1, bt, c), sub.dtype)],
                axis=1)
        part = jax.lax.dot_general(
            sub.reshape(rows * w * bt, c), w_ref[t], _MM,
            preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part
    # models/quantized.py::_epilogue with dq folded through LeakyReLU,
    # then _quantize_act for the next conv — the same op sequence XLA
    # fuses on the mirror path, for bit-comparable results
    y = acc.astype(jnp.float32)
    y = y + epi_ref[0]
    y = jnp.where(y >= 0.0, y, alpha * y)
    y = y * epi_ref[1] + epi_ref[2]
    if cast_bf16:  # the mirror epilogue casts to the compute dtype
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    q = jnp.clip(jnp.round(y * epi_ref[3]), -127.0, 127.0)
    out_ref[...] = q.astype(jnp.int8).reshape(rows, w, bt, co)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "cast_bf16", "interpret"))
def exit_conv_block_q(xq: jnp.ndarray, wq: jnp.ndarray, epi: jnp.ndarray,
                      *, alpha: float = 0.1, cast_bf16: bool = True,
                      interpret: bool = False) -> jnp.ndarray:
    """s8 [N,H,W,4Ci] -> s8 [N,H,W,Co] exit ConvBlock.

    wq s8 [4, 4Ci, Co]: the `_s2d_kernel_stride2_exit`-lifted kernel,
    quantized per output channel and reshaped ((U,V) major). epi f32
    [4, Co]: (bias/dq, bn_mul*dq, bn_add, 1/next_act_scale) rows, dq the
    per-channel sx*sw dequant scale.
    """
    n, h, w, c = xq.shape
    co = wq.shape[-1]
    rows, bt = _plan(h, w, n, c, co)
    nhb = h // rows

    xt = jnp.transpose(xq, (1, 2, 0, 3))  # bitcast on conv layouts
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, w=w, bt=bt, c=c, co=co,
                          nhb=nhb, alpha=alpha, cast_bf16=cast_bf16),
        grid=(n // bt, nhb),
        in_specs=[
            pl.BlockSpec((rows, w, bt, c), lambda ib, jh: (jh, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, w, bt, c),
                lambda ib, jh: (jnp.minimum((jh + 1) * rows, h - 1),
                                0, ib, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c, co), lambda ib, jh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, co), lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, w, bt, co),
                               lambda ib, jh: (jh, 0, ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, n, co), jnp.int8),
        interpret=interpret,
    )(xt, xt, wq, epi.astype(jnp.float32))
    return jnp.transpose(out, (2, 0, 1, 3))

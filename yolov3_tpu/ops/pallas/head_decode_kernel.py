"""Pallas TPU kernel: detection head 1x1 conv + box decode, one pass.

The round-3 HLO attribution (DESIGN.md) showed the stride-8 head conv
costing 0.682 ms at b64 for an f32[64,64,64,14] output: XLA picks a
batch-minor layout {0,3,2,1} for the 14-channel result (14 of 128 lanes
used) and the decode-adjacent fusions (sigmoid/exp/select + the packed
corner rolls + concat, `ops/decode.py::_decode_fm_packed`) add ~0.8 ms
more — all layout/bandwidth, none of it compute (the head matmul's
compute floor is ~0.005 ms). Parity target: the reference's head conv +
"reorg layer" (reference/model.py:104-212).

This kernel consumes the neck output once and emits the final decoded
rows directly:

    y    = x @ W + b                       (head 1x1 conv, MXU)
    dec  = is_xy ? (sigmoid(y)+cell)*stride
         : is_wh ? exp(y)*anchor : sigmoid(y)
    out  = dec @ T                         (corner conversion)

where T is a constant [A*d, A*d] matrix encoding x0=cx-w/2, x1=cx+w/2
(etc.) — the lane-crossing corner step as a tiny second matmul instead
of Mosaic-hostile lane rolls. Identical math to
`ops/decode.py::_decode_fm_packed`.

Layout contract (same bridge as `pointwise_kernel.py`): the wrapper
logically transposes [B,H,W,C] -> [H,W,B,C], a bitcast on the {3,0,2,1}
layout the producing conv emits; call sites pin the boundary with
`jax.lax.optimization_barrier`. The [B,H,W,A*d] result reshapes to the
final [B, H*W*A, d] detection rows memory-order-free (d divides A*d).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MM = (((1,), (0,)), ((), ()))
_VMEM_BUDGET = 10 * 1024 * 1024


def _estimate(rows: int, w: int, bt: int, cin: int, ad: int,
              x_bytes: int) -> int:
    m = rows * w * bt
    lanes = max(ad, 128)  # sub-128 minor dims pad to a full lane tile
    return (2 * m * cin * x_bytes       # double-buffered input
            + 2 * m * lanes * 4         # double-buffered f32 out
            + 5 * m * lanes * 4         # y/s/e/dec/out temps
            + cin * lanes * x_bytes + 2 * lanes * lanes * 4)


def _plan(h: int, w: int, b: int, cin: int, ad: int, x_bytes: int):
    bt = b
    while bt > 16 and b % (bt // 2) == 0:
        bt //= 2
    for rows in range(min(h, 8), 0, -1):
        if h % rows == 0 and _estimate(rows, w, bt, cin, ad,
                                       x_bytes) <= _VMEM_BUDGET:
            return rows, bt
    while bt > 1 and _estimate(1, w, bt, cin, ad, x_bytes) > _VMEM_BUDGET:
        bt //= 2
    return 1, max(bt, 1)


def vmem_fits(h: int, w: int, b: int, cin: int, ad: int,
              x_bytes: int = 2) -> bool:
    rows, bt = _plan(h, w, b, cin, ad, x_bytes)
    return (b % bt == 0
            and _estimate(rows, w, bt, cin, ad, x_bytes) <= _VMEM_BUDGET)


def _corner_matrix(num_anchors: int, d: int) -> np.ndarray:
    """[A*d, A*d] linear map: packed (cx,cy,w,h,rest) -> (x0,y0,x1,y1,rest).

    Encodes `ops/decode.py::_decode_fm_packed`'s roll-and-select corner
    step: out[k] = dec[k] -/+ 0.5*dec[k±2] on the box lanes, identity on
    objectness/class lanes.
    """
    ad = num_anchors * d
    t = np.zeros((ad, ad), np.float32)
    for a in range(num_anchors):
        o = a * d
        t[o + 0, o + 0] = 1.0
        t[o + 2, o + 0] = -0.5
        t[o + 1, o + 1] = 1.0
        t[o + 3, o + 1] = -0.5
        t[o + 0, o + 2] = 1.0
        t[o + 2, o + 2] = 0.5
        t[o + 1, o + 3] = 1.0
        t[o + 3, o + 3] = 0.5
        for k in range(4, d):
            t[o + k, o + k] = 1.0
    return t


def _kernel(x_ref, w_ref, b_ref, ap_ref, t_ref, o_ref, *, rows: int,
            w: int, bt: int, cin: int, ad: int, d: int, stride: float,
            cast_bf16: bool):
    jh = pl.program_id(1)
    m = rows * w * bt
    y = jax.lax.dot_general(x_ref[...].reshape(m, cin), w_ref[...], _MM,
                            preferred_element_type=jnp.float32)
    if cast_bf16:
        # mirror the XLA path: bf16 conv output, bf16 bias add
        y = (y.astype(jnp.bfloat16) + b_ref[...].astype(jnp.bfloat16))
        y = y.astype(jnp.float32)
    else:
        y = y + b_ref[...]

    # cell offsets from the flattened (row-in-band, w, batch) index
    lin = jax.lax.broadcasted_iota(jnp.int32, (m, ad), 0)
    col = ((lin // bt) % w).astype(jnp.float32)
    row = (lin // (w * bt) + jh * rows).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (m, ad), 1) % d
    off = jnp.where(k == 0, col, jnp.where(k == 1, row, 0.0))

    s = jax.nn.sigmoid(y)
    is_xy = k < 2
    is_wh = jnp.logical_and(k >= 2, k < 4)
    # exp only where consumed (exp of arbitrary logits can overflow)
    e = jnp.exp(jnp.where(is_wh, y, 0.0))
    dec = jnp.where(is_xy, (s + off) * stride,
                    jnp.where(is_wh, e * ap_ref[...], s))
    out = jax.lax.dot_general(dec, t_ref[...], _MM,
                              preferred_element_type=jnp.float32)
    o_ref[...] = out.reshape(rows, w, bt, ad)


@functools.partial(jax.jit, static_argnames=("anchors", "number_classes",
                                             "stride", "cast_bf16",
                                             "interpret"))
def head_decode(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, *,
                anchors: Tuple[Tuple[float, float], ...],
                number_classes: int, stride: int,
                cast_bf16: bool = True,
                interpret: bool = False) -> jnp.ndarray:
    """Head conv + decode for ONE scale.

    x [B,H,W,Cin] (bf16 neck output), w [Cin, A*(5+C)], b [A*(5+C)].
    Returns f32 [B, H*W*A, 5+C] rows [x0,y0,x1,y1,obj,probs...] in the
    reference's (cell, anchor) order — `decode_detections`' per-scale
    slice, bit-comparable to the XLA mirror.
    """
    num_anchors = len(anchors)
    d = 5 + number_classes
    ad = num_anchors * d
    n, h, wd, cin = x.shape
    x_bytes = 2 if x.dtype == jnp.bfloat16 else 4
    rows, bt = _plan(h, wd, n, cin, ad, x_bytes)
    nhb = h // rows

    anchor_plane = np.ones(ad, np.float32)
    for a, (aw, ah) in enumerate(anchors):
        anchor_plane[a * d + 2] = aw
        anchor_plane[a * d + 3] = ah

    xt = jnp.transpose(x, (1, 2, 0, 3))  # bitcast on conv layouts
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, w=wd, bt=bt, cin=cin, ad=ad,
                          d=d, stride=float(stride), cast_bf16=cast_bf16),
        grid=(n // bt, nhb),
        in_specs=[
            pl.BlockSpec((rows, wd, bt, cin), lambda ib, jh: (jh, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, ad), lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ad), lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ad), lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ad, ad), lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, wd, bt, ad),
                               lambda ib, jh: (jh, 0, ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wd, n, ad), jnp.float32),
        interpret=interpret,
    )(xt, w.astype(x.dtype), b.astype(jnp.float32).reshape(1, ad),
      jnp.asarray(anchor_plane).reshape(1, ad),
      jnp.asarray(_corner_matrix(num_anchors, d)))
    # [H,W,B,A*d] -> [B,H,W,A*d] -> [B, H*W*A, d]: the reshape splits the
    # minor dim in memory order (free); the transpose is the boundary the
    # caller pins with optimization_barrier
    return jnp.transpose(out, (2, 0, 1, 3)).reshape(n, h * wd * num_anchors,
                                                    d)

"""Pallas TPU kernel: 3x3 stride-1 ConvBlock (int8), one pass.

Feature blocks alternate 1x1 and 3x3 convs (reference/model.py:40-49).
The 1x1s run on `ops/pallas/pointwise_kernel.py`; this kernel is the 3x3
half, so a whole feature block can execute as a chain of VMEM-resident
Pallas passes with only s8 tensors in HBM between them. The round-3 HLO
attribution (DESIGN.md, b64) shows XLA's 3x3 s8 emitter at 43-80% MXU
depending on the stage (FeatureBlock_1's 64->128 at 128^2: 0.911 ms vs a
0.39 ms floor).

Nine tap-matmuls with whole-row/column shifts (SAME padding (1,1)):

    out[i, j] = sum_{u,v in 0..2}  x[i+u-1, j+v-1] @ W[u, v]

The u=0 / u=2 taps' edge rows come from one-row halo views of the same
input (index maps clamped at the image edges, masked to the zero pad
rows there).

Epilogue = `models/quantized.py::_epilogue` with dq folded through
LeakyReLU, then an OPTIONAL residual add (the feature block adds its
block input to the 3x3's output, reference/model.py:47) consuming the
residual's s8 image dequantized in-VMEM, then the next conv's input
quantize. Optionally also emits the bf16 sum (the block's output) for
the last rep.

Layout contract: transposed view [B,H,W,C] -> [H,W,B,C] (a bitcast on
conv-produced layouts), barrier-pinned at the call site — see
`ops/pallas/pointwise_kernel.py`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MM = (((1,), (0,)), ((), ()))
_VMEM_BUDGET = 10 * 1024 * 1024


def _estimate(rows: int, w: int, bt: int, c: int, co: int, x_bytes: int,
              has_res: bool, emit_bf16: bool) -> int:
    m = rows * w * bt
    return (2 * (rows + 2) * w * bt * c * x_bytes  # in + halos (dblbuf)
            + (rows + 2) * w * bt * c              # s8 quantized copy
            + (2 * m * co if has_res else 0)
            + 2 * m * co                           # s8 out (dblbuf)
            + (2 * m * co * 2 if emit_bf16 else 0)
            + 2 * m * co * 4                       # s32 acc + f32 epilogue
            + 3 * m * c                            # shifted tap views
            + 9 * c * co)


def _plan(h: int, w: int, b: int, c: int, co: int, x_bytes: int,
          has_res: bool, emit_bf16: bool):
    bt = b
    while bt > 8 and b % (bt // 2) == 0:
        bt //= 2
    for rows in range(min(h, 8), 0, -1):
        if h % rows == 0 and _estimate(rows, w, bt, c, co, x_bytes,
                                       has_res, emit_bf16) <= _VMEM_BUDGET:
            return rows, bt
    while bt > 1 and _estimate(1, w, bt, c, co, x_bytes, has_res,
                               emit_bf16) > _VMEM_BUDGET:
        bt //= 2
    return 1, max(bt, 1)


def vmem_fits(h: int, w: int, b: int, c: int, co: int, x_bytes: int = 1,
              has_res: bool = False, emit_bf16: bool = False) -> bool:
    rows, bt = _plan(h, w, b, c, co, x_bytes, has_res, emit_bf16)
    return (b % bt == 0 and h % rows == 0
            and _estimate(rows, w, bt, c, co, x_bytes, has_res,
                          emit_bf16) <= _VMEM_BUDGET)


def _kernel(x_ref, top_ref, bot_ref, w_ref, epi_ref, *rest, rows: int,
            w: int, bt: int, c: int, co: int, alpha: float,
            quantize_in: bool, has_res: bool, emit_s8: bool,
            emit_bf16: bool, cast_bf16: bool):
    refs = list(rest)
    rq_ref = refs.pop(0) if has_res else None
    o_ref = refs.pop(0) if emit_s8 else None
    o2_ref = refs.pop(0) if emit_bf16 else None
    jh = pl.program_id(1)
    nhb = pl.num_programs(1)
    m = rows * w * bt

    def quant(t):
        if not quantize_in:
            return t
        f = t.astype(jnp.float32) * epi_ref[4, :c]
        return jnp.clip(jnp.round(f), -127.0, 127.0).astype(jnp.int8)

    top = jnp.where(jh == 0, jnp.zeros((1, w, bt, c), x_ref.dtype),
                    top_ref[...])
    bot = jnp.where(jh == nhb - 1, jnp.zeros((1, w, bt, c), x_ref.dtype),
                    bot_ref[...])
    main = quant(x_ref[...])
    top, bot = quant(top), quant(bot)
    u0 = jnp.concatenate([top, main[:-1]], axis=0)   # rows i-1
    u2 = jnp.concatenate([main[1:], bot], axis=0)    # rows i+1

    zcol = jnp.zeros((rows, 1, bt, c), jnp.int8)
    acc = None
    for u, rows_u in enumerate((u0, main, u2)):
        v0 = jnp.concatenate([zcol, rows_u[:, :-1]], axis=1)  # cols j-1
        v2 = jnp.concatenate([rows_u[:, 1:], zcol], axis=1)   # cols j+1
        for v, tap in enumerate((v0, rows_u, v2)):
            part = jax.lax.dot_general(
                tap.reshape(m, c), w_ref[u * 3 + v], _MM,
                preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part

    # models/quantized.py::_epilogue (dq folded through LeakyReLU), the
    # residual add of the block input (bf16, mirror order), then the next
    # conv's _quantize_act
    y = acc.astype(jnp.float32)
    y = y + epi_ref[0, :co]
    y = jnp.where(y >= 0.0, y, alpha * y)
    y = y * epi_ref[1, :co] + epi_ref[2, :co]
    if cast_bf16:
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    if rq_ref is not None:
        res = (rq_ref[...].reshape(m, co).astype(jnp.float32)
               * epi_ref[5, :co])
        if cast_bf16:
            res = res.astype(jnp.bfloat16).astype(jnp.float32)
        y = res + y
        if cast_bf16:
            y = y.astype(jnp.bfloat16).astype(jnp.float32)
    if o2_ref is not None:
        o2_ref[...] = y.astype(jnp.bfloat16).reshape(o2_ref.shape)
    if o_ref is not None:
        q = jnp.clip(jnp.round(y * epi_ref[3, :co]), -127.0, 127.0)
        o_ref[...] = q.astype(jnp.int8).reshape(rows, w, bt, co)


@functools.partial(jax.jit, static_argnames=("alpha", "emit_s8",
                                             "emit_bf16", "cast_bf16",
                                             "interpret"))
def conv3x3_block_q(x: jnp.ndarray, wq: jnp.ndarray, epi: jnp.ndarray,
                    residual_q: Optional[jnp.ndarray] = None, *,
                    alpha: float = 0.1, emit_s8: bool = True,
                    emit_bf16: bool = False,
                    cast_bf16: bool = True, interpret: bool = False):
    """s8/bf16 [N,H,W,C] -> s8 [N,H,W,Co] 3x3 stride-1 ConvBlock.

    wq s8 [9, C, Co] ((u,v) major); epi f32 [6, max(C,Co)] rows
    (b/dq, mul*dq, add, 1/next_act_scale, 1/act_scale, res_scale).
    residual_q: s8 [N,H,W,Co], dequantized by epi row 5 and added to the
    epilogue output (the feature block's residual). `emit_s8` returns the
    next conv's pre-quantized input; `emit_bf16` the bf16 sum (the block
    output, for the final rep). Returns the single requested array or an
    (s8, bf16) tuple when both.
    """
    n, h, w, c = x.shape
    co = wq.shape[-1]
    x_bytes = 1 if x.dtype == jnp.int8 else 2
    rows, bt = _plan(h, w, n, c, co, x_bytes, residual_q is not None,
                     emit_bf16)
    nhb = h // rows
    assert emit_s8 or emit_bf16

    xt = jnp.transpose(x, (1, 2, 0, 3))  # bitcast on conv layouts
    operands = [xt, xt, xt, wq, epi.astype(jnp.float32)]
    in_specs = [
        pl.BlockSpec((rows, w, bt, c), lambda ib, jh: (jh, 0, ib, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w, bt, c),
                     lambda ib, jh: (jnp.maximum(jh * rows - 1, 0),
                                     0, ib, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w, bt, c),
                     lambda ib, jh: (jnp.minimum((jh + 1) * rows, h - 1),
                                     0, ib, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, c, co), lambda ib, jh: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(epi.shape, lambda ib, jh: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if residual_q is not None:
        operands.append(jnp.transpose(residual_q, (1, 2, 0, 3)))
        in_specs.append(pl.BlockSpec((rows, w, bt, co),
                                     lambda ib, jh: (jh, 0, ib, 0),
                                     memory_space=pltpu.VMEM))

    out_shape = []
    out_specs = []
    spec = pl.BlockSpec((rows, w, bt, co), lambda ib, jh: (jh, 0, ib, 0),
                        memory_space=pltpu.VMEM)
    if emit_s8:
        out_shape.append(jax.ShapeDtypeStruct((h, w, n, co), jnp.int8))
        out_specs.append(spec)
    if emit_bf16:
        out_shape.append(jax.ShapeDtypeStruct((h, w, n, co), jnp.bfloat16))
        out_specs.append(spec)

    multi = len(out_shape) > 1
    outs = pl.pallas_call(
        functools.partial(_kernel, rows=rows, w=w, bt=bt, c=c, co=co,
                          alpha=alpha, quantize_in=(x.dtype != jnp.int8),
                          has_res=residual_q is not None, emit_s8=emit_s8,
                          emit_bf16=emit_bf16, cast_bf16=cast_bf16),
        grid=(n // bt, nhb),
        in_specs=in_specs,
        out_specs=out_specs if multi else out_specs[0],
        out_shape=out_shape if multi else out_shape[0],
        interpret=interpret,
    )(*operands)
    if multi:
        return tuple(jnp.transpose(o, (2, 0, 1, 3)) for o in outs)
    return jnp.transpose(outs, (2, 0, 1, 3))

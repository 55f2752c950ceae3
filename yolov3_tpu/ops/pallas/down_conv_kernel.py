"""Pallas TPU kernel: 3x3 stride-2 downsample ConvBlock (int8), one pass.

The backbone's stage transitions (Darknet53 ConvBlock_3/4/5,
reference/model.py:30-35 with stride 2) are plain 3x3 stride-2 conv
blocks between feature blocks. The round-3 HLO attribution (DESIGN.md,
b64) shows XLA's conv emitter running them far off the int8 MXU rate —
ConvBlock_3 at 1.278 ms vs a 0.39 ms compute floor (~30%), ConvBlock_4
at ~45% — the same emitter weakness the exit-conv kernel beat on its
2x2 window (strided s8 convs defeat its tiling).

Here the conv is nine tap-matmuls on the MXU over the stride-2
decimated grid:

    out[i, j] = sum_{u,v in 0..2}  x[2i+u, 2j+v] @ W[u, v]

(XLA SAME padding for k=3, s=2, even H puts its single zero row/col at
the bottom/right: lo = total//2 = 0). The W-axis decimation is a free
in-VMEM reshape [W] -> [W/2, 2]: tap v=0 is plane 0, v=1 is plane 1,
v=2 is plane 0 shifted left one output pixel (zero-filled at the right
edge). Rows decimate the same way on the loaded band; the u=2 tap's
last row comes from a one-row halo view (the next band's first row,
masked to the zero pad row at the bottom edge).

The input is the bf16 block-boundary tensor; the kernel quantizes it
in-VMEM (epi row 4), so the bf16 -> s8 quantize pass XLA would run
standalone never touches HBM. The epilogue replicates
`models/quantized.py::_epilogue` (dq commuted through LeakyReLU) plus
the NEXT block's input quantize, emitting the s8 tensor the following
FeatureBlock's entry consumes directly (`_Ctx.block_input`'s
pre-quantized contract, same as the exit-conv kernel).

Layout contract: transposed view [B,H,W,C] -> [H,W,B,C] (a bitcast on
conv-produced layouts), barrier-pinned at the call site — see
`ops/pallas/pointwise_kernel.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MM = (((1,), (0,)), ((), ()))
_VMEM_BUDGET = 10 * 1024 * 1024


def _estimate(orows: int, w: int, bt: int, c: int, co: int) -> int:
    mo = orows * (w // 2) * bt
    return (2 * (2 * orows + 1) * w * bt * c * 2   # bf16 in + halo (dblbuf)
            + (2 * orows + 1) * w * bt * c          # s8 quantized copy
            + 2 * mo * co                           # s8 out (dblbuf)
            + 2 * mo * co * 4                       # s32 acc + f32 epilogue
            + 3 * mo * c                            # shifted tap views
            + 9 * c * co)


def _plan(h: int, w: int, b: int, c: int, co: int):
    """(out rows per band, batch tile) fitting the VMEM budget."""
    bt = b
    while bt > 8 and b % (bt // 2) == 0:
        bt //= 2
    oh = h // 2
    for orows in range(min(oh, 8), 0, -1):
        if oh % orows == 0 and _estimate(orows, w, bt, c,
                                         co) <= _VMEM_BUDGET:
            return orows, bt
    while bt > 1 and _estimate(1, w, bt, c, co) > _VMEM_BUDGET:
        bt //= 2
    return 1, max(bt, 1)


def vmem_fits(h: int, w: int, b: int, c: int, co: int) -> bool:
    if h % 2 or w % 2:
        return False
    orows, bt = _plan(h, w, b, c, co)
    return (b % bt == 0 and h // 2 % orows == 0
            and _estimate(orows, w, bt, c, co) <= _VMEM_BUDGET)


def _kernel(x_ref, halo_ref, w_ref, epi_ref, out_ref, *, orows: int,
            w: int, bt: int, c: int, co: int, alpha: float,
            cast_bf16: bool):
    jh = pl.program_id(1)
    wo = w // 2

    def quant(t):
        f = t.astype(jnp.float32) * epi_ref[4, :c]
        return jnp.clip(jnp.round(f), -127.0, 127.0).astype(jnp.int8)

    nhb = pl.num_programs(1)
    # bottom halo row: the next band's first row; at the image edge it is
    # the SAME-padding zero row
    halo = jnp.where(jh == nhb - 1,
                     jnp.zeros((1, w, bt, c), x_ref.dtype),
                     halo_ref[...])
    main = quant(x_ref[...])                     # [2*orows, w, bt, c]
    halo = quant(halo)
    # row taps on the decimated grid: band-relative input row = 2i + u
    mr = main.reshape(orows, 2, w, bt, c)
    u0 = mr[:, 0]                                # rows 0,2,...  [orows,...]
    u1 = mr[:, 1]                                # rows 1,3,...
    # rows 2,4,...,2*orows; with a single output row per band the in-band
    # part is empty and Mosaic rejects zero-sized vectors, so the tap is
    # just the halo row (orows is static — plain Python branch)
    u2 = (jnp.concatenate([mr[1:, 0], halo], axis=0) if orows > 1
          else halo)

    acc = None
    for u, rows_u in enumerate((u0, u1, u2)):
        # column taps: input col = 2j + v via [w/2, 2] planes
        cr = rows_u.reshape(orows, wo, 2, bt, c)
        v0 = cr[:, :, 0]
        v1 = cr[:, :, 1]
        v2 = (jnp.concatenate(
            [cr[:, 1:, 0], jnp.zeros((orows, 1, bt, c), jnp.int8)], axis=1)
            if wo > 1 else jnp.zeros((orows, 1, bt, c), jnp.int8))
        for v, tap in enumerate((v0, v1, v2)):
            part = jax.lax.dot_general(
                tap.reshape(orows * wo * bt, c), w_ref[u * 3 + v], _MM,
                preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part

    # models/quantized.py::_epilogue (dq folded through LeakyReLU) + the
    # next block's _quantize_act — same op sequence as the XLA mirror
    y = acc.astype(jnp.float32)
    y = y + epi_ref[0, :co]
    y = jnp.where(y >= 0.0, y, alpha * y)
    y = y * epi_ref[1, :co] + epi_ref[2, :co]
    if cast_bf16:
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    q = jnp.clip(jnp.round(y * epi_ref[3, :co]), -127.0, 127.0)
    out_ref[...] = q.astype(jnp.int8).reshape(orows, wo, bt, co)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "cast_bf16", "interpret"))
def down_conv_block_q(x: jnp.ndarray, wq: jnp.ndarray, epi: jnp.ndarray,
                      *, alpha: float = 0.1, cast_bf16: bool = True,
                      interpret: bool = False) -> jnp.ndarray:
    """bf16 [N,H,W,C] -> s8 [N,H/2,W/2,Co] 3x3 stride-2 ConvBlock.

    wq s8 [9, C, Co] ((u,v) major); epi f32 [5, max(C,Co)] rows
    (b/dq, mul*dq, add, 1/next_act_scale, 1/act_scale), dq the
    per-channel sx*sw dequant scale.
    """
    n, h, w, c = x.shape
    co = wq.shape[-1]
    orows, bt = _plan(h, w, n, c, co)
    oh, wo = h // 2, w // 2
    nhb = oh // orows

    xt = jnp.transpose(x, (1, 2, 0, 3))  # bitcast on conv layouts
    out = pl.pallas_call(
        functools.partial(_kernel, orows=orows, w=w, bt=bt, c=c, co=co,
                          alpha=alpha, cast_bf16=cast_bf16),
        grid=(n // bt, nhb),
        in_specs=[
            pl.BlockSpec((2 * orows, w, bt, c),
                         lambda ib, jh: (jh, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, w, bt, c),
                lambda ib, jh: (jnp.minimum((jh + 1) * 2 * orows, h - 1),
                                0, ib, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, co), lambda ib, jh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(epi.shape, lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((orows, wo, bt, co),
                               lambda ib, jh: (jh, 0, ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((oh, wo, n, co), jnp.int8),
        interpret=interpret,
    )(xt, xt, wq, epi.astype(jnp.float32))
    return jnp.transpose(out, (2, 0, 1, 3))

"""Pallas TPU kernel: the S2D region's TAIL (pw -> 3x3 -> residual -> exit)
as ONE VMEM-resident, software-pipelined band kernel.

The space-to-depth region (models/yolo.py::_s2d_region_apply, the lifted
form of reference/model.py:382-391's stem) is the int8 serving path's
largest remaining gap: ~8.7 ms of the 28.6 ms b64 step against a
compute floor near 4.3 ms (DESIGN.md round-3 profile). The round-3 HLO
attribution shows the per-stage convs already near their dense lifted
rooflines — the recoverable cost is the INTER-STAGE HBM traffic: at b64
the stage boundaries move ~2 GB/step (stem2-out s8 read twice: conv in
+ residual; pw-out written+read; the residual sum y written+read), all
of which dies in VMEM here. The whole-region shape is also the one
kernel form the round-3 sweep did NOT kill: both boundaries are already
kernel/image tensors, so the Pallas-island relayout cascade that
regressed every interior kernel does not apply.

Fused stages (128-dom coordinates, all per row of width W x bt x C):

    q2 = s8 input (stem2 out, scale s2)
    q3 = quant(epilogue(q2 @ Wpw), s3)          pw  (lifted 1x1, K=4Ci)
    z  = epilogue(sum_9taps q3 @ Wfb0[u,v])     FB0 3x3 (lifted stride-1)
    y  = bf16(z) + bf16(q2 * s2)                the block's residual add
    q4 = quant(y, s4)
    out= quant(epilogue(sum_4taps q4 @ Wex), s5)  exit (lifted [2,2] conv)

All matmuls are the DENSE lifted forms (the structural-zero inflation is
what keeps K at 128/256 full MXU lanes — phase-decomposed K=32/64
alternatives lose the MACs win back to MXU underutilization; DESIGN.md
round-4). Epilogues replicate `models/quantized.py::_epilogue` (dq
commuted through LeakyReLU) and `_quantize_act`'s exact op sequence, so
the kernel is bit-comparable to the XLA mirror.

Each grid cell covers `ro` output rows. The three stages run as ONE
row-software-pipeline: pw produces row k into a rolling 3-row window,
FB0 (+ residual) trails two rows behind into a rolling 2-row window,
the exit conv trails three. Live VMEM is therefore ~5 row-slices of
intermediates instead of whole bands — what lets an 8-image batch tile
(Mosaic's minimum) fit alongside the banded input. Out-of-image rows
are fetched clamped and MASKED to the stages' zero padding rows
in-kernel (FB0 pads its input, the exit pads its input); column padding
is in-VMEM zero-filled shifts.

Layout contract: transposed views [B,H,W,C] -> [H,W,B,C] (bitcasts on
conv-produced layouts), barrier-pinned at the call site — see
`ops/pallas/pointwise_kernel.py` / DESIGN.md round-3 "KEY UNLOCK".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MM = (((1,), (0,)), ((), ()))
_VMEM_BUDGET = 10 * 1024 * 1024


def _estimate(ro: int, w: int, bt: int, c: int, cm: int, co: int) -> int:
    """Peak VMEM bytes for one band. c=4Ci (input/residual width), cm=4Cm
    (pw output width), co=exit output width."""
    row = w * bt
    return (2 * ro * row * c             # main in (dblbuf)
            + 2 * 3 * row * c            # 1-row halo views (dblbuf)
            + 2 * ro * row * co          # out (dblbuf)
            + 3 * row * cm + 2 * row * c  # q3/q4 rolling windows
            + 3 * row * c * 4            # per-row s32/f32 chains
            + row * cm * 4
            + cm * c + 9 * cm * c + 4 * c * co + 16 * c * 4)


def _plan(h: int, w: int, b: int, c: int, cm: int, co: int):
    """(ro, bt): Mosaic needs the batch-tile block dim to be a multiple
    of 8 (or the whole batch); bigger ro = less input-halo re-read."""
    bt = 8 if b % 8 == 0 else b
    for ro in (8, 4, 2, 1):
        if h % ro == 0 and _estimate(ro, w, bt, c, cm, co) <= _VMEM_BUDGET:
            return ro, bt
    return 0, 0


def vmem_fits(h: int, w: int, b: int, c: int, cm: int, co: int) -> bool:
    if h < 2 or w < 2:
        return False
    ro, bt = _plan(h, w, b, c, cm, co)
    return ro > 0


def _epilogue(acc, b_dq, mul_dq, add, alpha, cast_bf16):
    """models/quantized.py::_epilogue with dq folded through LeakyReLU."""
    y = acc.astype(jnp.float32)
    y = y + b_dq
    y = jnp.where(y >= 0.0, y, alpha * y)
    y = y * mul_dq + add
    if cast_bf16:
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    return y


def _quant(y, inv):
    return jnp.clip(jnp.round(y * inv), -127.0, 127.0).astype(jnp.int8)


def _kernel(x_ref, top_ref, botA_ref, botB_ref, wpw_ref, wfb_ref, wex_ref,
            epi_ref, out_ref, *, ro: int, h: int, w: int, bt: int, c: int,
            cm: int, co: int, alpha: float, cast_bf16: bool):
    jh = pl.program_id(1)
    r0 = jh * ro
    m = w * bt

    def in_row(k):
        """Input row local k (global r0-1+k) as [w, bt, c] s8."""
        if k == 0:
            return top_ref[0]
        if k - 1 < ro:
            return x_ref[k - 1]
        return (botA_ref if k == ro + 1 else botB_ref)[0]

    def pw_row(k):
        """pw output row local k, masked to FB0's zero pad off-image."""
        acc = jax.lax.dot_general(in_row(k).reshape(m, c), wpw_ref[...],
                                  _MM, preferred_element_type=jnp.int32)
        y = _epilogue(acc, epi_ref[0, :cm], epi_ref[1, :cm],
                      epi_ref[2, :cm], alpha, cast_bf16)
        q = _quant(y, epi_ref[3, :cm]).reshape(w, bt, cm)
        g = r0 - 1 + k
        return jnp.where((g >= 0) & (g <= h - 1), q, jnp.zeros_like(q))

    def fb0_row(j, q3_win):
        """FB0 3x3 + residual + quantize for out row local j, from the
        3-row q3 window (rows j-1..j+1 in pw coordinates)."""
        zcol = jnp.zeros((1, bt, cm), jnp.int8)
        acc = None
        for u in range(3):
            row = q3_win[u]
            v0 = jnp.concatenate([zcol, row[:-1]], axis=0)   # cols -1
            v2 = jnp.concatenate([row[1:], zcol], axis=0)    # cols +1
            for vv, tap in enumerate((v0, row, v2)):
                part = jax.lax.dot_general(
                    tap.reshape(m, cm), wfb_ref[u * 3 + vv], _MM,
                    preferred_element_type=jnp.int32)
                acc = part if acc is None else acc + part
        z = _epilogue(acc, epi_ref[4, :c], epi_ref[5, :c], epi_ref[6, :c],
                      alpha, cast_bf16)
        res = (in_row(j + 1).reshape(m, c).astype(jnp.float32)
               * epi_ref[7, :c])
        if cast_bf16:
            res = res.astype(jnp.bfloat16).astype(jnp.float32)
        y = res + z
        if cast_bf16:
            y = y.astype(jnp.bfloat16).astype(jnp.float32)
        q = _quant(y, epi_ref[8, :c]).reshape(w, bt, c)
        # row r0+ro beyond the image is the exit conv's (0,1) zero pad row
        return jnp.where(r0 + j <= h - 1, q, jnp.zeros_like(q))

    def exit_row(j, q4_win):
        """Exit [2,2] window conv for out row local j from q4 rows j, j+1."""
        acc = None
        for t in range(4):
            u, vv = divmod(t, 2)
            tap = q4_win[u]
            if vv == 1:
                tap = jnp.concatenate(
                    [tap[1:], jnp.zeros((1, bt, c), jnp.int8)], axis=0)
            part = jax.lax.dot_general(tap.reshape(m, c), wex_ref[t], _MM,
                                       preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
        y = _epilogue(acc, epi_ref[9, :co], epi_ref[10, :co],
                      epi_ref[11, :co], alpha, cast_bf16)
        out_ref[j] = _quant(y, epi_ref[12, :co]).reshape(w, bt, co)

    # software pipeline: pw leads, FB0 trails 2 rows, exit trails 3
    q3 = [pw_row(0), pw_row(1)]
    q4 = []
    for k in range(2, ro + 3):
        q3.append(pw_row(k))
        q4.append(fb0_row(k - 2, q3[-3:]))
        if len(q4) == 2:
            exit_row(k - 3, q4)
            q4.pop(0)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "cast_bf16", "interpret"))
def s2d_tail_block_q(xq: jnp.ndarray, w_pw: jnp.ndarray, w_fb0: jnp.ndarray,
                     w_exit: jnp.ndarray, epi: jnp.ndarray, *,
                     alpha: float = 0.1, cast_bf16: bool = True,
                     interpret: bool = False) -> jnp.ndarray:
    """s8 [N,H,W,4Ci] (stem2 out) -> s8 [N,H,W,Co] (FeatureBlock_1 input).

    w_pw s8 [4Ci, 4Cm] (lifted block-diagonal 1x1); w_fb0 s8 [9, 4Cm, 4Ci]
    ((u,v) major lifted stride-1 3x3); w_exit s8 [4, 4Ci, Co] ((U,V) major
    lifted exit window). epi f32 [13, 4Ci]:
      0-3   pw:   b/dq, mul*dq, add, 1/s3
      4-8   fb0:  b/dq, mul*dq, add, s2 (residual dequant), 1/s4
      9-12  exit: b/dq, mul*dq, add, 1/s5
    (per-stage rows zero-padded to the widest channel count).
    """
    n, h, w, c = xq.shape
    cm = w_pw.shape[-1]
    co = w_exit.shape[-1]
    ro, bt = _plan(h, w, n, c, cm, co)
    nhb = h // ro

    xt = jnp.transpose(xq, (1, 2, 0, 3))  # bitcast on conv layouts

    def one_row(fn):
        return pl.BlockSpec((1, w, bt, c),
                            lambda ib, jh: (fn(jh), 0, ib, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, ro=ro, h=h, w=w, bt=bt, c=c, cm=cm,
                          co=co, alpha=alpha, cast_bf16=cast_bf16),
        grid=(n // bt, nhb),
        in_specs=[
            pl.BlockSpec((ro, w, bt, c), lambda ib, jh: (jh, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            # halo rows r0-1, r0+ro, r0+ro+1 (clamped; masked in-kernel)
            one_row(lambda jh: jnp.maximum(jh * ro - 1, 0)),
            one_row(lambda jh: jnp.minimum((jh + 1) * ro, h - 1)),
            one_row(lambda jh: jnp.minimum((jh + 1) * ro + 1, h - 1)),
            pl.BlockSpec(w_pw.shape, lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_fb0.shape, lambda ib, jh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_exit.shape, lambda ib, jh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(epi.shape, lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ro, w, bt, co),
                               lambda ib, jh: (jh, 0, ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, n, co), jnp.int8),
        interpret=interpret,
    )(xt, xt, xt, xt, w_pw, w_fb0, w_exit, epi.astype(jnp.float32))
    return jnp.transpose(out, (2, 0, 1, 3))

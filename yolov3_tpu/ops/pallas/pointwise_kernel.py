"""Pallas TPU kernel: quantized 1x1 conv block on the transposed view.

The HLO attribution (DESIGN.md round 3) showed XLA's pointwise fusions at
the 32^2-resolution stage pinned at ~0.47-0.5 ms each at batch 64 —
~10x off both their compute and bandwidth rooflines — while the same
work at 16^2 costs 0.047 ms. The conv-emitter's spatial-major iteration
(M=batch per position) is pathological there, and nothing expressible
from XLA-level JAX escapes it (reshape-to-dot regressed, DESIGN round-2b).

This kernel replaces an int8 1x1 ConvBlock (+ optional requantized
residual add + the next conv's input quantize) with one MXU matmul over
the flattened (W, batch) block and a VPU epilogue.

Layout contract: the wrapper logically transposes [B,H,W,C] ->
[H,W,B,C]. On a tensor an XLA conv produced (layout {3,0,2,1}: bytes
ordered h, w, n, c) that transpose is a BITCAST, and the kernel's
default-layout result, transposed back, is again byte-compatible with
the downstream conv's preferred operand layout — the round-2 "custom
call layout cascade" never happens (measured: scripts/
bench_layout_trick.py — the transposed-view bridge beats both plain XLA
and the untransposed kernel, with fewer copies).

Arithmetic mirrors `models/quantized.py` exactly in sequence:
  t   = rq * s_res (bf16 cast)  + y          [residual variant]
  q   = clip(round(t_f32 * inv_in), ±127) s8 [bf16-input variants]
  acc = q @ w                     (int8 MXU, s32)
  f   = leaky(acc + b/dq) * (mul*dq) + add   (f32, dq folded)
  out = clip(round(bf16(f)_f32 * inv_next), ±127) s8
so outputs match the XLA mirror up to .5-quantization-boundary noise
(the .5-quantization-boundary tolerance class shared by the int8 kernels).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MM = (((1,), (0,)), ((), ()))
# per-instance VMEM budget for auto row-banding (leave headroom under the
# 16M scoped limit for Mosaic temporaries)
_VMEM_BUDGET = 9 * 1024 * 1024


def _plan_rows(h: int, w: int, b: int, cin: int, cout: int,
               has_residual: bool, x_bytes: int) -> int:
    """Largest rows-per-block dividing h whose buffers fit the budget."""
    for rows in range(h, 0, -1):
        if h % rows:
            continue
        m = rows * w * b
        est = (2 * m * cin * x_bytes          # double-buffered input
               + (2 * m * cin if has_residual else 0)
               + 2 * m * cout                  # double-buffered s8 out
               + cin * cout                    # weights
               + 2 * m * max(cin, cout) * 4)   # ~2 f32 temps
        if est <= _VMEM_BUDGET:
            return rows
    return 1


def _kernel(x_ref, w_ref, e_ref, o_ref, *, m: int, cin: int, cout: int,
            alpha: float, quantize_in: bool, emit_bf16: bool,
            rq_ref=None, o2_ref=None):
    """One row band. e_ref [6, max(cin,cout)] f32 rows:
    0: b/dq [cout], 1: mul*dq [cout], 2: add [cout], 3: inv_next [cout],
    4: inv_in [cin] (quantize_in), 5: s_res broadcast [cin] (residual)."""
    if quantize_in:
        t = x_ref[...].reshape(m, cin)
        if rq_ref is not None:
            res = (rq_ref[...].reshape(m, cin).astype(jnp.float32)
                   * e_ref[5, :cin]).astype(jnp.bfloat16)
            t = res + t
        tf = t.astype(jnp.float32) * e_ref[4, :cin]
        q = jnp.clip(jnp.round(tf), -127, 127).astype(jnp.int8)
    else:
        q = x_ref[...].reshape(m, cin)
    acc = jax.lax.dot_general(q, w_ref[...], _MM,
                              preferred_element_type=jnp.int32)
    f = acc.astype(jnp.float32) + e_ref[0, :cout]
    f = jnp.where(f >= 0.0, f, alpha * f)
    f = f * e_ref[1, :cout] + e_ref[2, :cout]
    fb = f.astype(jnp.bfloat16)
    if emit_bf16:
        o2_ref[...] = fb.reshape(o2_ref.shape)
    f = fb.astype(jnp.float32) * e_ref[3, :cout]
    o_ref[...] = jnp.clip(jnp.round(f), -127,
                          127).astype(jnp.int8).reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("alpha", "emit_bf16",
                                             "interpret"))
def pointwise_conv_block_q(x: jnp.ndarray, w: jnp.ndarray,
                           epi: jnp.ndarray,
                           residual_q: Optional[jnp.ndarray] = None,
                           *, alpha: float = 0.2, emit_bf16: bool = False,
                           interpret: bool = False):
    """Quantized 1x1 conv block.

    x [B,H,W,Cin]: s8 (pre-quantized) or bf16 (quantized in-kernel with
    epi row 4). residual_q [B,H,W,Cin] s8 (optional, bf16 x only): added
    as residual after dequant by epi row 5. w [Cin,Cout] s8.
    epi [6, max(Cin,Cout)] f32 (see `_kernel`).
    Returns s8 [B,H,W,Cout] quantized for the next conv, plus the bf16
    conv-block output when `emit_bf16`.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[1]
    quantize_in = x.dtype != jnp.int8
    rows = _plan_rows(h, wd, b, cin, cout, residual_q is not None,
                      1 if x.dtype == jnp.int8 else 2)
    m = rows * wd * b

    xt = jnp.transpose(x, (1, 2, 0, 3))
    operands = [xt, w, epi.astype(jnp.float32)]
    in_specs = [
        pl.BlockSpec((rows, wd, b, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(epi.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(_kernel, m=m, cin=cin, cout=cout, alpha=alpha,
                             quantize_in=quantize_in, emit_bf16=emit_bf16)
    if residual_q is not None:
        operands.append(jnp.transpose(residual_q, (1, 2, 0, 3)))
        in_specs.append(pl.BlockSpec((rows, wd, b, cin),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))

        def kernel(x_ref, w_ref, e_ref, rq_ref, o_ref, *o2):
            kern(x_ref, w_ref, e_ref, o_ref, rq_ref=rq_ref,
                 o2_ref=o2[0] if o2 else None)
    else:
        def kernel(x_ref, w_ref, e_ref, o_ref, *o2):
            kern(x_ref, w_ref, e_ref, o_ref,
                 o2_ref=o2[0] if o2 else None)

    out_shape = [jax.ShapeDtypeStruct((h, wd, b, cout), jnp.int8)]
    out_specs = [pl.BlockSpec((rows, wd, b, cout), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    if emit_bf16:
        out_shape.append(jax.ShapeDtypeStruct((h, wd, b, cout),
                                              jnp.bfloat16))
        out_specs.append(pl.BlockSpec((rows, wd, b, cout),
                                      lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=(h // rows,),
        in_specs=in_specs,
        out_specs=out_specs if emit_bf16 else out_specs[0],
        out_shape=out_shape if emit_bf16 else out_shape[0],
        interpret=interpret,
    )(*operands)

    if emit_bf16:
        return (jnp.transpose(outs[0], (2, 0, 1, 3)),
                jnp.transpose(outs[1], (2, 0, 1, 3)))
    return jnp.transpose(outs, (2, 0, 1, 3))

"""Pallas TPU kernel: a whole FeatureBlock (all reps) in one VMEM-resident
pass.

The reference's feature block (reference/model.py:41-48) is, per rep,

    y = ConvBlock_1x1(x); y = ConvBlock_3x3(y); x = inputs + y

(the residual deliberately re-adds the ORIGINAL block input every rep).
On the XLA path each rep costs three HBM round-trips of the activation
plus three fused-op fixed overheads; profiling the int8 model shows every
1x1 conv pinned at ~0.21-0.29 ms regardless of shape — 10x off roofline —
because the quantize/requant epilogues and HBM traffic dominate tiny
matmuls. This kernel instead keeps the running activation resident in
VMEM across ALL reps: HBM sees one read of x and one write of the result.

Layouts (C always on lanes):
- the running activation IS the output block, flat [H*W, C] bf16 (read
  and updated in place across reps; the input block, resident across the
  rep grid dimension, supplies the original-input residual).
- the quantized 3x3 input lives in a scratch laid out as padded rows of
  width Wp = round8(W+2): q2 row i starts at _SHIFT + (i+1)*Wp, columns
  j < W. A SAME 3x3 conv is then nine tap-matmuls on sublane-offset
  slices (offset (u)*Wp + (v-1)), each [rows*Wp, C/2] @ [C/2, C] on the
  MXU — no im2row materialization, no dynamic lane indexing. The unwritten
  row tails (j >= W) stay zero and serve as BOTH the right-edge pad of row
  j=W-1 and the left-edge pad of the next row's j=0 read, so no masking
  is needed anywhere.

Grid is (batch, reps): the rep dimension streams per-rep weights while the
image blocks and scratch persist (their index maps depend only on the
batch coordinate, so Pallas keeps them resident across reps).

int8 mode mirrors `models/quantized.py::_conv_block`'s arithmetic
sequence (same reciprocal-multiply quantize, same folded-affine BN, bf16
cast before each quantize); bf16 mode is the same wiring with plain bf16
matmuls (the wiring oracle in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# front shift of the q2 scratch so the first tap read (u=0, v=0 -> column
# offset -1) stays in bounds
_SHIFT = 8
# target f32 accumulator footprint per row band (bytes)
_ACC_BUDGET = 1.8 * 1024 * 1024
# scoped-VMEM headroom for the whole kernel instance (hard limit is 16M;
# leave margin for Mosaic temporaries)
VMEM_LIMIT = 14.0 * 1024 * 1024

_MM = (((1,), (0,)), ((), ()))


def _round8(v: int) -> int:
    return (v + 7) // 8 * 8


def _estimate(h: int, w: int, c: int, wp: int, size_q: int,
              band: int) -> int:
    """VMEM bytes: double-buffered in/out image blocks, int8 q2 scratch,
    double-buffered per-rep weights, ~2 band-sized f32 temps."""
    ch = c // 2
    blocks = 4 * h * w * c * 2
    scratch = size_q * ch
    weights = 2 * (9 * ch * c + c * ch)
    temps = 2 * band * wp * c * 4
    return blocks + scratch + weights + temps


def _plan(h: int, w: int, c: int):
    """(padded row width, band rows, scratch rows) for an [h,w,c] block;
    the band shrinks until the whole plan fits the VMEM budget."""
    wp = _round8(w + 2)
    size_q = _round8((h + 2) * wp + _SHIFT + 8)
    band = max(1, min(h, int(_ACC_BUDGET) // (wp * c * 4)))
    while band > 4 and _estimate(h, w, c, wp, size_q, band) > VMEM_LIMIT:
        band = -(-band // 2)
    return wp, band, size_q


def vmem_fits(h: int, w: int, c: int) -> bool:
    wp, band, size_q = _plan(h, w, c)
    return _estimate(h, w, c, wp, size_q, band) <= VMEM_LIMIT


def _kernel(xf_ref, w1_ref, w2_ref, ex_ref, e1_ref, e2_ref, out_ref,
            q2p_ref, *, h: int, w: int, c: int, ch: int, reps: int,
            band: int, wp: int, alpha: float, int8: bool):
    n = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(jnp.logical_and(n == 0, r == 0))
    def _zero():
        q2p_ref[...] = jnp.zeros_like(q2p_ref)

    @pl.when(r == 0)
    def _seed():
        out_ref[...] = xf_ref[...].astype(out_ref.dtype)

    nb = -(-h // band)

    # ---- 1x1 conv block: out (carry) -> q2 scratch (the 3x3's input) ----
    for b in range(nb):
        r0 = b * band
        rows = min(band, h - r0)
        xb = out_ref[0, r0:r0 + rows, :, :].reshape(
            rows * w, c).astype(jnp.float32)
        if int8:
            q = jnp.clip(jnp.round(xb * ex_ref[0, 0, :]), -127, 127)
            acc = jax.lax.dot_general(
                q.astype(jnp.int8), w1_ref[0], _MM,
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            acc = jax.lax.dot_general(
                xb.astype(jnp.bfloat16), w1_ref[0], _MM,
                preferred_element_type=jnp.float32)
        y1 = acc * e1_ref[0, 0, :] + e1_ref[0, 1, :]
        y1 = jnp.where(y1 >= 0.0, y1, alpha * y1)
        y1 = y1 * e1_ref[0, 2, :] + e1_ref[0, 3, :]
        # cast to bf16 FIRST: the XLA mirror quantizes the 3x3 input from
        # the bf16-cast 1x1 output (models/quantized.py::_conv_block)
        y1 = y1.astype(jnp.bfloat16).astype(jnp.float32)
        if int8:
            q2 = jnp.clip(jnp.round(y1 * e1_ref[0, 4, :]), -127,
                          127).astype(jnp.int8)
        else:
            q2 = y1.astype(q2p_ref.dtype)
        q2r = q2.reshape(rows, w, ch)
        for dr in range(rows):  # row starts are Wp-strided: store per row
            q2p_ref[pl.ds(_SHIFT + (r0 + dr + 1) * wp, w), :] = q2r[dr]

    # ---- 3x3 conv block + residual (adds the ORIGINAL block input) ----
    for b in range(nb):
        r0 = b * band
        rows = min(band, h - r0)
        size = rows * wp
        acc = None
        for t in range(9):
            u, v = divmod(t, 3)
            off = _SHIFT + (r0 + u) * wp + v - 1
            sl = q2p_ref[pl.ds(off, size), :]
            part = jax.lax.dot_general(
                sl, w2_ref[0, t], _MM,
                preferred_element_type=jnp.int32 if int8 else jnp.float32)
            acc = part if acc is None else acc + part
        y2 = acc.astype(jnp.float32) * e2_ref[0, 0, :] + e2_ref[0, 1, :]
        y2 = jnp.where(y2 >= 0.0, y2, alpha * y2)
        y2 = y2 * e2_ref[0, 2, :] + e2_ref[0, 3, :]
        # cast BEFORE the residual add: the XLA mirror adds bf16 + bf16
        y2r = y2.astype(out_ref.dtype).reshape(rows, wp, c)[:, 0:w, :]
        out_ref[0, r0:r0 + rows, :, :] = (
            xf_ref[0, r0:r0 + rows, :, :].astype(out_ref.dtype) + y2r)


@functools.partial(jax.jit, static_argnames=("int8", "alpha", "interpret"))
def fused_feature_block(x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray,
                        ex: jnp.ndarray, e1: jnp.ndarray, e2: jnp.ndarray,
                        *, int8: bool, alpha: float = 0.2,
                        interpret: bool = False) -> jnp.ndarray:
    """Run a whole FeatureBlock on [N,H,W,C] activations.

    w1 [R,C,C/2], w2 [R,9,C/2,C]: per-rep 1x1 / 3x3 kernels (int8 when
    `int8`, else any float dtype). ex [R,1,C] f32: 1/act_scale of the 1x1
    input (ignored in bf16 mode). e1 [R,5,C/2] / e2 [R,4,C] f32: epilogue
    rows (dequant_scale, bias, bn_mul, bn_add[, 1/act_scale of the 3x3
    input — e1 only]).
    """
    n, h, w, c = x.shape
    reps, ch = w1.shape[0], w1.shape[2]
    wp, band, size_q = _plan(h, w, c)
    mm_dtype = jnp.int8 if int8 else jnp.bfloat16

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c, ch=ch, reps=reps,
                          band=band, wp=wp, alpha=alpha, int8=int8),
        grid=(n, reps),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, ch), lambda i, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, ch, c), lambda i, r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, ch), lambda i, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, c), lambda i, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i, r: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((size_q, ch), mm_dtype)],
        interpret=interpret,
    )(x, w1.astype(mm_dtype), w2.astype(mm_dtype),
      ex.astype(jnp.float32), e1.astype(jnp.float32),
      e2.astype(jnp.float32))
    return out

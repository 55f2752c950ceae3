"""Pallas TPU kernel for the greedy NMS suppression recurrence.

The sequential recurrence keep[i] = valid[i] AND no kept j < i with
IoU(j, i) > threshold is the only non-parallel part of NMS. TPU grid cells
execute sequentially on a core, so one-class-per-cell kernels serialize the
whole batch x class workload; this kernel processes a CHUNK of classes per
grid cell with every loop step vectorized across the chunk.

Round-3 design (supersedes the round-2 iou-slab kernel):
- IoU is computed INSIDE the kernel from the candidate boxes, one
  box-vs-all row per step. The [B*C, K, K] IoU tensor (134 MB at batch 64,
  K=512) never exists: HBM sees only the [C, 4, K] coordinates, and the
  XLA-side pairwise_iou pass disappears from the serving program.
- Coordinates arrive transposed [C, 4, K] (K on lanes) so every loop step
  is full-width VPU work; box i's scalars are extracted with a one-hot
  lane select + reduce (dynamic LANE indexing is what Mosaic forbids).
- The loop runs only to the max valid-candidate count in the chunk
  (candidates are score-sorted, so valid slots form a prefix): images
  where few boxes pass the score threshold cost proportionally less
  (the round-2 kernel always ran all K iterations).

Matches the host oracle (`yolov3_tpu.ops.boxes.single_class_nms`) exactly:
ties at the threshold survive (strict `>` suppression), and the IoU
arithmetic (max/min corner, clip-at-0 extent, inter/(a_i+a_j-inter))
follows `ops/nms.py::pairwise_iou` op for op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-chunk VMEM budget for the coordinate/working arrays (~10 K-wide f32
# rows per class); keeps the whole launch well under the scoped limit
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024
_MAX_CHUNK = 512


def _suppress_kernel(coords_ref, valid_ref, keep_ref, *,
                     iou_threshold: float, unroll: int):
    """One chunk: coords [C,4,K] f32 (l,t,r,b rows), valid [C,1,K] f32
    -> keep [C,1,K] f32."""
    c, _, k = valid_ref.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c, k), 1)
    l = coords_ref[:, 0, :]
    t = coords_ref[:, 1, :]
    r = coords_ref[:, 2, :]
    b = coords_ref[:, 3, :]
    area = (r - l) * (b - t)                                  # [C, K]
    valid_rows = valid_ref[...].reshape(c, k)                 # [C, K]

    # early exit: slots past the last valid candidate can neither be kept
    # nor suppress anything, so the greedy pass stops at the chunk's max
    # last-valid index + 1 (candidates are score-sorted, so valid slots
    # form a prefix and this equals the max valid count)
    bound = jnp.max(jnp.where(valid_rows > 0.0, col_ids + 1, 0))

    def pick(arr, sel):
        """arr[:, i] as [C, 1] via one-hot lane select + reduce."""
        return jnp.max(jnp.where(sel, arr, -jnp.inf), axis=-1,
                       keepdims=True)

    def body(i, keep):
        sel = col_ids == i
        li, ti, ri, bi = (pick(a, sel) for a in (l, t, r, b))
        ai = pick(area, sel)
        # IoU(box i, all boxes), op-for-op as ops/nms.py::pairwise_iou
        iw = jnp.maximum(jnp.minimum(r, ri) - jnp.maximum(l, li), 0.0)
        ih = jnp.maximum(jnp.minimum(b, bi) - jnp.maximum(t, ti), 0.0)
        inter = iw * ih
        iou = inter / (area + ai - inter)
        # keep[j] for j >= i is still 0 at step i, so "kept & conflicting"
        # alone reproduces the j < i restriction
        conflict = jnp.where(iou > iou_threshold, keep, 0.0)
        suppressed = jnp.max(conflict, axis=-1, keepdims=True)   # [C, 1]
        valid_i = jnp.max(jnp.where(sel, valid_rows, 0.0), axis=-1,
                          keepdims=True)
        keep_i = jnp.where(suppressed > 0.0, 0.0, valid_i)
        return jnp.where(sel, keep_i, keep)

    # manual unroll: `body` applications stay sequential (exact greedy
    # semantics — box i's keep decision lands in `keep` before box i+1's
    # conflict test reads it) but each box's IoU row is keep-independent,
    # so the compiler overlaps the row computations of an unrolled group
    # and the fori_loop bookkeeping amortizes. Overshoot past an odd
    # `bound` is harmless: those lanes have valid == 0 (score-sorted
    # prefix), so keep stays 0 and nothing downstream reads them.
    def group(s, keep):
        i0 = s * unroll
        for u in range(unroll):
            keep = body(i0 + u, keep)
        return keep

    keep_ref[...] = jax.lax.fori_loop(
        0, (bound + unroll - 1) // unroll, group,
        jnp.zeros((c, k), jnp.float32)).reshape(c, 1, k)


def _suppress_kernel_t(coords_ref, valid_ref, keep_ref, *,
                       iou_threshold: float, unroll: int):
    """Transposed ("planes") variant of one chunk: coords [4,K,C] f32
    (l/t/r/b planes with candidate rank K on SUBLANES, classes C on
    lanes), valid [K,C] f32 -> keep [K,C] f32.

    Box i's scalars come out as ONE dynamic sublane slice per plane
    (`coords_ref[p, pl.ds(i, 1), :]` — Mosaic allows dynamic indexing at
    sublane granularity) instead of the row-layout kernel's five one-hot
    lane-select+reduce `pick`s, and the per-step suppression reduction
    runs over SUBLANES (a ~66-op vreg tree at K=512) instead of lanes
    (~160 ops). The loop is VPU-issue-bound, so the per-step op count is
    the wall clock. `keep_ref` (the output block) doubles as the
    recurrence state: row i's decision is stored with a dynamic sublane
    write and re-read by later steps' conflict tests.
    """
    _, k, c = valid_ref.shape
    l = coords_ref[0]                                         # [K, C]
    t = coords_ref[1]
    r = coords_ref[2]
    b = coords_ref[3]
    area = (r - l) * (b - t)                                  # [K, C]
    valid_rows = valid_ref[...].reshape(k, c)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, c), 0)
    bound = jnp.max(jnp.where(valid_rows > 0.0, row_ids + 1, 0))

    keep_ref[...] = jnp.zeros((1, k, c), jnp.float32)

    def body(i, _):
        li = coords_ref[0, pl.ds(i, 1), :]                    # [1, C]
        ti = coords_ref[1, pl.ds(i, 1), :]
        ri = coords_ref[2, pl.ds(i, 1), :]
        bi = coords_ref[3, pl.ds(i, 1), :]
        ai = (ri - li) * (bi - ti)
        # IoU(box i, all boxes), op-for-op as ops/nms.py::pairwise_iou;
        # [1, C] rows broadcast over sublanes for free
        iw = jnp.maximum(jnp.minimum(r, ri) - jnp.maximum(l, li), 0.0)
        ih = jnp.maximum(jnp.minimum(b, bi) - jnp.maximum(t, ti), 0.0)
        inter = iw * ih
        iou = inter / (area + ai - inter)
        keep = keep_ref[...].reshape(k, c)
        # keep[j] for j >= i is still 0 at step i, so "kept & conflicting"
        # alone reproduces the j < i restriction
        conflict = jnp.where(iou > iou_threshold, keep, 0.0)
        suppressed = jnp.max(conflict, axis=0, keepdims=True)  # [1, C]
        valid_i = valid_ref[0, pl.ds(i, 1), :]
        keep_i = jnp.where(suppressed > 0.0, 0.0, valid_i)
        keep_ref[0, pl.ds(i, 1), :] = keep_i
        return 0

    def group(s, carry):
        i0 = s * unroll
        for u in range(unroll):
            carry = body(i0 + u, carry)
        return carry

    jax.lax.fori_loop(0, (bound + unroll - 1) // unroll, group, 0)


@functools.partial(jax.jit,
                   static_argnames=("iou_threshold", "interpret", "unroll"))
def suppress_boxes_pallas_t(cand: jnp.ndarray, valid: jnp.ndarray,
                            iou_threshold: float,
                            interpret: bool = False,
                            unroll: int = 4) -> jnp.ndarray:
    """Transposed-layout twin of `suppress_boxes_pallas` (same contract:
    cand [C, K, 4] score-sorted ltrb, valid [C, K] -> keep [C, K] bool).

    Classes ride the LANE dim and candidate rank the SUBLANE dim, so the
    sequential loop extracts box i with dynamic sublane slices instead of
    one-hot lane reductions. Chunks of up to 128 classes (one lane tile)
    run per grid cell.
    """
    c, k, _ = cand.shape
    coords = jnp.transpose(cand.astype(jnp.float32), (2, 1, 0))  # [4, K, C]
    chunk = min(c, 128)
    pad = (-c) % chunk
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.zeros((4, k, pad), coords.dtype)], axis=-1)
        valid = jnp.concatenate(
            [valid, jnp.zeros((pad, k), valid.dtype)], axis=0)
    total = c + pad
    valid_t = jnp.transpose(valid.astype(jnp.float32), (1, 0)).reshape(
        1, k, total)

    kernel = functools.partial(_suppress_kernel_t,
                               iou_threshold=iou_threshold, unroll=unroll)
    keep = pl.pallas_call(
        kernel,
        grid=(total // chunk,),
        in_specs=[
            pl.BlockSpec((4, k, chunk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, chunk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, chunk), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k, total), jnp.float32),
        interpret=interpret,
    )(coords, valid_t)
    return jnp.transpose(keep.reshape(k, total), (1, 0))[:c] > 0.0


@functools.partial(jax.jit,
                   static_argnames=("iou_threshold", "interpret", "unroll"))
def suppress_boxes_pallas(cand: jnp.ndarray, valid: jnp.ndarray,
                          iou_threshold: float,
                          interpret: bool = False,
                          unroll: int = 4) -> jnp.ndarray:
    """Batched greedy suppression from candidate boxes.

    cand [C, K, 4] ltrb (score-sorted per class), valid [C, K] ->
    keep [C, K] bool. C may fold batch x classes. `interpret=True` runs
    the kernel in Pallas interpreter mode (for CPU tests). `unroll`
    processes that many boxes per sequential loop step (exact semantics
    at any value; saturated [128,512] on TPU measured 2.118/1.662/1.624/
    1.660 ms at unroll 1/2/4/8 — DESIGN.md round-4 ledger).
    """
    c, k, _ = cand.shape
    coords = jnp.moveaxis(cand.astype(jnp.float32), -1, -2)   # [C, 4, K]
    per_class = 10 * k * 4
    chunk = max(1, min(c, _MAX_CHUNK, _VMEM_BUDGET_BYTES // per_class))
    pad = (-c) % chunk
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.zeros((pad, 4, k), coords.dtype)], axis=0)
        valid = jnp.concatenate(
            [valid, jnp.zeros((pad, k), valid.dtype)], axis=0)
    total = c + pad

    kernel = functools.partial(_suppress_kernel, iou_threshold=iou_threshold,
                               unroll=unroll)
    keep = pl.pallas_call(
        kernel,
        grid=(total // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, 1, k), jnp.float32),
        interpret=interpret,
    )(coords, valid.astype(jnp.float32).reshape(total, 1, k))
    return keep.reshape(total, k)[:c] > 0.0


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def greedy_suppress_pallas(iou: jnp.ndarray, valid: jnp.ndarray,
                           iou_threshold: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Round-2 compatibility entry: suppression from a precomputed IoU slab
    iou [C,K,K] + valid [C,K] -> keep [C,K] bool.

    Prefer `suppress_boxes_pallas` (computes IoU in-kernel from the boxes;
    no [C,K,K] materialization). This wrapper keeps the old contract for
    callers that already hold an IoU matrix; it runs the same row-per-step
    recurrence with the early-exit bound.
    """
    c, k, _ = iou.shape
    chunk = max(1, min(c, 4 * 1024 * 1024 // max(k * k * 4, 1)))
    pad = (-c) % chunk
    if pad:
        iou = jnp.concatenate(
            [iou, jnp.zeros((pad, k, k), iou.dtype)], axis=0)
        valid = jnp.concatenate(
            [valid, jnp.zeros((pad, k), valid.dtype)], axis=0)
    total = c + pad

    def kernel(iou_ref, valid_ref, keep_ref):
        cc, _, kk = valid_ref.shape
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (cc, kk), 1)
        valid_rows = valid_ref[...].reshape(cc, kk)
        bound = jnp.max(jnp.where(valid_rows > 0.0, col_ids + 1, 0))

        def body(i, keep):
            rows = iou_ref[:, pl.ds(i, 1), :].reshape(cc, kk)
            conflict = jnp.where(rows > iou_threshold, keep, 0.0)
            suppressed = jnp.max(conflict, axis=1, keepdims=True)
            valid_i = jnp.max(jnp.where(col_ids == i, valid_rows, 0.0),
                              axis=1, keepdims=True)
            keep_i = jnp.where(suppressed > 0.0, 0.0, valid_i)
            return jnp.where(col_ids == i, keep_i, keep)

        keep_ref[...] = jax.lax.fori_loop(
            0, bound, body, jnp.zeros((cc, kk), jnp.float32)).reshape(
                cc, 1, kk)

    keep = pl.pallas_call(
        kernel,
        grid=(total // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, 1, k), jnp.float32),
        interpret=interpret,
    )(iou.astype(jnp.float32),
      valid.astype(jnp.float32).reshape(total, 1, k))
    return keep.reshape(total, k)[:c] > 0.0

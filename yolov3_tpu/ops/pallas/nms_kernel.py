"""Pallas TPU kernel for the greedy NMS suppression recurrence.

The sequential recurrence keep[i] = valid[i] AND no kept j < i with
IoU(j, i) > threshold is the only non-parallel part of NMS. TPU grid cells
execute sequentially on a core, so one-class-per-cell kernels serialize the
whole batch x class workload; this kernel instead processes a CHUNK of
classes per grid cell with every loop step vectorized across the chunk
(row i selected by a one-hot MXU contraction — Mosaic forbids dynamic
per-lane indexing). VMEM sizing picks the largest chunk whose IoU slab
fits in ~8 MB.

Matches the host oracle (`yolov3_tpu.ops.boxes.single_class_nms`) exactly:
ties at the threshold survive (strict `>` suppression).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sized so the double-buffered input slab + the kernel's working copy stay
# under the 16 MB VMEM scoped limit
_VMEM_BUDGET_BYTES = 4 * 1024 * 1024


def _suppress_kernel(iou_ref, valid_ref, keep_ref, *, iou_threshold: float):
    """One chunk: iou [C,K,K] f32, valid [C,1,K] f32 -> keep [C,1,K] f32."""
    c, _, k = valid_ref.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c, k), 1)
    valid_rows = valid_ref[...].reshape(c, k)                # [C, K]

    def body(i, keep):
        # rows_i[c, :] = iou[c, i, :]: dynamic SUBLANE slice (one row per
        # class per step — dynamic LANE indexing is what Mosaic forbids)
        rows = iou_ref[:, pl.ds(i, 1), :].reshape(c, k)
        conflict = jnp.where((rows > iou_threshold) & (col_ids < i),
                             keep, 0.0)
        suppressed = jnp.max(conflict, axis=1, keepdims=True)  # [C, 1]
        valid_i = jnp.max(jnp.where(col_ids == i, valid_rows, 0.0),
                          axis=1, keepdims=True)               # [C, 1]
        keep_i = jnp.where(suppressed > 0.0, 0.0, valid_i)
        return jnp.where(col_ids == i, keep_i, keep)

    keep_ref[...] = jax.lax.fori_loop(
        0, k, body, jnp.zeros((c, k), jnp.float32)).reshape(c, 1, k)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def greedy_suppress_pallas(iou: jnp.ndarray, valid: jnp.ndarray,
                           iou_threshold: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Batched greedy suppression: iou [C,K,K], valid [C,K] -> keep [C,K] bool.

    C may fold batch x classes. `interpret=True` runs the kernel in Pallas
    interpreter mode (for CPU tests); on TPU the compiled kernel is used.
    """
    c, k, _ = iou.shape
    chunk = max(1, min(c, _VMEM_BUDGET_BYTES // max(k * k * 4, 1)))
    pad = (-c) % chunk
    if pad:
        iou = jnp.concatenate(
            [iou, jnp.zeros((pad, k, k), iou.dtype)], axis=0)
        valid = jnp.concatenate(
            [valid, jnp.zeros((pad, k), valid.dtype)], axis=0)
    total = c + pad

    kernel = functools.partial(_suppress_kernel, iou_threshold=iou_threshold)
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

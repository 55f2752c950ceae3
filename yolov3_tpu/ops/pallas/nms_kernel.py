"""Pallas TPU kernel for the greedy NMS suppression recurrence.

The sequential recurrence keep[i] = valid[i] AND no kept j < i with
IoU(j, i) > threshold is the only non-parallel part of NMS. The XLA
formulation (`yolov3_tpu.ops.nms._greedy_suppress`) runs it as a
`fori_loop` of K tiny HLO ops; this kernel runs the whole loop on-core with
the IoU matrix resident in VMEM, one [1, K] VPU row op per step, and no
per-iteration dispatch overhead. Grid dimension 0 walks the class axis so
all classes of one image run in a single kernel launch.

Matches the host oracle (`yolov3_tpu.ops.boxes.single_class_nms`) exactly:
ties at the threshold survive (strict `>` suppression).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _suppress_kernel(iou_ref, valid_ref, keep_ref, *, iou_threshold: float):
    """One class: iou [K,K] f32, valid [1,K] f32 -> keep [1,K] f32.

    Mosaic restricts dynamic per-lane indexing, so row i is selected with a
    one-hot matmul (MXU) and the keep vector is carried through the loop and
    updated with lane masks — no dynamic slices anywhere.
    """
    k = iou_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    valid_row = valid_ref[...]                               # [1, K]
    iou = iou_ref[...]                                       # [K, K]

    def body(i, keep_row):
        onehot = (col_ids == i).astype(jnp.float32)          # [1, K]
        # row i of the (symmetric) IoU matrix via MXU one-hot selection
        row = jnp.dot(onehot, iou, preferred_element_type=jnp.float32)
        conflict = jnp.where((row > iou_threshold) & (col_ids < i),
                             keep_row, 0.0)
        suppressed = jnp.max(conflict) > 0.0
        valid_i = jnp.max(jnp.where(col_ids == i, valid_row, 0.0))
        keep_i = jnp.where(suppressed, 0.0, valid_i)
        return jnp.where(col_ids == i, keep_i, keep_row)

    keep_ref[...] = jax.lax.fori_loop(
        0, k, body, jnp.zeros((1, k), jnp.float32))


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def greedy_suppress_pallas(iou: jnp.ndarray, valid: jnp.ndarray,
                           iou_threshold: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Batched greedy suppression: iou [C,K,K], valid [C,K] -> keep [C,K] bool.

    `interpret=True` runs the kernel in Pallas interpreter mode (for CPU
    tests); on TPU the compiled kernel is used.
    """
    c, k, _ = iou.shape
    kernel = functools.partial(_suppress_kernel, iou_threshold=iou_threshold)
    keep = pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((None, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 1, k), jnp.float32),
        interpret=interpret,
    )(iou.astype(jnp.float32), valid.astype(jnp.float32).reshape(c, 1, k))
    return keep.reshape(c, k) > 0.0

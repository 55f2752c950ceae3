"""On-device non-maximum suppression (fixed-shape, jit/vmap-friendly).

The reference runs greedy NMS on the host in numpy per image per class
(reference/bbox_utils.py:217-271) — O(C * N^2) CPU work after every model
call. On TPU we keep the whole post-process on device:

  scores = sqrt(class_probs * objectness)          # reference score rule
  per class: threshold -> top-K by score -> K x K IoU matrix ->
             greedy suppression as a fori_loop over the sorted candidates

The greedy recurrence keep[i] = valid[i] AND no kept j < i with
IoU(j, i) > threshold is exactly the reference's survivor rule (a candidate
is dropped when its IoU with an already-kept box exceeds the threshold;
ties at the threshold survive), so for N <= K and distinct scores the
device kernel matches `yolov3_tpu.ops.boxes.per_class_nms` bit-for-bit.
Results come back as fixed-size (boxes, scores, keep-mask) arrays; use
`nms_to_host` for the reference's ragged (boxes, scores, labels) output.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def pairwise_iou(boxes: Array) -> Array:
    """IoU matrix [K, K] for ltrb boxes [K, 4] (area = (r-l)*(b-t), no +1)."""
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:4], boxes[None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area[:, None] + area[None, :] - inter)


def _greedy_suppress(iou: Array, valid: Array, iou_threshold: float) -> Array:
    """Sequential greedy keep-mask over score-sorted candidates."""
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        suppressed = jnp.any(keep & (iou[:, i] > iou_threshold) & (idx < i))
        return keep.at[i].set(valid[i] & ~suppressed)

    return jax.lax.fori_loop(0, k, body, jnp.zeros((k,), jnp.bool_))


@functools.partial(jax.jit, static_argnames=("iou_threshold",
                                             "score_threshold", "max_boxes",
                                             "use_pallas"))
def per_class_nms_device(boxes: Array, objectness: Array, class_probs: Array,
                         iou_threshold: float = 0.3,
                         score_threshold: float = 0.1,
                         max_boxes: int = 512,
                         use_pallas: Optional[bool] = None,
                         ) -> Tuple[Array, Array, Array]:
    """Per-class greedy NMS for one image, fully on device.

    boxes [N, 4] ltrb, objectness [N, 1], class_probs [N, C].
    Returns (boxes [C, K, 4], scores [C, K], keep [C, K] bool) with
    candidates score-sorted per class; K = max_boxes caps the per-class
    candidate count (the reference has no cap; candidates beyond K — i.e.
    more than K detections of one class above threshold in one image — are
    dropped lowest-score-first).

    The suppression recurrence runs as a Pallas TPU kernel by default on
    TPU (one launch for all classes, IoU matrices in VMEM) and as an XLA
    fori_loop elsewhere; `use_pallas` forces either path.
    """
    scores_all = jnp.sqrt(class_probs * objectness)  # [N, C]
    k = min(max_boxes, boxes.shape[0])

    def gather(scores: Array) -> Tuple[Array, Array, Array]:
        masked = jnp.where(scores >= score_threshold, scores, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        return boxes[top_idx], top_scores, top_scores >= score_threshold

    cand, top_scores, valid = jax.vmap(gather, in_axes=1, out_axes=0)(
        scores_all)                                  # [C,K,4] [C,K] [C,K]

    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu
    if use_pallas:
        # IoU is computed inside the kernel: the [C,K,K] matrix never
        # materializes in HBM. Transposed ("planes") kernel: 2.63 ->
        # 1.68 ms dense NMS program at b64 vs the row-layout kernel,
        # bit-equal (scripts/bench_nms_kernel_t.py, DESIGN.md round 4)
        from yolov3_tpu.ops.pallas.nms_kernel import suppress_boxes_pallas_t
        keep = suppress_boxes_pallas_t(cand, valid, iou_threshold,
                                       interpret=not on_tpu, unroll=1)
    else:
        ious = jax.vmap(pairwise_iou)(cand)          # [C,K,K]
        keep = jax.vmap(
            lambda m, v: _greedy_suppress(m, v, iou_threshold))(ious, valid)
    return cand, top_scores, keep


def batched_nms_device(detections: Array, num_classes: int,
                       iou_threshold: float = 0.3,
                       score_threshold: float = 0.1,
                       max_boxes: int = 512,
                       min_box_size: Optional[float] = None,
                       use_pallas: Optional[bool] = None,
                       ) -> Tuple[Array, Array, Array]:
    """NMS over a batch of decoded detections [B, N, 4+1+C].

    Optionally applies the strict small-box filter
    (reference/bbox_utils.py:274-281) on device by zeroing those candidates'
    scores. Returns (boxes [B, C, K, 4], scores [B, C, K], keep [B, C, K]).

    On TPU all batch x class suppression problems fold into ONE Pallas
    kernel launch (grid cells on a core run sequentially, so per-class
    launches would serialize the whole batch).
    """
    boxes = detections[..., 0:4]
    objectness = detections[..., 4:5]
    class_probs = detections[..., 5:5 + num_classes]
    if min_box_size is not None:
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        big = ((w > min_box_size) & (h > min_box_size))[..., None]
        objectness = jnp.where(big, objectness, 0.0)

    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu
    b = boxes.shape[0]
    k = min(max_boxes, boxes.shape[1])

    # top_k over a FOLDED [B*C, N] operand: sorting [B, C, N] puts C=2 on
    # the sublane dim (tiling T(2,128) — 2 of 8 sublanes live) and the
    # sort measured 4.16 ms in the serving graph; the same sort folded to
    # [B*C, N] tiles T(8,128) and costs ~1.3 ms (DESIGN.md round-3
    # serving NMS note). The fold is a bitcast on the contiguous
    # transposed scores.
    c = class_probs.shape[-1]
    scores_all = jnp.sqrt(jnp.transpose(class_probs, (0, 2, 1))
                          * objectness[..., 0][:, None, :])  # [B, C, N]
    flat = scores_all.reshape(b * c, -1)                     # [B*C, N]
    masked = jnp.where(flat >= score_threshold, flat, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked, k)           # [B*C, K]
    top_scores = top_scores.reshape(b, c, k)
    top_idx = top_idx.reshape(b, c, k)
    # ONE flat row gather with globalized indices, NOT take_along_axis
    # over a transposed [B, 4, N] view (XLA scalarizes that to 3.1 ms)
    # and NOT a nested-vmap per-(b,c) row gather (0.45 ms): the single
    # [B*C*K]-row gather over boxes.reshape(B*N, 4) measured 2.665 vs
    # 3.107 ms for the whole NMS program (scripts/bench_nms_gather.py,
    # dense b64, bit-equal outputs)
    n = boxes.shape[1]
    gidx = top_idx + (jnp.arange(b, dtype=top_idx.dtype) * n)[:, None, None]
    cand = boxes.reshape(b * n, 4)[gidx.reshape(-1)].reshape(
        b, c, k, 4)                                          # [B, C, K, 4]
    valid = top_scores >= score_threshold

    if use_pallas:
        # all batch x class problems in one launch; IoU computed in-kernel
        # from the boxes (the [B,C,K,K] slab — 134 MB at batch 64 — never
        # exists in HBM). Transposed ("planes") kernel, unroll=1: 2.63 ->
        # 1.68 ms dense NMS program at b64 vs the row-layout kernel,
        # bit-equal (scripts/bench_nms_kernel_t.py, DESIGN.md round 4)
        from yolov3_tpu.ops.pallas.nms_kernel import suppress_boxes_pallas_t
        keep = suppress_boxes_pallas_t(
            cand.reshape(b * num_classes, k, 4),
            valid.reshape(b * num_classes, k),
            iou_threshold, interpret=not on_tpu, unroll=1)
        keep = keep.reshape(b, num_classes, k)
    else:
        ious = jax.vmap(jax.vmap(pairwise_iou))(cand)    # [B, C, K, K]
        keep = jax.vmap(jax.vmap(
            lambda m, v: _greedy_suppress(m, v, iou_threshold)))(ious, valid)
    return cand, top_scores, keep


_saturation_warned = False


def warn_if_saturated(cand_scores: np.ndarray) -> bool:
    """One-time operator warning when the fixed top-K candidate list filled.

    The device NMS caps candidates at K = max_boxes per class per image and
    silently drops lower-scored ones beyond K; the reference's host NMS has
    no cap. Below-threshold slots carry the -1.0 sentinel, so a class whose
    LAST (lowest) candidate score is non-negative had >= K above-threshold
    candidates — detections may have been truncated. Returns True when
    saturated. (If max_boxes already covers every decoded box nothing can be
    dropped; saturation then just means "every box was above threshold".)
    """
    global _saturation_warned
    saturated = bool((np.asarray(cand_scores)[..., -1] >= 0).any())
    if saturated and not _saturation_warned:
        _saturation_warned = True
        print("WARNING: device NMS candidate list saturated (>= max_boxes "
              "above-score-threshold detections in one class); detections "
              "may have been dropped — raise --max-boxes.")
    return saturated


def nms_to_host(cand_boxes, cand_scores, keep
                ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray],
                           Optional[np.ndarray]]:
    """Convert one image's fixed-size device NMS output to the reference's
    ragged (boxes [M,4], scores [M], labels [M]) — or (None, None, None)
    when nothing survives (reference/bbox_utils.py:264-271)."""
    cand_boxes = np.asarray(cand_boxes)
    cand_scores = np.asarray(cand_scores)
    keep = np.asarray(keep)
    warn_if_saturated(cand_scores)
    out_b, out_s, out_l = [], [], []
    for c in range(cand_boxes.shape[0]):
        sel = keep[c]
        if sel.any():
            out_b.append(cand_boxes[c][sel])
            out_s.append(cand_scores[c][sel])
            out_l.append(np.full(int(sel.sum()), c, dtype=np.int32))
    if not out_b:
        return None, None, None
    return (np.concatenate(out_b), np.concatenate(out_s),
            np.concatenate(out_l))

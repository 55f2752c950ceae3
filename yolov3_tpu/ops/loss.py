"""YOLOv3 four-component loss (xy, wh, objectness, class).

Exact reimplementation of reference/model.py:214-354 with every quirk kept,
reformulated for XLA with static shapes:

- The reference builds its ignore mask by boolean-masking the label grid to
  the V valid GT slots and broadcasting IoU against them
  (reference/model.py:256-282). Those V "true boxes" have xy forced to (0,0)
  and wh forced to the anchor sizes, so across the whole batch they take at
  most `num_anchors` DISTINCT values: anchor-sized boxes centered at the
  origin. We therefore compute IoU of every prediction against each of the A
  anchor-priors-at-origin and max over the anchors that actually appear in
  the batch's GT (a bitmask reduction) — bit-identical to the reference's
  dynamic-shape version, including the V=0 edge case where TF's reduce_max
  over an empty axis yields -inf (-inf < 0.5 everywhere => NOTHING is
  ignored: every negative cell contributes to the objectness loss).
- xy loss is MSE in logit space: both targets and predictions are mapped
  back through a clipped (0.01, 0.99) inverted sigmoid
  (reference/model.py:310-333).
- wh loss is MSE of log(wh / anchor) with a zeros->ones guard and a
  [1e-9, 1e9] clip (reference/model.py:335-345).
- Per-scale sums are divided by the LOCAL batch dimension
  (reference/model.py:236-237), then the caller divides the total by the
  GLOBAL batch size (reference/model.py:492) — both divisors are explicit
  here so single-chip and multi-chip runs reproduce the reference's scaling.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolov3_tpu.ops.decode import reorg_feature_map

Array = jnp.ndarray

XY_CLIP = 0.01  # reference/model.py:326
WH_LOG_CLIP_MIN = 1e-9  # reference/model.py:344
WH_LOG_CLIP_MAX = 1e9
IGNORE_IOU_THRESHOLD = 0.5  # YOLOv3 paper rule (reference/model.py:273)


class YoloLoss(NamedTuple):
    total: Array
    xy: Array
    wh: Array
    objectness: Array
    class_: Array


def _sigmoid_ce(labels: Array, logits: Array) -> Array:
    """tf.nn.sigmoid_cross_entropy_with_logits: max(x,0) - x*z + log1p(exp(-|x|))."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _inverse_sigmoid(p: Array) -> Array:
    """-log(1/p - 1), the reference's explicit sigmoid inversion
    (reference/model.py:331-333)."""
    return -jnp.log(1.0 / p - 1.0)


def _anchor_prior_iou(pred_xy: Array, pred_wh: Array,
                      anchors: Array, anchor_present: Array) -> Array:
    """Best IoU of each prediction against the batch-present anchor priors.

    pred_xy/pred_wh: [B, gh, gw, A, 2] absolute-pixel centers / sizes.
    anchors: [A, 2]; anchor_present: [A] bool — anchor slots holding >=1 GT
    anywhere in the batch (the distinct values the reference's V masked true
    boxes can take; see module docstring).

    Returns best_iou [B, gh, gw, A], -inf where no anchor is present.
    """
    # prior k: corners (-a_k/2, +a_k/2); pred corners from decoded box
    pred_min = (pred_xy - pred_wh / 2.0)[..., None, :]   # [B,gh,gw,A,1,2]
    pred_max = (pred_xy + pred_wh / 2.0)[..., None, :]
    prior_min = (-anchors / 2.0)[None, None, None, None, :, :]  # [1,1,1,1,A,2]
    prior_max = (anchors / 2.0)[None, None, None, None, :, :]

    inter_min = jnp.maximum(pred_min, prior_min)
    inter_max = jnp.minimum(pred_max, prior_max)
    inter_wh = jnp.maximum(inter_max - inter_min, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]          # [B,gh,gw,A,A]

    pred_area = (pred_wh[..., 0] * pred_wh[..., 1])[..., None]
    prior_area = (anchors[:, 0] * anchors[:, 1])[None, None, None, None, :]
    iou = inter / (pred_area + prior_area - inter)

    neg_inf = jnp.float32(-jnp.inf)
    masked = jnp.where(anchor_present[None, None, None, None, :], iou, neg_inf)
    return jnp.max(masked, axis=-1)


def loss_layer(feature_map: Array, gt_grid: Array,
               anchors: Sequence[Tuple[float, float]],
               number_classes: int, stride: int,
               ) -> Tuple[Array, Array, Array, Array]:
    """Per-scale loss quadruple (xy, wh, objectness, class).

    feature_map: NHWC [B, gh, gw, A*(5+C)] raw network output.
    gt_grid: [B, gh, gw, A, 5+C] dense label grid (absolute-pixel boxes,
    objectness flag, one-hot classes) as produced by the label encoder.
    """
    anchors_arr = jnp.asarray(anchors, dtype=jnp.float32)
    batch_size = jnp.float32(feature_map.shape[0])
    gt_grid = gt_grid.astype(jnp.float32)

    xy_offset, pred_boxes, pred_obj_logits, pred_class_logits = (
        reorg_feature_map(feature_map, anchors, number_classes, stride))

    object_mask = gt_grid[..., 4:5]                      # [B,gh,gw,A,1]
    pred_xy = pred_boxes[..., 0:2]
    pred_wh = pred_boxes[..., 2:4]

    # ---- objectness -------------------------------------------------------
    anchor_present = jnp.any(object_mask[..., 0] > 0, axis=(0, 1, 2))  # [A]
    best_iou = _anchor_prior_iou(pred_xy, pred_wh, anchors_arr, anchor_present)
    ignore_mask = (best_iou < IGNORE_IOU_THRESHOLD).astype(jnp.float32)[..., None]

    valid_mask = object_mask + (1.0 - object_mask) * ignore_mask
    valid_mask = jax.lax.stop_gradient(valid_mask)
    obj_labels = jax.lax.stop_gradient(object_mask)
    objectness_loss = valid_mask * _sigmoid_ce(obj_labels, pred_obj_logits)
    objectness_loss = jnp.sum(objectness_loss) / batch_size

    # ---- class ------------------------------------------------------------
    class_loss = object_mask * _sigmoid_ce(gt_grid[..., 5:], pred_class_logits)
    class_loss = jnp.sum(class_loss) / batch_size

    # ---- xy (logit-space MSE) ---------------------------------------------
    true_xy = gt_grid[..., 0:2] / float(stride) - xy_offset
    pred_cell_xy = pred_xy / float(stride) - xy_offset
    true_xy = jnp.clip(true_xy, XY_CLIP, 1.0 - XY_CLIP)
    pred_cell_xy = jnp.clip(pred_cell_xy, XY_CLIP, 1.0 - XY_CLIP)
    true_txy = jax.lax.stop_gradient(_inverse_sigmoid(true_xy))
    pred_txy = _inverse_sigmoid(pred_cell_xy)
    xy_loss = jnp.sum(jnp.square(true_txy - pred_txy) * object_mask) / batch_size

    # ---- wh (log-space MSE) -----------------------------------------------
    true_twh = gt_grid[..., 2:4] / anchors_arr
    pred_twh = pred_wh / anchors_arr
    true_twh = jnp.where(true_twh == 0.0, jnp.ones_like(true_twh), true_twh)
    pred_twh = jnp.where(pred_twh == 0.0, jnp.ones_like(pred_twh), pred_twh)
    true_twh = jnp.log(jnp.clip(true_twh, WH_LOG_CLIP_MIN, WH_LOG_CLIP_MAX))
    pred_twh = jnp.log(jnp.clip(pred_twh, WH_LOG_CLIP_MIN, WH_LOG_CLIP_MAX))
    true_twh = jax.lax.stop_gradient(true_twh)
    wh_loss = jnp.sum(jnp.square(true_twh - pred_twh) * object_mask) / batch_size

    return xy_loss, wh_loss, objectness_loss, class_loss


def compute_loss(feature_maps: Sequence[Array], gt_grids: Sequence[Array],
                 anchors: Sequence[Tuple[float, float]],
                 number_classes: int,
                 strides: Sequence[int] = (32, 16, 8)) -> YoloLoss:
    """Sum the four components over all scales (reference/model.py:214-228)."""
    loss_xy = loss_wh = loss_obj = loss_class = jnp.float32(0.0)
    for fm, gt, stride in zip(feature_maps, gt_grids, strides):
        xy, wh, obj, cls = loss_layer(fm, gt, anchors, number_classes, stride)
        loss_xy = loss_xy + xy
        loss_wh = loss_wh + wh
        loss_obj = loss_obj + obj
        loss_class = loss_class + cls
    total = loss_xy + loss_wh + loss_obj + loss_class
    return YoloLoss(total, loss_xy, loss_wh, loss_obj, loss_class)


def l2_regularization(params, weight_decay: float) -> Array:
    """Keras-style L2 kernel penalty: wd * sum(w^2) over conv kernels.

    The reference DEFINES these regularizers (reference/model.py:37,117) but
    its custom training loop never adds `model.losses`
    (reference/model.py:485-492), so they are inert there. Provided for the
    opt-in `TrainConfig.apply_weight_decay` path.
    """
    total = jnp.float32(0.0)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        if "kernel" in name:
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return weight_decay * total

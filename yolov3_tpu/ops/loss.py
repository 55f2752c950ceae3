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
import numpy as np

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


def loss_layer_packed(feature_map: Array, gt_grid: Array,
                      anchors: Sequence[Tuple[float, float]],
                      number_classes: int, stride: int,
                      ) -> Tuple[Array, Array, Array, Array]:
    """`loss_layer` computed entirely in the packed lane domain.

    Same math and quadruple as `loss_layer`, but every intermediate stays
    on the feature map's native [B, gh, gw, A*(5+C)] layout — per-lane
    selected elementwise ops, within-block rolls, and constant [L, L]
    matmuls for block broadcasts — instead of the 5D
    [B, gh, gw, A, 5+C] slice/stack tensors. The round-3 train profile
    attributed ~7-8 ms of the 47 ms bf16 step to dozens of 0.3-0.9 ms
    fusions over those 5D 7-lane tensors (DESIGN.md round-3 train
    profile); this formulation is the train-side twin of
    `ops/decode._decode_fm_packed`.

    Float-op sequence per lane matches `loss_layer` (same clips, guards,
    CE formula, division order); only reduction order differs, so results
    agree to float32 reduction tolerance, not bit-exactly.
    """
    num_anchors = len(anchors)
    d = 5 + number_classes
    lanes = num_anchors * d
    batch_size = jnp.float32(feature_map.shape[0])
    n, gh, gw, _ = feature_map.shape
    f = feature_map.astype(jnp.float32)
    g = gt_grid.astype(jnp.float32).reshape(n, gh, gw, lanes)

    k = np.arange(lanes)
    r = k % d
    is_x, is_y = jnp.asarray(r == 0), jnp.asarray(r == 1)
    is_xy = jnp.asarray(r < 2)
    is_wh = jnp.asarray((r >= 2) & (r < 4))
    is_obj = jnp.asarray(r == 4)
    is_cls = jnp.asarray(r >= 5)

    # object mask broadcast to every lane of its anchor block: a constant
    # [L, L] 0/1 matmul (g is the label input — no gradient flows here)
    bcast = np.zeros((lanes, lanes), np.float32)
    for i in range(lanes):
        bcast[(i // d) * d + 4, i] = 1.0
    om = g @ jnp.asarray(bcast)                      # [n,gh,gw,L]

    # prediction decode on xy/wh lanes (identical fp ops to
    # reorg_feature_map: (sigmoid+off)*stride, exp*anchor)
    col = jax.lax.broadcasted_iota(jnp.float32, (gh, gw, 1), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (gh, gw, 1), 0)
    off = jnp.where(is_x, col, jnp.where(is_y, row, 0.0))
    anchor_plane = np.ones(lanes, np.float32)
    for a, (aw, ah) in enumerate(anchors):
        anchor_plane[a * d + 2] = aw
        anchor_plane[a * d + 3] = ah
    anchor_plane = jnp.asarray(anchor_plane)
    s = jax.nn.sigmoid(f)
    # exp only where consumed: raw exp on obj/class lanes can overflow to
    # inf, and 0*inf in the where-VJP would poison the gradient
    e = jnp.exp(jnp.where(is_wh, f, 0.0))
    dec = jnp.where(is_xy, (s + off) * float(stride),
                    jnp.where(is_wh, e * anchor_plane, 0.0))

    # ---- objectness ignore mask: best IoU vs batch-present anchor priors
    present = jnp.max(g * is_obj.astype(jnp.float32), axis=(0, 1, 2))  # [L]
    half = 0.5 * jnp.roll(dec, -2, axis=-1)          # xy lanes see wh/2
    pmin, pmax = dec - half, dec + half              # corners on xy lanes
    # pred area on x lanes (x sees w via -2, h via -3)
    pa = jnp.roll(dec, -2, axis=-1) * jnp.roll(dec, -3, axis=-1)
    neg_inf = jnp.float32(-jnp.inf)
    best_iou = jnp.full_like(f, neg_inf)
    for a, (aw, ah) in enumerate(anchors):
        prior_half = jnp.where(is_x, 0.5 * float(aw),
                               jnp.where(is_y, 0.5 * float(ah), 0.0))
        imin = jnp.maximum(pmin, -prior_half)
        imax = jnp.minimum(pmax, prior_half)
        iwh = jnp.maximum(imax - imin, 0.0)
        inter = iwh * jnp.roll(iwh, -1, axis=-1)     # x lanes: inter area
        iou = inter / (pa + float(aw) * float(ah) - inter)
        iou = jnp.where(present[a * d + 4] > 0, iou, neg_inf)
        best_iou = jnp.maximum(best_iou, iou)
    # move best IoU from each block's x lane onto its obj lane
    ignore = (jnp.roll(best_iou, 4, axis=-1)
              < IGNORE_IOU_THRESHOLD).astype(jnp.float32)

    valid = jax.lax.stop_gradient(om + (1.0 - om) * ignore)
    ce = _sigmoid_ce(jax.lax.stop_gradient(g), f)    # obj + class lanes

    # ---- xy (logit-space MSE), identical clip/inversion sequence
    true_xy = jnp.clip(g / float(stride) - off, XY_CLIP, 1.0 - XY_CLIP)
    pred_xy = jnp.clip(dec / float(stride) - off, XY_CLIP, 1.0 - XY_CLIP)
    xy_sq = jnp.square(jax.lax.stop_gradient(_inverse_sigmoid(true_xy))
                       - _inverse_sigmoid(pred_xy))

    # ---- wh (log-space MSE) with the zeros->ones guard
    true_twh = g / anchor_plane
    pred_twh = dec / anchor_plane
    true_twh = jnp.where(true_twh == 0.0, 1.0, true_twh)
    pred_twh = jnp.where(pred_twh == 0.0, 1.0, pred_twh)
    true_twh = jnp.log(jnp.clip(true_twh, WH_LOG_CLIP_MIN, WH_LOG_CLIP_MAX))
    pred_twh = jnp.log(jnp.clip(pred_twh, WH_LOG_CLIP_MIN, WH_LOG_CLIP_MAX))
    wh_sq = jnp.square(jax.lax.stop_gradient(true_twh) - pred_twh)

    # per-lane contributions, then one matmul-reduce into the 4 components
    contrib = jnp.where(is_xy, om * xy_sq,
                        jnp.where(is_wh, om * wh_sq,
                                  jnp.where(is_obj, valid * ce,
                                            jnp.where(is_cls, om * ce,
                                                      0.0))))
    comp = np.zeros((lanes, 4), np.float32)          # xy, wh, obj, class
    comp[r < 2, 0] = 1.0
    comp[(r >= 2) & (r < 4), 1] = 1.0
    comp[r == 4, 2] = 1.0
    comp[r >= 5, 3] = 1.0
    sums = jnp.einsum("bhwl,lc->c", contrib, jnp.asarray(comp)) / batch_size
    return sums[0], sums[1], sums[2], sums[3]


def compute_loss(feature_maps: Sequence[Array], gt_grids: Sequence[Array],
                 anchors: Sequence[Tuple[float, float]],
                 number_classes: int,
                 strides: Sequence[int] = (32, 16, 8),
                 packed: bool = False) -> YoloLoss:
    """Sum the four components over all scales (reference/model.py:214-228).

    `packed` selects the lane-domain implementation (`loss_layer_packed`) —
    same math on the feature map's native layout, float32-reduction-level
    agreement with the 5D formulation."""
    layer = loss_layer_packed if packed else loss_layer
    loss_xy = loss_wh = loss_obj = loss_class = jnp.float32(0.0)
    for fm, gt, stride in zip(feature_maps, gt_grids, strides):
        xy, wh, obj, cls = layer(fm, gt, anchors, number_classes, stride)
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

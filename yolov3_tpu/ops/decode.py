"""Pure-function YOLO box decode (the reference's "reorg layer").

Parity target: reference/model.py:122-212. Math, ordering, and output layout
are identical; the implementation is NHWC and jit/vmap/shard_map friendly
(no Python control flow on traced values, static shapes throughout).

Decode rule per cell/anchor (YOLOv3 paper):
    b_x = (sigmoid(t_x) + c_x) * stride
    b_y = (sigmoid(t_y) + c_y) * stride
    b_w = anchor_w * exp(t_w)
    b_h = anchor_h * exp(t_h)

The reference's per-scale `stride` is always the scalar downsample factor
(img_size // grid_size gives 32/16/8 exactly because grids are derived from
the image size), so a scalar stride is exact.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def reorg_feature_map(feature_map: jnp.ndarray,
                      anchors: Sequence[Tuple[float, float]],
                      number_classes: int,
                      stride: int,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode one NHWC feature map [N, gh, gw, A*(5+C)].

    Returns (xy_offset [gh,gw,1,2], boxes [N,gh,gw,A,4] as absolute-pixel
    (cx, cy, w, h), objectness_logits [N,gh,gw,A,1], class_logits
    [N,gh,gw,A,C]) — the same quadruple as reference/model.py:122-167.
    """
    num_anchors = len(anchors)
    n, gh, gw, _ = feature_map.shape
    # decode math runs in float32 regardless of network compute dtype
    # (reference/model.py:133 casts the feature map to float32)
    fm = feature_map.astype(jnp.float32)
    fm = fm.reshape(n, gh, gw, num_anchors, 5 + number_classes)

    box_txy = fm[..., 0:2]
    box_twh = fm[..., 2:4]
    objectness_logits = fm[..., 4:5]
    class_logits = fm[..., 5:]

    # cell offsets: channel 0 is the column (x), channel 1 the row (y)
    # (reference/model.py:141-148)
    col = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    xy_offset = jnp.stack([col, row], axis=-1).reshape(gh, gw, 1, 2)

    anchors_arr = jnp.asarray(anchors, dtype=jnp.float32)  # [A, 2] = (w, h)
    box_xy = (jax.nn.sigmoid(box_txy) + xy_offset) * float(stride)
    box_wh = jnp.exp(box_twh) * anchors_arr
    boxes = jnp.concatenate([box_xy, box_wh], axis=-1)
    return xy_offset, boxes, objectness_logits, class_logits


def decode_detections(feature_maps: Sequence[jnp.ndarray],
                      anchors: Sequence[Tuple[float, float]],
                      number_classes: int,
                      strides: Sequence[int] = (32, 16, 8),
                      ) -> jnp.ndarray:
    """Decode all scales into inference detections [N, num_boxes, 4+1+C].

    Output rows are [x0, y0, x1, y1, objectness, class_probs...] with corners
    deliberately unclipped (reference/model.py:169-212 comments the clip out;
    host post-processing clips).
    """
    boxes_all: List[jnp.ndarray] = []
    obj_all: List[jnp.ndarray] = []
    probs_all: List[jnp.ndarray] = []
    num_anchors = len(anchors)

    for fm, stride in zip(feature_maps, strides):
        _, boxes, obj_logits, class_logits = reorg_feature_map(
            fm, anchors, number_classes, stride)
        n, gh, gw = boxes.shape[0], boxes.shape[1], boxes.shape[2]
        flat = gh * gw * num_anchors
        boxes_all.append(boxes.reshape(n, flat, 4))
        obj_all.append(jax.nn.sigmoid(obj_logits.reshape(n, flat, 1)))
        probs_all.append(jax.nn.sigmoid(class_logits.reshape(n, flat, number_classes)))

    boxes = jnp.concatenate(boxes_all, axis=1)
    objectness = jnp.concatenate(obj_all, axis=1)
    class_probs = jnp.concatenate(probs_all, axis=1)

    half_wh = boxes[..., 2:4] / 2.0
    corners = jnp.concatenate(
        [boxes[..., 0:2] - half_wh, boxes[..., 0:2] + half_wh], axis=-1)
    return jnp.concatenate([corners, objectness, class_probs], axis=-1)

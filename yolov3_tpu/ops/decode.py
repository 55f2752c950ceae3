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

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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


def _decode_fm_packed(fm: jnp.ndarray,
                      anchors: Sequence[Tuple[float, float]],
                      number_classes: int, stride: int,
                      anchor_pad: int = 0) -> jnp.ndarray:
    """One scale's full decode WITHOUT unpacking the channel dim.

    Identical math to `reorg_feature_map` + sigmoid + corner conversion,
    but expressed as per-lane-selected elementwise ops on the packed
    [N, gh, gw, A*(5+C)] layout: the 5D slice/concat intermediates (2- and
    4-lane tensors that force relayout copies on TPU) never materialize.

    `anchor_pad` (dp): the feature map carries dp channels per anchor with
    the real (5+C) in the first lanes of each dp block and don't-care
    values in the rest (the head-conv Co-padding that keeps the head conv
    out of the 14-lane batch-minor layout trap — zero weights there, so
    the pad lanes cost nothing and are sliced away at the end). 0 means
    unpadded (dp = 5+C). Per real lane the op sequence is identical, so
    padded and unpadded decode are bit-equal.

    Returns [N, gh*gw*A, 5+C] rows [x0,y0,x1,y1,obj,probs...]."""
    num_anchors = len(anchors)
    d = 5 + number_classes
    dp = anchor_pad or d
    assert dp >= d
    n, gh, gw, _ = fm.shape
    f = fm.astype(jnp.float32)

    k = np.arange(num_anchors * dp) % dp
    is_xy = jnp.asarray(k < 2)
    is_wh = jnp.asarray((k >= 2) & (k < 4))
    # cell offsets: lane k==0 is the column (x), k==1 the row (y)
    col = jax.lax.broadcasted_iota(jnp.float32, (gh, gw, 1), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (gh, gw, 1), 0)
    off = jnp.where(jnp.asarray(k == 0), col, jnp.where(
        jnp.asarray(k == 1), row, 0.0))          # [gh, gw, A*dp]
    anchor_plane = np.ones(num_anchors * dp, np.float32)
    for a, (aw, ah) in enumerate(anchors):
        anchor_plane[a * dp + 2] = aw
        anchor_plane[a * dp + 3] = ah
    anchor_plane = jnp.asarray(anchor_plane)

    s = jax.nn.sigmoid(f)
    e = jnp.exp(f)
    dec = jnp.where(is_xy, (s + off) * float(stride),
                    jnp.where(is_wh, e * anchor_plane, s))
    # corners: x0y0 (lanes 0,1) = cxcy - wh/2; x1y1 (lanes 2,3) = cxcy + wh/2
    # (rolls by 2 stay within each anchor's dp-lane block for the lanes
    # selected; other lanes are discarded by the where)
    fwd = jnp.roll(dec, -2, axis=-1)  # lane k sees k+2 (wh from xy lanes)
    bwd = jnp.roll(dec, 2, axis=-1)   # lane k sees k-2 (cx cy from wh lanes)
    out = jnp.where(is_xy, dec - 0.5 * fwd,
                    jnp.where(is_wh, bwd + 0.5 * dec, dec))
    out = out.reshape(n, gh * gw * num_anchors, dp)
    return out if dp == d else out[..., :d]


def decode_detections(feature_maps: Sequence[jnp.ndarray],
                      anchors: Sequence[Tuple[float, float]],
                      number_classes: int,
                      strides: Sequence[int] = (32, 16, 8),
                      anchor_pad: int = 0,
                      ) -> jnp.ndarray:
    """Decode all scales into inference detections [N, num_boxes, 4+1+C].

    Output rows are [x0, y0, x1, y1, objectness, class_probs...] with corners
    deliberately unclipped (reference/model.py:169-212 comments the clip out;
    host post-processing clips). Rows are ordered (scale, cell, anchor)
    exactly as the reference flattens them. `anchor_pad`: per-anchor channel
    count of Co-padded feature maps (see `_decode_fm_packed`); 0 = unpadded.
    """
    return jnp.concatenate(
        [_decode_fm_packed(fm, anchors, number_classes, stride, anchor_pad)
         for fm, stride in zip(feature_maps, strides)], axis=1)

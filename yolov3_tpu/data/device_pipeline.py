"""On-device (jit) augmentation, normalization, and label encoding.

The reference augments and YOLO-encodes every example in host worker
processes (reference/imagereader.py:326-411) — numpy/scipy on CPU. On a TPU
host the accelerator can do this work instead: this module implements the
whole per-batch preprocessing chain as one jittable function, so the host
workers only decode records and the TPU performs

  reflect / anisotropic-scale / crop warp -> box affine + cull ->
  noise -> blur -> per-image z-score -> dense YOLO label grids

with `jax.random` RNG. Semantics mirror `yolov3_tpu.data.augment` and
`yolov3_tpu.data.encoder` (same parameter ranges, culls, and grid-write
rules); image resampling is bilinear like the host path but not
bit-identical to scipy/cv2 kernels. Boxes travel as fixed-size [M, 5]
arrays with a validity mask (XLA static shapes).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.config import AugmentConfig
from yolov3_tpu.data.augment import BOX_MIN_EXTENT
# re-exported for backward compatibility; defined in encoder so reader
# workers can pad boxes without importing JAX
from yolov3_tpu.data.encoder import MAX_BOXES, pad_boxes  # noqa: F401

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _interp_axis(img: Array, coords: Array, axis: int, size: int) -> Array:
    """1-D linear interpolation along `axis` at float `coords` [size].

    Uses whole-row/column gathers (jnp.take on an index VECTOR), which XLA
    lowers to wide slices — a 2-D gather with per-pixel indices would
    scalarize on TPU (measured ~800 ms/batch vs ~ms for the separable form).
    """
    coords = jnp.clip(coords, 0.0, size - 1.0)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, size - 1)
    frac = coords - lo
    shape = [1, 1, 1]
    shape[axis] = coords.shape[0]
    frac = frac.reshape(shape)
    a = jnp.take(img, lo, axis=axis)
    b = jnp.take(img, hi, axis=axis)
    return a * (1.0 - frac) + b * frac


def _warp_image(img: Array, scale_y: Array, scale_x: Array, dy: Array,
                dx: Array, reflect_x: Array, reflect_y: Array) -> Array:
    """Rescale-by-(sy,sx) -> crop at (dy,dx) -> flips, as a separable
    bilinear warp (the affine has no rotation, so rows and columns resample
    independently).

    Equivalent of reference/augment.py:275-298 with the crop size equal to
    the image size (the training-reader case, reference/imagereader.py:368).
    """
    h, w = img.shape[0], img.shape[1]
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.where(reflect_y, rows[::-1], rows)
    cols = jnp.where(reflect_x, cols[::-1], cols)
    ys = (rows + dy) / scale_y
    xs = (cols + dx) / scale_x
    img = _interp_axis(img, ys, axis=0, size=h)
    return _interp_axis(img, xs, axis=1, size=w)


def _gaussian_blur(img: Array, sigma: Array, max_sigma: float) -> Array:
    """Gaussian blur with traced sigma over H, W, AND C (the reference blurs
    the channel axis too — scalar-sigma scipy call on an HWC array,
    reference/augment.py:122). sigma <= 0 is the identity."""
    radius = max(int(np.ceil(3.0 * max_sigma)), 1)
    offsets = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-6)
    weights = jnp.exp(-0.5 * (offsets / sig) ** 2)
    weights = weights / jnp.sum(weights)
    identity = (offsets == 0.0).astype(jnp.float32)
    weights = jnp.where(sigma > 0.0, weights, identity)

    def conv_axis(x: Array, axis: int) -> Array:
        pad = [(0, 0)] * x.ndim
        size = x.shape[axis]
        # reflect padding needs pad < size; clamp for tiny axes (e.g. C=1)
        r = min(radius, size - 1)
        if r == 0:
            return x
        pad[axis] = (r, r)
        xp = jnp.pad(x, pad, mode="reflect")
        out = jnp.zeros_like(x)
        for k in range(-r, r + 1):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(k + r, k + r + size)
            out = out + weights[k + radius] * xp[tuple(sl)]
        # renormalize when the axis was too small for the full kernel
        wsum = jnp.sum(jax.lax.dynamic_slice_in_dim(
            weights, radius - r, 2 * r + 1))
        return out / wsum

    for axis in range(img.ndim):
        img = conv_axis(img, axis)
    return img


def zscore_image(img: Array) -> Array:
    """Per-image z-score with the std<=1 guard (reference/imagereader.py:34-46)."""
    mean = jnp.mean(img)
    std = jnp.std(img)
    return jnp.where(std <= 1.0, img - mean, (img - mean) / std)


def zscore_images(images: Array) -> Array:
    """Batched zscore_image via axis reductions: bit-identical output,
    1.33 -> 1.07 ms at b64 512^2 u8 (scripts/bench_zscore.py — XLA fuses
    the batched axis-reduce better than the vmapped scalar reduce).
    Accepts raw integer pixels (converts on device)."""
    x = images.astype(jnp.float32)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    std = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=(1, 2, 3), keepdims=True))
    return jnp.where(std <= 1.0, x - mean, (x - mean) / std)


# ---------------------------------------------------------------------------
# boxes
# ---------------------------------------------------------------------------

def _jitter_boxes(boxes: Array, valid: Array, loc_sev: float, size_sev: float,
                  img_hw, key: Array) -> Array:
    """Location/size jitter (reference/augment.py:128-189), int truncation."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    m = boxes.shape[0]
    x, y, w, h, c = (boxes[:, i].astype(jnp.float32) for i in range(5))
    x = x + jnp.trunc(loc_sev * w * jax.random.normal(k1, (m,)))
    y = y + jnp.trunc(loc_sev * h * jax.random.normal(k2, (m,)))
    dw = jnp.trunc(size_sev * w * jax.random.normal(k3, (m,)))
    dh = jnp.trunc(size_sev * h * jax.random.normal(k4, (m,)))
    x = x - jnp.trunc(dw / 2.0)
    w = w + dw
    y = y - jnp.trunc(dh / 2.0)
    h = h + dh
    x_end = jnp.minimum(x + w - 1, img_hw[1] - 1)
    y_end = jnp.minimum(y + h - 1, img_hw[0] - 1)
    x = jnp.maximum(x, 0.0)
    y = jnp.maximum(y, 0.0)
    return jnp.stack([x, y, x_end - x + 1, y_end - y + 1, c], axis=1)


def _affine_boxes(boxes: Array, valid: Array, crop_hw, scale_x: Array,
                  scale_y: Array, dx: Array, dy: Array, reflect_x: Array,
                  reflect_y: Array) -> Tuple[Array, Array]:
    """Box affine + off-image/thin culls (reference/augment.py:192-272)."""
    ch, cw = float(crop_hw[0]), float(crop_hw[1])
    x_st = boxes[:, 0] * scale_x - dx
    x_end = (boxes[:, 0] + boxes[:, 2] - 1) * scale_x - dx
    y_st = boxes[:, 1] * scale_y - dy
    y_end = (boxes[:, 1] + boxes[:, 3] - 1) * scale_y - dy
    cls = boxes[:, 4]

    off = ((x_st >= cw) | (y_st >= ch)) | ((x_end < 0) | (y_end < 0))
    thin = ((x_st >= cw - BOX_MIN_EXTENT) | (y_st >= ch - BOX_MIN_EXTENT)
            | (x_end < BOX_MIN_EXTENT) | (y_end < BOX_MIN_EXTENT))
    valid = valid & ~(off | thin)

    x_st = jnp.maximum(x_st, 0.0)
    y_st = jnp.maximum(y_st, 0.0)
    x_end = jnp.minimum(x_end, cw - 1)
    y_end = jnp.minimum(y_end, ch - 1)

    rx_st = jnp.where(reflect_x, cw - x_end, x_st)
    rx_end = jnp.where(reflect_x, cw - x_st, x_end)
    ry_st = jnp.where(reflect_y, ch - y_end, y_st)
    ry_end = jnp.where(reflect_y, ch - y_st, y_end)

    out = jnp.stack([rx_st, ry_st, rx_end - rx_st + 1, ry_end - ry_st + 1,
                     cls], axis=1)
    return jnp.trunc(out), valid


# ---------------------------------------------------------------------------
# label encoding (device twin of yolov3_tpu.data.encoder.encode_boxes)
# ---------------------------------------------------------------------------

def encode_labels_device(boxes: Array, valid: Array,
                         image_size: Sequence[int],
                         anchors: Sequence[Tuple[float, float]],
                         number_classes: int) -> List[Array]:
    """Encode [M,5] (x,y,w,h,c) + validity into the 3 dense label grids.

    Same rules as the host encoder (floor center shift, best-anchor by
    origin-centered IoU, written to all scales, later boxes overwrite
    coordinates but one-hot class bits accumulate).

    Built as dense one-hot matmuls instead of a per-box write loop: a
    `fori_loop` of 64 guarded `dynamic_update_slice`s compiled to ~5 ms
    of serial while-loop per scale on TPU (~31 ms of the 51 ms
    preprocess_batch device profile — DESIGN.md round-3 feed ledger).
    Here each box maps to a flat (cell, anchor) slot index; a [M, G]
    one-hot (iota compare, masked by validity) turns the grid build into
    three [G, M] @ [M, k] matmuls:
    - coordinates: winner-take-all by box index (max of (t+1)*onehot
      per slot reproduces the loop's last-write-wins), then
      winner^T @ [cx, cy, w, h] rows;
    - objectness: any writer;
    - class bits: min(onehot^T @ class_onehot, 1) — the OR-accumulation
      of repeated `.set(1.0)` writes.
    Deterministic where XLA scatter with duplicate indices is not, and
    MXU-shaped instead of serial.
    """
    anchors_arr = jnp.asarray(anchors, dtype=jnp.float32)
    num_anchors = anchors_arr.shape[0]
    img_h, img_w = float(image_size[0]), float(image_size[1])

    boxes = boxes.astype(jnp.float32)
    wh = boxes[:, 2:4]
    centers = jnp.floor(boxes[:, 0:2] + (wh - 1.0) / 2.0)

    half_wh = wh[:, None, :] / 2.0
    half_anchor = anchors_arr[None, :, :] / 2.0
    inter_wh = jnp.maximum(jnp.minimum(half_wh, half_anchor) * 2.0, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area_box = (wh[:, 0] * wh[:, 1])[:, None]
    area_anchor = (anchors_arr[:, 0] * anchors_arr[:, 1])[None, :]
    iou = inter / (area_box + area_anchor - inter)
    best_anchor = jnp.argmax(iou, axis=-1)

    m = boxes.shape[0]
    cls = boxes[:, 4].astype(jnp.int32)
    cls_onehot = jax.nn.one_hot(cls, number_classes, dtype=jnp.float32)
    rows = jnp.concatenate([centers, wh], axis=1)          # [M, 4]
    # ascending priority implements the loop's later-box-overwrites rule
    prio = jnp.arange(1, m + 1, dtype=jnp.float32) * valid.astype(jnp.float32)

    labels = []
    for div in (32, 16, 8):
        gh, gw = int(image_size[0]) // div, int(image_size[1]) // div
        g_slots = gh * gw * num_anchors
        # clamp to the grid like the previous fori_loop encoder did (its
        # dynamic_update_slice writes clamped start indices); without this
        # an out-of-grid center's one-hot row is all-zero and the box is
        # silently dropped — unreachable via the normal pipeline (augment
        # clamps boxes to image bounds) but kept for direct callers
        i = jnp.clip(jnp.floor(centers[:, 1] / img_h * gh).astype(jnp.int32),
                     0, gh - 1)
        j = jnp.clip(jnp.floor(centers[:, 0] / img_w * gw).astype(jnp.int32),
                     0, gw - 1)
        q = (i * gw + j) * num_anchors + best_anchor.astype(jnp.int32)

        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (m, g_slots), 1)
        onehot = ((slot_iota == q[:, None]) & valid[:, None]
                  ).astype(jnp.float32)                    # [M, G]
        w = onehot * prio[:, None]
        win = jnp.max(w, axis=0)                           # [G]
        winner = (w == win[None, :]) & (win[None, :] > 0.0)

        coords = jax.lax.dot_general(
            winner.astype(jnp.float32), rows,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [G, 4]
        obj = (win > 0.0).astype(jnp.float32)[:, None]     # [G, 1]
        cls_bits = jnp.minimum(jax.lax.dot_general(
            onehot, cls_onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), 1.0)      # [G, C]

        grid = jnp.concatenate([coords, obj, cls_bits], axis=-1)
        labels.append(grid.reshape(gh, gw, num_anchors, 5 + number_classes))
    return labels


# ---------------------------------------------------------------------------
# full per-image chain + batch wrapper
# ---------------------------------------------------------------------------

def _augment_one(img: Array, boxes: Array, valid: Array, key: Array,
                 cfg: AugmentConfig) -> Tuple[Array, Array, Array]:
    keys = jax.random.split(key, 8)
    h, w = img.shape[0], img.shape[1]

    reflect_x = reflect_y = jnp.asarray(False)
    if cfg.reflection_flag:
        reflect_x = jax.random.uniform(keys[0]) > 0.5
        reflect_y = jax.random.uniform(keys[1]) > 0.5

    scale_x = scale_y = jnp.float32(1.0)
    dy = dx = jnp.float32(0.0)
    if cfg.scale_augmentation_severity > 0:
        # crop size == image size, so the scale floor is max(1, 1-s) = 1
        # (reference/augment.py:77-88 with fx = fy = 1)
        lo = max(1.0, 1.0 - cfg.scale_augmentation_severity)
        hi = 1.0 + cfg.scale_augmentation_severity
        scale_x = jax.random.uniform(keys[2], minval=lo, maxval=hi)
        scale_y = jax.random.uniform(keys[3], minval=lo, maxval=hi)
        # integer crop offset within the upscale surplus
        surplus_y = jnp.floor(h * scale_y) - h
        surplus_x = jnp.floor(w * scale_x) - w
        dy = jnp.floor(jax.random.uniform(keys[4]) * surplus_y)
        dx = jnp.floor(jax.random.uniform(keys[5]) * surplus_x)

    boxes = _jitter_boxes(boxes, valid, cfg.box_location_jitter_severity,
                          cfg.box_size_augmentation_severity, (h, w), keys[6])
    img = _warp_image(img, scale_y, scale_x, dy, dx, reflect_x, reflect_y)
    boxes, valid = _affine_boxes(boxes, valid, (h, w), scale_x, scale_y,
                                 dx, dy, reflect_x, reflect_y)

    noise_key, blur_key, sigma_key = jax.random.split(keys[7], 3)
    if cfg.noise_augmentation_severity > 0:
        dyn_range = jnp.max(img) - jnp.min(img)
        sigma_max = cfg.noise_augmentation_severity * dyn_range
        sigma = jax.random.uniform(sigma_key, minval=-1.0, maxval=1.0) * sigma_max
        img = img + jax.random.normal(noise_key, img.shape) * sigma

    if cfg.blur_augmentation_max_sigma > 0:
        blur_sigma = jax.random.uniform(
            blur_key, minval=-cfg.blur_augmentation_max_sigma,
            maxval=cfg.blur_augmentation_max_sigma)
        img = _gaussian_blur(img, blur_sigma, cfg.blur_augmentation_max_sigma)

    return img, boxes, valid


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "image_size", "anchors", "number_classes",
                     "use_augmentation"))
def preprocess_batch(images: Array, boxes: Array, valid: Array, key: Array,
                     cfg: AugmentConfig, image_size, anchors,
                     number_classes: int, use_augmentation: bool = True):
    """Full device preprocessing for one batch.

    images [B,H,W,C] float32 raw, boxes [B,M,5], valid [B,M] bool ->
    (z-scored images, label_s32, label_s16, label_s8).
    """
    b = images.shape[0]
    images = images.astype(jnp.float32)  # raw pixels cast on device
    if use_augmentation:
        keys = jax.random.split(key, b)
        images, boxes, valid = jax.vmap(
            lambda i, bx, v, k: _augment_one(i, bx, v, k, cfg))(
                images, boxes, valid, keys)
    images = zscore_images(images)  # == vmap(zscore_image), faster lowering
    labels = jax.vmap(
        lambda bx, v: encode_labels_device(bx, v, image_size, anchors,
                                           number_classes))(boxes, valid)
    return (images, labels[0], labels[1], labels[2])

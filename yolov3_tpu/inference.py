"""Whole-image inference CLI: exported model -> per-class NMS -> CSV boxes.

TPU-native equivalent of reference/inference.py:24-135. Pipeline parity:
image -> whole-image z-score -> model -> clip corners to the image ->
strict small-box filter -> per-class NMS (sqrt score rule) -> corners to
xywh + class id -> 'X,Y,W,H,C' CSV named after the image.

Differences from the reference:
- NMS runs ON DEVICE by default (`--host_nms` restores the numpy path;
  both produce identical results — tests/test_nms_device.py).
- the corner clip happens after materializing to numpy, fixing the
  reference's in-place-assignment-on-an-EagerTensor bug
  (reference/inference.py:62-65; SURVEY.md §7 quirk (d)).
- images are batched through the network (`--batch_size`), not one by one.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.config import InferenceConfig
from yolov3_tpu.data.imaging import ensure_hwc, imread
from yolov3_tpu.models.yolo import YoloV3Detector
from yolov3_tpu.ops import boxes as bbox
from yolov3_tpu.ops.nms import batched_nms_device, nms_to_host
from yolov3_tpu.utils import checkpoint as ckpt


@jax.jit
def zscore_batch(images: jnp.ndarray) -> jnp.ndarray:
    """Per-image z-score on device (single-core hosts are too slow for
    whole-image statistics over megapixel batches). Accepts raw integer
    pixels so the host->device transfer moves uint8/uint16, not float32."""
    from yolov3_tpu.data.device_pipeline import zscore_images
    return zscore_images(images)


def make_detector_fn(saved_model_filepath: str, num_devices: int = 1):
    """Load an exported model and return (detector_fn, config).

    detector_fn(images NHWC float32 [B, H, W, C]) -> detections
    [B, num_boxes, 4+1+C]. The artifact plays the reference's SavedModel
    role (reference/inference.py:35).

    With num_devices > 1 the batch is sharded across a data-parallel mesh
    (padded up to a multiple of the chip count) — the reference has no
    inference parallelism at all (it pins one GPU,
    reference/inference.py:131-133); batching tiles/images across chips is
    the TPU-native scale-out (SURVEY.md §2).
    """
    params, batch_stats, cfg = ckpt.load_model(saved_model_filepath)
    model = YoloV3Detector(cfg)
    # exported artifacts hold the feature-map model's variables; the
    # detector nests that model under scope "backbone"
    variables = {"params": {"backbone": params},
                 "batch_stats": {"backbone": batch_stats}}

    @jax.jit
    def detect(images: jnp.ndarray) -> jnp.ndarray:
        return model.apply(variables, images, train=False)

    if num_devices <= 1:
        return detect, cfg
    return shard_detector(detect, num_devices), cfg


def shard_detector(detect, num_devices: int):
    """Wrap a detector fn so image batches shard across a data-parallel
    mesh (padded up to a multiple of the chip count)."""
    from yolov3_tpu.parallel.mesh import batch_sharding, make_mesh
    mesh = make_mesh(n_devices=num_devices)
    n = mesh.devices.size
    sharding = batch_sharding(mesh)

    def detect_sharded(images) -> jnp.ndarray:
        b = images.shape[0]
        pad = (-b) % n
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad, *images.shape[1:]), images.dtype)])
        out = detect(jax.device_put(jnp.asarray(images), sharding))
        return out[:b]

    return detect_sharded


def make_serving_fn(saved_model_filepath: str,
                    icfg: Optional[InferenceConfig] = None,
                    min_box_size: Optional[int] = None):
    """Build the full serving program: ONE jitted call from images to final
    detections (model forward + box decode + corner clip + small-box filter
    + per-class NMS, all on device).

    Returns (serve, cfg) where serve(images [B,H,W,C] float32) ->
    (boxes [B,C,K,4] ltrb, scores [B,C,K], keep [B,C,K] bool). The reference
    splits this across a SavedModel call and host numpy
    (reference/inference.py:58-79); on TPU the whole pipeline is one XLA
    program — nothing crosses the host until the final fixed-size results.
    """
    icfg = icfg or InferenceConfig()
    if min_box_size is None:
        min_box_size = icfg.min_box_size
    params, batch_stats, cfg = ckpt.load_model(saved_model_filepath)
    model = YoloV3Detector(cfg)
    variables = {"params": {"backbone": params},
                 "batch_stats": {"backbone": batch_stats}}

    @jax.jit
    def serve(images: jnp.ndarray):
        # clip to the ACTUAL image bounds (static per compile), not
        # cfg.img_size: the network is fully convolutional and serves image
        # sizes other than the export size — same rule as the int8 twin
        # (models/quantized.py make_quantized_serving_fn) and the fixed
        # host-side clip (reference/inference.py:62-65)
        img_h, img_w = images.shape[1], images.shape[2]
        det = model.apply(variables, images, train=False)
        clipped = jnp.concatenate([
            jnp.clip(det[..., 0:1], 0, img_w),
            jnp.clip(det[..., 1:2], 0, img_h),
            jnp.clip(det[..., 2:3], 0, img_w),
            jnp.clip(det[..., 3:4], 0, img_h),
            det[..., 4:],
        ], axis=-1)
        return batched_nms_device(clipped, cfg.number_classes,
                                  iou_threshold=icfg.iou_threshold,
                                  score_threshold=icfg.score_threshold,
                                  max_boxes=icfg.max_boxes_per_class,
                                  min_box_size=float(min_box_size))

    return serve, cfg


def detections_to_csv_rows(det: np.ndarray, img_hw, min_box_size: int,
                           icfg: InferenceConfig, use_host_nms: bool,
                           num_classes: int, return_scores: bool = False):
    """Post-process one image's raw detections to [M, 5] xywhc int rows.

    `return_scores=True` additionally returns the [M] NMS scores (for the
    scored X,Y,W,H,P,C CSV layout — the reference CLI discards scores,
    reference/inference.py:79-87, which makes downstream AP evaluation
    order-dependent; the scored layout is the rank-aware opt-in)."""
    det = np.array(det, dtype=np.float32)  # writable host copy
    # clip corners into the image (after conversion to numpy — the fix for
    # the reference's EagerTensor item-assignment bug)
    det[:, 0] = np.clip(det[:, 0], 0, img_hw[1])
    det[:, 1] = np.clip(det[:, 1], 0, img_hw[0])
    det[:, 2] = np.clip(det[:, 2], 0, img_hw[1])
    det[:, 3] = np.clip(det[:, 3], 0, img_hw[0])

    det = bbox.filter_small_boxes(det, min_box_size)
    if use_host_nms:
        boxes, scores, labels = bbox.per_class_nms(
            det[:, 0:4], det[:, 4:5], det[:, 5:],
            iou_threshold=icfg.iou_threshold,
            score_threshold=icfg.score_threshold)
    else:
        out = batched_nms_device(det[None], num_classes,
                                 iou_threshold=icfg.iou_threshold,
                                 score_threshold=icfg.score_threshold,
                                 max_boxes=icfg.max_boxes_per_class)
        boxes, scores, labels = nms_to_host(out[0][0], out[1][0], out[2][0])
    if boxes is None:
        rows = np.zeros((0, 5), dtype=np.int32)
        return (rows, np.zeros((0,), np.float32)) if return_scores else rows
    boxes = boxes.copy()
    boxes[:, 2] = boxes[:, 2] - boxes[:, 0]
    boxes[:, 3] = boxes[:, 3] - boxes[:, 1]
    rows = np.concatenate([boxes, labels.reshape(-1, 1)],
                          axis=-1).astype(np.int32)
    if return_scores:
        return rows, np.asarray(scores, np.float32).reshape(-1)
    return rows


def save_overlay(img: np.ndarray, rows: np.ndarray, out_path: str) -> None:
    """Write a PNG with detection rectangles burned in (the reference keeps
    this as commented-out debug code, reference/inference.py:88-96)."""
    from yolov3_tpu.data.imaging import imwrite
    vis = img - img.min()
    rng = vis.max()
    if rng > 0:
        vis = vis / rng
    vis = np.ascontiguousarray((vis * 255).astype(np.uint8))
    imwrite(bbox.draw_boxes(vis, rows), out_path)


def inference(image_folder: str, image_format: str,
              saved_model_filepath: str, output_folder: str,
              min_box_size: int, batch_size: int = 1,
              use_host_nms: bool = False,
              num_devices: int = 1,
              overlay_folder: Optional[str] = None,
              icfg: Optional[InferenceConfig] = None,
              use_int8: bool = False,
              calib_percentile=None,
              save_scores: bool = False) -> None:
    os.makedirs(output_folder, exist_ok=True)
    icfg = icfg or InferenceConfig(min_box_size=min_box_size)
    image_format = image_format.lstrip(".")

    files = sorted(fn for fn in os.listdir(image_folder)
                   if fn.endswith(f".{image_format}"))
    paths = [os.path.join(image_folder, fn) for fn in files]

    # int8 variants calibrate on the first batch, so they build lazily;
    # the fully-fused serve program (forward+decode+clip+NMS in one XLA
    # call) serves the plain case, while --host_nms / --num-devices with
    # --int8 swap in the int8 DETECTOR and share the generic post-
    # processing path so those flags keep their meaning
    serve = None
    detect = cfg = None
    int8_fused = use_int8 and not use_host_nms and num_devices <= 1
    if not use_int8:
        detect, cfg = make_detector_fn(saved_model_filepath, num_devices)

    print("Starting inference of file list")
    for start in range(0, len(paths), batch_size):
        chunk = paths[start:start + batch_size]
        # transfer raw pixels (uint8/uint16); cast + z-score on device
        images = [ensure_hwc(imread(fp)) for fp in chunk]
        batch = zscore_batch(jnp.asarray(np.stack(images)))  # NHWC, on device

        if int8_fused:
            if serve is None:
                from yolov3_tpu.models.quantized import (
                    make_quantized_serving_fn)
                serve, cfg, _ = make_quantized_serving_fn(
                    saved_model_filepath, batch, icfg=icfg,
                    min_box_size=min_box_size,
                    calib_percentile=calib_percentile)
            pad = batch_size - batch.shape[0]
            if pad > 0:  # keep shapes static on the final chunk
                batch = jnp.concatenate(
                    [batch, jnp.zeros((pad, *batch.shape[1:]), batch.dtype)])
            nb, ns, nk = (np.asarray(o) for o in serve(batch))
            rows_per_image, scores_per_image = [], []
            for i in range(len(chunk)):
                boxes, scores, labels = nms_to_host(nb[i], ns[i], nk[i])
                if boxes is None:
                    rows_per_image.append(np.zeros((0, 5), np.int32))
                    scores_per_image.append(np.zeros((0,), np.float32))
                    continue
                boxes = boxes.copy()
                boxes[:, 2] -= boxes[:, 0]
                boxes[:, 3] -= boxes[:, 1]
                rows_per_image.append(np.concatenate(
                    [boxes, labels.reshape(-1, 1)], axis=-1).astype(np.int32))
                scores_per_image.append(
                    np.asarray(scores, np.float32).reshape(-1))
        else:
            if detect is None:  # int8 non-fused: calibrate on first batch
                from yolov3_tpu.models.quantized import (
                    make_quantized_detector_fn)
                detect, cfg = make_quantized_detector_fn(
                    saved_model_filepath, batch,
                    calib_percentile=calib_percentile)
                if num_devices > 1:
                    detect = shard_detector(detect, num_devices)
            dets = np.asarray(detect(batch))
            pairs = [
                detections_to_csv_rows(det, img.shape[:2], min_box_size,
                                       icfg, use_host_nms, cfg.number_classes,
                                       return_scores=True)
                for det, img in zip(dets, images)]
            rows_per_image = [p[0] for p in pairs]
            scores_per_image = [p[1] for p in pairs]

        for fp, rows, scores, img in zip(chunk, rows_per_image,
                                         scores_per_image, images):
            file_name = os.path.basename(fp)
            print(f"{start}/{len(paths)} : {file_name}")
            print(f"Found: {rows.shape[0]} rois")
            out_csv = os.path.join(
                output_folder, file_name.replace(image_format, "csv"))
            if save_scores:
                # scored X,Y,W,H,P,C layout (rank-aware evaluation);
                # write_boxes_from_ltrbpc takes inclusive ltrb corners
                ltrbpc = np.concatenate([
                    rows[:, 0:1], rows[:, 1:2],
                    rows[:, 0:1] + rows[:, 2:3] - 1,
                    rows[:, 1:2] + rows[:, 3:4] - 1,
                    scores.reshape(-1, 1), rows[:, 4:5]], axis=-1)
                bbox.write_boxes_from_ltrbpc(ltrbpc, out_csv)
            else:
                bbox.write_boxes_from_xywhc(rows, out_csv)
            if overlay_folder:
                os.makedirs(overlay_folder, exist_ok=True)
                save_overlay(img, rows, os.path.join(
                    overlay_folder, file_name.replace(image_format, "png")))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="inference",
        description="Detect objects in a folder of images with a trained model")
    parser.add_argument("--saved-model-filepath", type=str, required=True,
                        help="Filepath to the exported model to use")
    parser.add_argument("--output-folder", type=str, required=True)
    parser.add_argument("--image-folder", type=str, required=True,
                        help="folder containing images to inference (Required)")
    parser.add_argument("--image-format", type=str, default="tif",
                        help="format (extension) of the input images. "
                             "E.g {tif, jpg, png}")
    parser.add_argument("--min-box-size", type=int, default=32,
                        help="Smallest detection to consider. Default (32, 32).")
    parser.add_argument("--batch-size", type=int, default=1,
                        help="images per device batch")
    parser.add_argument("--max-boxes", type=int, default=512,
                        help="per-class candidate cap for the device NMS")
    parser.add_argument("--save-overlays", type=str, default=None,
                        help="also write detection-overlay PNGs to this folder")
    parser.add_argument("--save-scores", action="store_true",
                        help="write the scored X,Y,W,H,P,C CSV layout "
                             "instead of the reference's unscored X,Y,W,H,C "
                             "(rank-aware mAP evaluation needs scores)")
    parser.add_argument("--host_nms", action="store_true",
                        help="run NMS on the host (numpy) instead of on device")
    parser.add_argument("--calib-percentile", type=float, default=None,
                        help="int8 activation-scale calibration clips each "
                             "tensor's range at this percentile of "
                             "|activations| (default: absmax)")
    parser.add_argument("--int8", action="store_true",
                        help="serve the int8 post-training-quantized path "
                             "(activation scales calibrate on the first "
                             "batch; ~1.35x faster on v5e)")
    parser.add_argument("--num-devices", type=int, default=1,
                        help="shard image batches across the first N chips")
    args = parser.parse_args(argv)

    print("Arguments:")
    for k, v in sorted(vars(args).items()):
        print(f"{k} = {v}")

    inference(args.image_folder, args.image_format,
              args.saved_model_filepath, args.output_folder,
              args.min_box_size, batch_size=args.batch_size,
              use_host_nms=args.host_nms, num_devices=args.num_devices,
              overlay_folder=args.save_overlays,
              icfg=InferenceConfig(min_box_size=args.min_box_size,
                                   max_boxes_per_class=args.max_boxes),
              use_int8=args.int8, calib_percentile=args.calib_percentile,
              save_scores=args.save_scores)


if __name__ == "__main__":
    main()

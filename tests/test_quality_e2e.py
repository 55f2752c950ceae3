"""Closed-loop detection-quality gate: train -> export -> inference CLI -> mAP.

The reference was used to train real detectors (reference/README.md:9-11)
but ships no way to verify one works; loss-only e2e tests (test_train_e2e)
cannot catch sign/axis bugs that still let the loss decrease. This test
closes the loop: overfit a planted-rectangle toy dataset, run the REAL
`inference.py` CLI on the training images, and score the CSVs with the
evaluation harness — mAP@0.5 must reach 0.9.

Tuned for the 1-CPU host: 64px images, 1-block/32-filter model, one fixed
batch of 8 images, lr 5e-3 (measured: mAP 0.93 at 700 steps, 1.0 at 1500;
the steps below leave margin while staying ~1 min of stepping).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig, TrainConfig
from yolov3_tpu.data.encoder import encode_boxes
from yolov3_tpu.data.imaging import imwrite, zscore_normalize
from yolov3_tpu.inference import inference
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.ops import boxes as bbox
from yolov3_tpu.parallel import (create_train_state, make_mesh,
                                 make_train_step, replicate_to_mesh,
                                 shard_batch)
from yolov3_tpu.utils import checkpoint as ckpt
from yolov3_tpu.utils.evaluation import evaluate_folders

SIZE = 64
BOX = 24
N_IMAGES = 8
STEPS = 1000
LR = 5e-3


def _make_dataset(tmp_path, rng):
    """Bright solid squares on dark noise + ground-truth CSVs."""
    img_dir = str(tmp_path / "images")
    gt_dir = str(tmp_path / "gt")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    images, gts = [], []
    for i in range(N_IMAGES):
        img = (rng.rand(SIZE, SIZE, 3) * 40).astype(np.float32)
        x = rng.randint(0, SIZE - BOX)
        y = rng.randint(0, SIZE - BOX)
        img[y:y + BOX, x:x + BOX] += 180 + rng.rand() * 40
        img = np.clip(img, 0, 255).astype(np.uint8)
        rows = np.array([[x, y, BOX, BOX, 0]], np.int32)
        imwrite(img, os.path.join(img_dir, f"im{i}.png"))
        bbox.write_boxes_from_xywhc(rows, os.path.join(gt_dir, f"im{i}.csv"))
        images.append(img)
        gts.append(rows)
    return img_dir, gt_dir, images, gts


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["bf16_train", "int8_ste_train",
                                  "int8_static_train"])
def test_overfit_toy_dataset_reaches_high_map(tmp_path, rng, mode):
    """`int8_ste_train` additionally gates the QAT path end-to-end: a
    model TRAINED with the int8-forward straight-through estimator must
    still find the planted objects through both serving paths.
    `int8_static_train` gates the static-scale variant (frozen calibration
    scales, refreshed a few times like the trainer's per-epoch hook)."""
    img_dir, gt_dir, images, gts = _make_dataset(tmp_path, rng)
    int8_train = mode != "bf16_train"
    int8_static = mode == "int8_static_train"

    cfg = ModelConfig(img_size=(SIZE, SIZE, 3), number_classes=1,
                      anchors=((24, 24), (12, 12)), block_count=1,
                      filter_count=32, compute_dtype="float32",
                      int8_train=int8_train, int8_train_static=int8_static)
    tcfg = TrainConfig(batch_size=N_IMAGES)
    model = YoloV3(cfg)
    mesh = make_mesh(n_devices=1)
    state = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 3))
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(model, cfg, tcfg, mesh, N_IMAGES)

    batch_imgs = np.stack([zscore_normalize(im.astype(np.float32))
                           for im in images]).astype(np.float32)
    labels = [encode_boxes(g.astype(np.float32), cfg.img_size, cfg.anchors,
                           cfg.number_classes) for g in gts]
    tbatch = shard_batch(
        (batch_imgs,
         np.stack([lab[0] for lab in labels]),
         np.stack([lab[1] for lab in labels]),
         np.stack([lab[2] for lab in labels])), mesh)

    def recalibrate(st):
        from yolov3_tpu.models import quantized as Q
        scales = Q.calibrate(jax.device_get(st.params),
                             jax.device_get(st.batch_stats), cfg,
                             tbatch[0], train_mode=True)
        return st.replace(quant_scales=Q.scales_to_collection(
            scales, st.quant_scales))

    lr = jnp.float32(LR)
    metrics = None
    for i in range(STEPS):
        if int8_static and i % 250 == 0:
            # the trainer refreshes frozen scales once per epoch
            state = recalibrate(state)
        state, metrics = step(state, tbatch, lr)
    final_loss = float(metrics["loss"])
    assert np.isfinite(final_loss)
    assert final_loss < 0.5, f"failed to overfit: final loss {final_loss}"

    # export the trained model and run the REAL inference CLI on the
    # training images (reference workflow: SavedModel -> inference.py)
    path = ckpt.export_model(str(tmp_path / "model"),
                             jax.device_get(state.params),
                             jax.device_get(state.batch_stats), cfg)
    pred_dir = str(tmp_path / "pred")
    inference(img_dir, "png", path, pred_dir, min_box_size=8,
              batch_size=N_IMAGES)

    result = evaluate_folders(pred_dir, gt_dir, iou_threshold=0.5)
    assert result["mAP"] >= 0.9, (
        f"trained model does not find the planted objects: "
        f"mAP@0.5={result['mAP']:.3f} (per-class {result['per_class_ap']})")

    # the int8 post-training-quantized serving path must find the same
    # objects (quality gate for the quantized deployment path)
    pred8_dir = str(tmp_path / "pred_int8")
    inference(img_dir, "png", path, pred8_dir, min_box_size=8,
              batch_size=N_IMAGES, use_int8=True)
    result8 = evaluate_folders(pred8_dir, gt_dir, iou_threshold=0.5)
    assert result8["mAP"] >= 0.9, (
        f"int8-quantized model loses the planted objects: "
        f"mAP@0.5={result8['mAP']:.3f} (bf16 was {result['mAP']:.3f})")

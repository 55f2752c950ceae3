"""Inference CLI end-to-end: export a tiny model, run both CLIs, check CSVs."""

import os

import jax
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.data.imaging import imwrite
from yolov3_tpu.inference import inference, make_detector_fn
from yolov3_tpu.inference_tiled import inference_image_folder
from yolov3_tpu.models.yolo import YoloV3
from yolov3_tpu.ops import boxes as bbox
from yolov3_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def exported_model(tmp_path_factory):
    out = tmp_path_factory.mktemp("model")
    cfg = ModelConfig(img_size=(64, 64, 3), number_classes=2,
                      anchors=((16, 16), (32, 32)), block_count=1,
                      filter_count=32, compute_dtype="float32")
    model = YoloV3(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32), train=False)
    path = ckpt.export_model(str(out), variables["params"],
                             variables["batch_stats"], cfg)
    return path, cfg


def write_images(folder, rng, n, hw=(64, 64)):
    os.makedirs(folder, exist_ok=True)
    for i in range(n):
        img = rng.randint(0, 255, (*hw, 3)).astype(np.uint8)
        imwrite(img, os.path.join(folder, f"im{i}.png"))


class TestExportLoad:
    def test_roundtrip(self, exported_model):
        path, cfg = exported_model
        params, batch_stats, cfg2 = ckpt.load_model(path)
        assert cfg2 == cfg

    def test_detector_fn(self, exported_model, rng):
        path, cfg = exported_model
        detect, _ = make_detector_fn(path)
        det = np.asarray(detect(rng.rand(2, 64, 64, 3).astype(np.float32)))
        assert det.shape == (2, cfg.number_output_boxes, 4 + 1 + 2)

    def test_load_model_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ckpt.load_model(str(tmp_path / "nope"))


class TestInferenceCli:
    def test_whole_image_csv_output(self, exported_model, tmp_path, rng):
        path, _ = exported_model
        img_dir = str(tmp_path / "imgs")
        out_dir = str(tmp_path / "out")
        write_images(img_dir, rng, 3)
        inference(img_dir, "png", path, out_dir, min_box_size=4,
                  batch_size=2)
        csvs = sorted(os.listdir(out_dir))
        assert csvs == ["im0.csv", "im1.csv", "im2.csv"]
        with open(os.path.join(out_dir, "im0.csv")) as fh:
            assert fh.readline().strip() == "X,Y,W,H,C"
        rows = bbox.load_boxes_to_xywhc(os.path.join(out_dir, "im0.csv"))
        assert rows.shape[1] == 5

    def test_save_scores_layout(self, exported_model, tmp_path, rng):
        """--save-scores writes the scored X,Y,W,H,P,C layout with the same
        boxes as the unscored default, on BOTH the generic and the fused
        int8 serving branches (rank-aware mAP evaluation needs P)."""
        path, _ = exported_model
        img_dir = str(tmp_path / "imgs_sc")
        write_images(img_dir, rng, 2)
        for int8 in (False, True):
            out_plain = str(tmp_path / f"out_plain{int8}")
            out_scored = str(tmp_path / f"out_scored{int8}")
            inference(img_dir, "png", path, out_plain, min_box_size=4,
                      batch_size=2, use_int8=int8)
            inference(img_dir, "png", path, out_scored, min_box_size=4,
                      batch_size=2, use_int8=int8, save_scores=True)
            for fn in sorted(os.listdir(out_scored)):
                with open(os.path.join(out_scored, fn)) as fh:
                    assert fh.readline().strip() == "X,Y,W,H,P,C"
                from yolov3_tpu.utils.evaluation import load_predictions
                boxes, scores, classes = load_predictions(
                    os.path.join(out_scored, fn))
                plain = bbox.load_boxes_to_xywhc(os.path.join(out_plain, fn))
                assert boxes.shape[0] == plain.shape[0]
                if plain.shape[0]:
                    # same geometry (ltrb from the same xywh ints)
                    np.testing.assert_array_equal(
                        boxes[:, 0], plain[:, 0].astype(np.float64))
                    np.testing.assert_array_equal(
                        boxes[:, 2] - boxes[:, 0] + 1,
                        plain[:, 2].astype(np.float64))
                    assert np.all(scores > 0.0) and np.all(scores <= 1.0)

    def test_host_and_device_nms_agree(self, exported_model, tmp_path, rng):
        path, _ = exported_model
        img_dir = str(tmp_path / "imgs2")
        write_images(img_dir, rng, 2)
        out_a = str(tmp_path / "out_device")
        out_b = str(tmp_path / "out_host")
        inference(img_dir, "png", path, out_a, min_box_size=4)
        inference(img_dir, "png", path, out_b, min_box_size=4,
                  use_host_nms=True)
        for fn in os.listdir(out_a):
            a = bbox.load_boxes_to_xywhc(os.path.join(out_a, fn))
            b = bbox.load_boxes_to_xywhc(os.path.join(out_b, fn))
            np.testing.assert_array_equal(a, b)

    def test_tiled_inference_csv(self, exported_model, tmp_path, rng):
        path, _ = exported_model
        img_dir = str(tmp_path / "big")
        os.makedirs(img_dir)
        # image larger than the 64x64 tile -> multi-tile path
        big = rng.randint(0, 255, (150, 130, 3)).astype(np.uint8)
        imwrite(big, os.path.join(img_dir, "big.png"))
        out_dir = str(tmp_path / "out_tiled")
        inference_image_folder(img_dir, "png", path, out_dir,
                               tile_size=(64, 64), min_roi_size=4,
                               batch_size=4, edge_range=0)
        with open(os.path.join(out_dir, "big.csv")) as fh:
            assert fh.readline().strip() == "X,Y,W,H,P,C"

    def test_int8_host_and_device_nms_agree(self, exported_model, tmp_path,
                                            rng):
        """--int8 respects --host_nms: the int8 detector + host NMS path
        produces the same boxes as the fused int8 device-NMS path."""
        path, _ = exported_model
        img_dir = str(tmp_path / "imgs8")
        write_images(img_dir, rng, 2)
        out_a = str(tmp_path / "out8_device")
        out_b = str(tmp_path / "out8_host")
        inference(img_dir, "png", path, out_a, min_box_size=4,
                  batch_size=2, use_int8=True)
        inference(img_dir, "png", path, out_b, min_box_size=4,
                  batch_size=2, use_int8=True, use_host_nms=True)
        for fn in os.listdir(out_a):
            a = bbox.load_boxes_to_xywhc(os.path.join(out_a, fn))
            b = bbox.load_boxes_to_xywhc(os.path.join(out_b, fn))
            np.testing.assert_array_equal(a, b)

    def test_tiled_inference_int8_csv(self, exported_model, tmp_path, rng):
        """--int8 tiled path: calibrates on the first image's tiles and
        produces the same CSV schema as the bf16 path."""
        path, _ = exported_model
        img_dir = str(tmp_path / "big8")
        os.makedirs(img_dir)
        big = rng.randint(0, 255, (150, 130, 3)).astype(np.uint8)
        imwrite(big, os.path.join(img_dir, "big.png"))
        out_dir = str(tmp_path / "out_tiled_int8")
        inference_image_folder(img_dir, "png", path, out_dir,
                               tile_size=(64, 64), min_roi_size=4,
                               batch_size=4, edge_range=0, use_int8=True)
        with open(os.path.join(out_dir, "big.csv")) as fh:
            assert fh.readline().strip() == "X,Y,W,H,P,C"

    def test_int8_serving_clips_to_actual_image_size(self, exported_model,
                                                     rng):
        """The fused int8 serving program clips to the images it is given
        (the network is fully convolutional), not the 64px export size."""
        from yolov3_tpu.models.quantized import make_quantized_serving_fn
        path, _ = exported_model
        calib = rng.rand(2, 128, 128, 3).astype(np.float32)
        serve, cfg, _ = make_quantized_serving_fn(path, calib,
                                                  min_box_size=1)
        boxes, scores, keep = serve(rng.rand(2, 128, 128, 3)
                                    .astype(np.float32))
        kept = np.asarray(boxes)[np.asarray(keep)]
        assert kept.shape[0] > 0
        # corners clipped to 128, and some detections live beyond the
        # 64px export size (proving the clip was not cfg.img_size)
        assert kept.max() <= 128.0 + 1e-5
        assert kept.max() > 64.0 + 1e-5

    def test_int8_serving_raw_pixels_matches(self, exported_model, rng):
        """raw_pixels=True folds the per-image z-score into the serving
        program: uint8 pixels in == z-score-then-serve, same detections."""
        from yolov3_tpu.data.device_pipeline import zscore_images
        from yolov3_tpu.models.quantized import make_quantized_serving_fn
        path, _ = exported_model
        calib = rng.rand(2, 64, 64, 3).astype(np.float32)
        u8 = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
        serve, _, _ = make_quantized_serving_fn(path, calib, min_box_size=1)
        serve_raw, _, _ = make_quantized_serving_fn(path, calib,
                                                    min_box_size=1,
                                                    raw_pixels=True)
        want = serve(zscore_images(u8))
        got = serve_raw(u8)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_bf16_serving_clips_to_actual_image_size(self, exported_model,
                                                     rng):
        """bf16 twin of the int8 test: the fused serving program clips to
        the served image's bounds, not the 64px export size (round-2 weak
        item: it used cfg.img_size while the int8 path used images.shape)."""
        from yolov3_tpu.inference import make_serving_fn
        path, _ = exported_model
        serve, cfg = make_serving_fn(path, min_box_size=1)
        boxes, scores, keep = serve(rng.rand(2, 128, 128, 3)
                                    .astype(np.float32))
        kept = np.asarray(boxes)[np.asarray(keep)]
        assert kept.shape[0] > 0
        assert kept.max() <= 128.0 + 1e-5
        assert kept.max() > 64.0 + 1e-5

    def test_tile_size_mismatch_raises(self, exported_model, tmp_path, rng):
        path, _ = exported_model
        img_dir = str(tmp_path / "imgs3")
        write_images(img_dir, rng, 1)
        with pytest.raises(ValueError):
            inference_image_folder(img_dir, "png", path,
                                   str(tmp_path / "o"), tile_size=(128, 128),
                                   min_roi_size=4)


class TestServingFn:
    def test_one_program_matches_cli_path(self, exported_model, rng):
        """The fused serving program equals clip->filter->NMS done stepwise."""
        from yolov3_tpu.config import InferenceConfig
        from yolov3_tpu.inference import (detections_to_csv_rows,
                                          make_serving_fn)
        from yolov3_tpu.ops.nms import nms_to_host
        path, cfg = exported_model
        serve, _ = make_serving_fn(path, min_box_size=4)
        detect, _ = make_detector_fn(path)
        x = rng.rand(2, 64, 64, 3).astype(np.float32)

        boxes, scores, keep = serve(x)
        dets = np.asarray(detect(x))
        icfg = InferenceConfig(min_box_size=4)
        for i in range(2):
            got = nms_to_host(np.asarray(boxes[i]), np.asarray(scores[i]),
                              np.asarray(keep[i]))
            want = detections_to_csv_rows(dets[i], (64, 64), 4, icfg,
                                          use_host_nms=True,
                                          num_classes=cfg.number_classes)
            if got[0] is None:
                assert want.shape[0] == 0
                continue
            got_rows = got[0].copy()
            got_rows[:, 2] -= got_rows[:, 0]
            got_rows[:, 3] -= got_rows[:, 1]
            got_rows = np.concatenate(
                [got_rows, got[2].reshape(-1, 1)], axis=1).astype(np.int32)
            np.testing.assert_array_equal(got_rows, want)


class TestOverlays:
    def test_overlay_pngs_written(self, exported_model, tmp_path, rng):
        path, _ = exported_model
        img_dir = str(tmp_path / "imgs_ov")
        write_images(img_dir, rng, 2)
        out_dir = str(tmp_path / "out_ov")
        ov_dir = str(tmp_path / "overlays")
        inference(img_dir, "png", path, out_dir, min_box_size=4,
                  overlay_folder=ov_dir)
        ovs = sorted(os.listdir(ov_dir))
        assert ovs == ["im0.png", "im1.png"]
        from yolov3_tpu.data.imaging import imread
        assert imread(os.path.join(ov_dir, "im0.png")).shape[:2] == (64, 64)

"""Multi-chip inference: sharded detector equals single-device detector."""

import numpy as np
import pytest

from yolov3_tpu.inference import make_detector_fn

from tests.test_inference_e2e import exported_model, write_images  # noqa: F401


class TestShardedDetector:
    def test_matches_single_device(self, exported_model, rng):  # noqa: F811
        path, cfg = exported_model
        x = rng.rand(5, 64, 64, 3).astype(np.float32)  # 5 % 8 != 0 -> padding
        single, _ = make_detector_fn(path, num_devices=1)
        sharded, _ = make_detector_fn(path, num_devices=8)
        a = np.asarray(single(x))
        b = np.asarray(sharded(x))
        assert b.shape == a.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_exact_multiple(self, exported_model, rng):  # noqa: F811
        path, _ = exported_model
        x = rng.rand(8, 64, 64, 3).astype(np.float32)
        sharded, _ = make_detector_fn(path, num_devices=8)
        assert np.asarray(sharded(x)).shape[0] == 8

    def test_tiled_inference_multichip(self, exported_model, tmp_path, rng):  # noqa: F811
        from yolov3_tpu.inference_tiled import inference_image_folder
        from yolov3_tpu.ops import boxes as bbox
        path, _ = exported_model
        img_dir = str(tmp_path / "big")
        import os
        from yolov3_tpu.data.imaging import imwrite
        os.makedirs(img_dir)
        big = rng.randint(0, 255, (150, 130, 3)).astype(np.uint8)
        imwrite(big, os.path.join(img_dir, "big.png"))

        out1 = str(tmp_path / "o1")
        out8 = str(tmp_path / "o8")
        inference_image_folder(img_dir, "png", path, out1, tile_size=(64, 64),
                               min_roi_size=4, batch_size=4, edge_range=0,
                               num_devices=1)
        inference_image_folder(img_dir, "png", path, out8, tile_size=(64, 64),
                               min_roi_size=4, batch_size=8, edge_range=0,
                               num_devices=8)
        a = bbox.load_boxes_to_xywhc(os.path.join(out1, "big.csv"))
        b = bbox.load_boxes_to_xywhc(os.path.join(out8, "big.csv"))
        np.testing.assert_array_equal(a, b)


class TestTiledNmsPathEquivalence:
    def test_host_vs_device_nms_through_tiling(self, exported_model,
                                               tmp_path, rng):  # noqa: F811
        """The whole tiled pipeline gives identical CSVs with host or
        device NMS."""
        import os
        from yolov3_tpu.data.imaging import imwrite
        from yolov3_tpu.inference_tiled import inference_image_folder
        from yolov3_tpu.ops import boxes as bbox
        path, _ = exported_model
        img_dir = str(tmp_path / "big2")
        os.makedirs(img_dir)
        imwrite(rng.randint(0, 255, (150, 130, 3)).astype(np.uint8),
                os.path.join(img_dir, "big.png"))
        out_d = str(tmp_path / "od")
        out_h = str(tmp_path / "oh")
        for out, host in ((out_d, False), (out_h, True)):
            inference_image_folder(img_dir, "png", path, out,
                                   tile_size=(64, 64), min_roi_size=4,
                                   batch_size=4, edge_range=0,
                                   use_host_nms=host)
        a = bbox.load_boxes_to_xywhc(os.path.join(out_d, "big.csv"))
        b = bbox.load_boxes_to_xywhc(os.path.join(out_h, "big.csv"))
        np.testing.assert_array_equal(a, b)

"""mAP evaluation tests (golden values on crafted detections)."""

import numpy as np
import pytest

from yolov3_tpu.ops import boxes as bbox
from yolov3_tpu.utils.evaluation import (
    average_precision,
    evaluate_detections,
    evaluate_folders,
    load_predictions,
)


def ltrb(x, y, w, h, c):
    return [x, y, x + w - 1, y + h - 1, c]


class TestAveragePrecision:
    def test_perfect(self):
        assert average_precision(np.array([0.5, 1.0]),
                                 np.array([1.0, 1.0])) == pytest.approx(1.0)

    def test_half(self):
        # one TP then one FP over 2 GT: recall 0.5 at precision 1.0, then
        # precision drops -> AP = 0.5
        assert average_precision(np.array([0.5, 0.5]),
                                 np.array([1.0, 0.5])) == pytest.approx(0.5)


class TestEvaluateDetections:
    def test_perfect_detections(self):
        gt = {"a": np.array([ltrb(0, 0, 10, 10, 0), ltrb(50, 50, 10, 10, 0)],
                            dtype=float)}
        preds = {"a": (np.array([ltrb(0, 0, 10, 10, 0)[:4],
                                 ltrb(50, 50, 10, 10, 0)[:4]], dtype=float),
                       np.array([0.9, 0.8]), np.array([0, 0]))}
        out = evaluate_detections(preds, gt)
        assert out["mAP"] == pytest.approx(1.0)

    def test_miss_halves_recall(self):
        gt = {"a": np.array([ltrb(0, 0, 10, 10, 0), ltrb(50, 50, 10, 10, 0)],
                            dtype=float)}
        preds = {"a": (np.array([ltrb(0, 0, 10, 10, 0)[:4]], dtype=float),
                       np.array([0.9]), np.array([0]))}
        out = evaluate_detections(preds, gt)
        assert out["mAP"] == pytest.approx(0.5)

    def test_duplicate_detection_is_fp(self):
        gt = {"a": np.array([ltrb(0, 0, 10, 10, 0)], dtype=float)}
        box = ltrb(0, 0, 10, 10, 0)[:4]
        preds = {"a": (np.array([box, box], dtype=float),
                       np.array([0.9, 0.8]), np.array([0, 0]))}
        out = evaluate_detections(preds, gt)
        # first matches, duplicate is a false positive after the TP -> AP 1.0
        assert out["mAP"] == pytest.approx(1.0)

    def test_low_iou_is_fp(self):
        gt = {"a": np.array([ltrb(0, 0, 10, 10, 0)], dtype=float)}
        preds = {"a": (np.array([ltrb(100, 100, 10, 10, 0)[:4]], dtype=float),
                       np.array([0.9]), np.array([0]))}
        out = evaluate_detections(preds, gt)
        assert out["mAP"] == pytest.approx(0.0)

    def test_per_class_independent(self):
        gt = {"a": np.array([ltrb(0, 0, 10, 10, 0), ltrb(50, 50, 10, 10, 1)],
                            dtype=float)}
        preds = {"a": (np.array([ltrb(0, 0, 10, 10, 0)[:4]], dtype=float),
                       np.array([0.9]), np.array([0]))}
        out = evaluate_detections(preds, gt)
        assert out["per_class_ap"][0] == pytest.approx(1.0)
        assert out["per_class_ap"][1] == pytest.approx(0.0)
        assert out["mAP"] == pytest.approx(0.5)


class TestFolders:
    def test_end_to_end(self, tmp_path):
        gt_dir = tmp_path / "gt"
        pred_dir = tmp_path / "pred"
        gt_dir.mkdir()
        pred_dir.mkdir()
        bbox.write_boxes_from_xywhc(np.array([[0, 0, 10, 10, 0]]),
                                    str(gt_dir / "im0.csv"))
        # ltrbpc predictions
        bbox.write_boxes_from_ltrbpc(np.array([[0, 0, 9, 9, 0.9, 0]]),
                                     str(pred_dir / "im0.csv"))
        out = evaluate_folders(str(pred_dir), str(gt_dir))
        assert out["mAP"] == pytest.approx(1.0)

    def test_load_predictions_layouts(self, tmp_path):
        fp = str(tmp_path / "p.csv")
        bbox.write_boxes_from_xywhc(np.array([[1, 2, 10, 10, 3]]), fp)
        boxes, scores, classes = load_predictions(fp)
        assert scores[0] == 1.0 and classes[0] == 3
        bbox.write_boxes_from_ltrbpc(np.array([[1, 2, 10, 11, 0.5, 3]]), fp)
        boxes, scores, classes = load_predictions(fp)
        assert scores[0] == pytest.approx(0.5)
        np.testing.assert_array_equal(boxes[0], [1, 2, 10, 11])


class TestMissingPredictions:
    def test_gt_without_predictions_counts_as_missed(self, tmp_path):
        gt_dir = tmp_path / "gt2"
        pred_dir = tmp_path / "pred2"
        gt_dir.mkdir()
        pred_dir.mkdir()
        bbox.write_boxes_from_xywhc(np.array([[0, 0, 10, 10, 0]]),
                                    str(gt_dir / "a.csv"))
        bbox.write_boxes_from_xywhc(np.array([[0, 0, 10, 10, 0]]),
                                    str(gt_dir / "b.csv"))
        # prediction only for image a (perfect); b has no prediction file
        bbox.write_boxes_from_ltrbpc(np.array([[0, 0, 9, 9, 0.9, 0]]),
                                     str(pred_dir / "a.csv"))
        out = evaluate_folders(str(pred_dir), str(gt_dir))
        # recall tops out at 0.5 -> AP 0.5
        assert out["mAP"] == pytest.approx(0.5)

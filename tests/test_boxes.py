"""Golden-value tests for the host geometry core (SURVEY.md §7 step 1)."""

import numpy as np
import pytest

from yolov3_tpu.ops import boxes as bbox


class TestComputeIou:
    def test_identical_boxes(self):
        b = np.array([0.0, 0.0, 10.0, 10.0])
        ious = bbox.compute_iou(b, b[None, :])
        assert ious[0] == pytest.approx(1.0)

    def test_disjoint(self):
        b = np.array([0.0, 0.0, 10.0, 10.0])
        others = np.array([[20.0, 20.0, 30.0, 30.0]])
        assert bbox.compute_iou(b, others)[0] == pytest.approx(0.0)

    def test_half_overlap_golden(self):
        # box A [0,0,10,10] area 100; B [5,0,15,10] area 100; inter 50 -> 50/150
        b = np.array([0.0, 0.0, 10.0, 10.0])
        others = np.array([[5.0, 0.0, 15.0, 10.0]])
        assert bbox.compute_iou(b, others)[0] == pytest.approx(1.0 / 3.0)

    def test_corner_touch_is_zero(self):
        b = np.array([0.0, 0.0, 10.0, 10.0])
        others = np.array([[10.0, 10.0, 20.0, 20.0]])
        assert bbox.compute_iou(b, others)[0] == pytest.approx(0.0)

    def test_contained_box(self):
        b = np.array([0.0, 0.0, 10.0, 10.0])
        others = np.array([[2.0, 2.0, 4.0, 4.0]])  # area 4 inside area 100
        assert bbox.compute_iou(b, others)[0] == pytest.approx(4.0 / 100.0)


class TestSingleClassNms:
    def test_keeps_highest_and_suppresses(self):
        boxes = np.array([
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],   # heavy overlap with first
            [50.0, 50.0, 60.0, 60.0],
        ])
        scores = np.array([0.9, 0.8, 0.7])
        keep = bbox.single_class_nms(boxes, scores, iou_threshold=0.5)
        assert keep == [0, 2]

    def test_iou_exactly_at_threshold_survives(self):
        # the reference keeps candidates with iou <= threshold
        boxes = np.array([
            [0.0, 0.0, 10.0, 10.0],
            [5.0, 0.0, 15.0, 10.0],   # IoU = 1/3 vs first
        ])
        scores = np.array([0.9, 0.8])
        keep = bbox.single_class_nms(boxes, scores, iou_threshold=1.0 / 3.0)
        assert keep == [0, 1]
        keep = bbox.single_class_nms(boxes, scores, iou_threshold=0.33)
        assert keep == [0]

    def test_order_by_score_not_index(self):
        boxes = np.array([
            [1.0, 1.0, 11.0, 11.0],
            [0.0, 0.0, 10.0, 10.0],
        ])
        scores = np.array([0.5, 0.9])
        keep = bbox.single_class_nms(boxes, scores, iou_threshold=0.5)
        assert keep == [1]


class TestPerClassNms:
    def test_score_rule_sqrt_blend(self):
        boxes = np.array([[0.0, 0.0, 10.0, 10.0]])
        objectness = np.array([[0.25]])
        probs = np.array([[0.25]])
        # score = sqrt(0.25*0.25) = 0.25 >= 0.1 -> kept
        b, s, l = bbox.per_class_nms(boxes, objectness, probs)
        assert s[0] == pytest.approx(0.25)
        assert l[0] == 0

    def test_below_threshold_returns_none(self):
        boxes = np.array([[0.0, 0.0, 10.0, 10.0]])
        objectness = np.array([[0.01]])
        probs = np.array([[0.01]])
        assert bbox.per_class_nms(boxes, objectness, probs) == (None, None, None)

    def test_threshold_inclusive(self):
        boxes = np.array([[0.0, 0.0, 10.0, 10.0]])
        objectness = np.array([[0.1]])
        probs = np.array([[0.1]])  # score exactly 0.1
        b, s, l = bbox.per_class_nms(boxes, objectness, probs)
        assert b is not None and len(s) == 1

    def test_per_class_independent(self):
        # two heavily-overlapping boxes of different classes both survive
        boxes = np.array([
            [0.0, 0.0, 10.0, 10.0],
            [0.0, 0.0, 10.0, 10.0],
        ])
        objectness = np.array([[0.9], [0.9]])
        probs = np.array([[0.9, 0.0], [0.0, 0.9]])
        b, s, l = bbox.per_class_nms(boxes, objectness, probs)
        assert len(l) == 2
        assert sorted(l.tolist()) == [0, 1]

    def test_labels_concatenated_by_class(self):
        boxes = np.array([
            [0.0, 0.0, 10.0, 10.0],
            [50.0, 50.0, 60.0, 60.0],
        ])
        objectness = np.array([[0.9], [0.9]])
        probs = np.array([[0.9, 0.9], [0.9, 0.9]])
        b, s, l = bbox.per_class_nms(boxes, objectness, probs)
        assert b.shape == (4, 4)
        assert l.tolist() == [0, 0, 1, 1]


class TestFilterSmallBoxes:
    def test_strict_greater(self):
        boxes = np.array([
            [0.0, 0.0, 32.0, 32.0],   # w = h = 32, NOT > 32 -> dropped
            [0.0, 0.0, 33.0, 33.0],   # kept
            [0.0, 0.0, 33.0, 32.0],   # h = 32 -> dropped
        ])
        out = bbox.filter_small_boxes(boxes, 32)
        assert out.shape[0] == 1
        assert out[0, 2] == 33.0

    def test_passthrough_extra_columns(self):
        boxes = np.array([[0.0, 0.0, 40.0, 40.0, 0.7, 2.0]])
        out = bbox.filter_small_boxes(boxes, 32)
        assert out.shape == (1, 6)


class TestUnionOverlapping:
    def test_two_overlapping_merge(self):
        boxes = np.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
        scores = np.array([0.8, 0.6])
        out_b, out_s = bbox.union_all_overlapping_bb(boxes.copy(), scores.copy())
        assert out_b.shape[0] == 1
        np.testing.assert_allclose(out_b[0], [0.0, 0.0, 15.0, 15.0])
        assert out_s[0] == pytest.approx(0.7)

    def test_disjoint_untouched(self):
        boxes = np.array([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]])
        scores = np.array([0.8, 0.6])
        out_b, out_s = bbox.union_all_overlapping_bb(boxes.copy(), scores.copy())
        assert out_b.shape[0] == 2


class TestCsvIO:
    def test_xywhc_roundtrip(self, tmp_path):
        fp = str(tmp_path / "b.csv")
        boxes = np.array([[1, 2, 30, 40, 0], [5, 6, 70, 80, 3]])
        bbox.write_boxes_from_xywhc(boxes, fp)
        with open(fp) as fh:
            assert fh.readline().strip() == "X,Y,W,H,C"
        loaded = bbox.load_boxes_to_xywhc(fp)
        np.testing.assert_array_equal(loaded, boxes.astype(np.float64))

    def test_ltrbc_write_converts_to_wh(self, tmp_path):
        fp = str(tmp_path / "b.csv")
        # ltrb inclusive: [1,2,30,41] -> x=1,y=2,w=30,h=40
        bbox.write_boxes_from_ltrbc(np.array([[1, 2, 30, 41, 7]]), fp)
        loaded = bbox.load_boxes_to_xywhc(fp)
        np.testing.assert_array_equal(loaded[0], [1, 2, 30, 40, 7])

    def test_ltrbc_load_roundtrip(self, tmp_path):
        fp = str(tmp_path / "b.csv")
        bbox.write_boxes_from_xywhc(np.array([[1, 2, 30, 40, 0]]), fp)
        ltrb = bbox.load_boxes_to_ltrbc(fp)
        np.testing.assert_array_equal(ltrb[0], [1, 2, 30, 41, 0])

    def test_ltrbpc_header_and_format(self, tmp_path):
        fp = str(tmp_path / "b.csv")
        bbox.write_boxes_from_ltrbpc(np.array([[1.0, 2.0, 30.0, 41.0, 0.5, 3.0]]), fp)
        with open(fp) as fh:
            assert fh.readline().strip() == "X,Y,W,H,P,C"
            vals = fh.readline().strip().split(",")
        assert vals[:4] == ["1", "2", "30", "40"]
        assert float(vals[4]) == pytest.approx(0.5)
        assert vals[5] == "3"

    def test_missing_file_empty(self, tmp_path):
        out = bbox.load_boxes_to_xywhc(str(tmp_path / "nope.csv"))
        assert out.shape == (0, 5)

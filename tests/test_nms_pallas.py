"""Pallas NMS suppression kernel vs XLA fori_loop vs host oracle.

CPU tests run the kernel in Pallas interpreter mode; the compiled path is
exercised on TPU by the inference CLIs and bench.
"""

import numpy as np
import pytest

from yolov3_tpu.ops import boxes as bbox
from yolov3_tpu.ops.nms import nms_to_host, per_class_nms_device
from yolov3_tpu.ops.pallas.nms_kernel import greedy_suppress_pallas

from tests.test_nms_device import random_detections


class TestPallasSuppress:
    @pytest.mark.parametrize("seed,n,c", [(0, 64, 1), (1, 128, 3), (7, 256, 2)])
    def test_matches_host_oracle(self, seed, n, c):
        rng = np.random.RandomState(seed)
        boxes, objectness, probs = random_detections(rng, n, c)
        out = per_class_nms_device(boxes, objectness, probs, max_boxes=n,
                                   use_pallas=True)
        got = nms_to_host(*out)
        want = bbox.per_class_nms(boxes, objectness, probs)
        np.testing.assert_allclose(got[0], want[0], rtol=1e-5)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5)
        np.testing.assert_array_equal(got[2], want[2])

    def test_matches_xla_path(self, rng):
        boxes, objectness, probs = random_detections(rng, 100, 4)
        a = per_class_nms_device(boxes, objectness, probs, max_boxes=64,
                                 use_pallas=True)
        b = per_class_nms_device(boxes, objectness, probs, max_boxes=64,
                                 use_pallas=False)
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))

    def test_kernel_direct_threshold_tie(self):
        # IoU exactly at the threshold must NOT suppress (strict >)
        iou = np.array([[[1.0, 0.3], [0.3, 1.0]]], dtype=np.float32)
        valid = np.ones((1, 2), bool)
        keep = np.asarray(greedy_suppress_pallas(iou, valid, 0.3,
                                                 interpret=True))
        assert keep.tolist() == [[True, True]]
        keep = np.asarray(greedy_suppress_pallas(iou, valid, 0.29,
                                                 interpret=True))
        assert keep.tolist() == [[True, False]]

    def test_kernel_direct_chain(self):
        # A suppresses B; C overlaps B but not A -> C survives (suppressed
        # boxes cannot suppress others)
        iou = np.array([[[1.0, 0.9, 0.0],
                         [0.9, 1.0, 0.9],
                         [0.0, 0.9, 1.0]]], dtype=np.float32)
        valid = np.ones((1, 3), bool)
        keep = np.asarray(greedy_suppress_pallas(iou, valid, 0.5,
                                                 interpret=True))
        assert keep.tolist() == [[True, False, True]]

    def test_invalid_never_kept(self):
        iou = np.eye(4, dtype=np.float32)[None]
        valid = np.array([[True, False, True, False]])
        keep = np.asarray(greedy_suppress_pallas(iou, valid, 0.5,
                                                 interpret=True))
        assert keep.tolist() == [[True, False, True, False]]

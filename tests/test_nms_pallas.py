"""Pallas NMS suppression kernel vs XLA fori_loop vs host oracle.

CPU tests run the kernel in Pallas interpreter mode; the compiled path is
exercised on TPU by the inference CLIs and bench.
"""

import numpy as np
import pytest

from yolov3_tpu.ops import boxes as bbox
from yolov3_tpu.ops.nms import nms_to_host, per_class_nms_device
from yolov3_tpu.ops.pallas.nms_kernel import (greedy_suppress_pallas,
                                              suppress_boxes_pallas,
                                              suppress_boxes_pallas_t)

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


class TestSuppressBoxes:
    """The in-kernel-IoU round-3 kernel (`suppress_boxes_pallas`)."""

    def _oracle_keep(self, cand, valid, thr):
        from yolov3_tpu.ops.nms import _greedy_suppress, pairwise_iou
        import jax
        return np.asarray(jax.vmap(
            lambda c, v: _greedy_suppress(pairwise_iou(c), v, thr))(
                cand, valid))

    @pytest.mark.parametrize("seed,c,k", [(0, 3, 64), (1, 7, 128)])
    def test_matches_iou_slab_recurrence(self, seed, c, k):
        rng = np.random.RandomState(seed)
        xy = rng.rand(c, k, 2).astype(np.float32) * 100
        wh = rng.rand(c, k, 2).astype(np.float32) * 40 + 1
        cand = np.concatenate([xy, xy + wh], axis=-1)
        # score-sorted prefix validity (the production shape)
        counts = rng.randint(0, k + 1, c)
        valid = (np.arange(k)[None, :] < counts[:, None])
        got = np.asarray(suppress_boxes_pallas(cand, valid, 0.3,
                                               interpret=True))
        want = self._oracle_keep(cand, valid, 0.3)
        np.testing.assert_array_equal(got, want)

    def test_gap_validity_pattern(self):
        """Robustness: non-prefix validity (not produced by the NMS entry
        points, but the kernel must not silently mis-handle it)."""
        cand = np.array([[[0, 0, 10, 10],
                          [0, 0, 10, 10],
                          [20, 20, 30, 30],
                          [50, 50, 60, 60]]], dtype=np.float32)
        valid = np.array([[True, False, True, False]])
        got = np.asarray(suppress_boxes_pallas(cand, valid, 0.5,
                                               interpret=True))
        assert got.tolist() == [[True, False, True, False]]

    def test_all_invalid_keeps_nothing(self):
        cand = np.zeros((2, 8, 4), np.float32)
        valid = np.zeros((2, 8), bool)
        got = np.asarray(suppress_boxes_pallas(cand, valid, 0.3,
                                               interpret=True))
        assert not got.any()

    def test_threshold_tie_survives(self):
        # two boxes with IoU exactly 1/3: threshold 1/3 keeps both
        cand = np.array([[[0, 0, 10, 10], [0, 5, 10, 15]]], np.float32)
        valid = np.ones((1, 2), bool)
        iou = 50.0 / 150.0
        keep = np.asarray(suppress_boxes_pallas(cand, valid, iou,
                                                interpret=True))
        assert keep.tolist() == [[True, True]]
        keep = np.asarray(suppress_boxes_pallas(cand, valid, iou - 1e-4,
                                                interpret=True))
        assert keep.tolist() == [[True, False]]


class TestSuppressBoxesTransposed:
    """The transposed ("planes") kernel: identical contract and identical
    IoU arithmetic as `suppress_boxes_pallas`, so keep masks must match
    the row-layout kernel BIT-FOR-BIT on any input."""

    @pytest.mark.parametrize("seed,c,k,unroll", [(0, 3, 64, 4),
                                                 (1, 7, 128, 4),
                                                 (2, 130, 64, 2),
                                                 (3, 1, 32, 1)])
    def test_matches_row_layout_kernel(self, seed, c, k, unroll):
        rng = np.random.RandomState(seed)
        xy = rng.rand(c, k, 2).astype(np.float32) * 100
        wh = rng.rand(c, k, 2).astype(np.float32) * 40 + 1
        cand = np.concatenate([xy, xy + wh], axis=-1)
        counts = rng.randint(0, k + 1, c)
        valid = (np.arange(k)[None, :] < counts[:, None])
        got = np.asarray(suppress_boxes_pallas_t(cand, valid, 0.3,
                                                 interpret=True,
                                                 unroll=unroll))
        want = np.asarray(suppress_boxes_pallas(cand, valid, 0.3,
                                                interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_threshold_tie_survives(self):
        cand = np.array([[[0, 0, 10, 10], [0, 5, 10, 15]]], np.float32)
        valid = np.ones((1, 2), bool)
        iou = 50.0 / 150.0
        keep = np.asarray(suppress_boxes_pallas_t(cand, valid, iou,
                                                  interpret=True))
        assert keep.tolist() == [[True, True]]
        keep = np.asarray(suppress_boxes_pallas_t(cand, valid, iou - 1e-4,
                                                  interpret=True))
        assert keep.tolist() == [[True, False]]

    def test_gap_validity_pattern(self):
        cand = np.array([[[0, 0, 10, 10],
                          [0, 0, 10, 10],
                          [20, 20, 30, 30],
                          [50, 50, 60, 60]]], dtype=np.float32)
        valid = np.array([[True, False, True, False]])
        got = np.asarray(suppress_boxes_pallas_t(cand, valid, 0.5,
                                                 interpret=True))
        assert got.tolist() == [[True, False, True, False]]

    def test_all_invalid_keeps_nothing(self):
        cand = np.zeros((2, 8, 4), np.float32)
        valid = np.zeros((2, 8), bool)
        got = np.asarray(suppress_boxes_pallas_t(cand, valid, 0.3,
                                                 interpret=True))
        assert not got.any()

"""Label-encoder tests (reference/imagereader.py:252-324 semantics)."""

import numpy as np
import pytest

from yolov3_tpu.data.encoder import decode_label_grid, encode_boxes, grid_shapes

ANCHORS = [(32, 32), (128, 128), (256, 256)]


class TestGridShapes:
    def test_strides(self):
        shapes = grid_shapes((64, 128), 3, 2)
        assert shapes == [(2, 4, 3, 7), (4, 8, 3, 7), (8, 16, 3, 7)]


class TestEncodeBoxes:
    def test_empty_boxes(self):
        labels = encode_boxes(np.zeros((0, 5)), (64, 64), ANCHORS, 2)
        assert len(labels) == 3
        for lbl in labels:
            assert np.all(lbl == 0)

    def test_single_box_placement(self):
        # box at x=0,y=0,w=32,h=32 -> center floor((0,0)+(31/2)) = (15,15)
        # best anchor: 32x32 (index 0)
        boxes = np.array([[0, 0, 32, 32, 1]])
        labels = encode_boxes(boxes, (64, 64), ANCHORS, 3)
        s32 = labels[0]
        # cell: i=floor(15/64*2)=0, j=0
        assert s32[0, 0, 0, 4] == 1.0
        np.testing.assert_array_equal(s32[0, 0, 0, 0:4], [15, 15, 32, 32])
        np.testing.assert_array_equal(s32[0, 0, 0, 5:], [0, 1, 0])
        # written to ALL scales (reference quirk)
        for lbl in labels:
            assert lbl[..., 4].sum() == 1.0

    def test_best_anchor_by_iou(self):
        # 120x120 box should pick the 128x128 anchor (index 1)
        boxes = np.array([[100, 100, 120, 120, 0]])
        labels = encode_boxes(boxes, (256, 256), ANCHORS, 1)
        hits = np.nonzero(labels[0][..., 4])
        assert hits[2][0] == 1  # anchor index

    def test_cell_indexing_row_from_y(self):
        # center near (x=200, y=40) in a 256x256 image -> s32 grid 8x8:
        # i = floor(40/256*8) = 1 (row), j = floor(200/256*8) = 6 (col)
        boxes = np.array([[190, 30, 21, 21, 0]])
        labels = encode_boxes(boxes, (256, 256), ANCHORS, 1)
        ii, jj, aa = np.nonzero(labels[0][..., 4])
        assert (ii[0], jj[0]) == (1, 6)

    def test_overwrite_same_slot(self):
        # two boxes landing in the same cell+anchor: the later box's coords
        # win, but one-hot class bits ACCUMULATE (the reference never clears
        # the slot, reference/imagereader.py:312-322)
        boxes = np.array([[0, 0, 30, 30, 0], [2, 2, 30, 30, 1]])
        labels = encode_boxes(boxes, (64, 64), ANCHORS, 2)
        s32 = labels[0]
        assert s32[..., 4].sum() == 1.0
        np.testing.assert_array_equal(s32[0, 0, 0, 0:4], [16, 16, 30, 30])
        assert s32[0, 0, 0, 5 + 1] == 1.0
        assert s32[0, 0, 0, 5 + 0] == 1.0  # earlier class bit persists

    def test_roundtrip_via_inverse(self):
        boxes = np.array([[4, 8, 24, 28, 0], [150, 160, 60, 50, 1]])
        labels = encode_boxes(boxes, (256, 256), ANCHORS, 2)
        rec = decode_label_grid(labels[2])  # finest grid, fewest collisions
        assert rec.shape[0] == 2
        # inverse recovers corner via center - int(w/2); equal up to the
        # floor in the forward shift
        rec = rec[np.argsort(rec[:, 0])]
        for got, want in zip(rec, boxes):
            assert abs(got[0] - want[0]) <= 1
            assert abs(got[1] - want[1]) <= 1
            assert got[2] == want[2] and got[3] == want[3]

    def test_none_boxes(self):
        labels = encode_boxes(None, (64, 64), ANCHORS, 2)
        assert all(np.all(l == 0) for l in labels)

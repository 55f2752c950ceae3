"""Box-decode parity: JAX decode vs an independent numpy oracle.

The oracle below re-derives the reference's reorg math
(reference/model.py:122-212) directly from the YOLOv3 decode equations.
"""

import numpy as np
import pytest

from yolov3_tpu.ops.decode import decode_detections, reorg_feature_map


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_reorg(fm_nhwc, anchors, num_classes, stride):
    """Oracle: decode one feature map with plain numpy."""
    n, gh, gw, _ = fm_nhwc.shape
    a = len(anchors)
    fm = fm_nhwc.reshape(n, gh, gw, a, 5 + num_classes).astype(np.float64)
    txy, twh = fm[..., 0:2], fm[..., 2:4]
    obj, cls = fm[..., 4:5], fm[..., 5:]
    xs, ys = np.meshgrid(np.arange(gw), np.arange(gh))
    offset = np.stack([xs, ys], axis=-1)[:, :, None, :]  # [gh,gw,1,2]
    bxy = (_sigmoid(txy) + offset) * stride
    bwh = np.exp(twh) * np.asarray(anchors)
    return np.concatenate([bxy, bwh], axis=-1), obj, cls


ANCHORS = [(32, 32), (128, 128), (256, 256)]


class TestReorg:
    def test_matches_numpy_oracle(self, rng):
        num_classes = 3
        fm = rng.randn(2, 4, 6, len(ANCHORS) * (5 + num_classes)).astype(np.float32)
        _, boxes, obj, cls = reorg_feature_map(fm, ANCHORS, num_classes, 32)
        ref_boxes, ref_obj, ref_cls = numpy_reorg(fm, ANCHORS, num_classes, 32)
        np.testing.assert_allclose(np.asarray(boxes), ref_boxes, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(obj), ref_obj, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cls), ref_cls, rtol=1e-6, atol=1e-6)

    def test_zero_logits_center_of_cell(self):
        """t=0 decodes to (0.5 + offset) * stride and wh = anchors."""
        num_classes = 1
        fm = np.zeros((1, 2, 2, len(ANCHORS) * 6), dtype=np.float32)
        _, boxes, _, _ = reorg_feature_map(fm, ANCHORS, num_classes, 32)
        boxes = np.asarray(boxes)
        # cell (0,0) anchor 0: center (16, 16), size (32, 32)
        np.testing.assert_allclose(boxes[0, 0, 0, 0], [16, 16, 32, 32], rtol=1e-5)
        # cell (row 1, col 0): center x = 16, y = 48
        np.testing.assert_allclose(boxes[0, 1, 0, 0, :2], [16, 48], rtol=1e-5)
        # cell (row 0, col 1): center x = 48, y = 16 — checks x/y offset order
        np.testing.assert_allclose(boxes[0, 0, 1, 0, :2], [48, 16], rtol=1e-5)
        # anchor 1 size
        np.testing.assert_allclose(boxes[0, 0, 0, 1, 2:4], [128, 128], rtol=1e-5)


class TestDecodeDetections:
    def test_output_shape_and_count(self, rng):
        num_classes = 2
        a = len(ANCHORS)
        h = w = 64  # grids 2x2, 4x4, 8x8
        fms = [rng.randn(1, h // s, w // s, a * (5 + num_classes)).astype(np.float32)
               for s in (32, 16, 8)]
        det = np.asarray(decode_detections(fms, ANCHORS, num_classes))
        expected_boxes = a * (4 + 16 + 64)
        assert det.shape == (1, expected_boxes, 4 + 1 + num_classes)

    def test_corners_and_probs(self, rng):
        num_classes = 1
        fm = np.zeros((1, 1, 1, len(ANCHORS) * 6), dtype=np.float32)
        det = np.asarray(decode_detections([fm, fm, fm], ANCHORS, num_classes,
                                           strides=(32, 16, 8)))
        # first row: stride-32 cell(0,0) anchor(32,32): center (16,16) ->
        # corners (0, 0, 32, 32); sigmoid(0) = 0.5 for obj and prob
        np.testing.assert_allclose(det[0, 0, :4], [0, 0, 32, 32], rtol=1e-5, atol=1e-5)
        assert det[0, 0, 4] == pytest.approx(0.5)
        assert det[0, 0, 5] == pytest.approx(0.5)

    def test_random_logits_match_numpy_oracle(self, rng):
        """Full packed decode vs oracle-derived corners on RANDOM logits at
        every anchor/scale — guards the lane-aligned roll/where machinery in
        _decode_fm_packed (a lane-alignment bug for anchors > 0 is invisible
        to the zero-logit tests)."""
        num_classes = 3
        a = len(ANCHORS)
        h = w = 64
        fms = [rng.randn(2, h // s, w // s, a * (5 + num_classes))
               .astype(np.float32) for s in (32, 16, 8)]
        det = np.asarray(decode_detections(fms, ANCHORS, num_classes,
                                           strides=(32, 16, 8)))
        rows = []
        for fm, stride in zip(fms, (32, 16, 8)):
            boxes, obj, cls = numpy_reorg(fm, ANCHORS, num_classes, stride)
            cxy, wh = boxes[..., 0:2], boxes[..., 2:4]
            corners = np.concatenate(
                [cxy - 0.5 * wh, cxy + 0.5 * wh], axis=-1)
            full = np.concatenate(
                [corners, _sigmoid(obj), _sigmoid(cls)], axis=-1)
            rows.append(full.reshape(fm.shape[0], -1, 5 + num_classes))
        want = np.concatenate(rows, axis=1)
        np.testing.assert_allclose(det, want, rtol=1e-4, atol=1e-4)

    def test_anchor_pad_bit_matches_unpadded(self, rng):
        """Co-padded decode (head-conv lane padding) is bit-identical to
        the unpadded decode and ignores garbage in the pad lanes."""
        num_classes = 2
        a = len(ANCHORS)
        d = 5 + num_classes
        dp = 32
        h = w = 64
        fms, padded = [], []
        for s in (32, 16, 8):
            fm = rng.randn(2, h // s, w // s, a * d).astype(np.float32)
            blocks = fm.reshape(2, h // s, w // s, a, d)
            junk = 100.0 * rng.randn(2, h // s, w // s, a, dp - d)
            pad = np.concatenate([blocks, junk], axis=-1).astype(np.float32)
            fms.append(fm)
            padded.append(pad.reshape(2, h // s, w // s, a * dp))
        want = np.asarray(decode_detections(fms, ANCHORS, num_classes,
                                            strides=(32, 16, 8)))
        got = np.asarray(decode_detections(padded, ANCHORS, num_classes,
                                           strides=(32, 16, 8),
                                           anchor_pad=dp))
        np.testing.assert_array_equal(got, want)

    def test_corners_not_clipped(self):
        """Reference leaves decode corners unclipped (reference/model.py:202-208)."""
        num_classes = 1
        a = len(ANCHORS)
        fm = np.zeros((1, 1, 1, a * 6), dtype=np.float32)
        fm[0, 0, 0, 2:4] = 3.0  # blow up w/h of anchor-0 box
        det = np.asarray(decode_detections([fm, fm, fm], ANCHORS, num_classes))
        assert det[0, 0, 0] < 0  # x0 goes negative, not clipped

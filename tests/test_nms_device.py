"""Device NMS must match the host numpy oracle bit-for-bit (SURVEY.md §7
step 1: the numpy version is the test oracle for the device kernel)."""

import numpy as np
import pytest

from yolov3_tpu.ops import boxes as bbox
from yolov3_tpu.ops.nms import (
    batched_nms_device,
    nms_to_host,
    pairwise_iou,
    per_class_nms_device,
)


def random_detections(rng, n, c):
    xy = rng.rand(n, 2) * 400
    wh = rng.rand(n, 2) * 100 + 5
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    objectness = rng.rand(n, 1).astype(np.float32)
    probs = rng.rand(n, c).astype(np.float32)
    return boxes, objectness, probs


class TestPairwiseIou:
    def test_matches_host(self, rng):
        boxes, _, _ = random_detections(rng, 20, 1)
        got = np.asarray(pairwise_iou(boxes))
        for i in range(20):
            want = bbox.compute_iou(boxes[i], boxes)
            np.testing.assert_allclose(got[i], want, rtol=1e-5)


class TestDeviceNms:
    @pytest.mark.parametrize("seed,n,c", [(0, 50, 1), (1, 100, 3), (2, 200, 5)])
    def test_matches_host_oracle(self, seed, n, c):
        rng = np.random.RandomState(seed)
        boxes, objectness, probs = random_detections(rng, n, c)
        cand_b, cand_s, keep = per_class_nms_device(
            boxes, objectness, probs, iou_threshold=0.3, score_threshold=0.1,
            max_boxes=n)
        got_b, got_s, got_l = nms_to_host(cand_b, cand_s, keep)
        want_b, want_s, want_l = bbox.per_class_nms(
            boxes, objectness, probs, iou_threshold=0.3, score_threshold=0.1)
        assert got_b.shape == want_b.shape
        np.testing.assert_allclose(got_b, want_b, rtol=1e-5)
        np.testing.assert_allclose(got_s, want_s, rtol=1e-5)
        np.testing.assert_array_equal(got_l, want_l)

    def test_nothing_survives(self, rng):
        boxes, _, _ = random_detections(rng, 10, 2)
        objectness = np.full((10, 1), 1e-4, np.float32)
        probs = np.full((10, 2), 1e-4, np.float32)
        out = per_class_nms_device(boxes, objectness, probs)
        assert not np.asarray(out[2]).any()
        assert nms_to_host(*out) == (None, None, None)

    def test_cap_drops_lowest_scores(self, rng):
        boxes, objectness, probs = random_detections(rng, 64, 1)
        # no overlap suppression: make boxes disjoint
        boxes = np.stack([np.arange(64) * 200.0, np.zeros(64),
                          np.arange(64) * 200.0 + 50, np.full(64, 50.0)],
                         axis=1).astype(np.float32)
        objectness = np.ones((64, 1), np.float32)
        probs = np.linspace(0.2, 0.9, 64)[:, None].astype(np.float32) ** 2
        _, cand_s, keep = per_class_nms_device(boxes, objectness, probs,
                                               max_boxes=16)
        kept_scores = np.asarray(cand_s)[0][np.asarray(keep)[0]]
        assert len(kept_scores) == 16
        # the 16 highest scores survive
        np.testing.assert_allclose(
            np.sort(kept_scores), np.sort(np.sqrt(probs[:, 0]))[-16:],
            rtol=1e-5)

    def test_batched(self, rng):
        n, c, b = 40, 2, 3
        dets = []
        for _ in range(b):
            boxes, objectness, probs = random_detections(rng, n, c)
            dets.append(np.concatenate([boxes, objectness, probs], axis=1))
        dets = np.stack(dets)
        out_b, out_s, keep = batched_nms_device(dets, num_classes=c,
                                                max_boxes=n)
        assert np.asarray(out_b).shape == (b, c, n, 4)
        for i in range(b):
            got = nms_to_host(out_b[i], out_s[i], keep[i])
            want = bbox.per_class_nms(dets[i, :, :4], dets[i, :, 4:5],
                                      dets[i, :, 5:])
            np.testing.assert_allclose(got[0], want[0], rtol=1e-5)

    def test_min_box_size_on_device(self, rng):
        # one big box, one small box, far apart
        dets = np.array([[
            [0, 0, 100, 100, 0.9, 0.9],
            [300, 300, 310, 310, 0.9, 0.9],
        ]], dtype=np.float32)
        _, _, keep = batched_nms_device(dets, num_classes=1, max_boxes=2,
                                        min_box_size=32)
        assert int(np.asarray(keep).sum()) == 1

    def test_saturation_detected_and_warned_once(self, rng, capsys):
        """ADVICE round 1: surface silent top-K truncation to CLI users."""
        import yolov3_tpu.ops.nms as nms_mod
        from yolov3_tpu.ops.nms import warn_if_saturated
        # 64 disjoint above-threshold candidates, cap 16 -> saturated
        boxes = np.stack([np.arange(64) * 200.0, np.zeros(64),
                          np.arange(64) * 200.0 + 50, np.full(64, 50.0)],
                         axis=1).astype(np.float32)
        objectness = np.ones((64, 1), np.float32)
        probs = np.full((64, 1), 0.8, np.float32)
        _, cand_s, _ = per_class_nms_device(boxes, objectness, probs,
                                            max_boxes=16)
        nms_mod._saturation_warned = False
        assert warn_if_saturated(np.asarray(cand_s))
        assert "raise --max-boxes" in capsys.readouterr().out
        # second call is silent (one-time warning)
        assert warn_if_saturated(np.asarray(cand_s))
        assert capsys.readouterr().out == ""
        # plenty of headroom (only 4 of 64 candidates above threshold,
        # cap 16) -> tail slots carry the -1 sentinel -> not saturated
        low_probs = np.full((64, 1), 1e-4, np.float32)
        low_probs[:4] = 0.8
        _, cand_s2, _ = per_class_nms_device(boxes, objectness, low_probs,
                                             max_boxes=16)
        assert not warn_if_saturated(np.asarray(cand_s2))

    def test_jit_cache_stable_shapes(self, rng):
        boxes, objectness, probs = random_detections(rng, 30, 2)
        o1 = per_class_nms_device(boxes, objectness, probs, max_boxes=16)
        o2 = per_class_nms_device(boxes * 1.1, objectness, probs, max_boxes=16)
        assert np.asarray(o1[0]).shape == np.asarray(o2[0]).shape

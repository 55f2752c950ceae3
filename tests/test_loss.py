"""Loss parity: static-shape JAX loss vs a numpy oracle that follows the
reference's DYNAMIC-shape formulation (tf.boolean_mask + broadcast_iou,
reference/model.py:230-354) literally."""

import numpy as np
import pytest

from yolov3_tpu.data.encoder import encode_boxes
from yolov3_tpu.ops.loss import (YoloLoss, compute_loss, loss_layer,
                                 loss_layer_packed)

ANCHORS = [(32, 32), (128, 128)]
NUM_CLASSES = 2
A = len(ANCHORS)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _sigmoid_ce(labels, logits):
    return np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits)))


def numpy_loss_layer(fm, gt, anchors, num_classes, stride):
    """Literal numpy transcription of the reference's per-scale loss,
    including the dynamic boolean_mask over the whole batch."""
    anchors = np.asarray(anchors, dtype=np.float64)
    fm = fm.astype(np.float64)
    gt = gt.astype(np.float64)
    n, gh, gw = fm.shape[0], fm.shape[1], fm.shape[2]
    batch = float(n)

    fm = fm.reshape(n, gh, gw, A, 5 + num_classes)
    xs, ys = np.meshgrid(np.arange(gw), np.arange(gh))
    offset = np.stack([xs, ys], -1)[:, :, None, :].astype(np.float64)
    pred_xy = (_sigmoid(fm[..., 0:2]) + offset) * stride
    pred_wh = np.exp(fm[..., 2:4]) * anchors
    pred_obj = fm[..., 4:5]
    pred_cls = fm[..., 5:]

    obj_mask = gt[..., 4:5]

    # dynamic-V true boxes: xy zeroed, wh = anchors, masked to valid slots
    true_xy_grid = np.zeros_like(gt[..., 0:2])
    true_wh_grid = np.ones_like(gt[..., 2:4]) * anchors
    valid = obj_mask[..., 0].astype(bool)
    v_xy = true_xy_grid[valid]            # [V,2]
    v_wh = true_wh_grid[valid]

    if v_xy.shape[0] == 0:
        best_iou = np.full((n, gh, gw, A), -np.inf)
    else:
        p_min = (pred_xy - pred_wh / 2)[..., None, :]
        p_max = (pred_xy + pred_wh / 2)[..., None, :]
        t_min = (v_xy - v_wh / 2)[None, None, None, None]
        t_max = (v_xy + v_wh / 2)[None, None, None, None]
        iw = np.maximum(np.minimum(p_max, t_max) - np.maximum(p_min, t_min), 0)
        inter = iw[..., 0] * iw[..., 1]
        pa = (pred_wh[..., 0] * pred_wh[..., 1])[..., None]
        ta = (v_wh[:, 0] * v_wh[:, 1])[None, None, None, None]
        best_iou = (inter / (pa + ta - inter)).max(-1)

    ignore = (best_iou < 0.5).astype(np.float64)[..., None]
    valid_mask = obj_mask + (1 - obj_mask) * ignore
    obj_loss = (valid_mask * _sigmoid_ce(obj_mask, pred_obj)).sum() / batch
    cls_loss = (obj_mask * _sigmoid_ce(gt[..., 5:], pred_cls)).sum() / batch

    clip = 0.01
    t_xy = np.clip(gt[..., 0:2] / stride - offset, clip, 1 - clip)
    p_xy = np.clip(pred_xy / stride - offset, clip, 1 - clip)
    inv = lambda p: -np.log(1.0 / p - 1.0)
    xy_loss = (np.square(inv(t_xy) - inv(p_xy)) * obj_mask).sum() / batch

    t_twh = gt[..., 2:4] / anchors
    p_twh = pred_wh / anchors
    t_twh = np.where(t_twh == 0, 1.0, t_twh)
    p_twh = np.where(p_twh == 0, 1.0, p_twh)
    t_twh = np.log(np.clip(t_twh, 1e-9, 1e9))
    p_twh = np.log(np.clip(p_twh, 1e-9, 1e9))
    wh_loss = (np.square(t_twh - p_twh) * obj_mask).sum() / batch
    return xy_loss, wh_loss, obj_loss, cls_loss


def make_gt(image_size, boxes):
    return encode_boxes(np.asarray(boxes), image_size, ANCHORS, NUM_CLASSES)


class TestLossLayer:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_dynamic_reference_oracle(self, seed):
        rng = np.random.RandomState(seed)
        img = (64, 64, 3)
        gts = make_gt(img, [[8, 8, 20, 24, 0], [30, 28, 30, 30, 1]])
        for gt, stride in zip(gts, (32, 16, 8)):
            gh, gw = gt.shape[0], gt.shape[1]
            fm = rng.randn(2, gh, gw, A * (5 + NUM_CLASSES)).astype(np.float32)
            gt_b = np.stack([gt, np.zeros_like(gt)])  # image 2 empty
            ours = loss_layer(fm, gt_b, ANCHORS, NUM_CLASSES, stride)
            ref = numpy_loss_layer(fm, gt_b, ANCHORS, NUM_CLASSES, stride)
            for o, r in zip(ours, ref):
                assert float(o) == pytest.approx(float(r), rel=1e-4)

    def test_empty_batch_all_ignored(self, rng):
        """V=0: TF reduce_max over the empty axis is -inf => ignore everywhere
        => objectness loss covers every cell, other components zero."""
        img = (64, 64, 3)
        gts = make_gt(img, np.zeros((0, 5)))
        gt = np.stack([gts[0], gts[0]])
        fm = rng.randn(2, 2, 2, A * (5 + NUM_CLASSES)).astype(np.float32)
        ours = loss_layer(fm, gt, ANCHORS, NUM_CLASSES, 32)
        ref = numpy_loss_layer(fm, gt, ANCHORS, NUM_CLASSES, 32)
        assert float(ours[0]) == 0.0 and float(ours[1]) == 0.0 and float(ours[3]) == 0.0
        assert float(ours[2]) == pytest.approx(float(ref[2]), rel=1e-4)

    def test_perfect_prediction_small_box_losses(self):
        """A feature map encoding the GT exactly gives ~zero xy/wh loss."""
        img = (64, 64, 3)
        box = [16, 16, 32, 32, 0]  # center (31, 31) after floor shift
        gt = make_gt(img, [box])[0]  # stride-32 grid [2,2,A,5+C]
        ii, jj, aa = np.nonzero(gt[:, :, :, 4])
        i, j, a = int(ii[0]), int(jj[0]), int(aa[0])
        cx, cy, w, h = gt[i, j, a, 0:4]

        fm = np.zeros((1, 2, 2, A * (5 + NUM_CLASSES)), dtype=np.float32)
        fm_r = fm.reshape(1, 2, 2, A, 5 + NUM_CLASSES)
        # invert decode: t_xy = logit(cx/stride - j), t_wh = log(wh/anchor)
        def logit(p):
            return np.log(p / (1 - p))
        fm_r[0, i, j, a, 0] = logit(cx / 32.0 - j)
        fm_r[0, i, j, a, 1] = logit(cy / 32.0 - i)
        fm_r[0, i, j, a, 2] = np.log(w / ANCHORS[a][0])
        fm_r[0, i, j, a, 3] = np.log(h / ANCHORS[a][1])

        xy, wh, obj, cls = loss_layer(fm, gt[None], ANCHORS, NUM_CLASSES, 32)
        assert float(xy) == pytest.approx(0.0, abs=1e-6)
        assert float(wh) == pytest.approx(0.0, abs=1e-8)
        assert float(obj) > 0  # obj logits are 0, not +inf
        assert float(cls) > 0

    def test_gradients_finite(self, rng):
        import jax
        img = (64, 64, 3)
        gt = make_gt(img, [[8, 8, 20, 24, 0]])[0][None]
        fm = rng.randn(1, 2, 2, A * (5 + NUM_CLASSES)).astype(np.float32)

        def f(fm):
            xy, wh, obj, cls = loss_layer(fm, gt, ANCHORS, NUM_CLASSES, 32)
            return xy + wh + obj + cls

        g = jax.grad(f)(fm)
        assert np.all(np.isfinite(np.asarray(g)))


class TestPackedLoss:
    """The lane-domain loss must agree with the 5D formulation in value AND
    gradient (it drives the fast train step)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_values_match_unpacked(self, seed):
        rng = np.random.RandomState(seed)
        img = (64, 64, 3)
        gts = make_gt(img, [[8, 8, 20, 24, 0], [30, 28, 30, 30, 1]])
        for gt, stride in zip(gts, (32, 16, 8)):
            gh, gw = gt.shape[0], gt.shape[1]
            fm = rng.randn(2, gh, gw, A * (5 + NUM_CLASSES)).astype(np.float32)
            gt_b = np.stack([gt, np.zeros_like(gt)])
            want = loss_layer(fm, gt_b, ANCHORS, NUM_CLASSES, stride)
            got = loss_layer_packed(fm, gt_b, ANCHORS, NUM_CLASSES, stride)
            for g_, w_ in zip(got, want):
                assert float(g_) == pytest.approx(float(w_), rel=1e-5,
                                                  abs=1e-7)

    def test_empty_batch_matches_unpacked(self, rng):
        """V=0 edge case: nothing ignored, objectness everywhere."""
        img = (64, 64, 3)
        gts = make_gt(img, np.zeros((0, 5)))
        gt = np.stack([gts[0], gts[0]])
        fm = rng.randn(2, 2, 2, A * (5 + NUM_CLASSES)).astype(np.float32)
        want = loss_layer(fm, gt, ANCHORS, NUM_CLASSES, 32)
        got = loss_layer_packed(fm, gt, ANCHORS, NUM_CLASSES, 32)
        for g_, w_ in zip(got, want):
            assert float(g_) == pytest.approx(float(w_), rel=1e-5, abs=1e-7)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_gradients_match_unpacked(self, seed):
        import jax
        rng = np.random.RandomState(seed)
        img = (64, 64, 3)
        gt = make_gt(img, [[8, 8, 20, 24, 0], [40, 40, 16, 16, 1]])[0][None]
        # large logits exercise the exp-overflow guard on non-wh lanes
        fm = (4.0 * rng.randn(1, 2, 2, A * (5 + NUM_CLASSES))
              ).astype(np.float32)

        def total(layer, x):
            xy, wh, obj, cls = layer(x, gt, ANCHORS, NUM_CLASSES, 32)
            return xy + wh + obj + cls

        g_want = np.asarray(jax.grad(lambda x: total(loss_layer, x))(fm))
        g_got = np.asarray(
            jax.grad(lambda x: total(loss_layer_packed, x))(fm))
        assert np.all(np.isfinite(g_got))
        np.testing.assert_allclose(g_got, g_want, rtol=1e-4, atol=1e-6)

    def test_compute_loss_packed_flag(self, rng):
        img = (64, 64, 3)
        gts = make_gt(img, [[8, 8, 20, 24, 0]])
        fms = [rng.randn(1, g.shape[0], g.shape[1],
                         A * (5 + NUM_CLASSES)).astype(np.float32)
               for g in gts]
        want = compute_loss(fms, [g[None] for g in gts], ANCHORS, NUM_CLASSES)
        got = compute_loss(fms, [g[None] for g in gts], ANCHORS, NUM_CLASSES,
                           packed=True)
        for g_, w_ in zip(got, want):
            assert float(g_) == pytest.approx(float(w_), rel=1e-5, abs=1e-7)


class TestComputeLoss:
    def test_sums_scales(self, rng):
        img = (64, 64, 3)
        gts = make_gt(img, [[8, 8, 20, 24, 0]])
        fms = [rng.randn(1, g.shape[0], g.shape[1], A * (5 + NUM_CLASSES)).astype(np.float32)
               for g in gts]
        out = compute_loss(fms, [g[None] for g in gts], ANCHORS, NUM_CLASSES)
        assert isinstance(out, YoloLoss)
        assert float(out.total) == pytest.approx(
            float(out.xy + out.wh + out.objectness + out.class_), rel=1e-6)

        per_scale = [loss_layer(fm, g[None], ANCHORS, NUM_CLASSES, s)
                     for fm, g, s in zip(fms, gts, (32, 16, 8))]
        assert float(out.xy) == pytest.approx(sum(float(p[0]) for p in per_scale), rel=1e-5)
